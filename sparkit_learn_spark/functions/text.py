"""Text-processing column expressions (tokenize / normalize / shingle).

Counterpart of the reference's vectorizer preprocessing
[ref: splearn/feature_extraction/text.py · C:H], expressed as
built-in functions instead of per-block Python callables.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalized_text(c: Column | str) -> Column:
    """Canonical form used for exact dedup: lowercase, trimmed."""
    c = F.col(c) if isinstance(c, str) else c
    return F.lower(F.trim(c))


def tokens(c: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization -> array<string>."""
    c = F.col(c) if isinstance(c, str) else c
    return F.split(c, sep)


def shingles(toks: Column, k: int = 5, sep: str = " ") -> Column:
    """All k-token shingles of a token array (array<string>).

    sequence(1, n-k+1) start indices -> slice(toks, i, k) -> join.
    Caller must guard size(toks) >= k (sequence would descend).
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), sep))
