"""Vector math over ``array<float>`` columns as higher-order functions.

Everything runs JVM-side via ``zip_with`` / ``aggregate`` — per-row
cost is a tight loop over the array, no Python crossing, and the
expressions participate in whole-stage codegen. Accumulation is in
DOUBLE regardless of element type (float32 embeddings) so results are
reproducible against any double-precision oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Double-precision dot product of two equal-length array columns."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array column (double)."""
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (for L2-normalized inputs this equals dot)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
