"""Skew-handling join: explicit key salting (SURVEY §4.2 guardrail).

AQE's skew-join split handles most skew at runtime; explicit salting
remains the tool when one build-side key is so hot that even split
partitions overwhelm a task (the classic power-law user_id). The
left (large, skewed) side gets a deterministic salt in [0, n_salts);
the right side is replicated n_salts times; the join key becomes
(key, salt) — the hot key's rows spread over n_salts tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Join types where small-side replication cannot manufacture rows:
#: every output row is anchored to exactly one (salted) large-side row.
_SAFE_HOW = {"inner", "left", "leftouter", "left_outer", "left_semi",
             "leftsemi", "left_anti", "leftanti"}


def salted_join(large: DataFrame, small: DataFrame, key: str, *,
                n_salts: int = 8, how: str = "inner",
                seed: int = 42) -> DataFrame:
    """Equi-join large⋈small on ``key`` with the large side salted.

    The small side is exploded n_salts× (cheap — it is the small
    side); result columns match a plain ``large.join(small, key)``.

    ``how`` is restricted to inner/left-flavored joins: for right/full
    outer, each unmatched small-side replica would emit its own
    null-extended row (n_salts duplicates). The salt is DERIVED from
    the row (xxhash64 over all large-side columns), not drawn from
    F.rand — task retries and speculative re-execution must re-salt a
    row identically or non-inner results can be corrupted.
    """
    if how not in _SAFE_HOW:
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "replicating the small side would duplicate unmatched "
            "right/full-outer rows n_salts times"
        )
    salted_large = large.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in large.columns], F.lit(seed)),
               F.lit(n_salts)).cast("int"),
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_large.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")
