"""Skew-handling join: explicit key salting (SURVEY §4.2 guardrail).

AQE's skew-join split handles most skew at runtime; explicit salting
remains the tool when one build-side key is so hot that even split
partitions overwhelm a task (the classic power-law user_id). The
left (large, skewed) side gets a random salt in [0, n_salts); the
right side is replicated n_salts times; the join key becomes
(key, salt) — the hot key's rows spread over n_salts tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(large: DataFrame, small: DataFrame, key: str, *,
                n_salts: int = 8, how: str = "inner",
                seed: int = 42) -> DataFrame:
    """Equi-join large⋈small on ``key`` with the large side salted.

    The small side is exploded n_salts× (cheap — it is the small
    side); result columns match a plain ``large.join(small, key)``.
    """
    salted_large = large.withColumn(
        "_salt", (F.rand(seed) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_large.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")
