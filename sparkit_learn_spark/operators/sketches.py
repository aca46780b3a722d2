"""Count-Min sketch: frequency estimation in sublinear space.

The counter grid is a (depth x width) DataFrame built with ONE hash
aggregate over the token stream — d*w counters total (a few thousand
rows) regardless of vocabulary size, which is the point: at 100 TB
the exact term-count table is billions of rows, the CMS is a
broadcastable card. Estimates never underestimate (CMS guarantee)
and overestimate by at most eps*N with probability 1-delta, where
eps ~ e/width and delta ~ exp(-depth).

Everything is deterministic: xxhash64 with fixed per-row seeds, no
RNG — the same corpus always builds the same grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_build(items: DataFrame, item_col: str, *, width: int = 1024,
              depth: int = 4) -> DataFrame:
    """Build the counter grid (row, bucket, cnt) from an item stream
    (one input row = one occurrence). One explode to depth rows per
    item + one hash aggregate — no vocabulary-sized state."""
    coords = F.explode(F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            F.pmod(F.xxhash64(F.col(item_col), F.lit(i)), F.lit(width))
             .cast("int").alias("bucket"),
        )
        for i in range(depth)
    ])).alias("rb")
    return (
        items.select(coords)
        .groupBy("rb.row", "rb.bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_probe(sketch: DataFrame, queries: DataFrame, item_col: str, *,
              width: int = 1024, depth: int = 4) -> DataFrame:
    """Estimate each query item's frequency: min over the depth
    counters it hashes to. The sketch side is d*w rows — broadcast;
    the query side explodes to depth rows and aggregates back."""
    coords = F.explode(F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            F.pmod(F.xxhash64(F.col(item_col), F.lit(i)), F.lit(width))
             .cast("int").alias("bucket"),
        )
        for i in range(depth)
    ])).alias("rb")
    probes = queries.select(item_col, coords).select(
        item_col, "rb.row", "rb.bucket"
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )
