"""Round-6 wave 104: engine-surface completions — the iterator-form
pandas UDF (SCALAR_ITER, the expensive-init amortization shape),
GROUP BY ALL resolution, and the hidden _metadata file columns. Each
exactly DuckDB-oracled with engine-neutral outputs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table
from ..registry import register


@register(
    "q_udf_pandas_iter",
    oracle="""
    SELECT l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(FLOOR(
               SQRT(CAST(l_quantity AS DOUBLE))
               * (1 + CAST(ROUND(l_discount * 100) AS BIGINT) / 1000.0)
               * 1e6 + 0.5) / 1e6), 6) AS score_sum
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q_udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas UDF (SCALAR_ITER): the Arrow-vectorized
    shape that initializes per-EXECUTOR state once and streams
    batches through it — the API for UDFs with expensive setup
    (model weights, compiled regexes) where per-batch re-init would
    dominate. Here the 'model' is a constant coefficient table; the
    scoring math is deterministic — per-row 6dp quantization via
    TIE-FREE floor(x·10⁶ + 0.5)/10⁶ on BOTH sides (np.round is
    half-to-even but SQL ROUND is half-away-from-zero, a latent
    1e-6 cross-engine flake on exact .5 ties — ADVICE r6), so the
    aggregate is exactly oracled.

    Scale: Arrow batch transfer, one Python worker per core,
    setup amortized across ALL batches of a partition — the 10-100×
    cheaper Python path; the plan shows ArrowEvalPython with the
    iterator eval type."""
    li = load_table(spark, sf_dir, "lineitem")

    @pandas_udf("double")
    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
        import numpy as np

        coef = 1 / 1000.0  # "expensive" init: built once per worker
        for b in batches:
            q = b["q"].to_numpy(dtype=float)
            d = b["d"].to_numpy(dtype=float)
            # tie-free 6dp quantization (matches the oracle's
            # FLOOR(x*1e6 + 0.5)/1e6; np.round would be half-to-even)
            yield pd.Series(
                np.floor(np.sqrt(q) * (1 + d * coef) * 1e6 + 0.5) / 1e6
            )

    scored = li.select(
        "l_linestatus",
        score(
            F.struct(
                F.col("l_quantity").cast("double").alias("q"),
                F.round(F.col("l_discount") * 100).cast("long").alias("d"),
            )
        ).alias("s"),
    )
    return (
        scored.groupBy("l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("s"), 6).alias("score_sum"))
        .orderBy("l_linestatus")
    )


@register(
    "q_sql_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS DOUBLE)
                 / 1000.0, 6) AS revenue_k
    FROM orders
    GROUP BY ALL
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def q_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 4 / modern-SQL sugar): every non-aggregate
    select item becomes a grouping key at resolution time — the
    ergonomic form analysts reach for first, verified here to resolve
    identically to the explicit grouping in both engines (the oracle
    itself uses DuckDB's GROUP BY ALL, so the FEATURE is what's
    cross-checked, not just the result).

    Scale: resolves to a plain hash aggregate — sugar costs nothing;
    included so the SQL-surface inventory can claim the syntax.

    ANSI note (the r7 driver-red fix): under Spark 4's default ANSI
    mode `BIGINT / 1000.0` promotes to DECIMAL(28,6) while DuckDB
    yields DOUBLE — numerically identical values that hash differently
    whenever a value carries trailing zeros at 6dp. The numerator is
    therefore CAST to DOUBLE before the division in BOTH engines, and
    testing.assert_driver_hashable now rejects Decimal cells outright
    so the class cannot ship again."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gba")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT))
                          AS DOUBLE) / 1000.0, 6) AS revenue_k
        FROM orders_gba
        GROUP BY ALL
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


@register(
    "q_scan_metadata_cols",
    oracle="""
    -- the fixture ships one parquet file per table, so the file-level
    -- rollup must collapse to (1 file, COUNT(*) rows); the oracle pins
    -- that invariant without needing engine-specific path strings
    SELECT CAST(1 AS BIGINT) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS min_file_rows
    FROM orders
    """,
)
def q_scan_metadata_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden file-metadata columns (_metadata.file_path): per-file
    row counts from the scan itself — the lineage/debugging surface
    ("which file produced these rows?") that incident response needs
    when one bad file poisons a load. Output is engine-neutral
    (file COUNTS, not paths); the oracle reads the same footer truth
    through DuckDB's filename pseudo-column.

    Scale: _metadata is populated from the file split — zero extra
    I/O; the per-file aggregate is the fastest possible provenance
    audit because the file IS the partition."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias("fname")
    )
    g = df.groupBy("fname").agg(F.count(F.lit(1)).alias("cnt"))
    return g.agg(
        F.countDistinct("fname").alias("n_files"),
        F.sum("cnt").alias("n_rows"),
        F.min("cnt").alias("min_file_rows"),
    )
