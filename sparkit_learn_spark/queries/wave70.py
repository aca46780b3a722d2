"""Round-6 wave 70: a small-file compaction planner (the table-
maintenance OPTIMIZE primitive — fixed-order cumulative-sum bin
packing of a file manifest), a UCB1 multi-armed-bandit readout, and
Spark 4 SQL-defined UDFs (CREATE FUNCTION ... RETURN) exercised
through a banding aggregation. All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_N_FILES = 200
_ROW_BYTES = 120
_TARGET = 1_048_576  # 1 MiB compaction target
# portable Knuth multiplicative hash -> synthetic file id
_FILE_ID = f"(l_orderkey * 2654435761) % 4294967296 % {_N_FILES}"


@register(
    "q_maint_compaction_plan",
    oracle=f"""
    WITH manifest AS (
        SELECT {_FILE_ID} AS file_id,
               CAST(COUNT(*) * {_ROW_BYTES} AS BIGINT) AS bytes
        FROM lineitem GROUP BY 1),
    planned AS (
        SELECT file_id, bytes,
               CAST(FLOOR((SUM(bytes) OVER (ORDER BY file_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) - bytes)
                    / {_TARGET}) AS BIGINT) AS bin
        FROM manifest),
    bins AS (
        SELECT bin, CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
               CAST(COUNT(*) AS BIGINT) AS bin_files
        FROM planned GROUP BY bin)
    SELECT CAST(COUNT(DISTINCT p.file_id) AS BIGINT) AS n_files,
           CAST(SUM(p.bytes) AS BIGINT) AS total_bytes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bins) AS n_bins,
           ROUND(CAST(SUM(p.bytes) AS DOUBLE)
                 / (SELECT COUNT(*) FROM bins) / {_TARGET}, 6)
               AS avg_bin_fill,
           (SELECT MAX(bin_bytes) FROM bins) AS max_bin_bytes,
           CAST(SUM(CASE WHEN p.bytes > {_TARGET} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oversized_files
    FROM planned p
    """,
)
def q_maint_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: build a synthetic file manifest
    (portable-hash file ids, bytes = rows x 120), then assign files to
    merge groups by fixed-manifest-order cumulative-sum bin packing —
    bin = floor(bytes_before / target) — and report plan health
    (file/bin counts, average bin fill vs the 1 MiB target, oversized
    inputs). This is the planning half of OPTIMIZE/auto-compaction:
    at 100 TB the killer is millions of kilobyte files, and the fix
    is exactly this one sorted prefix-sum pass over the MANIFEST
    (file-count grain, never the data).

    Scale: one hash aggregate to manifest grain, one window over the
    manifest (thousands of rows per million data rows), integer
    arithmetic throughout — plan cost is O(files), independent of
    table bytes.
    """
    li = load_table(spark, sf_dir, "lineitem")
    manifest = (
        li.groupBy(
            ((F.col("l_orderkey") * 2654435761) % 4294967296 % _N_FILES)
            .alias("file_id")
        )
        .agg((F.count(F.lit(1)) * _ROW_BYTES).alias("bytes"))
    )
    w = Window.orderBy("file_id").rowsBetween(Window.unboundedPreceding, 0)
    planned = manifest.select(
        "file_id",
        "bytes",
        F.floor((F.sum("bytes").over(w) - F.col("bytes")) / _TARGET).alias(
            "bin"
        ),
    )
    bins = planned.groupBy("bin").agg(F.sum("bytes").alias("bin_bytes"))
    summary = planned.agg(
        F.countDistinct("file_id").alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
        F.sum((F.col("bytes") > _TARGET).cast("long")).alias(
            "n_oversized_files"
        ),
    )
    bin_summary = bins.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.max("bin_bytes").alias("max_bin_bytes"),
    )
    return summary.crossJoin(F.broadcast(bin_summary)).select(
        "n_files",
        "total_bytes",
        "n_bins",
        F.round(
            F.col("total_bytes").cast("double") / F.col("n_bins") / _TARGET, 6
        ).alias("avg_bin_fill"),
        "max_bin_bytes",
        "n_oversized_files",
    )


@register(
    "q_bandit_ucb",
    oracle="""
    WITH arms AS (
        SELECT CAST(user_id % 4 AS BIGINT) AS variant,
               CAST(COUNT(*) AS BIGINT) AS trials,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS successes
        FROM events GROUP BY 1),
    tot AS (SELECT CAST(SUM(trials) AS BIGINT) AS n_total FROM arms),
    scored AS (
        SELECT a.variant, a.trials, a.successes,
               ROUND(CAST(a.successes AS DOUBLE) / a.trials, 6)
                   AS mean_reward,
               ROUND(CAST(a.successes AS DOUBLE) / a.trials
                     + SQRT(2.0 * LN(CAST(t.n_total AS DOUBLE))
                            / a.trials), 6) AS ucb_score
        FROM arms a CROSS JOIN tot t)
    SELECT variant, trials, successes, mean_reward, ucb_score,
           CAST(ucb_score = MAX(ucb_score) OVER () AS BIGINT) AS chosen
    FROM scored
    ORDER BY variant
    """,
)
def q_bandit_ucb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 multi-armed-bandit readout: per variant (portable hash
    assignment), mean purchase rate plus the sqrt(2 ln N / n)
    exploration bonus; `chosen` marks the arm UCB1 would pull next.
    The deterministic half of adaptive experimentation — the policy
    replay is sequential, but the scoreboard at any snapshot is one
    aggregate pass.

    Scale: one hash aggregate to 4 arm rows; the exploration term is
    computed on exact integer counts so the 6dp-rounded scores are
    engine-stable; the arg-max window runs over 4 rows. Driver-free.
    """
    ev = load_table(spark, sf_dir, "events")
    arms = ev.groupBy((F.col("user_id") % 4).alias("variant")).agg(
        F.count(F.lit(1)).alias("trials"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias(
            "successes"
        ),
    )
    tot = arms.agg(F.sum("trials").alias("n_total"))
    scored = arms.crossJoin(F.broadcast(tot)).select(
        "variant",
        "trials",
        "successes",
        F.round(F.col("successes").cast("double") / F.col("trials"), 6).alias(
            "mean_reward"
        ),
        F.round(
            F.col("successes").cast("double") / F.col("trials")
            + F.sqrt(
                2.0 * F.log(F.col("n_total").cast("double")) / F.col("trials")
            ),
            6,
        ).alias("ucb_score"),
    )
    w = Window.partitionBy()
    return scored.select(
        "*",
        (F.col("ucb_score") == F.max("ucb_score").over(w))
        .cast("long")
        .alias("chosen"),
    ).orderBy("variant")


@register(
    "q_sql_sqludf",
    oracle="""
    SELECT CASE WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT) < 10000000
                THEN 'small'
                WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT) < 30000000
                THEN 'mid'
                ELSE 'large' END AS price_band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_sql_sqludf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar UDFs (Spark 4 `CREATE FUNCTION ... RETURN
    expr`): `order_cents` and `price_band` are declared in SQL and
    composed inside an aggregation. Unlike Python UDFs these are
    inlined into the Catalyst plan at analysis time — full codegen,
    zero serialization, so the "UDF" costs nothing at 100 TB. The
    oracle inlines the same expressions.

    Scale: identical plan to writing the CASE inline — one hash
    aggregate, whole-stage codegen end to end.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "w70_orders"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION w70_order_cents(p DOUBLE) "
        "RETURNS BIGINT RETURN CAST(ROUND(p * 100) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION w70_price_band(cents BIGINT) "
        "RETURNS STRING RETURN CASE WHEN cents < 10000000 THEN 'small' "
        "WHEN cents < 30000000 THEN 'mid' ELSE 'large' END"
    )
    return spark.sql(
        """
        SELECT w70_price_band(w70_order_cents(o_totalprice)) AS price_band,
               COUNT(*) AS n_orders,
               SUM(w70_order_cents(o_totalprice)) AS total_cents
        FROM w70_orders
        GROUP BY 1
        ORDER BY 1
        """
    )
