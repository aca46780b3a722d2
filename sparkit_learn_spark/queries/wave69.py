"""Round-6 wave 69: difference-in-differences causal readout, a
hierarchical backoff benchmark join (coalesce cascade over
specificity levels), and an incremental view-maintenance merge law
(old snapshot + delta == direct full refresh). All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_DID_CUT = "2024-01-16"


@register(
    "q_stat_diff_in_diff",
    oracle=f"""
    WITH cells AS (
        SELECT CAST(user_id % 2 = 0 AS INTEGER) AS treated,
               CAST(ts >= TIMESTAMP '{_DID_CUT}' AS INTEGER) AS post,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY 1, 2),
    wide AS (
        SELECT
          SUM(CASE WHEN treated = 1 AND post = 0 THEN cents END)
            / SUM(CASE WHEN treated = 1 AND post = 0 THEN n END)
            / 100.0 AS mean_t_pre,
          SUM(CASE WHEN treated = 1 AND post = 1 THEN cents END)
            / SUM(CASE WHEN treated = 1 AND post = 1 THEN n END)
            / 100.0 AS mean_t_post,
          SUM(CASE WHEN treated = 0 AND post = 0 THEN cents END)
            / SUM(CASE WHEN treated = 0 AND post = 0 THEN n END)
            / 100.0 AS mean_c_pre,
          SUM(CASE WHEN treated = 0 AND post = 1 THEN cents END)
            / SUM(CASE WHEN treated = 0 AND post = 1 THEN n END)
            / 100.0 AS mean_c_post,
          CAST(SUM(n) AS BIGINT) AS n_events
        FROM cells)
    SELECT ROUND(mean_t_pre, 6) AS mean_t_pre,
           ROUND(mean_t_post, 6) AS mean_t_post,
           ROUND(mean_c_pre, 6) AS mean_c_pre,
           ROUND(mean_c_post, 6) AS mean_c_post,
           ROUND((mean_t_post - mean_t_pre)
                 - (mean_c_post - mean_c_pre) + 0.0, 6) AS did_estimate,
           n_events
    FROM wide
    """,
)
def q_stat_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over the events stream: treatment =
    even user_id (a deterministic stand-in for an assignment column),
    period split at 2024-01-16, outcome = mean purchase value. DiD
    estimate = (T_post − T_pre) − (C_post − C_pre), the workhorse
    quasi-experimental readout when randomization is absent.

    Scale: one hash aggregate over the fact table down to 4 cells,
    then a single-row arithmetic projection — map-side partials do
    almost all the work; no join, no window, driver-free. Cell means
    are exact-integer cent sums divided once, so the estimate is
    bit-stable across partitionings at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            (F.col("user_id") % 2 == 0).cast("int").alias("treated"),
            (F.col("ts") >= F.lit(_DID_CUT).cast("timestamp"))
            .cast("int")
            .alias("post"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )

    def cell_mean(t: int, p: int):
        cond = (F.col("treated") == t) & (F.col("post") == p)
        cents = F.sum(F.when(cond, F.col("cents")))
        n = F.sum(F.when(cond, F.col("n")))
        return cents / n / 100.0

    wide = cells.agg(
        cell_mean(1, 0).alias("mean_t_pre"),
        cell_mean(1, 1).alias("mean_t_post"),
        cell_mean(0, 0).alias("mean_c_pre"),
        cell_mean(0, 1).alias("mean_c_post"),
        F.sum("n").alias("n_events"),
    )
    return wide.select(
        F.round("mean_t_pre", 6).alias("mean_t_pre"),
        F.round("mean_t_post", 6).alias("mean_t_post"),
        F.round("mean_c_pre", 6).alias("mean_c_pre"),
        F.round("mean_c_post", 6).alias("mean_c_post"),
        F.round(
            (F.col("mean_t_post") - F.col("mean_t_pre"))
            - (F.col("mean_c_post") - F.col("mean_c_pre")),
            6,
        ).alias("did_estimate"),
        F.col("n_events"),
    )


_MIN_CELL = 50


@register(
    "q_join_backoff_cascade",
    oracle=f"""
    WITH fact AS (
        SELECT o.o_orderkey, c.c_nationkey, o.o_orderpriority,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    lvl2 AS (
        SELECT c_nationkey, o_orderpriority,
               CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / COUNT(*)
                   AS bench
        FROM fact GROUP BY 1, 2 HAVING COUNT(*) >= {_MIN_CELL}),
    lvl1 AS (
        SELECT o_orderpriority,
               CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / COUNT(*)
                   AS bench
        FROM fact GROUP BY 1 HAVING COUNT(*) >= {_MIN_CELL}),
    lvl0 AS (
        SELECT CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / COUNT(*)
                   AS bench
        FROM fact),
    enriched AS (
        SELECT f.cents,
               CASE WHEN l2.bench IS NOT NULL THEN 2
                    WHEN l1.bench IS NOT NULL THEN 1
                    ELSE 0 END AS bench_level,
               COALESCE(l2.bench, l1.bench, l0.bench) AS bench
        FROM fact f
        LEFT JOIN lvl2 l2 ON f.c_nationkey = l2.c_nationkey
                         AND f.o_orderpriority = l2.o_orderpriority
        LEFT JOIN lvl1 l1 ON f.o_orderpriority = l1.o_orderpriority
        CROSS JOIN lvl0 l0)
    SELECT bench_level,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(ABS(cents - bench)) AS BIGINT))
                AS BIGINT) AS sum_abs_dev_cents
    FROM enriched
    GROUP BY bench_level
    ORDER BY bench_level
    """,
)
def q_join_backoff_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical backoff benchmark join: price each order against
    the most specific reliable benchmark available — (nation,
    priority) cell if it has ≥50 orders, else the priority-level
    benchmark, else the global mean — via a COALESCE cascade over two
    left joins, then report order counts and total absolute deviation
    per fallback level. The standard sparse-cell enrichment pattern
    (a.k.a. backoff smoothing) for cold-start cells.

    Scale: the benchmark tables are aggregates over the dimension
    cross-product (≤ nations × priorities rows) — all broadcast; the
    fact table shuffles once for the customer join and never again.
    Per-order deviations are rounded to integer cents before the sum
    so the output is summation-order independent.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    fact = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_nationkey",
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    fact = fact.persist()

    def bench_over(*keys: str) -> DataFrame:
        g = fact.groupBy(*[F.col(k) for k in keys]) if keys else fact.groupBy()
        out = g.agg(
            (F.sum("cents").cast("double") / F.count(F.lit(1))).alias("bench"),
            F.count(F.lit(1)).alias("n"),
        )
        if keys:
            out = out.filter(F.col("n") >= _MIN_CELL)
        return out.drop("n")

    lvl2 = bench_over("c_nationkey", "o_orderpriority").withColumnRenamed(
        "bench", "bench2"
    )
    lvl1 = bench_over("o_orderpriority").withColumnRenamed("bench", "bench1")
    lvl0 = bench_over().withColumnRenamed("bench", "bench0")

    enriched = (
        fact.join(
            F.broadcast(lvl2), ["c_nationkey", "o_orderpriority"], "left"
        )
        .join(F.broadcast(lvl1), ["o_orderpriority"], "left")
        .crossJoin(F.broadcast(lvl0))
        .select(
            "cents",
            F.when(F.col("bench2").isNotNull(), 2)
            .when(F.col("bench1").isNotNull(), 1)
            .otherwise(0)
            .alias("bench_level"),
            F.coalesce("bench2", "bench1", "bench0").alias("bench"),
        )
    )
    out = (
        enriched.groupBy("bench_level")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.abs(F.col("cents") - F.col("bench"))).cast("long")
            ).alias("sum_abs_dev_cents"),
        )
        .orderBy("bench_level")
    )
    return out


_IVM_CUT = "1999-01-01"


@register(
    "q_ivm_merge_law",
    oracle=f"""
    WITH old AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS s,
               MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS mn,
               MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS mx
        FROM orders WHERE o_orderdate < TIMESTAMP '{_IVM_CUT}'
        GROUP BY 1),
    delta AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS s,
               MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS mn,
               MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS mx
        FROM orders WHERE o_orderdate >= TIMESTAMP '{_IVM_CUT}'
        GROUP BY 1),
    direct AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS s,
               MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS mn,
               MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS mx
        FROM orders GROUP BY 1),
    merged AS (
        SELECT d.o_orderpriority,
               COALESCE(o.n, 0) + COALESCE(dl.n, 0) AS n_merged,
               COALESCE(o.s, 0) + COALESCE(dl.s, 0) AS s_merged,
               LEAST(COALESCE(o.mn, dl.mn), COALESCE(dl.mn, o.mn))
                   AS mn_merged,
               GREATEST(COALESCE(o.mx, dl.mx), COALESCE(dl.mx, o.mx))
                   AS mx_merged,
               d.n AS n_direct, d.s AS s_direct,
               d.mn AS mn_direct, d.mx AS mx_direct
        FROM direct d
        LEFT JOIN old o USING (o_orderpriority)
        LEFT JOIN delta dl USING (o_orderpriority))
    SELECT o_orderpriority,
           CAST(n_merged AS BIGINT) AS n_merged,
           ROUND(CAST(s_merged AS DOUBLE) / n_merged / 100.0, 6)
               AS mean_merged,
           CAST(mn_merged AS BIGINT) AS min_cents,
           CAST(mx_merged AS BIGINT) AS max_cents,
           CAST(n_merged = n_direct AND s_merged = s_direct
                AND mn_merged = mn_direct AND mx_merged = mx_direct
                AS BIGINT) AS merge_equals_direct
    FROM merged
    ORDER BY o_orderpriority
    """,
)
def q_ivm_merge_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance merge law: an aggregate snapshot
    built from orders before 1999-01-01 plus a delta partial from
    orders after merges — via the commutative-monoid algebra (sum of
    counts/sums, min of mins, max of maxes) — into exactly the
    direct full-refresh aggregate. Emits the merged per-priority
    stats and a per-row `merge_equals_direct` proof bit. This is the
    algebra behind every incremental refresh / map-side combine:
    partial states compose associatively, so a 100 TB view never
    needs full recomputation when a partition of new data lands.

    Scale: three hash aggregates to ≤5 rows each, then broadcast-size
    joins. All comparisons are exact-integer, so the proof bit cannot
    flip on summation order.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderdate",
    )
    cut = F.lit(_IVM_CUT).cast("timestamp")

    def partial(df: DataFrame, suffix: str) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias(f"n_{suffix}"),
            F.sum("cents").alias(f"s_{suffix}"),
            F.min("cents").alias(f"mn_{suffix}"),
            F.max("cents").alias(f"mx_{suffix}"),
        )

    old = partial(orders.filter(F.col("o_orderdate") < cut), "old")
    delta = partial(orders.filter(F.col("o_orderdate") >= cut), "delta")
    direct = partial(orders, "direct")

    merged = (
        direct.join(F.broadcast(old), ["o_orderpriority"], "left")
        .join(F.broadcast(delta), ["o_orderpriority"], "left")
        .select(
            "o_orderpriority",
            (
                F.coalesce("n_old", F.lit(0)) + F.coalesce("n_delta", F.lit(0))
            ).alias("n_merged"),
            (
                F.coalesce("s_old", F.lit(0)) + F.coalesce("s_delta", F.lit(0))
            ).alias("s_merged"),
            F.least(
                F.coalesce("mn_old", "mn_delta"),
                F.coalesce("mn_delta", "mn_old"),
            ).alias("mn_merged"),
            F.greatest(
                F.coalesce("mx_old", "mx_delta"),
                F.coalesce("mx_delta", "mx_old"),
            ).alias("mx_merged"),
            "n_direct",
            "s_direct",
            "mn_direct",
            "mx_direct",
        )
    )
    return merged.select(
        "o_orderpriority",
        F.col("n_merged").cast("long").alias("n_merged"),
        F.round(
            F.col("s_merged").cast("double") / F.col("n_merged") / 100.0, 6
        ).alias("mean_merged"),
        F.col("mn_merged").cast("long").alias("min_cents"),
        F.col("mx_merged").cast("long").alias("max_cents"),
        (
            (F.col("n_merged") == F.col("n_direct"))
            & (F.col("s_merged") == F.col("s_direct"))
            & (F.col("mn_merged") == F.col("mn_direct"))
            & (F.col("mx_merged") == F.col("mx_direct"))
        )
        .cast("long")
        .alias("merge_equals_direct"),
    ).orderBy("o_orderpriority")
