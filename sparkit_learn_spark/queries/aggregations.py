"""Aggregation operators (SURVEY.md §2B — q_agg_*).

Spark's hash aggregate does partial (map-side) + final aggregation
automatically — the declarative form of the reference's per-block
partial_fit + reduce(add) pattern [ref: splearn/naive_bayes.py · C:H].
Shuffle count: 1 per groupBy (partials cross the wire pre-combined);
survives 100× scale because state per grouping key is O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_R6 = 6  # float aggregates rounded to 6dp in BOTH engines (SURVEY §5.2)


@register(
    "q_agg_q1",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 6)                                   AS sum_qty,
      ROUND(SUM(l_extendedprice), 6)                              AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 6)           AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
      ROUND(AVG(l_quantity), 6)                                   AS avg_qty,
      ROUND(AVG(l_extendedprice), 6)                              AS avg_price,
      ROUND(AVG(l_discount), 6)                                   AS avg_disc,
      CAST(COUNT(*) AS BIGINT)                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_agg_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary over lineitem.

    Plan shape: parquet scan (shipdate filter pushed) -> partial hash
    agg -> exchange on (returnflag, linestatus) [2 groups x 3 — tiny]
    -> final hash agg -> sort. One shuffle; whole-stage codegen
    end-to-end; no Python.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), _R6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), _R6).alias("sum_base_price"),
            F.round(F.sum(disc_price), _R6).alias("sum_disc_price"),
            F.round(F.sum(charge), _R6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), _R6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), _R6).alias("avg_price"),
            F.round(F.avg("l_discount"), _R6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) — Spark expands to a two-stage aggregate
    (distinct on (group, key) then count); still one logical pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts")
    )


@register(
    "q_agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           ROUND(SUM(l_quantity), 6)                 AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several DISTINCT aggregates + a plain aggregate in one query
    (Spark plans an Expand — one branch per distinct key set)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.round(F.sum("l_quantity"), _R6).alias("sum_qty"),
    )


@register(
    "q_agg_rollup",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(COUNT(*) AS BIGINT)      AS n_customers,
           ROUND(SUM(c.c_acctbal), 6)    AS sum_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (region -> nation -> grand total); subtotal
    rows carry NULL group keys in both engines."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("c_acctbal"), _R6).alias("sum_bal"),
    )


@register(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT)  AS n_rows,
           ROUND(SUM(l_quantity), 6) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims (all 4 grouping-set combos)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), _R6).alias("sum_qty"),
    )


@register(
    "q_agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, ROUND(SUM(l_extendedprice), 6) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (Expand-based plan)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_extendedprice), 6) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register("q_agg_approx_cd")  # rows-only: HLL sketches differ across engines
def q_agg_approx_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++). No DuckDB oracle — HLL
    estimates are engine-specific; pytest bounds the relative error
    against the exact count instead (tests/test_approx.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts")
    )


@register(
    "q_agg_stats",
    oracle="""
    SELECT o_orderstatus,
           ROUND(AVG(o_totalprice), 6)         AS avg_price,
           ROUND(MIN(o_totalprice), 6)         AS min_price,
           ROUND(MAX(o_totalprice), 6)         AS max_price,
           ROUND(STDDEV_SAMP(o_totalprice), 4) AS std_price,
           ROUND(VAR_SAMP(o_totalprice) / 1e6, 4) AS var_price_m
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates. var is scaled to millions before
    rounding: var magnitude ~1e9 and engines use different
    single-pass/merge formulas, so absolute 6dp rounding would expose
    last-bit noise."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.avg("o_totalprice"), _R6).alias("avg_price"),
        F.round(F.min("o_totalprice"), _R6).alias("min_price"),
        F.round(F.max("o_totalprice"), _R6).alias("max_price"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("std_price"),
        F.round(F.var_samp("o_totalprice") / 1e6, 4).alias("var_price_m"),
    )


@register(
    "q_agg_having",
    oracle="""
    SELECT l_partkey, ROUND(SUM(l_quantity), 6) AS sum_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(l_quantity) > 400
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation HAVING filter (filter on the unrounded sum,
    project the rounded one — matching the SQL semantics exactly)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("_raw_sum"))
        .filter(F.col("_raw_sum") > 400)
        .select("l_partkey", F.round("_raw_sum", _R6).alias("sum_qty"))
    )


@register(
    "q_agg_time_rollup",
    oracle="""
    SELECT date_trunc('day', ts)  AS bucket_day,
           date_trunc('hour', ts) AS bucket_hour,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 6)     AS sum_value
    FROM events
    GROUP BY ROLLUP (bucket_day, bucket_hour, event_type)
    """,
)
def q_agg_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: one-pass ROLLUP over the
    (day -> hour -> event_type) hierarchy — every granularity a
    time-series store would materialize, from a single shuffle
    (operators/rollup.py time_rollup)."""
    from ..catalog import load_table as _lt
    from ..operators.rollup import time_rollup

    ev = _lt(spark, sf_dir, "events")
    return time_rollup(
        ev,
        ts_col="ts",
        levels=("day", "hour"),
        dims=("event_type",),
        aggs=[
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        ],
    )


@register("q_agg_approx_quantiles")  # rows-only: t-digest/GK sketches are engine-specific
def q_agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantile sketch (Greenwald-Khanna): p50/p90/p99 of
    o_totalprice per status at 0.1% relative error. Mergeable sketch =
    single pass + tiny shuffle at any scale; error bound asserted
    against DuckDB's exact quantiles in tests/test_ml.py."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 1000).alias("q"),
    ).select(
        "o_orderstatus",
        F.round(F.col("q")[0], 2).alias("p50"),
        F.round(F.col("q")[1], 2).alias("p90"),
        F.round(F.col("q")[2], 2).alias("p99"),
    )


@register(
    "q_agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by priority (rows) × status (columns).
    Explicit pivot values keep it a single-pass aggregate (omitting
    them would add a distinct-values job); missing cells are 0 via
    coalesce to match the FILTER-count oracle."""
    o = load_table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))  # count("*") is rejected inside Pivot
    )
    return pivoted.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c) for c in ("F", "O", "P")],
    )


@register(
    "q_agg_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bin_id,
           ROUND(CAST(FLOOR(o_totalprice / 50000) AS BIGINT) * 50000.0, 6) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 6) AS min_price,
           ROUND(MAX(o_totalprice), 6) AS max_price
    FROM orders
    GROUP BY bin_id
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value (50k bins) — the binning
    is a pure projection so the whole histogram is one partial+final
    hash aggregate on a few hundred bins: map-side combine collapses
    each partition to ~bins rows and the shuffle is tiny at any
    scale. The distributed twin of numpy.histogram for data audits."""
    o = load_table(spark, sf_dir, "orders")
    bin_id = F.floor(F.col("o_totalprice") / 50000).cast("bigint")
    return (
        o.select("o_totalprice", bin_id.alias("bin_id"))
        .groupBy("bin_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 6).alias("min_price"),
            F.round(F.max("o_totalprice"), 6).alias("max_price"),
        )
        .select(
            "bin_id",
            F.round(F.col("bin_id") * 50000.0, 6).alias("bin_lo"),
            "n", "min_price", "max_price",
        )
    )
