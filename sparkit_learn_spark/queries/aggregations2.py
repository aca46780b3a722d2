"""Aggregate surface, wave 2: linear-regression aggregates, exact
percentiles (interpolated), and ordered string aggregation — the
remaining ANSI aggregate families. All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_agg_regr",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4)  AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 2)
             AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6)     AS r2,
           ROUND(corr(l_extendedprice, l_quantity), 6)        AS corr_pq,
           ROUND(covar_samp(l_extendedprice, l_quantity) / 1e6, 4)
             AS covar_m,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
             AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregate family (regr_slope / intercept /
    r2 / corr / covar_samp / regr_count): price-vs-quantity fit per
    return flag. covar is scaled to millions before rounding (same
    rationale as q_agg_stats: magnitude ~1e5 with engine-specific
    merge formulas exposes last-bit noise at fine precision).

    Scale: all six are single-pass partial+final hash aggregates over
    a 3-key groupBy — Spark merges per-partition moment sketches, so
    the shuffle carries one row of moments per (partition, flag)."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 2).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.corr(y, x), 6).alias("corr_pq"),
        F.round(F.covar_samp(y, x) / 1e6, 4).alias("covar_m"),
        F.regr_count(y, x).alias("n"),
    )


@register(
    "q_agg_percentile",
    oracle="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           ROUND(quantile_cont(o_totalprice, 0.90), 4) AS p90
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (ANSI percentile_cont semantics:
    linear interpolation at rank p*(n-1)) of order value per priority
    class — the exact counterpart of q_agg_approx_quantiles' sketch.

    Scale: exact percentiles require the group's values collected to
    one aggregation buffer — correct but memory-bound per group; the
    approx (Greenwald-Khanna) variant is the 100 TB path, kept as a
    separate registered operator so both contracts stay available."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        *[
            F.round(F.percentile("o_totalprice", F.lit(p)), 4).alias(a)
            for p, a in [(0.25, "p25"), (0.50, "p50"),
                         (0.75, "p75"), (0.90, "p90")]
        ]
    )


@register(
    "q_agg_string_agg",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (string_agg / LISTAGG): the nations
    of each region as one sorted comma-joined string. Expressed as
    array_sort(collect_list()) -> array_join, the order-deterministic
    form (a bare collect_list order is partition-dependent).

    Scale: collect_list is bounded here by group fan-out (nations per
    region), not corpus size — the pattern is safe whenever the
    grouped collection is dimension-sized; for unbounded groups the
    sorted-window + aggregation form replaces it."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


@register(
    "q_agg_corr",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qty_price,
           ROUND(covar_pop(l_discount, l_tax) * 1e6, 6) + 0.0 AS covar_disc_tax_e6,
           ROUND(stddev_samp(l_extendedprice), 6) AS sd_price,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation and sample/
    population covariance — the feature-relationship profile a data-
    audit pass computes before model training.

    Scale: corr/covar are single-pass algebraic aggregates (sum, sum
    of squares, sum of products) with map-side partial merge — one
    shuffle of 3-value keys carrying a handful of moments each,
    identical shape to q_agg_stats regardless of row count.

    covar_pop(l_discount, l_tax) is O(1e-7) at fixture scales, so it
    is scaled to micro-units BEFORE the 6dp round (same precedent as
    q_agg_stats' var-in-millions): rounding the raw value lands on
    ZERO, where DuckDB keeps IEEE -0.0 but Spark's BigDecimal HALF_UP
    round has no signed zero — a guaranteed cross-engine hash split
    (the r4 driver failure)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias("covar_qty_price"),
        (F.round(F.covar_pop("l_discount", "l_tax") * 1e6, 6) + F.lit(0.0))
        .alias("covar_disc_tax_e6"),
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("sd_price"),
        F.count("*").alias("n"),
    )


@register(
    "q_agg_argmax",
    oracle="""
    SELECT c_mktsegment,
           arg_max(c_name, CAST(round(c_acctbal * 100) AS BIGINT)
                           * 10000000000 + c_custkey)  AS top_customer,
           MAX(c_acctbal)                               AS top_balance,
           arg_min(c_name, CAST(round(c_acctbal * 100) AS BIGINT)
                           * 10000000000 + c_custkey)  AS bottom_customer,
           MIN(c_acctbal)                               AS bottom_balance
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group argmax/argmin (max_by / min_by): the single-pass
    "which row holds the extreme" aggregate that otherwise needs a
    rank window + filter — one shuffle on the group key instead of a
    window sort.

    Ties broken by custkey via a scalar composite ordering value
    (acctbal is integral at 2 decimals, so acctbal*100*1e10 + custkey
    is strictly monotone in (acctbal, custkey) and fits a long) —
    bare max_by on a tied value is engine-nondeterministic, and the
    sf0.1 fixture does contain (segment, acctbal) ties.

    The composite is built in INTEGER space: round() is cast to long
    BEFORE the *1e10 multiply. Doubles past 2^53 have spacing 2, so a
    double-space composite would collide adjacent custkeys whenever
    acctbal*100*1e10 exceeds ~9.0e15 (acctbal > ~9007) and the
    tie-break would silently go nondeterministic again."""
    c = load_table(spark, sf_dir, "customer")
    ordv = (F.round(F.col("c_acctbal") * 100).cast("long")
            * F.lit(10_000_000_000) + F.col("c_custkey"))
    return c.groupBy("c_mktsegment").agg(
        F.max_by("c_name", ordv).alias("top_customer"),
        F.max("c_acctbal").alias("top_balance"),
        F.min_by("c_name", ordv).alias("bottom_customer"),
        F.min("c_acctbal").alias("bottom_balance"),
    )


@register(
    "q_agg_unpivot",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             ROUND(SUM(l_quantity), 2)      AS sum_qty,
             ROUND(SUM(l_extendedprice), 2) AS sum_price,
             ROUND(SUM(l_discount), 2)      AS sum_disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value
    FROM w UNPIVOT (value FOR metric IN (sum_qty, sum_price, sum_disc))
    """,
)
def q_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long UNPIVOT (melt): per-flag metric columns rotated into
    (key, metric, value) rows — the inverse of q_agg_pivot and the
    standard feed for long-form metric stores.

    Scale: unpivot is a zero-shuffle projection (each input row emits
    one row per measure column — a generate, no exchange); the only
    shuffle is the upstream aggregate's."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "q_agg_bool",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_discount <= 0.1)                    AS all_small_disc,
           bool_or(l_quantity >= 50)                      AS any_max_qty,
           CAST(COUNT(*) FILTER (WHERE l_tax > 0.05) AS BIGINT)
                                                          AS n_high_tax,
           CAST(COUNT(*) FILTER (WHERE l_quantity < 5) AS BIGINT)
                                                          AS n_tiny
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate battery: bool_and / bool_or /
    count_if (≡ ANSI COUNT(*) FILTER) per group — the predicates-as-
    aggregates family a data-quality report is built from.

    Scale: all four fold into ONE hash aggregate pass with map-side
    combine (booleans partial-agg as AND/OR, count_if as a partial
    sum) — no per-predicate scan, shuffle carries one row per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_discount") <= 0.1).alias("all_small_disc"),
        F.bool_or(F.col("l_quantity") >= 50).alias("any_max_qty"),
        F.count_if(F.col("l_tax") > 0.05).alias("n_high_tax"),
        F.count_if(F.col("l_quantity") < 5).alias("n_tiny"),
    )


@register(
    "q_agg_skew_kurt",
    oracle="""
    WITH mu AS (
      SELECT l_returnflag, AVG(l_discount) AS m
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           -- population g1/g2 from explicit central moments: Spark's
           -- skewness/kurtosis are population-form; DuckDB's builtins
           -- are sample-form (bias-corrected), so the oracle computes
           -- the population definition directly. +0.0 guards the
           -- signed-zero rounding class.
           ROUND(AVG(POW(l.l_discount - mu.m, 3))
                 / POW(AVG(POW(l.l_discount - mu.m, 2)), 1.5), 6) + 0.0
             AS skew,
           ROUND(AVG(POW(l.l_discount - mu.m, 4))
                 / POW(AVG(POW(l.l_discount - mu.m, 2)), 2) - 3, 6) + 0.0
             AS kurt,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l JOIN mu ON l.l_returnflag = mu.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def q_agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment statistics per group: skewness and excess
    kurtosis of the discount distribution (population form — Spark's
    definition; the oracle computes the same from explicit central
    moments because DuckDB's builtins are the bias-corrected sample
    form). Computed on l_discount, whose centered powers stay ~1e-2 —
    no catastrophic cancellation at any SF, so 6dp parity holds.

    Scale: Spark's skewness/kurtosis are single-pass algebraic
    aggregates over running moments with map-side partial merge — the
    same one-shuffle shape as q_agg_stats (the oracle's two-pass CTE
    is a DuckDB-side convenience, not the executed plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_discount"), 6).alias("skew"),
        F.round(F.kurtosis("l_discount"), 6).alias("kurt"),
        F.count("*").alias("n"),
    )


@register(
    "q_agg_bitwise",
    oracle="""
    SELECT l_returnflag,
           CAST(bit_and(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS b_and,
           CAST(bit_or(CAST(l_linenumber AS BIGINT))  AS BIGINT) AS b_or,
           CAST(bit_xor(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS b_xor
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_and / bit_or / bit_xor) per group —
    the flag-mask rollup shape (permission unions, feature-bit
    intersections). Integer-exact, no FP hazard.

    Scale: all three are commutative-associative single-value
    aggregates — partial merge map-side, one 8-byte value per group
    crosses the shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    col = F.col("l_linenumber").cast("long")
    return li.groupBy("l_returnflag").agg(
        F.bit_and(col).alias("b_and"),
        F.bit_or(col).alias("b_or"),
        F.bit_xor(col).alias("b_xor"),
    )


# q_agg_collect_sorted moved to queries/agg_arrays.py (imported first
# so the driver's 50-query registry-prefix sample re-verifies the r5
# fix) — and now emits a joined STRING, not a raw array column, which
# the driver's pandas canonicalizer cannot sort/hash.
