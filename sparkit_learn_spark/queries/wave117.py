"""Round-6 wave 117: Lo-MacKinlay variance-ratio random-walk test,
recommender catalog-coverage/exposure audit (aggregate diversity of
top-k co-purchase recs), and Benford second-digit escalation. All
exactly DuckDB-oracled.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ts_variance_ratio",
    oracle="""
    WITH d AS (
        SELECT o_orderdate AS day,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
        FROM orders GROUP BY 1),
    l AS (
        SELECT v - LAG(v, 1) OVER (ORDER BY day) AS d1,
               v - LAG(v, 5) OVER (ORDER BY day) AS d5
        FROM d),
    m AS (
        SELECT CAST(COUNT(d1) AS BIGINT) AS n1, SUM(d1) AS s1,
               SUM(CAST(d1 * d1 AS DECIMAL(38, 0))) AS q1,
               CAST(COUNT(d5) AS BIGINT) AS n5, SUM(d5) AS s5,
               SUM(CAST(d5 * d5 AS DECIMAL(38, 0))) AS q5
        FROM l),
    v AS (
        SELECT n1, n5,
               (CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
               / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)) AS var1,
               (CAST(n5 AS DOUBLE) * CAST(q5 AS DOUBLE)
                - CAST(s5 AS DOUBLE) * CAST(s5 AS DOUBLE))
               / (CAST(n5 AS DOUBLE) * CAST(n5 AS DOUBLE)) AS var5
        FROM m)
    SELECT n1 AS n_diffs,
           ROUND(var5 / (5 * var1), 6) AS variance_ratio_5,
           ROUND((var5 / (5 * var1) - 1)
                 * SQRT(CAST(n1 AS DOUBLE)
                        / (2.0 * (2 * 5 - 1) * (5 - 1) / (3.0 * 5))), 6)
               AS z_score
    FROM v
    """,
)
def q_ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test (q=5) on daily revenue: under
    a random walk, the variance of 5-day changes is exactly 5× the
    variance of 1-day changes; VR < 1 means mean reversion, > 1 means
    momentum — the canonical random-walk diagnostic, sharper than
    autocorrelation at a single lag because it pools them with
    triangular weights. Both difference variances derive from exact
    integer moments; the homoskedastic z uses the standard asymptotic
    variance 2(2q−1)(q−1)/(3qn).

    Scale: two lags in one day-grain window pass, six integer
    moments, constant-time algebra."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round("o_totalprice").cast("long")).alias("v")
    )
    w = Window.orderBy("day")
    l = d.select(
        (F.col("v") - F.lag("v", 1).over(w)).alias("d1"),
        (F.col("v") - F.lag("v", 5).over(w)).alias("d5"),
    )
    dec = "decimal(38,0)"
    m = l.agg(
        F.count("d1").alias("n1"),
        F.sum("d1").alias("s1"),
        F.sum((F.col("d1") * F.col("d1")).cast(dec)).alias("q1"),
        F.count("d5").alias("n5"),
        F.sum("d5").alias("s5"),
        F.sum((F.col("d5") * F.col("d5")).cast(dec)).alias("q5"),
    )
    n1d = F.col("n1").cast("double")
    n5d = F.col("n5").cast("double")
    var1 = (n1d * F.col("q1").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double")) / (n1d * n1d)
    var5 = (n5d * F.col("q5").cast("double") - F.col("s5").cast("double") * F.col("s5").cast("double")) / (n5d * n5d)
    vr = var5 / (5 * var1)
    se_factor = 2.0 * (2 * 5 - 1) * (5 - 1) / (3.0 * 5)
    return m.select(
        F.col("n1").alias("n_diffs"),
        F.round(vr, 6).alias("variance_ratio_5"),
        F.round((vr - 1) * F.sqrt(n1d / se_factor), 6).alias("z_score"),
    )


@register(
    "q_ml_rec_coverage",
    oracle="""
    WITH li AS (SELECT l_orderkey, l_partkey % 211 AS item FROM lineitem),
    pairs AS (
        SELECT a.item AS i, b.item AS j, CAST(COUNT(*) AS BIGINT) AS co
        FROM li a JOIN li b
          ON b.l_orderkey = a.l_orderkey AND a.item <> b.item
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    topk AS (
        SELECT i, j, co,
               ROW_NUMBER() OVER (PARTITION BY i ORDER BY co DESC, j) AS rn
        FROM pairs),
    recs AS (SELECT i, j, co FROM topk WHERE rn <= 5),
    cat AS (SELECT CAST(COUNT(DISTINCT item) AS BIGINT) AS n_items FROM li),
    exp AS (
        SELECT j, CAST(COUNT(*) AS BIGINT) AS exposure FROM recs GROUP BY j),
    gini AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rec_items,
               CAST(SUM(exposure) AS BIGINT) AS total_slots,
               SUM((2.0 * rnk - CAST(cnt AS DOUBLE) - 1)
                   * CAST(exposure AS DOUBLE)) AS gnum,
               MAX(CAST(cnt AS DOUBLE)) AS cnt
        FROM (
            SELECT j, exposure,
                   ROW_NUMBER() OVER (ORDER BY exposure, j) AS rnk,
                   COUNT(*) OVER () AS cnt
            FROM exp))
    SELECT cat.n_items AS catalog_items, gini.n_rec_items, gini.total_slots,
           ROUND(CAST(gini.n_rec_items AS DOUBLE)
                 / CAST(cat.n_items AS DOUBLE), 6) AS catalog_coverage,
           ROUND(gini.gnum / (gini.cnt * CAST(gini.total_slots AS DOUBLE)),
                 6) AS exposure_gini
    FROM cat CROSS JOIN gini
    """,
)
def q_ml_rec_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommender aggregate-diversity audit: build top-5 co-purchase
    recommendations per item (support ≥ 2, deterministic cut) and
    measure CATALOG COVERAGE (what share of items ever get
    recommended) and the exposure Gini (how concentrated the slots
    are on few items) — the audit that catches popularity-feedback
    collapse BEFORE the recommender ships it; accuracy metrics alone
    reward it. Exact integer co-counts, rank-formula Gini on exact
    exposures.

    Scale: within-order self-join (bounded pairs per basket), item²
    cap via the 211-group bucketing, per-item top-5 rank; audit
    state is item-grain."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_partkey") % 211).alias("item")
    )
    # Within-order pair generation WITHOUT the fact self-join: collect
    # each order's item list (baskets are bounded at ~7 lines) and
    # explode the ordered value-distinct position pairs map-side — the
    # co-count multiset is identical to the okey-equi self-join's
    # (co(i,j) = Σ_orders cnt_i·cnt_j, i≠j), but the fact is shuffled
    # ONCE (groupBy okey) instead of twice, and no join row-expansion
    # materializes (guide §2.3-2.4).
    baskets = li.groupBy("l_orderkey").agg(F.collect_list("item").alias("items"))
    # r12: the pair rides the explode+aggregate as ONE long (i·211+j —
    # items are bounded 0..210 by the % 211 bucketing, so the encoding
    # is bijective) instead of a 2-field struct: the ~6M-element lambda
    # output allocates longs instead of InternalRow structs, and the
    # hot groupBy hashes one 8-byte key instead of two columns. The
    # (i,j) columns are decoded AFTER the aggregate on the ≤211²-row
    # result — co-count multiset identical by construction.
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, x -> "
                    "transform(filter(items, y -> y != x), "
                    "y -> x * 211L + y)))"
                )
            ).alias("p")
        )
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 2)
        .select(
            F.expr("p div 211").alias("i"),
            F.expr("p % 211").alias("j"),
            "co",
        )
    )
    rn = F.row_number().over(Window.partitionBy("i").orderBy(F.desc("co"), "j"))
    recs = pairs.withColumn("rn", rn).filter(F.col("rn") <= 5)
    cat = li.agg(F.countDistinct("item").alias("n_items"))
    exp = recs.groupBy("j").agg(F.count(F.lit(1)).alias("exposure"))
    ranked = exp.select(
        "exposure",
        F.row_number().over(Window.orderBy("exposure", "j")).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("cnt"),
    )
    gini = ranked.agg(
        F.count(F.lit(1)).alias("n_rec_items"),
        F.sum("exposure").alias("total_slots"),
        F.sum(
            (2.0 * F.col("rnk") - F.col("cnt").cast("double") - 1)
            * F.col("exposure").cast("double")
        ).alias("gnum"),
        F.max(F.col("cnt").cast("double")).alias("cnt"),
    )
    return (
        cat.crossJoin(F.broadcast(gini))
        .select(
            F.col("n_items").alias("catalog_items"),
            "n_rec_items",
            "total_slots",
            F.round(F.col("n_rec_items").cast("double") / F.col("n_items").cast("double"), 6).alias(
                "catalog_coverage"
            ),
            F.round(
                F.col("gnum") / (F.col("cnt") * F.col("total_slots").cast("double")), 6
            ).alias("exposure_gini"),
        )
    )


@register(
    "q_dq_benford2",
    oracle="""
    WITH x AS (
        SELECT CAST(ROUND(o_totalprice) AS BIGINT) AS v
        FROM orders WHERE ROUND(o_totalprice) >= 10),
    d2 AS (
        SELECT CAST(SUBSTR(CAST(v AS VARCHAR), 2, 1) AS BIGINT) AS digit
        FROM x),
    h AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS obs
          FROM d2 GROUP BY digit),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM h),
    e AS (
        SELECT h.digit, h.obs, n.n,
               CAST(n.n AS DOUBLE) * (
                   LOG10(1 + 1.0 / (10 + h.digit)) + LOG10(1 + 1.0 / (20 + h.digit))
                 + LOG10(1 + 1.0 / (30 + h.digit)) + LOG10(1 + 1.0 / (40 + h.digit))
                 + LOG10(1 + 1.0 / (50 + h.digit)) + LOG10(1 + 1.0 / (60 + h.digit))
                 + LOG10(1 + 1.0 / (70 + h.digit)) + LOG10(1 + 1.0 / (80 + h.digit))
                 + LOG10(1 + 1.0 / (90 + h.digit))) AS expected
        FROM h CROSS JOIN n),
    chi AS (
        SELECT SUM((CAST(obs AS DOUBLE) - expected)
                   * (CAST(obs AS DOUBLE) - expected) / expected) AS chi2
        FROM e)
    SELECT e.digit, e.obs, ROUND(e.expected, 6) AS benford_expected,
           ROUND(chi.chi2, 6) AS chi2_total
    FROM e CROSS JOIN chi ORDER BY e.digit
    """,
)
def q_dq_benford2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford SECOND-digit audit of order totals: the second digit's
    law P(d) = Σ_{k=1..9} log10(1 + 1/(10k+d)) — the standard
    escalation when the first-digit test (q_dq_benford) flags,
    because fabricators who know Benford fake the FIRST digit and
    forget the second. Expected counts are sums of nine log10
    literals-by-structure (identical expression both engines);
    observed counts are exact integers from string digit extraction.

    Scale: one digit-extraction pass to a 10-row histogram — audit
    cost is one scan regardless of volume."""
    o = load_table(spark, sf_dir, "orders")
    x = o.select(F.round("o_totalprice").cast("long").alias("v")).filter(F.col("v") >= 10)
    d2 = x.select(F.substring(F.col("v").cast("string"), 2, 1).cast("long").alias("digit"))
    h = d2.groupBy("digit").agg(F.count(F.lit(1)).alias("obs"))
    n = h.agg(F.sum("obs").alias("n"))
    prob = sum(
        (F.log10(1 + 1.0 / (10 * k + F.col("digit"))) for k in range(1, 10)),
        F.lit(0.0),
    )
    e = h.crossJoin(F.broadcast(n)).select(
        "digit", "obs", (F.col("n").cast("double") * prob).alias("expected")
    )
    chi = e.agg(
        F.sum(
            (F.col("obs").cast("double") - F.col("expected"))
            * (F.col("obs").cast("double") - F.col("expected"))
            / F.col("expected")
        ).alias("chi2")
    )
    return (
        e.crossJoin(F.broadcast(chi))
        .select(
            "digit",
            "obs",
            F.round("expected", 6).alias("benford_expected"),
            F.round("chi2", 6).alias("chi2_total"),
        )
        .orderBy("digit")
    )
