"""Round-6 wave 59: compound growth index (running product via
exp-of-cumulative-log), leave-one-out target encoding (leakage-free
categorical features), and one-pass univariate feature screening
(unpivot + grouped moments). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ts_growth_index",
    oracle="""
    WITH mon AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1),
    r AS (
        SELECT m, rev,
               LAG(rev) OVER (ORDER BY m) AS prev
        FROM mon),
    lns AS (
        SELECT m, rev,
               CAST(ROUND(1e9 * LN(rev / CAST(prev AS DOUBLE)))
                    AS BIGINT) AS lnr_u
        FROM r WHERE prev IS NOT NULL),
    cum AS (
        SELECT m, rev,
               SUM(lnr_u) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING)
                   AS cum_u
        FROM lns)
    SELECT m AS month, rev AS revenue_cents,
           ROUND(EXP(cum_u / 1e9), 6) AS growth_index
    FROM cum
    """,
)
def q_ts_growth_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound growth index: monthly revenue rebased to the first
    month as Π(1 + rₜ) — computed as exp of the CUMULATIVE SUM of
    log-ratios (the only distributed-safe form of a running product;
    no multiplicative window exists), with each month's log-ratio
    quantized to nano-units so the cumulative sum is exact and
    order-free. The indexed-growth line every KPI dashboard rebases
    to 1.0.

    Scale: month-grain series after one map-side aggregate; the
    cumulative window runs over the tiny series — the log-space
    rewrite is what makes 'running product' a prefix sum."""
    o = load_table(spark, sf_dir, "orders")
    mon = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    w = Window.orderBy("m")
    lns = mon.select(
        "m",
        "rev",
        F.round(
            1e9
            * F.log(
                F.col("rev") / F.lag("rev").over(w).cast("double")
            )
        )
        .cast("long")
        .alias("lnr_u"),
    ).filter(F.col("lnr_u").isNotNull())
    cum = lns.select(
        "m",
        "rev",
        F.sum("lnr_u")
        .over(Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_u"),
    )
    return cum.select(
        F.col("m").alias("month"),
        F.col("rev").alias("revenue_cents"),
        F.round(F.exp(F.col("cum_u") / 1e9), 6).alias("growth_index"),
    )


@register(
    "q_ml_loo_target_encoding",
    oracle="""
    WITH g AS (
        SELECT c.c_nationkey AS nation,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    stats AS (
        SELECT nation,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s
        FROM g GROUP BY nation),
    loo AS (
        SELECT g.nation,
               CAST(ROUND(1e6 * (st.s - g.cents)
                    / CAST(st.n - 1 AS DOUBLE)) AS BIGINT) AS loo_u,
               CAST(ROUND(1e6 * st.s / CAST(st.n AS DOUBLE)) AS BIGINT)
                   AS full_u
        FROM g JOIN stats st ON st.nation = g.nation
        WHERE st.n > 1)
    SELECT CAST(nation AS BIGINT) AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(loo_u) / 1e6, 6) AS min_loo_cents,
           ROUND(MAX(loo_u) / 1e6, 6) AS max_loo_cents,
           ROUND(SUM(ABS(loo_u - full_u)) / COUNT(*) / 1e6, 6)
               AS mean_abs_leakage_cents
    FROM loo GROUP BY nation
    """,
)
def q_ml_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding: each order's nation feature is
    the nation's mean order value EXCLUDING that order —
    (Σ − x)/(n − 1), the algebraic LOO that prevents a row from
    leaking its own target into its feature (the classic
    target-encoding overfit). Reported per nation as the LOO-value
    range plus the mean |LOO − full-mean| gap — the leakage each row
    would have carried. Encodings quantize to micro-cents;
    group sums are exact integers.

    Scale: ONE group-stats aggregate broadcast back onto the fact
    (the LOO needs no per-row exclusion pass — it's algebra over the
    group sums), then a nation-grain rollup."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    g = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nation"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    stats = g.groupBy("nation").agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    loo = (
        g.join(F.broadcast(stats), "nation")
        .filter(F.col("n") > 1)
        .select(
            "nation",
            F.round(
                1e6
                * (F.col("s") - F.col("cents"))
                / (F.col("n") - 1).cast("double")
            )
            .cast("long")
            .alias("loo_u"),
            F.round(1e6 * F.col("s") / F.col("n").cast("double"))
            .cast("long")
            .alias("full_u"),
        )
    )
    return loo.groupBy(F.col("nation").cast("long").alias("nation")).agg(
        F.count("*").alias("n_rows"),
        F.round(F.min("loo_u") / 1e6, 6).alias("min_loo_cents"),
        F.round(F.max("loo_u") / 1e6, 6).alias("max_loo_cents"),
        F.round(
            F.sum(F.abs(F.col("loo_u") - F.col("full_u")))
            / F.count("*")
            / 1e6,
            6,
        ).alias("mean_abs_leakage_cents"),
    )


@register(
    "q_ml_feature_screen",
    oracle="""
    WITH base AS (
        SELECT CAST(ROUND(1e6 * l_quantity) AS BIGINT) AS f_quantity,
               CAST(ROUND(1e6 * l_discount) AS BIGINT) AS f_discount,
               CAST(ROUND(1e6 * l_tax) AS BIGINT) AS f_tax,
               CAST(ROUND(100 * l_extendedprice) AS BIGINT) AS y
        FROM lineitem),
    long AS (
        SELECT 'quantity' AS feature, f_quantity AS x, y FROM base
        UNION ALL SELECT 'discount', f_discount, y FROM base
        UNION ALL SELECT 'tax', f_tax, y FROM base),
    m AS (
        SELECT feature, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
        FROM long GROUP BY feature)
    SELECT feature, n,
           ROUND((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx)
                    * SQRT(n * syy - sy * sy)), 6) AS corr_with_target
    FROM m
    """,
)
def q_ml_feature_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass univariate feature screening: every candidate numeric
    feature's Pearson correlation with the target (extended price),
    computed by UNPIVOTING features into (feature, x, y) rows and
    running ONE grouped moment aggregate — the scan count stays 1 no
    matter how many features are screened, the shape a 1000-column
    feature store demands. Feature values quantize to micro-units
    (exact for these fixed-precision columns); moments in
    HUGEINT/DECIMAL.

    Scale: the unpivot multiplies rows by the feature count but
    every row is narrow and the aggregate combines map-side —
    features × 6 moments of shuffle, one fact scan."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.round(1e6 * F.col("l_quantity")).cast("decimal(19,0)").alias(
            "f_quantity"
        ),
        F.round(1e6 * F.col("l_discount")).cast("decimal(19,0)").alias(
            "f_discount"
        ),
        F.round(1e6 * F.col("l_tax")).cast("decimal(19,0)").alias("f_tax"),
        F.round(100 * F.col("l_extendedprice"))
        .cast("decimal(19,0)")
        .alias("y"),
    )
    long = None
    for name in ["quantity", "discount", "tax"]:
        part = base.select(
            F.lit(name).alias("feature"),
            F.col(f"f_{name}").alias("x"),
            "y",
        )
        long = part if long is None else long.unionByName(part)
    m = long.groupBy("feature").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    return m.select(
        "feature",
        "n",
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("corr_with_target"),
    )
