"""Round-6 wave 45: seasonality/trend strength diagnostics (Hyndman
F-measures over the classical decomposition), portable table
checksums for cross-engine reconciliation, and log-log price
elasticity per brand. All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ts_strength",
    oracle="""
    WITH day_rev AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1),
    tr AS (
        SELECT d, rev,
               SUM(rev) OVER (ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS t7,
               COUNT(*) OVER (ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
        FROM day_rev),
    det AS (
        SELECT d, isodow(d) AS dow, rev,
               7 * rev - t7 AS det_u
        FROM tr WHERE n7 = 7),
    seas AS (
        SELECT dow,
               ROUND(SUM(det_u) / (CAST(COUNT(*) AS DOUBLE) * 7.0), 6)
                   AS s_dow
        FROM det GROUP BY dow),
    cells AS (
        SELECT CAST(ROUND(det.det_u / 7.0) AS BIGINT) AS det_c,
               CAST(ROUND(det.det_u / 7.0 - seas.s_dow) AS BIGINT)
                   AS resid_c,
               CAST(ROUND(det.rev - seas.s_dow) AS BIGINT) AS deseas_c
        FROM det JOIN seas USING (dow)),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(det_c AS HUGEINT)) AS DOUBLE) AS sd,
               CAST(SUM(CAST(det_c AS HUGEINT) * det_c) AS DOUBLE) AS sdd,
               CAST(SUM(CAST(resid_c AS HUGEINT)) AS DOUBLE) AS sr,
               CAST(SUM(CAST(resid_c AS HUGEINT) * resid_c) AS DOUBLE)
                   AS srr,
               CAST(SUM(CAST(deseas_c AS HUGEINT)) AS DOUBLE) AS su,
               CAST(SUM(CAST(deseas_c AS HUGEINT) * deseas_c) AS DOUBLE)
                   AS suu
        FROM cells)
    SELECT n AS n_days,
           ROUND(GREATEST(0.0,
                 1 - (n * srr - sr * sr) / (n * sdd - sd * sd)), 6)
               AS seasonal_strength,
           ROUND(GREATEST(0.0,
                 1 - (n * srr - sr * sr) / (n * suu - su * su)), 6)
               AS trend_strength
    FROM m
    """,
)
def q_ts_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality and trend STRENGTH (the Hyndman F-measures):
    1 − Var(residual)/Var(detrended) and 1 − Var(residual)/
    Var(deseasonalized) over the classical weekly decomposition —
    the two numbers that decide whether a forecasting model needs a
    seasonal term, a trend term, or neither (the scalar summary
    q_ts_decompose's per-dow indices don't give). Detrended values
    stay in the exact integer 7·rev−Σ₇ form, the per-dow seasonal
    index rounds to 6dp, and every per-day component quantizes to
    integer cents before HUGEINT/DECIMAL variance sums — order-free
    throughout.

    Scale: day-grain series after one map-side aggregate; two
    windows and two joins over ~2.4k rows, one moment aggregate."""
    o = load_table(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    det = (
        day.select(
            "d",
            "rev",
            F.sum("rev").over(w7).alias("t7"),
            F.count("*").over(w7).alias("n7"),
        )
        .filter(F.col("n7") == 7)
        .select(
            (F.weekday("d") + 1).alias("dow"),
            "rev",
            (7 * F.col("rev") - F.col("t7")).alias("det_u"),
        )
    )
    seas = det.groupBy("dow").agg(
        F.round(
            F.sum("det_u") / (F.count("*").cast("double") * 7.0), 6
        ).alias("s_dow")
    )
    cells = det.join(F.broadcast(seas), "dow").select(
        F.round(F.col("det_u") / 7.0)
        .cast("decimal(19,0)")
        .alias("det_c"),
        F.round(F.col("det_u") / 7.0 - F.col("s_dow"))
        .cast("decimal(19,0)")
        .alias("resid_c"),
        F.round(F.col("rev") - F.col("s_dow"))
        .cast("decimal(19,0)")
        .alias("deseas_c"),
    )
    m = cells.agg(
        F.count("*").alias("n"),
        F.sum("det_c").cast("double").alias("sd"),
        F.sum(F.col("det_c") * F.col("det_c")).cast("double").alias("sdd"),
        F.sum("resid_c").cast("double").alias("sr"),
        F.sum(F.col("resid_c") * F.col("resid_c")).cast("double").alias("srr"),
        F.sum("deseas_c").cast("double").alias("su"),
        F.sum(F.col("deseas_c") * F.col("deseas_c")).cast("double").alias("suu"),
    )
    n = F.col("n").cast("double")
    var_r = n * F.col("srr") - F.col("sr") * F.col("sr")
    var_d = n * F.col("sdd") - F.col("sd") * F.col("sd")
    var_u = n * F.col("suu") - F.col("su") * F.col("su")
    return m.select(
        F.col("n").alias("n_days"),
        F.round(F.greatest(F.lit(0.0), 1 - var_r / var_d), 6).alias(
            "seasonal_strength"
        ),
        F.round(F.greatest(F.lit(0.0), 1 - var_r / var_u), 6).alias(
            "trend_strength"
        ),
    )


@register(
    "q_dq_table_checksum",
    oracle="""
    WITH o AS (
        SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(((o_orderkey
                          + CAST(ROUND(o_totalprice * 100) AS BIGINT) * 31)
                         * 2654435761) % 4294967296) AS BIGINT) AS checksum
        FROM orders),
    l AS (
        SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(((l_orderkey * 8 + l_linenumber
                          + CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 31)
                         * 2654435761) % 4294967296) AS BIGINT)
        FROM lineitem),
    c AS (
        SELECT 'customer', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(((c_custkey
                          + CAST(ROUND(c_acctbal * 100) AS BIGINT) * 31)
                         * 2654435761) % 4294967296) AS BIGINT)
        FROM customer)
    SELECT * FROM o UNION ALL SELECT * FROM l UNION ALL SELECT * FROM c
    """,
)
def q_dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable table checksums: per table, an order-independent
    content fingerprint — each row hashes (key, value-cents) through
    the portable multiplicative hash and the SUM of row hashes is the
    table's checksum — the cross-system reconciliation primitive
    (same data loaded into two engines ⇒ same checksum; one flipped
    cent ⇒ different). Pure integer arithmetic, commutative by
    construction so partitioning/order can't matter.

    Scale: embarrassingly parallel map-side hash + one scalar sum per
    table — the cheapest possible full-table validation; at 100 TB
    run per-partition checksums first and roll up, giving
    which-partition-diverged for free."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")

    def chk(df, name, key, cents_col):
        cents = F.round(F.col(cents_col) * 100).cast("long")
        h = ((key + cents * 31) * F.lit(2654435761)) % F.lit(4294967296)
        return df.agg(
            F.count("*").alias("n_rows"), F.sum(h).alias("checksum")
        ).select(F.lit(name).alias("tbl"), "n_rows", "checksum")

    return (
        chk(o, "orders", F.col("o_orderkey"), "o_totalprice")
        .unionByName(
            chk(
                li,
                "lineitem",
                F.col("l_orderkey") * 8 + F.col("l_linenumber"),
                "l_extendedprice",
            )
        )
        .unionByName(chk(c, "customer", F.col("c_custkey"), "c_acctbal"))
    )


@register(
    "q_fin_price_elasticity",
    oracle="""
    WITH pts AS (
        SELECT p.p_brand AS brand,
               CAST(ROUND(1e9 * LN(l.l_extendedprice / l.l_quantity))
                    AS BIGINT) AS x,
               CAST(ROUND(1e9 * LN(l.l_quantity)) AS BIGINT) AS y
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity > 0 AND l.l_extendedprice > 0),
    m AS (
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
        FROM pts GROUP BY brand)
    SELECT brand, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
               AS elasticity
    FROM m
    """,
)
def q_fin_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity of demand per brand: the slope of
    ln(quantity) on ln(unit price) across line items — the log-log
    OLS whose coefficient IS the elasticity (% quantity change per %
    price change), the pricing-analytics staple. Each row's logs
    quantize to integer nano-units so the per-brand moment sums are
    exact (HUGEINT/DECIMAL — nano-log products overflow doubles),
    and the slope is one closed-form double step per brand.

    Scale: one fact-side join to the part dimension (broadcastable)
    and one map-side-combining aggregate at brand grain carrying
    five moments — the q_stat_ols_by_group shape with row-local
    transcendentals."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    p = load_table(spark, sf_dir, "part")
    pts = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.round(
            1e9 * F.log(F.col("l_extendedprice") / F.col("l_quantity"))
        )
        .cast("decimal(19,0)")
        .alias("x"),
        F.round(1e9 * F.log("l_quantity"))
        .cast("decimal(19,0)")
        .alias("y"),
    )
    m = pts.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    return m.select(
        "brand",
        "n",
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (n * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("elasticity"),
    )
