"""Round-6 wave 105: two-way ANOVA with interaction (weighted
cell-means decomposition), Bartlett's variance-homogeneity test
(the parametric sibling of the existing Levene), and variance
inflation factors (the multicollinearity audit companion to ridge /
signal-correlation). All exactly DuckDB-oracled from integer moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_anova2",
    oracle="""
    WITH cell AS (
        SELECT o_orderstatus AS a, o_orderpriority AS b,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS s,
               SUM(CAST(CAST(ROUND(o_totalprice) AS BIGINT)
                        * CAST(ROUND(o_totalprice) AS BIGINT)
                   AS DECIMAL(38, 0))) AS q
        FROM orders GROUP BY 1, 2),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s,
               CAST(SUM(q) AS DECIMAL(38, 0)) AS q,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(COUNT(DISTINCT a) AS BIGINT) AS ka,
               CAST(COUNT(DISTINCT b) AS BIGINT) AS kb
        FROM cell),
    ma AS (SELECT a, CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s
           FROM cell GROUP BY a),
    mb AS (SELECT b, CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s
           FROM cell GROUP BY b),
    ss AS (
        SELECT
          (SELECT CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE) FROM tot) AS ss_total,
          (SELECT SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE)) FROM cell)
            - (SELECT CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE) FROM tot) AS ss_cells,
          (SELECT SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE)) FROM ma)
            - (SELECT CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE) FROM tot) AS ss_a,
          (SELECT SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE)) FROM mb)
            - (SELECT CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE) FROM tot) AS ss_b,
          (SELECT n FROM tot) AS n,
          (SELECT n_cells FROM tot) AS n_cells,
          (SELECT ka FROM tot) AS ka, (SELECT kb FROM tot) AS kb)
    SELECT effect, CAST(df AS BIGINT) AS df,
           ROUND(ss_val / ss_total, 6) AS ss_share,
           ROUND((ss_val / df)
                 / ((ss_total - ss_cells) / (n - n_cells)), 6) AS f_stat
    FROM (
        SELECT 'A:orderstatus' AS effect, ka - 1 AS df, ss_a AS ss_val,
               ss_total, ss_cells, n, n_cells FROM ss
        UNION ALL
        SELECT 'B:orderpriority', kb - 1, ss_b, ss_total, ss_cells, n,
               n_cells FROM ss
        UNION ALL
        SELECT 'AxB:interaction', n_cells - ka - kb + 1,
               ss_cells - ss_a - ss_b, ss_total, ss_cells, n, n_cells
        FROM ss)
    ORDER BY effect
    """,
)
def q_stat_anova2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way ANOVA with interaction: does order value depend on
    status, on priority, and on their INTERACTION (the weighted
    cell-means / Type-I decomposition: SS_AB = SS_cells − SS_A −
    SS_B)? The interaction F is the term one-way ANOVAs
    (q_stat_anova) structurally cannot see — a priority effect that
    exists only for open orders. Every SS derives from exact integer
    cell sums (Σy, Σy² per cell), so the F statistics are
    bit-identical doubles; SS are reported as SHARES of total (the
    η²-style effect size) so the hash never compares raw ~1e15
    doubles whose last-ulp formatting could differ.

    Scale: one pass to (3×5 cell)-grain sufficient statistics; every
    SS is a fold over ≤15 rows (the bounded cell table is the only
    thing the driver touches) — the two-factor design costs the same
    scan as the one-factor one."""
    o = load_table(spark, sf_dir, "orders")
    y = F.round("o_totalprice").cast("long")
    cell = o.groupBy(
        F.col("o_orderstatus").alias("a"), F.col("o_orderpriority").alias("b")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("s"),
        F.sum((y * y).cast("decimal(38,0)")).alias("q"),
    ).persist()
    contrib = lambda df: df.agg(  # noqa: E731
        F.sum(F.col("s").cast("double") * F.col("s").cast("double") / F.col("n").cast("double"))
    ).first()[0]
    tot = cell.agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("q").alias("q"),
        F.count(F.lit(1)).alias("n_cells"),
        F.countDistinct("a").alias("ka"),
        F.countDistinct("b").alias("kb"),
    ).first()
    n, s, q = tot["n"], tot["s"], float(tot["q"])
    n_cells, ka, kb = tot["n_cells"], tot["ka"], tot["kb"]
    cm = float(s) * float(s) / float(n)
    ss_total = q - cm
    ss_cells = contrib(cell) - cm
    ss_a = contrib(cell.groupBy("a").agg(F.sum("n").alias("n"), F.sum("s").alias("s"))) - cm
    ss_b = contrib(cell.groupBy("b").agg(F.sum("n").alias("n"), F.sum("s").alias("s"))) - cm
    ss_ab = ss_cells - ss_a - ss_b
    mse = (ss_total - ss_cells) / (n - n_cells)
    rows = [
        ("A:orderstatus", ka - 1, ss_a),
        ("AxB:interaction", n_cells - ka - kb + 1, ss_ab),
        ("B:orderpriority", kb - 1, ss_b),
    ]
    out = spark.createDataFrame(
        [
            (e, int(df_), round(ss_ / ss_total, 6), round((ss_ / df_) / mse, 6))
            for e, df_, ss_ in rows
        ],
        ["effect", "df", "ss_share", "f_stat"],
    )
    return out.orderBy("effect")


@register(
    "q_stat_bartlett",
    oracle="""
    WITH g AS (
        SELECT l_linestatus AS grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(l_quantity AS BIGINT)) AS s,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                   AS q
        FROM lineitem GROUP BY 1),
    v AS (
        SELECT grp, n,
               (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) AS s2
        FROM g),
    t AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
               SUM((CAST(n AS DOUBLE) - 1) * s2) AS pooled_num,
               SUM((CAST(n AS DOUBLE) - 1) * LN(s2)) AS sum_ln,
               SUM(1.0 / (CAST(n AS DOUBLE) - 1)) AS sum_inv
        FROM v)
    SELECT n AS n_rows, k AS n_groups,
           ROUND((CAST(n - k AS DOUBLE)
                  * LN(pooled_num / CAST(n - k AS DOUBLE)) - sum_ln)
                 / (1 + (sum_inv - 1.0 / CAST(n - k AS DOUBLE))
                        / (3 * (CAST(k AS DOUBLE) - 1))), 6)
               AS bartlett_chi2
    FROM t
    """,
)
def q_stat_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test for variance homogeneity of quantity across
    line statuses — the parametric (and more powerful under
    normality) sibling of the robust Levene test already in the
    battery; running both is the textbook recommendation since they
    disagree exactly when the data is heavy-tailed. Group variances
    derive from exact integer moments; the statistic is one
    closed-form double expression.

    Scale: one map-side-combining pass to k group moments, then a
    k-row fold."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    g = li.groupBy(F.col("l_linestatus").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s"),
        F.sum(x * x).alias("q"),
    )
    nd = F.col("n").cast("double")
    v = g.select(
        "grp",
        "n",
        (
            (nd * F.col("q").cast("double") - F.col("s").cast("double") * F.col("s").cast("double"))
            / (nd * (nd - 1))
        ).alias("s2"),
    )
    t = v.agg(
        F.sum("n").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum((nd - 1) * F.col("s2")).alias("pooled_num"),
        F.sum((nd - 1) * F.log("s2")).alias("sum_ln"),
        F.sum(1.0 / (nd - 1)).alias("sum_inv"),
    )
    nk = (F.col("n") - F.col("k")).cast("double")
    kd = F.col("k").cast("double")
    return t.select(
        F.col("n").alias("n_rows"),
        F.col("k").alias("n_groups"),
        F.round(
            (nk * F.log(F.col("pooled_num") / nk) - F.col("sum_ln"))
            / (1 + (F.col("sum_inv") - 1.0 / nk) / (3 * (kd - 1))),
            6,
        ).alias("bartlett_chi2"),
    )


@register(
    "q_ml_vif",
    oracle="""
    WITH m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
               CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
                   AS s2,
               CAST(SUM(CAST(ROUND(l_tax * 100) AS BIGINT)) AS DOUBLE) AS s3,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s11,
               CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                        * CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
                   AS s22,
               CAST(SUM(CAST(ROUND(l_tax * 100) AS BIGINT)
                        * CAST(ROUND(l_tax * 100) AS BIGINT)) AS DOUBLE)
                   AS s33,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
                   AS s12,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(ROUND(l_tax * 100) AS BIGINT)) AS DOUBLE)
                   AS s13,
               CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                        * CAST(ROUND(l_tax * 100) AS BIGINT)) AS DOUBLE)
                   AS s23
        FROM lineitem),
    c AS (
        SELECT (s12 - s1 * s2 / n) / SQRT((s11 - s1 * s1 / n)
                   * (s22 - s2 * s2 / n)) AS r12,
               (s13 - s1 * s3 / n) / SQRT((s11 - s1 * s1 / n)
                   * (s33 - s3 * s3 / n)) AS r13,
               (s23 - s2 * s3 / n) / SQRT((s22 - s2 * s2 / n)
                   * (s33 - s3 * s3 / n)) AS r23
        FROM m)
    SELECT feature,
           ROUND(1.0 / (1.0 - r2), 6) AS vif
    FROM (
        SELECT 'quantity' AS feature,
               (r12 * r12 + r13 * r13 - 2 * r12 * r13 * r23)
                   / (1 - r23 * r23) AS r2 FROM c
        UNION ALL
        SELECT 'discount_pct',
               (r12 * r12 + r23 * r23 - 2 * r12 * r23 * r13)
                   / (1 - r13 * r13) FROM c
        UNION ALL
        SELECT 'tax_pct',
               (r13 * r13 + r23 * r23 - 2 * r13 * r23 * r12)
                   / (1 - r12 * r12) FROM c)
    ORDER BY feature
    """,
)
def q_ml_vif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance inflation factors for the three lineitem features
    (quantity, discount%, tax%): VIF_i = 1/(1−R²_i) where R²_i
    regresses feature i on the other two — closed over the 3×3
    correlation matrix (R²_1 = (r12² + r13² − 2·r12·r13·r23)/
    (1−r23²)). The multicollinearity audit that tells you WHICH
    feature ridge regression (q_ml_ridge2) is rescuing you from;
    VIF > 10 = the coefficient is uninterpretable. All correlations
    derive from one pass of exact integer moments.

    Scale: nine moments in one map-side-combining aggregate;
    everything after is constant-size algebra — p features cost p²
    moments, never p² passes."""
    li = load_table(spark, sf_dir, "lineitem")
    x1 = F.col("l_quantity").cast("long")
    x2 = F.round(F.col("l_discount") * 100).cast("long")
    x3 = F.round(F.col("l_tax") * 100).cast("long")
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x1).cast("double").alias("s1"),
        F.sum(x2).cast("double").alias("s2"),
        F.sum(x3).cast("double").alias("s3"),
        F.sum(x1 * x1).cast("double").alias("s11"),
        F.sum(x2 * x2).cast("double").alias("s22"),
        F.sum(x3 * x3).cast("double").alias("s33"),
        F.sum(x1 * x2).cast("double").alias("s12"),
        F.sum(x1 * x3).cast("double").alias("s13"),
        F.sum(x2 * x3).cast("double").alias("s23"),
    )
    nd = F.col("n")
    r = lambda sij, si, sj, sii, sjj: (  # noqa: E731
        (F.col(sij) - F.col(si) * F.col(sj) / nd)
        / F.sqrt(
            (F.col(sii) - F.col(si) * F.col(si) / nd)
            * (F.col(sjj) - F.col(sj) * F.col(sj) / nd)
        )
    )
    c = m.select(
        r("s12", "s1", "s2", "s11", "s22").alias("r12"),
        r("s13", "s1", "s3", "s11", "s33").alias("r13"),
        r("s23", "s2", "s3", "s22", "s33").alias("r23"),
    )
    r12, r13, r23 = F.col("r12"), F.col("r13"), F.col("r23")
    rows = c.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("discount_pct").alias("feature"),
                    ((r12 * r12 + r23 * r23 - 2 * r12 * r23 * r13) / (1 - r13 * r13)).alias("r2"),
                ),
                F.struct(
                    F.lit("quantity").alias("feature"),
                    ((r12 * r12 + r13 * r13 - 2 * r12 * r13 * r23) / (1 - r23 * r23)).alias("r2"),
                ),
                F.struct(
                    F.lit("tax_pct").alias("feature"),
                    ((r13 * r13 + r23 * r23 - 2 * r13 * r23 * r12) / (1 - r12 * r12)).alias("r2"),
                ),
            )
        ).alias("x")
    )
    return rows.select(
        F.col("x.feature").alias("feature"),
        F.round(1.0 / (1.0 - F.col("x.r2")), 6).alias("vif"),
    ).orderBy("feature")
