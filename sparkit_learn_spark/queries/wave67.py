"""Round-6 wave 67: experimentation-rigor battery — sample-ratio-
mismatch (SRM) audit per exposure segment, delta-method CI for a
ratio-of-sums metric, and Benjamini-Hochberg FDR control across a
metric panel. All exactly DuckDB-oracled (integer moments; normal
quantiles and the logistic normal-CDF approximation inlined as
identical arithmetic in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# two-sided alpha=0.05 critical values inlined as identical literals.
_CHI2_1DF = "3.841459"
_Z975 = "1.959964"
_ARM = "((user_id * 2654435761) % 4294967296) % 2"


@register(
    "q_evt_ab_srm",
    oracle=f"""
    WITH u AS (
        SELECT DISTINCT event_type, user_id,
               {_ARM} AS arm
        FROM events),
    seg AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_treat,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_ctrl
        FROM u GROUP BY event_type)
    SELECT event_type, n_treat, n_ctrl,
           ROUND(CAST((n_treat - n_ctrl) * (n_treat - n_ctrl) AS DOUBLE)
                 / (n_treat + n_ctrl), 6) AS chi2,
           CASE WHEN CAST((n_treat - n_ctrl) * (n_treat - n_ctrl)
                          AS DOUBLE) / (n_treat + n_ctrl) > {_CHI2_1DF}
                THEN 1 ELSE 0 END AS srm_flag
    FROM seg
    ORDER BY event_type
    """,
)
def q_evt_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch audit: for each exposure segment (users
    who emitted each event type), the treated/control user counts
    under the hash assignment and the 1-df chi-square against the
    designed 50/50 split, flagged at the literal 3.841459 critical
    value. SRM is the canonical experiment-validity check — a
    triggered chi-square means the assignment or logging is biased
    and every downstream readout is untrustworthy. The statistic is
    exact integer arithmetic with one final double division, so the
    engines cannot diverge.

    Scale: distinct-(type,user) then a 5-group count — one hash
    aggregate at user grain, map-side combining, no skew (arms are
    hash-balanced by construction)."""
    e = load_table(spark, sf_dir, "events")
    u = e.select(
        "event_type", "user_id", F.expr(_ARM).alias("arm")
    ).distinct()
    seg = u.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_treat"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_ctrl"),
    )
    d = F.col("n_treat") - F.col("n_ctrl")
    chi2 = (d * d).cast("double") / (F.col("n_treat") + F.col("n_ctrl"))
    return seg.select(
        "event_type",
        "n_treat",
        "n_ctrl",
        F.round(chi2, 6).alias("chi2"),
        F.when(chi2 > float(_CHI2_1DF), 1).otherwise(0).alias("srm_flag"),
    ).orderBy("event_type")


@register(
    "q_evt_ab_delta_ci",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, {_ARM} AS arm,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(ROUND(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY user_id),
    m AS (
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
        FROM per_user GROUP BY arm),
    d AS (
        SELECT arm, n, sx / sy AS r,
               (1.0 / (n * (sy / n) * (sy / n)))
               * (((n * sxx - sx * sx) / (CAST(n AS DOUBLE) * (n - 1)))
                  - 2.0 * (sx / sy)
                        * ((n * sxy - sx * sy)
                           / (CAST(n AS DOUBLE) * (n - 1)))
                  + (sx / sy) * (sx / sy)
                        * ((n * syy - sy * sy)
                           / (CAST(n AS DOUBLE) * (n - 1)))) AS var_r
        FROM m),
    wide AS (
        SELECT t.n AS n_treat, c.n AS n_ctrl,
               t.r AS r_treat, c.r AS r_ctrl,
               t.r - c.r AS diff,
               SQRT(t.var_r + c.var_r) AS se
        FROM (SELECT * FROM d WHERE arm = 1) t,
             (SELECT * FROM d WHERE arm = 0) c)
    SELECT n_treat, n_ctrl,
           ROUND(r_treat, 6) AS r_treat,
           ROUND(r_ctrl, 6) AS r_ctrl,
           ROUND(diff, 6) AS diff,
           ROUND(se, 6) AS se,
           ROUND(diff - {_Z975} * se, 6) AS ci_lo,
           ROUND(diff + {_Z975} * se, 6) AS ci_hi
    FROM wide
    """,
)
def q_evt_ab_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method CI for a ratio-of-sums experiment metric —
    purchase cents per view, the canonical 'revenue per session'
    shape whose naive per-user-mean analysis is biased because both
    numerator and denominator are random. Per arm: R = Σx/Σy with
    Var(R) ≈ (σx² − 2R·σxy + R²·σy²) / (n·ȳ²) from EXACT 128-bit
    per-user moment sums (x = purchase cents, y = view count,
    zero-filled for non-converting users); the difference CI uses the
    inlined 1.959964 quantile. One double step at the end.

    Scale: one aggregate at user grain (map-side combining) into a
    2-row moment table — the delta algebra is constant-size; no
    per-user data leaves the shuffle stage."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", cents).otherwise(0))
        .cast("decimal(19,0)")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("decimal(19,0)")
        .alias("y"),
    ).select(F.expr(_ARM).alias("arm"), "x", "y")
    m = per_user.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)"))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n").cast("double")
    r = F.col("sx") / F.col("sy")
    var_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) / (
        n * (F.col("n") - 1)
    )
    var_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")) / (
        n * (F.col("n") - 1)
    )
    cov_xy = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * (F.col("n") - 1)
    )
    ybar = F.col("sy") / n
    var_r = (var_x - 2.0 * r * cov_xy + r * r * var_y) / (n * ybar * ybar)
    d = m.select(
        "arm", "n", r.alias("r"), var_r.alias("var_r")
    )
    t = d.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_treat"),
        F.col("r").alias("r_treat"),
        F.col("var_r").alias("v_treat"),
    )
    c = d.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_ctrl"),
        F.col("r").alias("r_ctrl"),
        F.col("var_r").alias("v_ctrl"),
    )
    diff = F.col("r_treat") - F.col("r_ctrl")
    se = F.sqrt(F.col("v_treat") + F.col("v_ctrl"))
    z = float(_Z975)
    return t.crossJoin(c).select(
        "n_treat",
        "n_ctrl",
        F.round("r_treat", 6).alias("r_treat"),
        F.round("r_ctrl", 6).alias("r_ctrl"),
        F.round(diff, 6).alias("diff"),
        F.round(se, 6).alias("se"),
        F.round(diff - z * se, 6).alias("ci_lo"),
        F.round(diff + z * se, 6).alias("ci_hi"),
    )


@register(
    "q_stat_fdr_bh",
    oracle=f"""
    WITH arms AS (
        SELECT CAST({_ARM} AS BIGINT) AS arm,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1),
    per_ut AS (
        SELECT event_type, user_id, {_ARM} AS arm,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, user_id),
    m AS (
        SELECT p.event_type, p.arm, a.n_users AS n,
               CAST(SUM(p.c) AS DOUBLE) AS s,
               CAST(SUM(CAST(p.c AS HUGEINT) * p.c) AS DOUBLE) AS ss
        FROM per_ut p JOIN arms a ON a.arm = p.arm
        GROUP BY p.event_type, p.arm, a.n_users),
    wide AS (
        SELECT t.event_type,
               t.s / t.n AS mu1, c.s / c.n AS mu0,
               (t.n * t.ss - t.s * t.s)
                   / (CAST(t.n AS DOUBLE) * (t.n - 1)) / t.n AS vn1,
               (c.n * c.ss - c.s * c.s)
                   / (CAST(c.n AS DOUBLE) * (c.n - 1)) / c.n AS vn0
        FROM (SELECT * FROM m WHERE arm = 1) t
        JOIN (SELECT * FROM m WHERE arm = 0) c
          ON c.event_type = t.event_type),
    zt AS (
        SELECT event_type,
               ROUND((mu1 - mu0) / SQRT(vn1 + vn0), 6) AS z
        FROM wide),
    pt AS (
        SELECT event_type, z,
               ROUND(2.0 / (1.0 + EXP(0.07056 * ABS(z) * ABS(z) * ABS(z)
                                      + 1.5976 * ABS(z))), 6) AS p_value
        FROM zt),
    ranked AS (
        SELECT event_type, z, p_value,
               CAST(ROW_NUMBER() OVER (ORDER BY p_value, event_type)
                    AS BIGINT) AS rank,
               CAST(COUNT(*) OVER () AS BIGINT) AS m_tests
        FROM pt),
    crit AS (
        SELECT *,
               rank * 0.05 / m_tests AS bh_threshold,
               MAX(CASE WHEN p_value <= rank * 0.05 / m_tests
                        THEN rank ELSE 0 END) OVER () AS k
        FROM ranked)
    SELECT event_type, z, p_value, rank,
           ROUND(bh_threshold, 6) AS bh_threshold,
           CASE WHEN rank <= k THEN 1 ELSE 0 END AS rejected
    FROM crit
    ORDER BY rank
    """,
)
def q_stat_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control across the experiment's metric
    panel: one Welch z per event type (mean events-per-user, treated
    vs control, zero-inflated denominators counted via the arm's full
    user census), two-sided p via the Bowling logistic normal-CDF
    approximation evaluated on the 6dp-ROUNDED z so both engines
    exponentiate bit-identical inputs, then the BH step-up rule —
    reject every metric ranked at or below the largest rank whose p
    is within rank·q/m (q = 0.05). This is what stops a 20-metric
    dashboard from 'finding' one false winner per experiment.

    Scale: (type,user)-grain count aggregate, then constant-size
    panel algebra; the BH window runs over m metric rows, not data
    rows."""
    e = load_table(spark, sf_dir, "events")
    arms = e.select(F.expr(_ARM).alias("arm"), "user_id").groupBy(
        "arm"
    ).agg(F.count_distinct("user_id").alias("n_users"))
    per_ut = e.groupBy("event_type", "user_id").agg(
        F.count("*").cast("decimal(19,0)").alias("c")
    ).select(
        "event_type", F.expr(_ARM).alias("arm"), "c"
    )
    m = per_ut.join(F.broadcast(arms), "arm").groupBy(
        "event_type", "arm", "n_users"
    ).agg(
        F.sum("c").cast("double").alias("s"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)"))
        .cast("double")
        .alias("ss"),
    )
    n = F.col("n_users").cast("double")
    mu = F.col("s") / n
    vn = (
        (F.col("n_users") * F.col("ss") - F.col("s") * F.col("s"))
        / (n * (F.col("n_users") - 1))
        / n
    )
    side = m.select("event_type", "arm", mu.alias("mu"), vn.alias("vn"))
    t = side.filter(F.col("arm") == 1).select(
        "event_type", F.col("mu").alias("mu1"), F.col("vn").alias("vn1")
    )
    c = side.filter(F.col("arm") == 0).select(
        "event_type", F.col("mu").alias("mu0"), F.col("vn").alias("vn0")
    )
    zt = t.join(c, "event_type").select(
        "event_type",
        F.round(
            (F.col("mu1") - F.col("mu0"))
            / F.sqrt(F.col("vn1") + F.col("vn0")),
            6,
        ).alias("z"),
    )
    az = F.abs(F.col("z"))
    pt = zt.select(
        "event_type",
        "z",
        F.round(
            2.0 / (1.0 + F.exp(0.07056 * az * az * az + 1.5976 * az)), 6
        ).alias("p_value"),
    )
    wr = Window.orderBy("p_value", "event_type")
    wall = Window.partitionBy()
    ranked = pt.select(
        "event_type",
        "z",
        "p_value",
        F.row_number().over(wr).cast("long").alias("rank"),
        F.count("*").over(wall).cast("long").alias("m_tests"),
    )
    thresh = F.col("rank") * 0.05 / F.col("m_tests")
    crit = ranked.select(
        "event_type",
        "z",
        "p_value",
        "rank",
        thresh.alias("bh_threshold"),
        F.max(
            F.when(F.col("p_value") <= thresh, F.col("rank")).otherwise(0)
        )
        .over(wall)
        .alias("k"),
    )
    return crit.select(
        "event_type",
        "z",
        "p_value",
        "rank",
        F.round("bh_threshold", 6).alias("bh_threshold"),
        F.when(F.col("rank") <= F.col("k"), 1).otherwise(0).alias(
            "rejected"
        ),
    ).orderBy("rank")
