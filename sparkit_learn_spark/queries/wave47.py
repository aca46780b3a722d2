"""Round-6 wave 47: CUPED variance reduction for experiments
(pre-period covariate adjustment), value-pattern (format-signature)
profiling, and net-dollar-retention revenue cohorts. All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_H = "(({k} * 2654435761) % 4294967296) % 2"


@register(
    "q_evt_ab_cuped",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey AS cust,
               {_H.format(k='o_custkey')} AS arm,
               CAST(SUM(CASE WHEN o_orderdate < DATE '1998-01-01'
                        THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN o_orderdate >= DATE '1998-01-01'
                        THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS y
        FROM orders GROUP BY 1, 2),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy
        FROM per_cust),
    arms AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_arm,
               CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy_arm,
               CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx_arm
        FROM per_cust GROUP BY arm),
    th AS (
        SELECT n, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta,
               (n * syy - sy * sy) AS vy,
               (n * sxx - sx * sx) AS vx,
               (n * sxy - sx * sy) AS cxy
        FROM m)
    SELECT t.n AS n_customers,
           ROUND(t.theta, 6) AS theta,
           ROUND((a1.sy_arm / a1.n_arm - a0.sy_arm / a0.n_arm) / 100.0,
                 6) AS raw_diff_dollars,
           ROUND(((a1.sy_arm / a1.n_arm - t.theta * a1.sx_arm / a1.n_arm)
                  - (a0.sy_arm / a0.n_arm
                     - t.theta * a0.sx_arm / a0.n_arm)) / 100.0, 6)
               AS cuped_diff_dollars,
           ROUND(t.cxy * t.cxy / (t.vx * t.vy), 6) AS var_reduction
    FROM th t
    JOIN arms a1 ON a1.arm = 1
    JOIN arms a0 ON a0.arm = 0
    """,
)
def q_evt_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction: the experiment readout adjusted by
    each customer's PRE-PERIOD revenue covariate — θ = cov(x,y)/var(x)
    estimated on exact 128-bit cent moments, the treatment/control
    difference recomputed on y − θx, and the variance reduction
    (= corr², the fraction of metric noise the pre-period explains) —
    the technique that lets an A/B test reach significance with
    severalfold less traffic. Arms assigned by the portable hash (as
    q_evt_ab_experiment); one double step at the end.

    Scale: one customer-grain aggregate (map-side combining) carrying
    both periods' sums, then constant-size moment algebra — the
    adjusted estimate needs NO second per-row pass because group
    means of y − θx decompose into the moments already collected."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per_cust = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.expr(_H.format(k="o_custkey")).alias("arm"),
    ).agg(
        F.sum(
            F.when(F.col("o_orderdate") < F.lit("1998-01-01"), cents)
            .otherwise(0)
        )
        .cast("decimal(19,0)")
        .alias("x"),
        F.sum(
            F.when(F.col("o_orderdate") >= F.lit("1998-01-01"), cents)
            .otherwise(0)
        )
        .cast("decimal(19,0)")
        .alias("y"),
    )
    m = per_cust.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    arms = per_cust.groupBy("arm").agg(
        F.count("*").alias("n_arm"),
        F.sum("y").cast("double").alias("sy_arm"),
        F.sum("x").cast("double").alias("sx_arm"),
    )
    a1 = arms.filter(F.col("arm") == 1).select(
        F.col("n_arm").alias("n1"),
        F.col("sy_arm").alias("sy1"),
        F.col("sx_arm").alias("sx1"),
    )
    a0 = arms.filter(F.col("arm") == 0).select(
        F.col("n_arm").alias("n0"),
        F.col("sy_arm").alias("sy0"),
        F.col("sx_arm").alias("sx0"),
    )
    n = F.col("n").cast("double")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cxy = n * F.col("sxy") - F.col("sx") * F.col("sy")
    theta = cxy / vx
    j = m.crossJoin(F.broadcast(a1)).crossJoin(F.broadcast(a0))
    raw = F.col("sy1") / F.col("n1") - F.col("sy0") / F.col("n0")
    cuped = (
        F.col("sy1") / F.col("n1") - theta * F.col("sx1") / F.col("n1")
    ) - (F.col("sy0") / F.col("n0") - theta * F.col("sx0") / F.col("n0"))
    return j.select(
        F.col("n").alias("n_customers"),
        F.round(theta, 6).alias("theta"),
        F.round(raw / 100.0, 6).alias("raw_diff_dollars"),
        F.round(cuped / 100.0, 6).alias("cuped_diff_dollars"),
        F.round(cxy * cxy / (vx * vy), 6).alias("var_reduction"),
    )


@register(
    "q_dq_value_patterns",
    oracle="""
    WITH sigs AS (
        SELECT 'customer.c_name' AS col,
               regexp_replace(regexp_replace(regexp_replace(
                   c_name, '[0-9]', '9', 'g'), '[A-Z]', 'A', 'g'),
                   '[a-z]', 'a', 'g') AS sig
        FROM customer
        UNION ALL
        SELECT 'orders.o_orderpriority',
               regexp_replace(regexp_replace(regexp_replace(
                   o_orderpriority, '[0-9]', '9', 'g'), '[A-Z]', 'A', 'g'),
                   '[a-z]', 'a', 'g')
        FROM orders
        UNION ALL
        SELECT 'documents.lang',
               regexp_replace(regexp_replace(regexp_replace(
                   lang, '[0-9]', '9', 'g'), '[A-Z]', 'A', 'g'),
                   '[a-z]', 'a', 'g')
        FROM documents)
    SELECT col, sig, CAST(COUNT(*) AS BIGINT) AS n
    FROM sigs GROUP BY col, sig
    """,
)
def q_dq_value_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-pattern (format-signature) profiling: every value maps to
    its character-class signature (digits→9, upper→A, lower→a) and
    signatures aggregate per column — the profiler view that exposes
    mixed formats, stray whitespace, and malformed identifiers
    without enumerating raw values (one signature per format, not
    per value). Pure string mapping, identical regex semantics in
    both engines.

    Scale: row-local regex rewrite then a signature-grain aggregate —
    signatures are format-cardinality (tiny), so the shuffle carries
    almost nothing; columns are independent scans unioned."""

    def sig(col):
        return F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(col, "[0-9]", "9"), "[A-Z]", "A"
            ),
            "[a-z]",
            "a",
        )

    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer.c_name").alias("col"), sig(F.col("c_name")).alias("sig")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.lit("orders.o_orderpriority").alias("col"),
        sig(F.col("o_orderpriority")).alias("sig"),
    )
    d = load_table(spark, sf_dir, "documents").select(
        F.lit("documents.lang").alias("col"), sig(F.col("lang")).alias("sig")
    )
    return (
        c.unionByName(o)
        .unionByName(d)
        .groupBy("col", "sig")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_fin_ndr_cohorts",
    oracle="""
    WITH o AS (
        SELECT o_custkey,
               date_trunc('month', o_orderdate) AS m,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               MIN(date_trunc('month', o_orderdate)) OVER (
                   PARTITION BY o_custkey) AS cohort
        FROM orders),
    cell AS (
        SELECT cohort,
               CAST((year(m) - year(cohort)) * 12
                    + (month(m) - month(cohort)) AS BIGINT) AS age,
               CAST(SUM(cents) AS BIGINT) AS rev
        FROM o GROUP BY 1, 2),
    base AS (
        SELECT cohort, rev AS rev0 FROM cell WHERE age = 0)
    SELECT c.cohort, c.age, c.rev,
           ROUND(c.rev / CAST(b.rev0 AS DOUBLE), 6) AS ndr
    FROM cell c JOIN base b ON b.cohort = c.cohort
    WHERE c.age <= 6
    """,
)
def q_fin_ndr_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net-dollar-retention cohorts: customers grouped by first-order
    month, and each cohort's REVENUE at age k months expressed as a
    share of its age-0 revenue — the dollar-weighted retention view
    (expansion can push NDR above 1.0) that user-count retention
    (q_evt_retention) structurally cannot show. Exact cents; ages
    0–6 reported.

    Scale: cohort via one per-customer window, then a (cohort, age)
    grain aggregate and a broadcast join of the age-0 baseline —
    the cohort triangle never touches fact grain after the first
    aggregate."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey")
    t = o.select(
        F.date_trunc("month", "o_orderdate").alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.min(F.date_trunc("month", "o_orderdate")).over(w).alias("cohort"),
    )
    cell = t.groupBy(
        "cohort",
        (
            (F.year("m") - F.year("cohort")) * 12
            + (F.month("m") - F.month("cohort"))
        )
        .cast("long")
        .alias("age"),
    ).agg(F.sum("cents").alias("rev"))
    base = cell.filter(F.col("age") == 0).select(
        "cohort", F.col("rev").alias("rev0")
    )
    return (
        cell.join(F.broadcast(base), "cohort")
        .filter(F.col("age") <= 6)
        .select(
            "cohort",
            "age",
            "rev",
            F.round(F.col("rev") / F.col("rev0").cast("double"), 6).alias(
                "ndr"
            ),
        )
    )
