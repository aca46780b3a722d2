"""Round-6 wave 61: HLL precision sweep (the sketch-sizing table)
and sequential A/B monitoring with O'Brien–Fleming-style boundaries.
All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# alpha-spending z boundaries for 5 equally-spaced looks
# (O'Brien–Fleming approximation), inlined as identical literals
_OBF = [4.877, 3.357, 2.680, 2.290, 2.031]


def _hll_p_sql(p: int) -> str:
    m = 1 << p
    rem_bits = 32 - p
    rem_mod = 1 << rem_bits
    alpha = "0.7213 / (1 + 1.079 / {m})".format(m=m)
    return f"""
    SELECT {p} AS p, {m} AS m,
           CAST(ROUND({alpha} * {m} * {m}
                / (SUM(POWER(2.0, -rho)) + ({m} - COUNT(*))))
                AS BIGINT) AS estimate
    FROM (
        SELECT bucket,
               MAX(CASE WHEN rem = 0 THEN {rem_bits + 1}
                        ELSE {rem_bits}
                             - length(bin(CAST(rem AS BIGINT))) + 1
                   END) AS rho
        FROM (
            SELECT ((x * 2654435761) % 4294967296) // {rem_mod}
                       AS bucket,
                   ((x * 2654435761) % 4294967296) % {rem_mod} AS rem
            FROM keys)
        GROUP BY bucket)
    """


@register(
    "q_sketch_hll_precision_sweep",
    oracle=f"""
    WITH keys AS (SELECT DISTINCT o_custkey AS x FROM orders),
    ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_d FROM keys),
    sweep AS ({_hll_p_sql(6)} UNION ALL {_hll_p_sql(8)}
              UNION ALL {_hll_p_sql(10)} UNION ALL {_hll_p_sql(12)})
    SELECT CAST(s.p AS BIGINT) AS p, CAST(s.m AS BIGINT) AS registers,
           s.estimate, e.exact_d,
           ROUND((s.estimate - e.exact_d)
                 / CAST(e.exact_d AS DOUBLE), 6) AS rel_error
    FROM sweep s CROSS JOIN ex e
    """,
)
def q_sketch_hll_precision_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL precision sweep: the same key set sketched at p = 6/8/10/12
    (64 → 4096 registers), estimates and relative errors side by side
    — the sizing table that turns 'use HLL' into 'use p=12 for ±1.6%
    at 4 KB', read against the 1.04/√m theoretical error. Same
    portable-hash / binary-length construction as
    q_sketch_hll_portable at every precision; the four sketches are
    independent and exactly reproduced by both engines.

    Scale: four register-grain MAX aggregates over one hashed scan —
    each is mergeable (register MAX) and the sweep is embarrassingly
    parallel; production picks ONE p, this query shows why."""
    o = load_table(spark, sf_dir, "orders")
    keys = o.select(F.col("o_custkey").alias("x")).distinct()
    ex = keys.agg(F.count("*").alias("exact_d"))
    sweeps = []
    for p in [6, 8, 10, 12]:
        m = 1 << p
        rem_bits = 32 - p
        rem_mod = 1 << rem_bits
        h = (F.col("x") * 2654435761) % 4294967296
        hashed = keys.select(
            (h / rem_mod).cast("long").alias("bucket"),
            (h % rem_mod).alias("rem"),
        )
        rho = F.when(F.col("rem") == 0, rem_bits + 1).otherwise(
            rem_bits - F.length(F.expr("bin(rem)")) + 1
        )
        regs = hashed.groupBy("bucket").agg(F.max(rho).alias("rho"))
        alpha = 0.7213 / (1 + 1.079 / m)
        est = regs.agg(
            F.round(
                alpha
                * m
                * m
                / (
                    F.sum(F.pow(F.lit(2.0), -F.col("rho")))
                    + (m - F.count("*"))
                )
            )
            .cast("long")
            .alias("estimate")
        ).select(
            F.lit(p).cast("long").alias("p"),
            F.lit(m).cast("long").alias("registers"),
            "estimate",
        )
        sweeps.append(est)
    sweep = sweeps[0]
    for fr in sweeps[1:]:
        sweep = sweep.unionByName(fr)
    return sweep.crossJoin(F.broadcast(ex)).select(
        "p",
        "registers",
        "estimate",
        "exact_d",
        F.round(
            (F.col("estimate") - F.col("exact_d"))
            / F.col("exact_d").cast("double"),
            6,
        ).alias("rel_error"),
    )


@register(
    "q_evt_ab_sequential",
    oracle=f"""
    WITH b AS (
        SELECT o_orderkey,
               ((o_custkey * 2654435761) % 4294967296) % 2 AS arm,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               NTILE(5) OVER (ORDER BY o_orderdate, o_orderkey)
                   AS look
        FROM orders),
    per_look AS (
        SELECT look, arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) AS s,
               CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE)
                   AS ss
        FROM b GROUP BY look, arm),
    cum AS (
        SELECT look, arm,
               SUM(n) OVER (PARTITION BY arm ORDER BY look) AS cn,
               SUM(s) OVER (PARTITION BY arm ORDER BY look) AS cs,
               SUM(ss) OVER (PARTITION BY arm ORDER BY look) AS css
        FROM per_look),
    wide AS (
        SELECT a.look,
               a.cn AS n1, a.cs AS s1, a.css AS ss1,
               c.cn AS n0, c.cs AS s0, c.css AS ss0
        FROM (SELECT * FROM cum WHERE arm = 1) a
        JOIN (SELECT * FROM cum WHERE arm = 0) c ON c.look = a.look),
    z AS (
        SELECT look,
               (s1 / n1 - s0 / n0)
               / SQRT((css1_var / n1) + (css0_var / n0)) AS zval
        FROM (
            SELECT look, n1, s1, n0, s0,
                   (n1 * ss1 - s1 * s1) / (n1 * (n1 - 1)) AS css1_var,
                   (n0 * ss0 - s0 * s0) / (n0 * (n0 - 1)) AS css0_var
            FROM wide)),
    bounds(look, zbound) AS (VALUES
        (1, {_OBF[0]}), (2, {_OBF[1]}), (3, {_OBF[2]}),
        (4, {_OBF[3]}), (5, {_OBF[4]}))
    SELECT CAST(z.look AS BIGINT) AS look,
           ROUND(z.zval, 6) AS z,
           bo.zbound,
           CASE WHEN ABS(z.zval) > bo.zbound THEN 1 ELSE 0 END
               AS boundary_crossed
    FROM z JOIN bounds bo ON bo.look = z.look
    """,
)
def q_evt_ab_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential A/B monitoring: the experiment metric (hash-assigned
    arms over order value) evaluated at 5 equally-spaced LOOKS with
    O'Brien–Fleming-style alpha-spending boundaries (z literals
    inlined identically in both engines) — early looks demand ~4.9σ,
    the final look ~2.0σ, which is what lets a team peek five times
    without inflating false positives (the naive repeated-z-test
    mistake). Cumulative Welch z per look from exact 128-bit moment
    prefixes; deterministic look banding by (date, key).

    Scale: one (look, arm)-grain moment aggregate, cumulative sums
    over 10 rows, constant-size z algebra — the peeking schedule
    costs one aggregate regardless of look count."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    b = o.select(
        F.expr(
            "((o_custkey * 2654435761) % 4294967296) % 2"
        ).alias("arm"),
        F.round(F.col("o_totalprice") * 100)
        .cast("decimal(19,0)")
        .alias("cents"),
        F.ntile(5)
        .over(Window.orderBy("o_orderdate", "o_orderkey"))
        .alias("look"),
    )
    per_look = b.groupBy("look", "arm").agg(
        F.count("*").alias("n"),
        F.sum("cents").cast("double").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("double").alias("ss"),
    )
    wcum = Window.partitionBy("arm").orderBy("look")
    cum = per_look.select(
        "look",
        "arm",
        F.sum("n").over(wcum).alias("cn"),
        F.sum("s").over(wcum).alias("cs"),
        F.sum("ss").over(wcum).alias("css"),
    )
    a1 = cum.filter(F.col("arm") == 1).select(
        "look",
        F.col("cn").alias("n1"),
        F.col("cs").alias("s1"),
        F.col("css").alias("ss1"),
    )
    a0 = cum.filter(F.col("arm") == 0).select(
        "look",
        F.col("cn").alias("n0"),
        F.col("cs").alias("s0"),
        F.col("css").alias("ss0"),
    )
    wide = a1.join(a0, "look")
    n1, n0 = F.col("n1").cast("double"), F.col("n0").cast("double")
    var1 = (n1 * F.col("ss1") - F.col("s1") * F.col("s1")) / (n1 * (n1 - 1))
    var0 = (n0 * F.col("ss0") - F.col("s0") * F.col("s0")) / (n0 * (n0 - 1))
    zval = (F.col("s1") / n1 - F.col("s0") / n0) / F.sqrt(
        var1 / n1 + var0 / n0
    )
    bounds = spark.createDataFrame(
        [(i + 1, zb) for i, zb in enumerate(_OBF)], "look int, zbound double"
    )
    return (
        wide.select("look", zval.alias("zval"))
        .join(F.broadcast(bounds), "look")
        .select(
            F.col("look").cast("long").alias("look"),
            F.round(F.col("zval"), 6).alias("z"),
            "zbound",
            F.when(F.abs("zval") > F.col("zbound"), 1)
            .otherwise(0)
            .alias("boundary_crossed"),
        )
    )
