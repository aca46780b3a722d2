"""Round-8 wave 143: survey-sampling and causal-inference depth —
Neyman optimal allocation (the stratified-sampling design step that
decides HOW MANY rows each stratum contributes before any AQP/sample
query runs) and a difference-in-differences EVENT STUDY (per-period
lead/lag effects around a treatment date — the modern causal-claims
plot, where q_stat_diff_in_diff gives only the pooled 2×2). Both
exactly DuckDB-oracled: stddevs and effect ratios are micro-quantized
from integer sufficient statistics, and the allocation integerizes
with largest-remainder rounding (the q_fin_proration discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: total sample budget to allocate across strata.
BUDGET = 1000

#: quantization scale for per-stratum stddevs — 3dp, deliberately
#: coarser than the usual 1e6 so nh·sdq·BUDGET stays far inside
#: BIGINT even at sf10 stratum sizes (3e6 rows × 8e7 × 1e3 ≈ 2.4e17).
SCALE = 1_000


@register(
    "q_agg_neyman_allocation",
    oracle=f"""
    WITH s AS (
        SELECT o_orderpriority AS stratum,
               CAST(COUNT(*) AS BIGINT) AS nh,
               CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS sx,
               CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)
                        * CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT)
                   AS sxx
        FROM orders GROUP BY 1),
    sd AS (
        SELECT stratum, nh,
               CAST(ROUND(SQRT((CAST(nh AS DOUBLE) * sxx
                                - CAST(sx AS DOUBLE) * sx)
                               / (CAST(nh AS DOUBLE) * (nh - 1)))
                          * {SCALE}) AS BIGINT) AS sdq
        FROM s),
    wgt AS (
        SELECT stratum, nh, sdq, nh * sdq AS w,
               CAST(SUM(nh * sdq) OVER () AS BIGINT) AS wtot
        FROM sd),
    alloc AS (
        SELECT stratum, nh, sdq,
               (w * {BUDGET}) // wtot AS base,
               (w * {BUDGET}) % wtot AS rem
        FROM wgt),
    short AS (
        SELECT CAST({BUDGET} - SUM(base) AS BIGINT) AS missing FROM alloc),
    ranked AS (
        SELECT alloc.*, ROW_NUMBER() OVER (ORDER BY rem DESC, stratum)
                   AS rk
        FROM alloc)
    SELECT stratum, nh AS stratum_rows,
           ROUND(CAST(sdq AS DOUBLE) / {SCALE}, 6) AS stddev,
           CAST(base + CASE WHEN rk <= short.missing THEN 1 ELSE 0 END
                AS BIGINT) AS n_alloc
    FROM ranked CROSS JOIN short
    ORDER BY stratum
    """,
)
def q_agg_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation (1934): split a {BUDGET}-row sample
    budget across the order-priority strata proportionally to
    N_h·S_h — big, high-variance strata get more rows, which
    minimizes the estimator's variance at fixed cost. Stddevs come
    from integer (n, Σx, Σx²) sufficient statistics quantized ×{SCALE}
    (deliberately coarser than the usual 1e6 — see SCALE's note),
    the allocation is integer largest-remainder rounding (allocations
    sum to the budget EXACTLY), so the whole design is hash-exact.

    Scale: one map-side-combinable pass to stratum grain (5 rows);
    the design step costs nothing next to the sample it licenses."""
    o = load_table(spark, sf_dir, "orders")
    x = F.round("o_totalprice").cast("long")
    s = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
    )
    sd = s.select(
        "stratum", "nh",
        F.round(
            F.sqrt(
                (F.col("nh").cast("double") * F.col("sxx")
                 - F.col("sx").cast("double") * F.col("sx"))
                / (F.col("nh").cast("double") * (F.col("nh") - 1))
            ) * SCALE
        ).cast("long").alias("sdq"),
    )
    w = sd.withColumn("w", F.col("nh") * F.col("sdq")).withColumn(
        "wtot", F.sum(F.col("nh") * F.col("sdq")).over(
            Window.partitionBy()))
    alloc = w.select(
        "stratum", "nh", "sdq",
        F.expr(f"(w * {BUDGET}) div wtot").alias("base"),
        ((F.col("w") * BUDGET) % F.col("wtot")).alias("rem"),
    )
    short = alloc.agg((F.lit(BUDGET) - F.sum("base")).alias("missing"))
    ranked = alloc.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("rem").desc(),
                                                 "stratum")))
    return (
        ranked.crossJoin(F.broadcast(short))
        .select(
            "stratum",
            F.col("nh").alias("stratum_rows"),
            F.round(F.col("sdq").cast("double") / SCALE, 6).alias("stddev"),
            (F.col("base")
             + F.when(F.col("rk") <= F.col("missing"), 1).otherwise(0))
            .cast("long").alias("n_alloc"),
        )
        .orderBy("stratum")
    )


#: treatment cohort and date for the event study.
_TREAT_NATIONS = (3, 7, 11)
_EVENT_DATE = "1995-06-01"


@register(
    "q_evt_event_study",
    oracle=f"""
    WITH o AS (
        SELECT o_custkey, o_orderdate,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
    c AS (
        SELECT c_custkey,
               CASE WHEN c_nationkey IN {_TREAT_NATIONS}
                    THEN 1 ELSE 0 END AS treated
        FROM customer),
    j AS (
        SELECT treated,
               CAST(FLOOR(CAST(DATE_DIFF('day', DATE '{_EVENT_DATE}',
                                         CAST(o_orderdate AS DATE))
                               AS DOUBLE) / 91.0)
                    AS BIGINT) AS rel_q,
               cents
        FROM o JOIN c ON c.c_custkey = o.o_custkey),
    g AS (
        SELECT rel_q, treated,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s
        FROM j WHERE rel_q BETWEEN -4 AND 3
        GROUP BY 1, 2),
    wide AS (
        SELECT rel_q,
               MAX(CASE WHEN treated = 1 THEN s END) AS ts,
               MAX(CASE WHEN treated = 1 THEN n END) AS tn,
               MAX(CASE WHEN treated = 0 THEN s END) AS cs,
               MAX(CASE WHEN treated = 0 THEN n END) AS cn
        FROM g GROUP BY rel_q),
    base AS (
        SELECT CAST(ts AS DOUBLE) / tn - CAST(cs AS DOUBLE) / cn AS gap0
        FROM wide WHERE rel_q = -1)
    SELECT rel_q,
           tn AS n_treated, cn AS n_control,
           ROUND((CAST(ts AS DOUBLE) / tn - CAST(cs AS DOUBLE) / cn)
                 / 100, 6) AS raw_gap,
           ROUND((CAST(ts AS DOUBLE) / tn - CAST(cs AS DOUBLE) / cn
                  - base.gap0) / 100, 6) AS effect_vs_pre
    FROM wide CROSS JOIN base
    ORDER BY rel_q
    """,
)
def q_evt_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences EVENT STUDY: per relative quarter
    around {_EVENT_DATE}, the treated-vs-control gap in mean order
    value (treated = nations {_TREAT_NATIONS}), normalized to the
    quarter-(−1) gap — the leads/lags plot behind every modern causal
    claim: flat pre-period coefficients ARE the parallel-trends
    check that q_stat_diff_in_diff's pooled 2×2 silently assumes.
    Means are integer-cent ratios, so the only float step is the
    final normalized division — 6dp-rounded, hash-exact.

    Scale: one join + one (quarter × arm) aggregate — 16 cells; the
    baseline row broadcasts."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_nationkey").isin(*_TREAT_NATIONS), 1)
        .otherwise(0).alias("treated"),
    )
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "treated",
        F.floor(
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit(_EVENT_DATE).cast("date")) / 91.0
        ).cast("long").alias("rel_q"),
        "cents",
    )
    g = (
        j.where(F.col("rel_q").between(-4, 3))
        .groupBy("rel_q", "treated")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    )
    wide = g.groupBy("rel_q").agg(
        F.max(F.when(F.col("treated") == 1, F.col("s"))).alias("ts"),
        F.max(F.when(F.col("treated") == 1, F.col("n"))).alias("tn"),
        F.max(F.when(F.col("treated") == 0, F.col("s"))).alias("cs"),
        F.max(F.when(F.col("treated") == 0, F.col("n"))).alias("cn"),
    )
    gap = (F.col("ts").cast("double") / F.col("tn")
           - F.col("cs").cast("double") / F.col("cn"))
    base = wide.where(F.col("rel_q") == -1).select(gap.alias("gap0"))
    return (
        wide.crossJoin(F.broadcast(base))
        .select(
            "rel_q",
            F.col("tn").alias("n_treated"),
            F.col("cn").alias("n_control"),
            F.round(gap / 100, 6).alias("raw_gap"),
            F.round((gap - F.col("gap0")) / 100, 6).alias("effect_vs_pre"),
        )
        .orderBy("rel_q")
    )
