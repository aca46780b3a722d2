"""Round-6 wave 85: empirical-Bayes (James-Stein-style) shrinkage of
per-nation means (the small-area estimator behind sparse-cell
reporting), temperature-scaled corpus sampling weights (the
multilingual mix formula), and the unbiased pass@k estimator (the
LLM-eval combinatorial identity, exact integer falling factorials).
All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_stat_eb_shrinkage",
    oracle="""
    WITH base AS (
        SELECT c.c_nationkey AS nation,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    g AS (
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s
        FROM base GROUP BY nation),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM g),
    wvar AS (
        SELECT SUM(CAST(cents AS DECIMAL(38, 0))
                   * CAST(cents AS DECIMAL(38, 0))) AS s2
        FROM base),
    parts AS (
        SELECT g.nation, g.n, g.s, t.nt, t.st, t.k,
               CAST(g.s AS DOUBLE) / g.n AS raw,
               CAST(t.st AS DOUBLE) / t.nt AS grand,
               (CAST(w.s2 AS DOUBLE)
                - CAST(t.st AS DOUBLE) * t.st / t.nt) / (t.nt - 1)
                   AS var_within
        FROM g CROSS JOIN tot t CROSS JOIN wvar w),
    btab AS (
        SELECT nation, n, raw, grand,
               var_within / n
               / (var_within / n
                  + (SELECT (SUM((p2.raw - p2.grand) * (p2.raw - p2.grand))
                             / (MAX(p2.k) - 1))
                     FROM parts p2)) AS b
        FROM parts)
    SELECT nation, n AS n_orders,
           ROUND(raw / 100.0, 6) AS raw_mean,
           ROUND(b + 0.0, 6) AS shrink_factor,
           ROUND((b * grand + (1.0 - b) * raw) / 100.0 + 0.0, 6)
               AS shrunk_mean
    FROM btab
    ORDER BY nation
    """,
)
def q_stat_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-nation mean order value: each
    nation's raw mean pulls toward the grand mean by
    B = (σ²/n) / (σ²/n + τ²), with the between-nation variance τ²
    estimated method-of-moments from the raw means themselves — the
    small-area / sparse-cell estimator that keeps a 12-order nation
    from reporting a wild mean (the model-based cousin of the
    ≥50-row backoff join). Moments are exact integers; the
    between-variance is a 25-term sum of identical doubles.

    Scale: one fact pass to nation grain plus one global moments
    aggregate — everything after operates on ≤25 rows; the same
    shrinkage applies per-cell at any fan-out.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    dec = "decimal(38,0)"
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nation"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base = base.persist()
    g = base.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    tot = g.agg(
        F.sum("n").alias("nt"),
        F.sum("s").alias("st"),
        F.count(F.lit(1)).alias("k"),
    )
    wvar = base.agg(
        F.sum(F.col("cents").cast(dec) * F.col("cents").cast(dec)).alias("s2")
    )
    parts = (
        g.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(wvar))
        .select(
            "nation",
            "n",
            "k",
            (F.col("s").cast("double") / F.col("n")).alias("raw"),
            (F.col("st").cast("double") / F.col("nt")).alias("grand"),
            (
                (
                    F.col("s2").cast("double")
                    - F.col("st").cast("double") * F.col("st") / F.col("nt")
                )
                / (F.col("nt") - 1)
            ).alias("var_within"),
        )
    )
    parts = parts.persist()
    tau2 = parts.agg(
        (
            F.sum(
                (F.col("raw") - F.col("grand"))
                * (F.col("raw") - F.col("grand"))
            )
            / (F.max("k") - 1)
        ).alias("tau2")
    )
    btab = parts.crossJoin(F.broadcast(tau2)).select(
        "nation",
        "n",
        "raw",
        "grand",
        (
            F.col("var_within")
            / F.col("n")
            / (F.col("var_within") / F.col("n") + F.col("tau2"))
        ).alias("b"),
    )
    return btab.select(
        "nation",
        F.col("n").alias("n_orders"),
        F.round(F.col("raw") / 100.0, 6).alias("raw_mean"),
        F.round(F.col("b"), 6).alias("shrink_factor"),
        F.round(
            (F.col("b") * F.col("grand") + (1.0 - F.col("b")) * F.col("raw"))
            / 100.0,
            6,
        ).alias("shrunk_mean"),
    ).orderBy("nation")


@register(
    "q_llm_mix_temperature",
    oracle="""
    WITH g AS (
        SELECT source,
               CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM documents GROUP BY source),
    t AS (SELECT CAST(SUM(chars) AS BIGINT) AS tc FROM g),
    w AS (
        SELECT g.source, g.chars,
               CAST(g.chars AS DOUBLE) / t.tc AS p,
               POWER(CAST(g.chars AS DOUBLE) / t.tc, 1.0 / 1.43) AS pw
        FROM g CROSS JOIN t),
    z AS (SELECT SUM(pw) AS zz, CAST(COUNT(*) AS BIGINT) AS k FROM w)
    SELECT w.source, w.chars,
           ROUND(w.p, 6) AS natural_share,
           ROUND(w.pw / z.zz, 6) AS temp_share,
           ROUND(w.pw / z.zz / w.p + 0.0, 6) AS upsample_factor
    FROM w CROSS JOIN z
    ORDER BY w.source
    """,
)
def q_llm_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus sampling weights (T = 1.43, i.e.
    exponent α = 1/T ≈ 0.7 — the multilingual-mix convention): each
    source's natural character share p_i is flattened to
    p_i^α / Σ p_j^α, and the upsample factor says how much a
    low-resource source gets boosted — the mixing rule behind
    balanced multilingual / multi-domain pretraining corpora. The
    POWER terms divide a Σ over 4 source rows (identical doubles in
    both engines at dimension grain).

    Scale: one hash aggregate to source grain; the temperature math
    is constant-size. Feeding the weights into the registered
    hash-resample operator completes the pipeline.
    """
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(F.sum("n_chars").alias("chars"))
    t = g.agg(F.sum("chars").alias("tc"))
    w = g.crossJoin(F.broadcast(t)).select(
        "source",
        "chars",
        (F.col("chars").cast("double") / F.col("tc")).alias("p"),
        F.pow(
            F.col("chars").cast("double") / F.col("tc"), 1.0 / 1.43
        ).alias("pw"),
    )
    z = w.agg(F.sum("pw").alias("zz"))
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "source",
            "chars",
            F.round(F.col("p"), 6).alias("natural_share"),
            F.round(F.col("pw") / F.col("zz"), 6).alias("temp_share"),
            F.round(F.col("pw") / F.col("zz") / F.col("p"), 6).alias(
                "upsample_factor"
            ),
        )
        .orderBy("source")
    )


def _passk(k: int) -> str:
    """1 - C(n-c,k)/C(n,k) as exact falling-factorial integer ratio."""
    num = " * ".join(f"(n - c - {i})" for i in range(k))
    den = " * ".join(f"(n - {i})" for i in range(k))
    return f"1.0 - CAST({num} AS DOUBLE) / ({den})"


@register(
    "q_llm_pass_at_k",
    oracle=f"""
    WITH per_task AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                             END) AS BIGINT) AS c
        FROM events GROUP BY user_id
        HAVING COUNT(*) >= 8),
    est AS (
        SELECT CAST(ROUND(({_passk(1)}) * 1000000) AS BIGINT) AS p1,
               CAST(ROUND(({_passk(2)}) * 1000000) AS BIGINT) AS p2,
               CAST(ROUND(({_passk(4)}) * 1000000) AS BIGINT) AS p4,
               CAST(ROUND(({_passk(8)}) * 1000000) AS BIGINT) AS p8
        FROM per_task),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_tasks,
               CAST(SUM(p1) AS BIGINT) AS s1,
               CAST(SUM(p2) AS BIGINT) AS s2,
               CAST(SUM(p4) AS BIGINT) AS s4,
               CAST(SUM(p8) AS BIGINT) AS s8
        FROM est)
    SELECT n_tasks,
           ROUND(CAST(s1 AS DOUBLE) / n_tasks / 1000000.0, 6) AS pass_at_1,
           ROUND(CAST(s2 AS DOUBLE) / n_tasks / 1000000.0, 6) AS pass_at_2,
           ROUND(CAST(s4 AS DOUBLE) / n_tasks / 1000000.0, 6) AS pass_at_4,
           ROUND(CAST(s8 AS DOUBLE) / n_tasks / 1000000.0, 6) AS pass_at_8
    FROM agg
    """,
)
def q_llm_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k estimator: per task (user as the stand-in)
    with n attempts and c successes, pass@k = 1 − C(n−c,k)/C(n,k),
    computed as the EXACT integer falling-factorial ratio
    Π(n−c−i)/Π(n−i) — the combinatorial identity from the Codex
    paper that LLM eval harnesses use instead of naive empirical
    rates (which are biased when n > k). Per-task estimates are
    micro-quantized before averaging, so the corpus-level pass@k is
    an exact integer sum divided once.

    Scale: one hash aggregate to task grain, row-local combinatorics
    (no factorials — the falling products never exceed n⁸), one
    constant-size rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    per_task = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("c"),
        )
        .filter(F.col("n") >= 8)
    )
    est = per_task.select(
        *[
            F.round(F.expr(_passk(k)) * 1000000)
            .cast("long")
            .alias(f"p{k}")
            for k in (1, 2, 4, 8)
        ]
    )
    agg = est.agg(
        F.count(F.lit(1)).alias("n_tasks"),
        *[F.sum(f"p{k}").alias(f"s{k}") for k in (1, 2, 4, 8)],
    )
    return agg.select(
        "n_tasks",
        *[
            F.round(
                F.col(f"s{k}").cast("double") / F.col("n_tasks") / 1000000.0,
                6,
            ).alias(f"pass_at_{k}")
            for k in (1, 2, 4, 8)
        ],
    )
