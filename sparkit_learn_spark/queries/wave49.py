"""Round-6 wave 49: dominant-period detection (ACF argmax over a lag
sweep), power-law exponent fit (continuous MLE on user activity), and
Heaps-law vocabulary growth via the first-seen rewrite. All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ts_autoperiod",
    oracle="""
    WITH day AS (
        SELECT o_orderdate AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1),
    s AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, rev FROM day),
    lags AS (SELECT CAST(u.g AS BIGINT) AS lag
             FROM unnest(range(2, 31)) AS u(g)),
    m AS (
        SELECT l.lag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(a.rev AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(SUM(CAST(b.rev AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(SUM(CAST(a.rev AS HUGEINT) * b.rev) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(a.rev AS HUGEINT) * a.rev) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(b.rev AS HUGEINT) * b.rev) AS DOUBLE) AS syy
        FROM lags l
        JOIN s a ON TRUE
        JOIN s b ON b.i = a.i + l.lag
        GROUP BY l.lag),
    r AS (
        SELECT lag,
               ROUND((n * sxy - sx * sy)
                     / (SQRT(n * sxx - sx * sx)
                        * SQRT(n * syy - sy * sy)), 6) AS rho
        FROM m),
    best AS (
        SELECT lag, rho,
               ROW_NUMBER() OVER (ORDER BY rho DESC, lag) AS rn
        FROM r)
    SELECT lag AS dominant_period_days, rho AS acf_peak
    FROM best WHERE rn = 1
    """,
)
def q_ts_autoperiod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-period detection: the autocorrelation of the daily-
    revenue series swept over lags 2–30 and the argmax reported —
    the automated 'is this series weekly? monthly?' answer that
    seeds every seasonal model (q_ts_decompose assumes period 7;
    this measures it). Each lag correlation from exact HUGEINT/
    DECIMAL moments, rounded before the deterministic argmax
    (lag tie-break).

    Scale: the series reduces to day grain once; the lag sweep is
    one join of the lag spine against the self-shifted series —
    29 independent aggregates over a calendar-bounded input,
    constant cost in data volume."""
    o = load_table(spark, sf_dir, "orders")
    day = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    s = day.select(
        F.row_number().over(Window.orderBy("d")).alias("i"),
        F.col("rev").cast("decimal(19,0)").alias("rev"),
    )
    lags = spark.range(2, 31).select(F.col("id").alias("lag"))
    a = s.select(F.col("i").alias("ia"), F.col("rev").alias("ra"))
    b = s.select(F.col("i").alias("ib"), F.col("rev").alias("rb"))
    m = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("ib") == F.col("ia") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count("*").alias("n"),
            F.sum("ra").cast("double").alias("sx"),
            F.sum("rb").cast("double").alias("sy"),
            F.sum(F.col("ra") * F.col("rb")).cast("double").alias("sxy"),
            F.sum(F.col("ra") * F.col("ra")).cast("double").alias("sxx"),
            F.sum(F.col("rb") * F.col("rb")).cast("double").alias("syy"),
        )
    )
    n = F.col("n").cast("double")
    r = m.select(
        "lag",
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("rho"),
    )
    w = Window.orderBy(F.col("rho").desc(), "lag")
    return (
        r.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            F.col("lag").alias("dominant_period_days"),
            F.col("rho").alias("acf_peak"),
        )
    )


@register(
    "q_evt_power_law_fit",
    oracle="""
    WITH act AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
        FROM events GROUP BY user_id),
    xmin AS (SELECT 5 AS xm),
    tail AS (
        SELECT CAST(ROUND(1e9 * LN(k / CAST(x.xm AS DOUBLE)))
                    AS BIGINT) AS ln_u
        FROM act CROSS JOIN xmin x WHERE k >= x.xm)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
           ROUND(1 + COUNT(*) / (SUM(ln_u) / 1e9), 6) AS alpha
    FROM tail
    """,
)
def q_evt_power_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law exponent fit: the continuous MLE
    α = 1 + n / Σ ln(k/xmin) over per-user activity counts at a fixed
    tail cutoff xmin = 5 — the Clauset-style estimate of how
    heavy-tailed user behavior is, which predicts hot-key skew (the
    α that decides whether the busiest user breaks a naive
    partition-by-user shuffle). Per-row logs quantize to integer
    nano-units so the tail sum is exact and order-free.

    Scale: one activity aggregate (map-side combining per user) and
    one scalar tail aggregate — COUNT(*)-shaped end to end."""
    e = load_table(spark, sf_dir, "events")
    act = e.groupBy("user_id").agg(F.count("*").alias("k"))
    tail = act.filter(F.col("k") >= 5).select(
        F.round(1e9 * F.log(F.col("k") / 5.0)).cast("long").alias("ln_u")
    )
    return tail.agg(
        F.count("*").alias("n_tail"),
        F.round(
            1 + F.count("*") / (F.sum("ln_u") / 1e9), 6
        ).alias("alpha"),
    )


@register(
    "q_llm_vocab_growth",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    first_seen AS (
        SELECT u.tok AS term, MIN(doc_id) AS d0
        FROM t, unnest(toks) AS u(tok)
        GROUP BY u.tok),
    checkpoints AS (
        SELECT CAST(u.g AS BIGINT) AS cp
        FROM unnest([50, 100, 200, 500, 1000, 2000, 5000, 10000,
                     20000, 50000]) AS u(g)),
    n AS (SELECT MAX(doc_id) AS max_id FROM t)
    SELECT c.cp AS n_docs_prefix,
           CAST(SUM(CASE WHEN f.d0 < c.cp THEN 1 ELSE 0 END) AS BIGINT)
               AS vocab_size
    FROM checkpoints c
    CROSS JOIN n
    JOIN first_seen f ON TRUE
    WHERE c.cp <= n.max_id + 1
    GROUP BY c.cp
    """,
)
def q_llm_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth: distinct vocabulary size over the
    first k documents, at geometric checkpoints — the curve whose
    flattening says when a corpus stops teaching a tokenizer new
    types (and whose exponent sizes the vocab a BPE trainer should
    target). Computed WITHOUT k separate distinct-counts: each term
    contributes one first-seen doc id, and every checkpoint is a
    conditional count over that term-grain table — the cumulative-
    distinct rewrite (q_evt_cumulative_users) applied to vocabulary.

    Scale: one (term → min doc) aggregate over the exploded stream,
    then a 10-row checkpoint spine against term grain — corpus
    scanned once regardless of checkpoint count."""
    d = load_table(spark, sf_dir, "documents")
    first_seen = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("d0"))
    )
    n = d.agg(F.max("doc_id").alias("max_id"))
    cps = spark.createDataFrame(
        [(c,) for c in [50, 100, 200, 500, 1000, 2000, 5000, 10000,
                        20000, 50000]],
        "cp long",
    )
    return (
        first_seen.crossJoin(F.broadcast(cps))
        .crossJoin(F.broadcast(n))
        .filter(F.col("cp") <= F.col("max_id") + 1)
        .groupBy(F.col("cp").alias("n_docs_prefix"))
        .agg(
            F.sum(
                F.when(F.col("d0") < F.col("cp"), 1).otherwise(0)
            ).alias("vocab_size")
        )
    )
