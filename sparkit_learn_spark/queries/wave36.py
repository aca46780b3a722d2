"""Round-6 wave 36: experiment power analysis (required sample size
per segment from exact moments), DAU/MAU-style stickiness via the
first-seen cumulative-distinct rewrite, and per-document keyword
extraction (TF-IDF top-3 with micro-quantized scores). All exactly
DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# two-sided alpha=0.05 and power=0.80 normal quantiles, inlined as
# identical literals in both engines (no erf needed at runtime).
_ZA = "1.959964"
_ZB = "0.841621"


@register(
    "q_stat_power_analysis",
    oracle=f"""
    WITH m AS (
        SELECT c.c_nationkey AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS HUGEINT))
                    AS DOUBLE) AS sy,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS HUGEINT)
                        * CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) AS syy
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1),
    s AS (
        SELECT nation, n_orders,
               sy / n_orders AS mu,
               (n_orders * syy - sy * sy)
                 / (CAST(n_orders AS DOUBLE) * (n_orders - 1)) AS var
        FROM m WHERE n_orders > 1)
    SELECT CAST(nation AS BIGINT) AS nation, n_orders,
           ROUND(mu, 6) AS mean_cents,
           ROUND(SQRT(var), 6) AS sd_cents,
           CAST(CEIL(2.0 * var * ({_ZA} + {_ZB}) * ({_ZA} + {_ZB})
                     / ((0.01 * mu) * (0.01 * mu))) AS BIGINT)
               AS n_required_per_arm
    FROM s
    """,
)
def q_stat_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis per market: the per-arm sample size
    needed to detect a 1% lift in mean order value at alpha = 0.05 /
    power = 0.80 — n = 2·σ²·(z_α/2 + z_β)²/δ² — computed from each
    nation's EXACT revenue moments (128-bit integer sums; one double
    step at the end; the normal quantiles are inlined as identical
    literals in both engines, so no erf evaluation can diverge). The
    pre-experiment sizing every A/B readout (q_evt_ab_experiment)
    should have consulted first: high-variance markets need
    quadratically more traffic.

    Scale: one map-side-combining aggregate at nation grain carrying
    three moments — COUNT(*)-shaped shuffle, groups independent."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("o_totalprice") * 100).cast("decimal(19,0)")
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(F.col("c_nationkey").alias("nation"), cents.alias("y"))
        .groupBy("nation")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("y").cast("double").alias("sy"),
            F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        )
        .filter(F.col("n_orders") > 1)
    )
    n = F.col("n_orders").cast("double")
    mu = F.col("sy") / n
    var = (F.col("n_orders") * F.col("syy") - F.col("sy") * F.col("sy")) / (
        n * (F.col("n_orders") - 1)
    )
    zsum = F.lit(float(_ZA)) + F.lit(float(_ZB))
    return m.select(
        F.col("nation").cast("long").alias("nation"),
        "n_orders",
        F.round(mu, 6).alias("mean_cents"),
        F.round(F.sqrt(var), 6).alias("sd_cents"),
        F.ceil(
            2.0 * var * zsum * zsum / ((0.01 * mu) * (0.01 * mu))
        )
        .cast("long")
        .alias("n_required_per_arm"),
    )


@register(
    "q_evt_dau_stickiness",
    oracle="""
    WITH e AS (
        SELECT date_trunc('day', ts) AS d, user_id FROM events),
    dau AS (
        SELECT d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        FROM e GROUP BY d),
    first_seen AS (
        SELECT user_id, MIN(d) AS d0 FROM e GROUP BY user_id),
    joins AS (
        SELECT d0 AS d, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM first_seen GROUP BY d0),
    cum AS (
        SELECT dau.d, dau.dau,
               SUM(COALESCE(j.new_users, 0)) OVER (
                   ORDER BY dau.d ROWS UNBOUNDED PRECEDING)
                   AS known_users
        FROM dau LEFT JOIN joins j ON j.d = dau.d)
    SELECT d, dau, CAST(known_users AS BIGINT) AS known_users,
           ROUND(dau / CAST(known_users AS DOUBLE), 6) AS stickiness
    FROM cum
    """,
)
def q_evt_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement stickiness: daily active users over the cumulative
    known-user base (the DAU/MAU family with an ever-growing
    denominator) — computed WITHOUT any windowed COUNT(DISTINCT):
    each user contributes one first-seen event, new-user counts
    cumulative-sum at day grain, and DAU is an exact per-day
    distinct. The product-analytics pulse metric.

    Scale: two aggregates (per-day distinct; per-user min) plus a
    day-grain window — the windowed-distinct rewrite that turns an
    O(days × users) sliding distinct into two linear passes; the
    cumulative window runs over the tiny day series."""
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    )
    dau = e.groupBy("d").agg(F.countDistinct("user_id").alias("dau"))
    joins = (
        e.groupBy("user_id")
        .agg(F.min("d").alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("new_users"))
    )
    cum = dau.join(joins, "d", "left").select(
        "d",
        "dau",
        F.sum(F.coalesce("new_users", F.lit(0)))
        .over(Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0))
        .alias("known_users"),
    )
    return cum.select(
        "d",
        "dau",
        F.col("known_users").cast("long").alias("known_users"),
        F.round(
            F.col("dau") / F.col("known_users").cast("double"), 6
        ).alias("stickiness"),
    )


@register(
    "q_llm_keyword_extract",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    tf AS (
        SELECT doc_id, u.tok AS term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM t, unnest(toks) AS u(tok)
        GROUP BY doc_id, u.tok),
    df AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf
        GROUP BY term),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM t),
    scored AS (
        SELECT tf.doc_id, tf.term,
               CAST(ROUND(1e6 * tf.tf
                          * LN(n.n_docs / CAST(df.df AS DOUBLE)))
                    AS BIGINT) AS score_u
        FROM tf JOIN df USING (term) CROSS JOIN n),
    ranked AS (
        SELECT doc_id, term, score_u,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score_u DESC, term) AS rnk
        FROM scored)
    SELECT doc_id, term, score_u, rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def q_llm_keyword_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by TF-IDF
    (raw tf × ln(N/df)), scores quantized to integer micro-units
    before ranking with a term tie-break so the extraction is
    engine-deterministic — the document-level twin of the corpus
    TF-IDF (q_ml_tfidf) and the summarization/tagging primitive.

    Scale: term frequencies aggregate at (doc, term) grain (map-side
    combining over the exploded stream), document frequencies at term
    grain, IDF joins back BY TERM (dictionary-sized, broadcastable),
    and the top-3 window partitions by document — nothing quadratic,
    no global rank."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("toks"))
    tf = (
        t.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = t.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                1e6
                * F.col("tf")
                * F.log(F.col("n_docs") / F.col("df").cast("double"))
            )
            .cast("long")
            .alias("score_u"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score_u").desc(), "term")
    return (
        scored.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )
