"""Round-6 wave 19: model gains/lift table (histogram-grain deciles),
activity-burst detection (value-range sliding windows), and
fingerprint-key clustering (OpenRefine-style sorted-token keys for
entity resolution). All exactly DuckDB-oracled in integer space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ml_lift_table",
    oracle="""
    WITH h AS (
        SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM lineitem GROUP BY 1),
    c AS (
        SELECT v, n, pos,
               SUM(n) OVER (ORDER BY v DESC) - n AS cum_before,
               SUM(n) OVER () AS nt, SUM(pos) OVER () AS post
        FROM h),
    d AS (
        SELECT LEAST(cum_before * 10 // nt, 9) AS decile, n, pos, nt, post
        FROM c)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(pos) AS BIGINT) AS n_returns,
           ROUND(SUM(pos) / CAST(MIN(post) AS DOUBLE), 6) AS capture_rate,
           ROUND((SUM(pos) / CAST(SUM(n) AS DOUBLE))
                 / (CAST(MIN(post) AS DOUBLE) / MIN(nt)), 6) AS lift
    FROM d GROUP BY decile
    """,
)
def q_ml_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table: rank lineitems by extended price (as a
    'return-risk score') into 10 bands and report each band's capture
    rate of actual returns and its lift over the base rate — the
    model-evaluation table behind every targeting decision. Deciles
    assign at HISTOGRAM grain (a price value-group lands in the decile
    where its descending cumulative count starts, integer-arithmetic
    floor) — the scale-correct semantics that needs NO global
    row-number over the fact.

    Scale: fact collapses to a price histogram with map-side combine;
    banding is a window over the bounded price domain; the final
    aggregate is 10 rows. A strict per-row decile would need a global
    sort — this histogram banding is how distributed rankers avoid
    it."""
    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("pos"),
    )
    wc = Window.orderBy(F.col("v").desc())
    wt = Window.partitionBy()
    c = h.select(
        "n",
        "pos",
        (F.sum("n").over(wc) - F.col("n")).alias("cum_before"),
        F.sum("n").over(wt).alias("nt"),
        F.sum("pos").over(wt).alias("post"),
    )
    d = c.select(
        F.least(
            F.floor(F.col("cum_before") * 10 / F.col("nt")), F.lit(9)
        ).alias("decile"),
        "n",
        "pos",
        "nt",
        "post",
    )
    return d.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.sum("n").alias("n_rows"),
        F.sum("pos").alias("n_returns"),
        F.round(
            F.sum("pos") / F.min("post").cast("double"), 6
        ).alias("capture_rate"),
        F.round(
            (F.sum("pos") / F.sum("n").cast("double"))
            / (F.min("post").cast("double") / F.min("nt")),
            6,
        ).alias("lift"),
    )


@register(
    "q_evt_burst_detection",
    oracle="""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS us FROM events),
    w AS (
        SELECT user_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY us
                              RANGE BETWEEN 300000000 PRECEDING
                              AND CURRENT ROW) AS burst
        FROM e),
    m AS (
        SELECT user_id, CAST(MAX(burst) AS BIGINT) AS max_burst_5min,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM w GROUP BY user_id)
    SELECT user_id, max_burst_5min, n_events
    FROM m ORDER BY max_burst_5min DESC, user_id LIMIT 10
    """,
)
def q_evt_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: each user's maximum event count inside any
    trailing 5-minute window, via a VALUE-RANGE frame over exact
    microsecond timestamps (every event's window ends at itself, so
    the per-user max is exactly the densest 5-minute burst). Top-10
    burstiest users, deterministic (count, user) cut.

    Scale: the range frame is keyed by user — bounded partitions, a
    single ordered pass each, no self-join (the naive pairwise
    'events within 5 min' join is quadratic per user); top-10 is
    TakeOrderedAndProject. The streaming twin is a sliding window
    count (q_stream_sliding); this is its retrospective exact form."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = Window.partitionBy("user_id").orderBy(us).rangeBetween(-300000000, 0)
    b = e.select("user_id", F.count("*").over(w).alias("burst"))
    m = b.groupBy("user_id").agg(
        F.max("burst").alias("max_burst_5min"),
        F.count("*").alias("n_events"),
    )
    return m.orderBy(F.col("max_burst_5min").desc(), "user_id").limit(10)


@register(
    "q_llm_fingerprint_key",
    oracle="""
    WITH k AS (
        SELECT doc_id,
               array_to_string(list_sort(list_distinct(
                   string_split(lower(text), ' '))), ' ') AS fkey
        FROM documents),
    g AS (
        SELECT fkey, CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(doc_id) AS canonical_doc
        FROM k GROUP BY fkey HAVING COUNT(*) > 1)
    SELECT canonical_doc, n_docs,
           CAST(LENGTH(fkey) AS BIGINT) AS key_chars
    FROM g
    """,
)
def q_llm_fingerprint_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-key clustering (the OpenRefine 'fingerprint'
    method): normalize each document to its sorted set of lowercased
    tokens and group on that key — catches reordered/duplicated-word
    variants that exact-hash dedup (q_llm_exact_dedup) misses while
    staying a pure equality join, no pairwise similarity. Emits the
    multi-member clusters with their canonical (min-id) doc. ASCII
    tokens sort identically under Spark's and DuckDB's binary
    collation.

    Scale: key construction is row-local array work; the group-by
    shuffles the (bounded) key, not the text — at 100 TB hash the key
    first (sha2) and shuffle digests, exactly as the exact-dedup path
    does. The ER ladder: exact hash → fingerprint key → MinHash →
    embedding cosine, in rising recall and cost."""
    d = load_table(spark, sf_dir, "documents")
    fkey = F.array_join(
        F.array_sort(F.array_distinct(F.split(F.lower(F.col("text")), " "))),
        " ",
    )
    k = d.select("doc_id", fkey.alias("fkey"))
    return (
        k.groupBy("fkey")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_doc"))
        .filter(F.col("n_docs") > 1)
        .select(
            "canonical_doc",
            "n_docs",
            F.length("fkey").cast("long").alias("key_chars"),
        )
    )
