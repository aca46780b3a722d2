"""Round-6 wave 39: new-vs-returning revenue decomposition (the
acquisition/retention split), bitmask behavior rollup (bit_or
aggregation over event-type flags), and a dedup provenance audit
(which sources win/lose canonicals). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_fin_new_vs_returning",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderdate,
               date_trunc('month', o_orderdate) AS m,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               MIN(o_orderdate) OVER (PARTITION BY o_custkey)
                   AS first_date
        FROM orders),
    tagged AS (
        SELECT m,
               CASE WHEN date_trunc('month', first_date) = m
                    THEN 'new' ELSE 'returning' END AS segment,
               cents
        FROM o)
    SELECT m AS month, segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM tagged GROUP BY m, segment
    """,
)
def q_fin_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning revenue decomposition: each month's orders and
    revenue split by whether the customer's FIRST-EVER order falls in
    that month — the acquisition/retention lens every growth dashboard
    leads with (a flat topline can hide collapsing acquisition).
    First-order month via one per-customer window; exact cents.

    Scale: the first-seen date is a per-customer MIN window (keyed
    shuffle at customer grain, no self-join back to the fact — the
    window carries it), then one map-side-combining aggregate at
    (month, segment) grain."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    tagged = o.select(
        F.date_trunc("month", "o_orderdate").alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.min("o_orderdate").over(w).alias("first_date"),
    ).select(
        "m",
        F.when(
            F.date_trunc("month", "first_date") == F.col("m"), "new"
        )
        .otherwise("returning")
        .alias("segment"),
        "cents",
    )
    return tagged.groupBy(F.col("m").alias("month"), "segment").agg(
        F.count("*").alias("n_orders"),
        F.sum("cents").alias("revenue_cents"),
    )


@register(
    "q_agg_bitmask_rollup",
    oracle="""
    WITH flags AS (
        SELECT user_id,
               bit_or(CASE event_type
                      WHEN 'view' THEN 1 WHEN 'click' THEN 2
                      WHEN 'signup' THEN 4 WHEN 'purchase' THEN 8
                      WHEN 'error' THEN 16 ELSE 0 END) AS mask
        FROM events GROUP BY user_id)
    SELECT CAST(mask AS BIGINT) AS behavior_mask,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CASE WHEN (mask & 8) > 0 THEN 1 ELSE 0 END AS has_purchase,
           CASE WHEN (mask & 16) > 0 THEN 1 ELSE 0 END AS has_error
    FROM flags GROUP BY mask
    """,
)
def q_agg_bitmask_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmask behavior rollup: each event type maps to one bit, a
    BIT_OR aggregate folds every user's history into a single
    behavior mask, and mask-grain counts enumerate the observed
    behavior combinations (with purchase/error bits decoded) — the
    bitmap encoding that turns 'users who did X and Y but never Z'
    into integer mask tests instead of N self-joins. Pure integer
    bit algebra, identical in both engines.

    Scale: BIT_OR combines map-side like any sum, users shuffle
    once, and the final rollup runs at mask grain (≤2^5 rows here) —
    the segmentation query cost of ONE aggregate regardless of how
    many behavior predicates downstream filters need."""
    e = load_table(spark, sf_dir, "events")
    bit = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "purchase", 8)
        .when(F.col("event_type") == "error", 16)
        .otherwise(0)
    )
    flags = e.select("user_id", bit.alias("b")).groupBy("user_id").agg(
        F.expr("bit_or(b)").alias("mask")
    )
    return flags.groupBy(F.col("mask").cast("long").alias("behavior_mask")).agg(
        F.count("*").alias("n_users"),
    ).select(
        "behavior_mask",
        "n_users",
        F.when(F.col("behavior_mask").bitwiseAND(8) > 0, 1)
        .otherwise(0)
        .alias("has_purchase"),
        F.when(F.col("behavior_mask").bitwiseAND(16) > 0, 1)
        .otherwise(0)
        .alias("has_error"),
    )


@register(
    "q_llm_dedup_provenance",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               sha256(lower(trim(text))) AS sha
        FROM documents),
    g AS (
        SELECT sha, MIN(doc_id) AS canonical
        FROM t GROUP BY sha),
    tagged AS (
        SELECT t.source,
               CASE WHEN t.doc_id = g.canonical THEN 1 ELSE 0 END
                   AS is_canonical
        FROM t JOIN g USING (sha))
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_canonical) AS BIGINT) AS n_kept,
           CAST(SUM(1 - is_canonical) AS BIGINT) AS n_lost,
           ROUND(SUM(1 - is_canonical) / CAST(COUNT(*) AS DOUBLE), 6)
               AS loss_rate
    FROM tagged GROUP BY source
    """,
)
def q_llm_dedup_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup provenance audit: after exact dedup (min-id canonical per
    sha256 group), which SOURCES keep their documents and which lose
    them to duplicates hosted elsewhere — the survivor-bias check
    before trusting post-dedup source proportions (a mirror site
    shows near-total loss; an original shows near-zero). Exact
    integers until the final rate.

    Scale: identical profile to exact dedup — one digest-grain
    aggregate plus a fan-back join BY DIGEST (never text); source
    attribution rides along as a row-local column."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "source", F.sha2(F.lower(F.trim("text")), 256).alias("sha")
    )
    g = t.groupBy("sha").agg(F.min("doc_id").alias("canonical"))
    tagged = t.join(g, "sha").select(
        "source",
        F.when(F.col("doc_id") == F.col("canonical"), 1)
        .otherwise(0)
        .alias("is_canonical"),
    )
    return tagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("is_canonical").alias("n_kept"),
        F.sum(1 - F.col("is_canonical")).alias("n_lost"),
        F.round(
            F.sum(1 - F.col("is_canonical")) / F.count("*").cast("double"),
            6,
        ).alias("loss_rate"),
    )
