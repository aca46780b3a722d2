"""Round-6 wave 10: market-basket association rules (support /
confidence / lift over within-order brand pairs) and sequence-pattern
matching over per-user event journeys (MATCH_RECOGNIZE-style regex on
an order-deterministic event string). Both exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ml_basket_rules",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n AS (SELECT CAST(COUNT(DISTINCT okey) AS DOUBLE) AS n_orders FROM ob),
    item AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS supp FROM ob GROUP BY brand),
    pair AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b,
               CAST(COUNT(*) AS BIGINT) AS supp_ab
        FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
        GROUP BY 1, 2)
    SELECT brand_a, brand_b, supp_ab,
           ROUND(supp_ab / CAST(ia.supp AS DOUBLE), 6) AS confidence,
           ROUND(supp_ab * n.n_orders
                 / (CAST(ia.supp AS DOUBLE) * ib.supp), 6) AS lift
    FROM pair
    JOIN item ia ON ia.brand = pair.brand_a
    JOIN item ib ON ib.brand = pair.brand_b
    CROSS JOIN n
    ORDER BY ROUND(supp_ab * n.n_orders
                   / (CAST(ia.supp AS DOUBLE) * ib.supp), 6) DESC,
             brand_a, brand_b
    LIMIT 15
    """,
)
def q_ml_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining on within-order brand co-occurrence:
    support(a,b) from a per-order distinct-brand self-join, confidence
    = supp(ab)/supp(a), lift = supp(ab)*N/(supp(a)*supp(b)); top-15
    rules by lift, ties broken on the brand pair so the cut is
    engine-deterministic (ordering key is ROUND(lift, 6), matching the
    emitted column exactly).

    Scale: brands per order are bounded (~items/order), so the
    self-join on okey explodes each order into at most C(k,2) pairs —
    linear in the fact, never all-pairs across orders. The brand
    dimension joins broadcast; item supports are 25 rows. The TPC-H
    `part` table is SF-scaled, so at true 100 TB the partkey->brand
    join becomes a shuffle join on l_partkey — still one fact pass."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # ob fans out four ways (the n_orders count, item supports, and
    # both sides of the pair self-join); persist so the join+distinct
    # runs once instead of once per consumer (before-plan: 30
    # exchanges, 2 redundant SortMergeJoins).
    ob = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
        .persist()
    )
    n_orders = float(ob.select("okey").distinct().count())
    item = ob.groupBy("brand").agg(F.count("*").alias("supp"))
    a, b = ob.alias("a"), ob.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count("*").alias("supp_ab"))
    )
    ia = item.select(F.col("brand").alias("brand_a"), F.col("supp").alias("supp_a"))
    ib = item.select(F.col("brand").alias("brand_b"), F.col("supp").alias("supp_b"))
    lift = F.round(
        F.col("supp_ab")
        * F.lit(n_orders)
        / (F.col("supp_a").cast("double") * F.col("supp_b")),
        6,
    )
    return (
        pair.join(F.broadcast(ia), "brand_a")
        .join(F.broadcast(ib), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "supp_ab",
            F.round(F.col("supp_ab") / F.col("supp_a").cast("double"), 6).alias(
                "confidence"
            ),
            lift.alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(15)
    )


@register(
    "q_evt_seq_pattern",
    oracle="""
    WITH j AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS journey
        FROM events GROUP BY user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN regexp_matches(journey, 's.*p')
                         THEN 1 ELSE 0 END) AS BIGINT) AS signup_then_buy,
           CAST(SUM(CASE WHEN regexp_matches(journey, 'v.*p')
                         THEN 1 ELSE 0 END) AS BIGINT) AS view_then_buy,
           CAST(SUM(CASE WHEN regexp_matches(journey, '^[^e]*$')
                         AND regexp_matches(journey, 'p')
                         THEN 1 ELSE 0 END) AS BIGINT) AS errorfree_buyers,
           ROUND(AVG(LENGTH(journey)), 6) AS avg_journey_len
    FROM j
    """,
)
def q_evt_seq_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence matching: each user's journey
    becomes a compact event string (first letter of each event type,
    ordered by (ts, event_id) — the event_id tie-break makes the
    string deterministic under equal timestamps), then regexes count
    funnel patterns: signup-before-purchase, view-before-purchase, and
    error-free buyers.

    Scale: one hash agg to per-user journey strings (bounded by
    events/user), then row-local regex — no window, no self-join; the
    canonical distributed way to run sequence patterns that SQL window
    funnels (q_evt_funnel) can't express."""
    e = load_table(spark, sf_dir, "events")
    j = e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"),
                            F.col("event_id"),
                            F.substring("event_type", 1, 1).alias("c"),
                        )
                    )
                ),
                lambda s: s["c"],
            ),
            "",
        ).alias("journey")
    )
    return j.agg(
        F.count("*").alias("n_users"),
        F.sum(F.col("journey").rlike("s.*p").cast("long")).alias("signup_then_buy"),
        F.sum(F.col("journey").rlike("v.*p").cast("long")).alias("view_then_buy"),
        F.sum(
            (F.col("journey").rlike("^[^e]*$") & F.col("journey").rlike("p"))
            .cast("long")
        ).alias("errorfree_buyers"),
        F.round(F.avg(F.length("journey")), 6).alias("avg_journey_len"),
    )
