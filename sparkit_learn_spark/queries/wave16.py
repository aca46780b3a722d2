"""Round-6 wave 16: decision-stump induction (exact weighted-Gini
split search), change-point detection via prefix-sum SSE
minimization, bot-behavior flagging over per-user event metrics, and
a cross-source duplicate-overlap matrix. All exactly DuckDB-oracled;
scores are doubles derived from exact integer sufficient statistics,
so argmin/argmax cuts cannot flip across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ml_decision_stump",
    oracle="""
    WITH h AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM lineitem GROUP BY 1),
    c AS (
        SELECT q,
               SUM(n) OVER (ORDER BY q) AS nl,
               SUM(pos) OVER (ORDER BY q) AS posl,
               SUM(n) OVER () AS nt,
               SUM(pos) OVER () AS post
        FROM h),
    s AS (
        SELECT q AS threshold, CAST(nl AS BIGINT) AS n_left,
               CAST(nt - nl AS BIGINT) AS n_right,
               (CAST(nl AS DOUBLE)
                - (CAST(posl AS DOUBLE) * posl
                   + CAST(nl - posl AS DOUBLE) * (nl - posl)) / nl
                + CAST(nt - nl AS DOUBLE)
                - (CAST(post - posl AS DOUBLE) * (post - posl)
                   + CAST((nt - nl) - (post - posl) AS DOUBLE)
                     * ((nt - nl) - (post - posl))) / (nt - nl))
               / nt AS gini_raw
        FROM c WHERE nl < nt)
    SELECT threshold, n_left, n_right, ROUND(gini_raw, 6) AS gini
    FROM s ORDER BY gini_raw, threshold LIMIT 1
    """,
)
def q_ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump induction: the single quantity threshold that
    best separates returned lineitems, by minimum weighted Gini
    impurity over every candidate split. Candidate evaluation runs on
    the class histogram's integer cumulative counts, and the impurity
    is the identical closed-form double in both engines — the argmin
    (ties to the smaller threshold) cannot flip.

    Scale: the fact collapses to a 50-bin class histogram with
    map-side combine; split search is a window over the bounded value
    domain — the exact-split pattern every distributed tree learner
    (per feature, per node) reduces to."""
    li = load_table(spark, sf_dir, "lineitem")
    h = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("pos"),
    )
    wc = Window.orderBy("q")
    wt = Window.partitionBy()
    c = h.select(
        "q",
        F.sum("n").over(wc).alias("nl"),
        F.sum("pos").over(wc).alias("posl"),
        F.sum("n").over(wt).alias("nt"),
        F.sum("pos").over(wt).alias("post"),
    )
    nl, posl = F.col("nl"), F.col("posl")
    nt, post = F.col("nt"), F.col("post")
    nr, posr = nt - nl, post - posl
    gini = (
        nl.cast("double")
        - (posl.cast("double") * posl + (nl - posl).cast("double") * (nl - posl))
        / nl
        + nr.cast("double")
        - (posr.cast("double") * posr + (nr - posr).cast("double") * (nr - posr))
        / nr
    ) / nt
    return (
        c.filter(nl < nt)
        .select(
            F.col("q").alias("threshold"),
            nl.cast("long").alias("n_left"),
            nr.cast("long").alias("n_right"),
            gini.alias("gini_raw"),
        )
        .orderBy("gini_raw", "threshold")
        .limit(1)
        .select(
            "threshold",
            "n_left",
            "n_right",
            F.round(F.col("gini_raw"), 6).alias("gini"),
        )
    )


@register(
    "q_ts_changepoint",
    oracle="""
    WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1),
    c AS (
        SELECT day,
               ROW_NUMBER() OVER (ORDER BY day) AS i,
               SUM(rev_c) OVER (ORDER BY day) AS sl,
               SUM(CAST(rev_c AS DECIMAL(19, 0))
                   * CAST(rev_c AS DECIMAL(19, 0)))
                   OVER (ORDER BY day) AS s2l,
               COUNT(*) OVER () AS n,
               SUM(rev_c) OVER () AS st,
               SUM(CAST(rev_c AS DECIMAL(19, 0))
                   * CAST(rev_c AS DECIMAL(19, 0))) OVER () AS s2t
        FROM d),
    s AS (
        SELECT day, i, n,
               (CAST(s2l AS DOUBLE)
                - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / i)
               + (CAST(s2t - s2l AS DOUBLE)
                  - CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
                    / (n - i)) AS sse,
               CAST(sl AS DOUBLE) / i / 100.0 AS mean_before,
               CAST(st - sl AS DOUBLE) / (n - i) / 100.0 AS mean_after
        FROM c WHERE i < n)
    SELECT day AS split_day, ROUND(mean_before, 6) AS mean_before,
           ROUND(mean_after, 6) AS mean_after, ROUND(sse / 1e10, 6) AS sse_e10
    FROM s ORDER BY sse, day LIMIT 1
    """,
)
def q_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point detection (binary segmentation, one split): the day
    that minimizes total within-segment squared error of the daily
    revenue series — computed in O(n) from prefix sums, never by
    re-scanning segments. Revenue is exact cents, squared sums run in
    DECIMAL(38,0), and each candidate's SSE is the identical
    closed-form double in both engines; ties break to the earlier day.

    Scale: the fact collapses map-side to day grain; prefix sums are
    one ordered pass over the ~2.4k-day dimension. Recursing on the
    winning segments (full binary segmentation) repeats this query on
    day ranges — each step stays dimension-sized."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    rev2 = F.col("rev_c").cast("decimal(19,0)") * F.col("rev_c").cast(
        "decimal(19,0)"
    )
    wc = Window.orderBy("day")
    wt = Window.partitionBy()
    c = d.select(
        "day",
        F.row_number().over(wc).alias("i"),
        F.sum("rev_c").over(wc).alias("sl"),
        F.sum(rev2).over(wc).alias("s2l"),
        F.count("*").over(wt).alias("n"),
        F.sum("rev_c").over(wt).alias("st"),
        F.sum(rev2).over(wt).alias("s2t"),
    )
    i, n = F.col("i"), F.col("n")
    sl, st = F.col("sl"), F.col("st")
    sse = (
        F.col("s2l").cast("double") - sl.cast("double") * sl.cast("double") / i
    ) + (
        (F.col("s2t") - F.col("s2l")).cast("double")
        - (st - sl).cast("double") * (st - sl).cast("double") / (n - i)
    )
    return (
        c.filter(i < n)
        .select(
            F.col("day").alias("split_day"),
            (sl.cast("double") / i / 100.0).alias("mb"),
            ((st - sl).cast("double") / (n - i) / 100.0).alias("ma"),
            sse.alias("sse"),
        )
        .orderBy("sse", "split_day")
        .limit(1)
        .select(
            "split_day",
            F.round(F.col("mb"), 6).alias("mean_before"),
            F.round(F.col("ma"), 6).alias("mean_after"),
            F.round(F.col("sse") / 1e10, 6).alias("sse_e10"),
        )
    )


@register(
    "q_evt_bot_flags",
    oracle="""
    WITH u AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS span_us,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_errors,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
        FROM events GROUP BY user_id),
    f AS (
        SELECT user_id, n_events, n_errors, n_types,
               ROUND(n_events * 6e7 / span_us, 6) AS rate_per_min,
               CASE WHEN n_events * 30000000 >= span_us THEN 1 ELSE 0 END
                   AS is_bot
        FROM u WHERE n_events >= 10 AND span_us > 0)
    SELECT user_id, n_events, n_errors, n_types, rate_per_min, is_bot
    FROM f ORDER BY n_events DESC, user_id LIMIT 20
    """,
)
def q_evt_bot_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/abuse screening: per-user event volume, error count, type
    diversity, sustained event rate, and a rate flag (≥ 2 events/min
    across the whole span, tested as the exact integer inequality
    n·30 000 000 µs ≥ span — no float threshold). Top-20 heaviest
    users, (count, user) ordered so the cut is deterministic.

    Scale: one user-keyed aggregate with map-side combine (the
    COUNT(DISTINCT type) expands to the standard two-level agg);
    top-20 compiles to TakeOrderedAndProject — the abuse dashboard
    query at any scale."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    u = e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (F.max(us) - F.min(us)).alias("span_us"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "n_errors"
        ),
        F.countDistinct("event_type").alias("n_types"),
    )
    return (
        u.filter((F.col("n_events") >= 10) & (F.col("span_us") > 0))
        .select(
            "user_id",
            "n_events",
            "n_errors",
            "n_types",
            F.round(F.col("n_events") * 6e7 / F.col("span_us"), 6).alias(
                "rate_per_min"
            ),
            F.when(
                F.col("n_events") * 30000000 >= F.col("span_us"), 1
            )
            .otherwise(0)
            .alias("is_bot"),
        )
        .orderBy(F.col("n_events").desc(), "user_id")
        .limit(20)
    )


@register(
    "q_llm_source_overlap",
    oracle="""
    WITH h AS (
        SELECT DISTINCT source,
               sha256(array_to_string(
                   string_split(lower(trim(text)), ' ')[1:8], ' ')) AS sha
        FROM documents),
    tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM h GROUP BY 1),
    p AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(COUNT(*) AS BIGINT) AS shared
        FROM h a JOIN h b ON a.sha = b.sha AND a.source < b.source
        GROUP BY 1, 2)
    SELECT p.src_a, p.src_b, p.shared,
           ROUND(p.shared / CAST(ta.n + tb.n - p.shared AS DOUBLE), 6)
               AS jaccard
    FROM p JOIN tot ta ON ta.source = p.src_a
    JOIN tot tb ON tb.source = p.src_b
    """,
)
def q_llm_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate-overlap matrix: for every pair of corpus
    sources, how many normalized 8-token-prefix digests they share and
    the Jaccard of their digest sets — the governance report that
    decides which source to drop when two feeds mirror each other.
    Digest grain, exact integers. (r7: the fingerprint moved from
    full-text sha to the 8-token prefix — the corpus has no EXACT
    cross-source duplicate below sf0.1, so the full-text version was
    empty at the driver's SF and its oracle check trivially green;
    prefix collisions exist at every SF: 24/24/248 pairs.)

    Scale: shuffle 32-byte digests, never text; the digest self-join
    fans out only within same-digest groups (bounded by sources per
    digest ≤ 20), and the per-source totals broadcast."""
    d = load_table(spark, sf_dir, "documents")
    h = d.select(
        "source",
        F.sha2(F.concat_ws(
            " ", F.slice(F.split(F.lower(F.trim(F.col("text"))), " "), 1, 8)
        ), 256).alias("sha"),
    ).distinct()
    tot = h.groupBy("source").agg(F.count("*").alias("n"))
    a, b = h.alias("a"), h.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.sha") == F.col("b.sha"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count("*").alias("shared"))
    )
    ta = tot.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    tb = tot.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        p.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            "shared",
            F.round(
                F.col("shared")
                / (F.col("na") + F.col("nb") - F.col("shared")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
