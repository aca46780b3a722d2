"""Round-6 wave 11: period-over-period growth (MoM/YoY), weighted
median, two-feature OLS via exact-integer normal equations, classical
seasonal decomposition (day-of-week indices), BFS hop distance on the
near-dup graph (recursive-CTE oracled), and incremental batch-vs-corpus
dedup. All exactly DuckDB-oracled; float emissions derive from exact
integer (cents) aggregates so ROUND(…, 6) cannot flip on engine
summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle


@register(
    "q_ts_yoy",
    oracle="""
    WITH m AS (
        SELECT YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1, 2),
    w AS (
        SELECT y, m, rev_c,
               LAG(rev_c, 1) OVER (ORDER BY y, m) AS prev_m,
               LAG(rev_c, 12) OVER (ORDER BY y, m) AS prev_y
        FROM m)
    SELECT y, m, ROUND(rev_c / 100.0, 2) AS revenue,
           ROUND((rev_c - prev_m) / CAST(prev_m AS DOUBLE), 6) AS mom_pct,
           ROUND((rev_c - prev_y) / CAST(prev_y AS DOUBLE), 6) AS yoy_pct
    FROM w
    """,
)
def q_ts_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth: monthly revenue with month-over-month
    and year-over-year percentage change via LAG(1) / LAG(12) over the
    (year, month) series. Revenue is aggregated in exact integer cents
    so both engines feed IDENTICAL bigints into the ratio — the 6dp
    round cannot flip on summation order.

    Scale: the fact scan aggregates map-side to month grain (~80 rows
    at any SF), so the unpartitioned LAG window runs over a dimension-
    sized series, not the fact — single-reducer is correct and free
    here. First 1/12 months emit NULL change, matching SQL LAG."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c"))
    w = Window.orderBy("y", "m")
    return m.select(
        "y",
        "m",
        F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
        F.round(
            (F.col("rev_c") - F.lag("rev_c", 1).over(w))
            / F.lag("rev_c", 1).over(w).cast("double"),
            6,
        ).alias("mom_pct"),
        F.round(
            (F.col("rev_c") - F.lag("rev_c", 12).over(w))
            / F.lag("rev_c", 12).over(w).cast("double"),
            6,
        ).alias("yoy_pct"),
    )


@register(
    "q_agg_weighted_median",
    oracle="""
    WITH g AS (
        SELECT l_returnflag AS rf,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v_c,
               SUM(CAST(l_quantity AS BIGINT)) AS w
        FROM lineitem GROUP BY 1, 2),
    c AS (
        SELECT rf, v_c, w,
               SUM(w) OVER (PARTITION BY rf ORDER BY v_c) AS cum_w,
               SUM(w) OVER (PARTITION BY rf) AS tot_w
        FROM g)
    SELECT rf AS l_returnflag,
           ROUND(MIN(v_c) FILTER (WHERE cum_w * 2 >= tot_w) / 100.0, 2)
               AS weighted_median_price,
           CAST(MIN(tot_w) AS BIGINT) AS total_weight
    FROM c GROUP BY rf
    """,
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of extended price per return flag: the
    smallest price whose cumulative weight reaches half the total.
    Prices collapse to integer cents and weights to integer quantity
    BEFORE the cumulative window, so the crossing test (cum*2 >= tot)
    is exact integer arithmetic — deterministic across engines and tie
    orders (the default RANGE frame makes equal prices peers, so the
    through-value cumulative is order-independent).

    Scale: SINGLE-EXCHANGE shape (r11 rewrite) — the cumulative window
    runs directly over fact rows hash-partitioned by l_returnflag.
    Tradeoff to know at 100 TB: l_returnflag has ~3 values, so the
    whole fact funnels into ~3 partitions for the per-group sort; on a
    genuinely huge fact, reintroduce the (group, distinct-value)
    histogram pre-aggregate (it bounds window input by the value
    domain) — at fixture scale that pre-aggregate barely collapsed
    rows (594k of 600k) and its extra exchange measurably lost, which
    is why the direct form ships (see the r11 note below)."""
    li = load_table(spark, sf_dir, "lineitem")
    # r11 (guide §2.3): the (rf, cent) pre-aggregate barely collapsed
    # at sf0.1 (594k of 600k rows — cent prices are nearly unique) yet
    # cost its own exchange BEFORE the window's rf exchange. The
    # default RANGE frame makes the cumulative through-value, so the
    # window applied directly to fact rows yields the SAME cum_w for
    # every peer row and the same crossing minimum — one exchange + one
    # sort total (measured 1.25 → 0.73 s warm, identical results). At
    # a truly bounded value domain the histogram form wins instead;
    # here the domain is ~row-sized, so the "histogram" was pure cost.
    c = li.select(
        F.col("l_returnflag").alias("rf"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v_c"),
        F.col("l_quantity").cast("long").alias("w"),
    ).select(
        "rf",
        "v_c",
        F.sum("w").over(Window.partitionBy("rf").orderBy("v_c")).alias("cum_w"),
        F.sum("w").over(Window.partitionBy("rf")).alias("tot_w"),
    )
    return c.groupBy(F.col("rf").alias("l_returnflag")).agg(
        F.round(
            F.min(F.when(F.col("cum_w") * 2 >= F.col("tot_w"), F.col("v_c")))
            / 100.0,
            2,
        ).alias("weighted_median_price"),
        F.min("tot_w").alias("total_weight"),
    )


@register(
    "q_stat_ols2",
    oracle="""
    WITH s AS (
        SELECT l_linestatus AS ls,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(l_quantity AS BIGINT)) AS s1,
               SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS s2,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sy,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s11,
               SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                   * CAST(ROUND(l_discount * 100) AS BIGINT)) AS s22,
               SUM(CAST(l_quantity AS BIGINT)
                   * CAST(ROUND(l_discount * 100) AS BIGINT)) AS s12,
               SUM(CAST(l_quantity AS BIGINT)
                   * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS s1y,
               SUM(CAST(ROUND(l_discount * 100) AS BIGINT)
                   * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS s2y,
               SUM(CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        AS DECIMAL(38, 0))) AS syy
        FROM lineitem GROUP BY 1),
    d AS (
        SELECT ls, n,
               CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS d1,
               CAST(s2 AS DOUBLE) AS d2, CAST(sy AS DOUBLE) AS dy,
               CAST(s11 AS DOUBLE) AS d11, CAST(s22 AS DOUBLE) AS d22,
               CAST(s12 AS DOUBLE) AS d12, CAST(s1y AS DOUBLE) AS d1y,
               CAST(s2y AS DOUBLE) AS d2y, CAST(syy AS DOUBLE) AS dyy
        FROM s),
    a AS (
        SELECT ls, n,
               d11 - d1 * d1 / nd AS a11, d22 - d2 * d2 / nd AS a22,
               d12 - d1 * d2 / nd AS a12, d1y - d1 * dy / nd AS a1y,
               d2y - d2 * dy / nd AS a2y, dyy - dy * dy / nd AS ayy,
               nd, d1, d2, dy
        FROM d),
    b AS (
        SELECT ls, n, a1y, a2y, ayy,
               (a1y * a22 - a2y * a12) / (a11 * a22 - a12 * a12) AS b1,
               (a2y * a11 - a1y * a12) / (a11 * a22 - a12 * a12) AS b2,
               nd, d1, d2, dy
        FROM a)
    SELECT ls AS l_linestatus, n,
           ROUND((dy - b1 * d1 - b2 * d2) / nd / 100.0, 6) AS intercept,
           ROUND(b1 / 100.0, 6) AS coef_quantity,
           ROUND(b2 / 100.0, 6) AS coef_discount_pct,
           ROUND((b1 * a1y + b2 * a2y) / ayy, 6) AS r2
    FROM b
    """,
)
def q_stat_ols2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature ordinary least squares per line status: regress
    extended price (dollars) on quantity and discount percentage via
    the closed-form normal equations. Every moment (Σx, Σx², Σxy, Σy²)
    is accumulated as an EXACT integer (cents / quantity units /
    discount points; Σy² as DECIMAL(38,0) since it exceeds int64), so
    both engines derive coefficients from bit-identical doubles — the
    6dp round cannot flip on float summation order. R² uses the
    identity SSR = b1·A1y + b2·A2y over the centered moments.

    Scale: one map-side-combining aggregate pass over the fact — ten
    integer sums per group, no second pass, no matrix library; the
    textbook distributed-OLS shape (sufficient statistics, then a
    constant-time solve per group)."""
    li = load_table(spark, sf_dir, "lineitem")
    x1 = F.col("l_quantity").cast("long")
    x2 = F.round(F.col("l_discount") * 100).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    s = li.groupBy(F.col("l_linestatus").alias("ls")).agg(
        F.count("*").alias("n"),
        F.sum(x1).alias("s1"),
        F.sum(x2).alias("s2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"),
        F.sum((y * y).cast("decimal(38,0)")).alias("syy"),
    )
    d = s.select(
        "ls",
        "n",
        F.col("n").cast("double").alias("nd"),
        F.col("s1").cast("double").alias("d1"),
        F.col("s2").cast("double").alias("d2"),
        F.col("sy").cast("double").alias("dy"),
        F.col("s11").cast("double").alias("d11"),
        F.col("s22").cast("double").alias("d22"),
        F.col("s12").cast("double").alias("d12"),
        F.col("s1y").cast("double").alias("d1y"),
        F.col("s2y").cast("double").alias("d2y"),
        F.col("syy").cast("double").alias("dyy"),
    )
    a = d.select(
        "ls",
        "n",
        "nd",
        "d1",
        "d2",
        "dy",
        (F.col("d11") - F.col("d1") * F.col("d1") / F.col("nd")).alias("a11"),
        (F.col("d22") - F.col("d2") * F.col("d2") / F.col("nd")).alias("a22"),
        (F.col("d12") - F.col("d1") * F.col("d2") / F.col("nd")).alias("a12"),
        (F.col("d1y") - F.col("d1") * F.col("dy") / F.col("nd")).alias("a1y"),
        (F.col("d2y") - F.col("d2") * F.col("dy") / F.col("nd")).alias("a2y"),
        (F.col("dyy") - F.col("dy") * F.col("dy") / F.col("nd")).alias("ayy"),
    )
    det = F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    b = a.select(
        "ls",
        "n",
        "nd",
        "d1",
        "d2",
        "dy",
        "a1y",
        "a2y",
        "ayy",
        ((F.col("a1y") * F.col("a22") - F.col("a2y") * F.col("a12")) / det).alias(
            "b1"
        ),
        ((F.col("a2y") * F.col("a11") - F.col("a1y") * F.col("a12")) / det).alias(
            "b2"
        ),
    )
    return b.select(
        F.col("ls").alias("l_linestatus"),
        "n",
        F.round(
            (F.col("dy") - F.col("b1") * F.col("d1") - F.col("b2") * F.col("d2"))
            / F.col("nd")
            / 100.0,
            6,
        ).alias("intercept"),
        F.round(F.col("b1") / 100.0, 6).alias("coef_quantity"),
        F.round(F.col("b2") / 100.0, 6).alias("coef_discount_pct"),
        F.round(
            (F.col("b1") * F.col("a1y") + F.col("b2") * F.col("a2y")) / F.col("ayy"),
            6,
        ).alias("r2"),
    )


@register(
    "q_ts_decompose",
    oracle="""
    WITH day_rev AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1),
    tr AS (
        SELECT d, rev_c,
               SUM(rev_c) OVER (ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS t7_c,
               COUNT(*) OVER (ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7
        FROM day_rev)
    SELECT isodow(d) AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(SUM(7 * rev_c - t7_c) / (CAST(COUNT(*) AS DOUBLE) * 700.0), 6)
               AS seasonal
    FROM tr WHERE n7 = 7
    GROUP BY 1
    """,
)
def q_ts_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue with
    weekly period: trend is the centered 7-day moving average, and the
    seasonal index per ISO day-of-week is the mean detrended value.
    The detrended series is kept as the EXACT integer 7·rev − Σ₇rev
    (avoiding the division until the final mean), so the per-dow mean
    divides one exact bigint — no float-summation-order hazard.

    Scale: the fact collapses map-side to day grain (~2.4k rows), so
    the unpartitioned centered-MA window runs over a dimension-sized
    series — single-reducer is correct and free; edge days (incomplete
    7-day frame) are excluded, the textbook centered-MA contract."""
    o = load_table(spark, sf_dir, "orders")
    day_rev = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    tr = day_rev.select(
        "d",
        "rev_c",
        F.sum("rev_c").over(w7).alias("t7_c"),
        F.count("*").over(w7).alias("n7"),
    )
    return (
        tr.filter(F.col("n7") == 7)
        .groupBy((F.weekday("d") + 1).cast("long").alias("dow"))
        .agg(
            F.count("*").alias("n_days"),
            F.round(
                F.sum(7 * F.col("rev_c") - F.col("t7_c"))
                / (F.count("*").cast("double") * 700.0),
                6,
            ).alias("seasonal"),
        )
    )


@register("q_graph_bfs_hops")
def q_graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distance (≤4 hops) from the minimum-id node of the
    near-dup graph: the transitive neighborhood a canonical document
    reaches through chained near-duplicates — the radius statistic
    that distinguishes a tight template cluster (all dist 1) from a
    drift chain (dist grows). Oracled by a DuckDB recursive CTE taking
    MIN(dist) over depth-bounded path enumeration.

    Scale: frontier-expansion BFS — per hop one edge-grain hash join
    of the (small) frontier against the edge list plus an anti-join
    against visited; state is node-grain, work is edges-touched-grain,
    iterations fixed at 4. The seed is a single driver-side scalar
    (one MIN), not a collected table."""
    pairs = _edges(spark, sf_dir)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    edges = edges.persist()
    try:
        seed = edges.agg(F.min("src")).collect()[0][0]
        visited = spark.createDataFrame(
            [(int(seed), 0)], "node: long, dist: long"
        )
        frontier = visited
        for hop in range(1, 5):
            nxt = (
                frontier.join(edges, frontier.node == edges.src)
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(visited.select("node"), "node", "left_anti")
                .select("node", F.lit(hop).cast("long").alias("dist"))
            )
            nxt = nxt.persist()
            if nxt.count() == 0:
                nxt.unpersist()
                break
            visited = visited.unionAll(nxt)
            frontier = nxt
        return visited
    finally:
        edges.unpersist()


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .llm_pipeline2 import q_llm_ngram_jaccard

    return q_llm_ngram_jaccard(spark, sf_dir)


set_oracle(
    "q_graph_bfs_hops",
    f"""
WITH RECURSIVE pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
seed AS (SELECT MIN(src) AS s FROM e),
bfs AS (
    SELECT s AS node, 0 AS dist FROM seed
    UNION
    SELECT e.dst, bfs.dist + 1 FROM bfs JOIN e ON e.src = bfs.node
    WHERE bfs.dist < 4)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM bfs GROUP BY node
""",
)


@register(
    "q_llm_dedup_incremental",
    oracle="""
    WITH batch AS (
        SELECT doc_id, sha256(lower(trim(text))) AS text_sha
        FROM documents WHERE doc_id % 7 = 0),
    corpus AS (
        SELECT DISTINCT sha256(lower(trim(text))) AS text_sha
        FROM documents WHERE doc_id % 7 <> 0)
    SELECT MIN(b.doc_id) AS doc_id, b.text_sha
    FROM batch b ANTI JOIN corpus c USING (text_sha)
    GROUP BY b.text_sha
    """,
)
def q_llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: a new batch (doc_id % 7 = 0) is
    admitted only where its normalized-text sha256 is absent from the
    existing corpus (anti-join) AND it is the first occurrence within
    the batch itself (min doc_id per digest) — the two-stage contract
    of a production ingest pipeline (intra-batch dedup + history
    check).

    Scale: both sides shuffle 32-byte digests, never text; at 100 TB
    the corpus side is a pre-materialized digest index (here derived
    inline from the same table), and the anti-join is digest-
    partitioned so each new shard probes one bucket. The batch is
    typically ≪ corpus, so AQE picks a broadcast anti-join of the
    batch-side digest set per partition."""
    d = load_table(spark, sf_dir, "documents")
    sha = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    batch = d.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", sha.alias("text_sha")
    )
    corpus = (
        d.filter(F.col("doc_id") % 7 != 0).select(sha.alias("text_sha")).distinct()
    )
    return (
        batch.join(corpus, "text_sha", "left_anti")
        .groupBy("text_sha")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "text_sha")
    )
