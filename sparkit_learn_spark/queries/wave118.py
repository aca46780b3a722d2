"""Round-6 wave 118: IDF-weighted Jaccard near-dup scoring (rare
shingles count more), one-covariate ANCOVA (covariate-adjusted group
means), and Mood's median test (k-group location via the grand-median
contingency). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_llm_weighted_jaccard",
    oracle="""
    WITH t AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
    s AS (
        SELECT DISTINCT doc_id,
               ARRAY_TO_STRING(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ')
                   AS sh
        FROM t, UNNEST(RANGE(1, LEN(toks) - 3)) u(i)
        WHERE LEN(toks) >= 5),
    ndocs AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
    idf AS (
        SELECT sh, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
               CAST(ROUND(LN(CAST(nd AS DOUBLE)
                             / CAST(COUNT(DISTINCT doc_id) AS DOUBLE))
                          * 1000000) AS BIGINT) AS w
        FROM s CROSS JOIN ndocs GROUP BY sh, nd
        HAVING COUNT(DISTINCT doc_id) <= 100),
    docw AS (
        SELECT s.doc_id, CAST(SUM(idf.w) AS BIGINT) AS total_w
        FROM s JOIN idf ON idf.sh = s.sh GROUP BY s.doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(SUM(idf.w) AS BIGINT) AS common_w
        FROM s a
        JOIN s b ON b.sh = a.sh AND a.doc_id < b.doc_id
        JOIN idf ON idf.sh = a.sh
        GROUP BY 1, 2),
    scored AS (
        SELECT i.doc_a, i.doc_b, i.common_w,
               ROUND(CAST(i.common_w AS DOUBLE)
                     / CAST(wa.total_w + wb.total_w - i.common_w AS DOUBLE),
                     6) AS wjaccard
        FROM inter i
        JOIN docw wa ON wa.doc_id = i.doc_a
        JOIN docw wb ON wb.doc_id = i.doc_b)
    SELECT doc_a, doc_b, wjaccard
    FROM scored WHERE wjaccard >= 0.05
    ORDER BY wjaccard DESC, doc_a, doc_b LIMIT 25
    """,
)
def q_llm_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-weighted Jaccard near-dup scoring: shingle overlap where
    each shingle counts its micro-quantized IDF — two docs sharing
    RARE shingles score far higher than two sharing boilerplate, the
    weighting that separates true derivation from genre similarity
    (plain Jaccard, q_llm_ngram_jaccard, treats both the same).
    Weighted |A∩B| / |A∪B| over integer weights (IDF quantized to
    ppm BEFORE summation, the q_graph_adamic_adar convention), df ≤
    100 cap bounds the inverted index. Top-25 pairs, exactly oracled.

    Scale: same candidates-then-verify shape as the exact Jaccard —
    inverted index join, never all-pairs; the weights ride along as
    one extra integer column."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("toks"))
    s = (
        t.filter(F.size("toks") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 4),"
                    " i -> array_join(slice(toks, i, 5), ' '))"
                )
            ).alias("sh"),
        )
        .distinct()
        .persist()
    )
    nd = docs.agg(F.count(F.lit(1)).alias("nd"))
    idf = (
        # s is already distinct on (doc_id, sh), so COUNT(*) per sh
        # equals COUNT(DISTINCT doc_id) — the plain count keeps the
        # aggregate single-phase (no distinct-expand, one exchange
        # instead of two)
        s.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 100)
        .crossJoin(F.broadcast(nd))
        .select(
            "sh",
            F.round(
                F.log(F.col("nd").cast("double") / F.col("df").cast("double")) * 1000000
            )
            .cast("long")
            .alias("w"),
        )
    )
    # sw fans out three ways (docw + both sides of the pair self-join);
    # persist so the idf aggregate + weight join run once, not once per
    # consumer (before-plan: the 2-exchange idf subtree appeared twice,
    # 59 exchanges total)
    sw = s.join(idf, "sh").persist()
    docw = sw.groupBy("doc_id").agg(F.sum("w").alias("total_w"))
    a = sw.select(F.col("doc_id").alias("doc_a"), "sh", F.col("w").alias("wa"))
    b = sw.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh2"))
    inter = (
        a.join(b, (F.col("sh") == F.col("sh2")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum("wa").alias("common_w"))
    )
    wa = docw.select(F.col("doc_id").alias("doc_a"), F.col("total_w").alias("ta"))
    wb = docw.select(F.col("doc_id").alias("doc_b"), F.col("total_w").alias("tb"))
    scored = (
        # the per-doc weight table is doc-grain (small); broadcast both
        # sides so the pair table isn't shuffled twice by doc key
        inter.join(F.broadcast(wa), "doc_a")
        .join(F.broadcast(wb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common_w").cast("double")
                / (F.col("ta") + F.col("tb") - F.col("common_w")).cast("double"),
                6,
            ).alias("wjaccard"),
        )
    )
    return (
        scored.filter(F.col("wjaccard") >= 0.05)
        .orderBy(F.desc("wjaccard"), "doc_a", "doc_b")
        .limit(25)
    )


@register(
    "q_stat_ancova",
    oracle="""
    WITH x AS (
        SELECT l_returnflag AS grp,
               CAST(l_quantity AS BIGINT) AS c,
               CAST(ROUND(l_extendedprice) AS BIGINT) AS y
        FROM lineitem),
    g AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(c) AS sc, SUM(y) AS sy,
               SUM(CAST(c * c AS DECIMAL(38, 0))) AS scc,
               SUM(CAST(c * y AS DECIMAL(38, 0))) AS scy
        FROM x GROUP BY grp),
    pool AS (
        SELECT SUM(CAST(scy AS DOUBLE) - CAST(sc AS DOUBLE)
                       * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS sxy_w,
               SUM(CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE)
                       * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) AS sxx_w
        FROM g),
    tot AS (
        SELECT CAST(SUM(n) AS DOUBLE) AS nt,
               CAST(SUM(sc) AS DOUBLE) AS sct
        FROM g)
    SELECT g.grp AS l_returnflag, g.n,
           ROUND(CAST(g.sy AS DOUBLE) / CAST(g.n AS DOUBLE), 6)
               AS raw_mean,
           ROUND((pool.sxy_w / pool.sxx_w), 6) AS pooled_slope,
           ROUND(CAST(g.sy AS DOUBLE) / CAST(g.n AS DOUBLE)
                 - (pool.sxy_w / pool.sxx_w)
                   * (CAST(g.sc AS DOUBLE) / CAST(g.n AS DOUBLE)
                      - tot.sct / tot.nt), 6) AS adjusted_mean
    FROM g CROSS JOIN pool CROSS JOIN tot ORDER BY g.grp
    """,
)
def q_stat_ancova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-covariate ANCOVA: compare mean line revenue across return
    flags AFTER adjusting for quantity — adjusted_mean_g = ȳ_g −
    b_w·(x̄_g − x̄), with the pooled WITHIN-group slope b_w (the
    covariance machinery that answers "do returned items earn less
    per line, or do they just have different quantities?"). A raw
    group mean comparison confounds the covariate; ANCOVA removes
    exactly that. Sufficient statistics are exact integers per group;
    the adjustment is constant-time algebra.

    Scale: one map-side-combining pass to k group moments — the
    covariate adjustment costs two extra integer sums per group."""
    li = load_table(spark, sf_dir, "lineitem")
    c = F.col("l_quantity").cast("long")
    y = F.round("l_extendedprice").cast("long")
    dec = "decimal(38,0)"
    g = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("sc"),
        F.sum(y).alias("sy"),
        F.sum((c * c).cast(dec)).alias("scc"),
        F.sum((c * y).cast(dec)).alias("scy"),
    )
    nd = F.col("n").cast("double")
    pool = g.agg(
        F.sum(
            F.col("scy").cast("double") - F.col("sc").cast("double") * F.col("sy").cast("double") / nd
        ).alias("sxy_w"),
        F.sum(
            F.col("scc").cast("double") - F.col("sc").cast("double") * F.col("sc").cast("double") / nd
        ).alias("sxx_w"),
    )
    tot = g.agg(
        F.sum("n").cast("double").alias("nt"), F.sum("sc").cast("double").alias("sct")
    )
    slope = F.col("sxy_w") / F.col("sxx_w")
    return (
        g.crossJoin(F.broadcast(pool))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("grp").alias("l_returnflag"),
            "n",
            F.round(F.col("sy").cast("double") / nd, 6).alias("raw_mean"),
            F.round(slope, 6).alias("pooled_slope"),
            F.round(
                F.col("sy").cast("double") / nd
                - slope * (F.col("sc").cast("double") / nd - F.col("sct") / F.col("nt")),
                6,
            ).alias("adjusted_mean"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_stat_moods_median",
    oracle="""
    WITH x AS (
        SELECT o_orderpriority AS grp,
               CAST(ROUND(o_totalprice) AS BIGINT) AS v
        FROM orders),
    h AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM x GROUP BY v),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
    med AS (
        SELECT MIN(v) AS m
        FROM (SELECT v, SUM(c) OVER (ORDER BY v) AS cc FROM h)
             CROSS JOIN n
        WHERE cc >= (n.n + 1) // 2),
    g AS (
        SELECT grp,
               CAST(SUM(CASE WHEN v > med.m THEN 1 ELSE 0 END) AS BIGINT)
                   AS above,
               CAST(SUM(CASE WHEN v <= med.m THEN 1 ELSE 0 END) AS BIGINT)
                   AS at_or_below
        FROM x CROSS JOIN med GROUP BY grp),
    t AS (SELECT CAST(SUM(above) AS BIGINT) AS ta,
                 CAST(SUM(at_or_below) AS BIGINT) AS tb FROM g),
    chi AS (
        SELECT SUM(
            POW(CAST(g.above AS DOUBLE)
                - CAST(g.above + g.at_or_below AS DOUBLE)
                  * CAST(t.ta AS DOUBLE) / CAST(t.ta + t.tb AS DOUBLE), 2)
            / (CAST(g.above + g.at_or_below AS DOUBLE)
               * CAST(t.ta AS DOUBLE) / CAST(t.ta + t.tb AS DOUBLE))
          + POW(CAST(g.at_or_below AS DOUBLE)
                - CAST(g.above + g.at_or_below AS DOUBLE)
                  * CAST(t.tb AS DOUBLE) / CAST(t.ta + t.tb AS DOUBLE), 2)
            / (CAST(g.above + g.at_or_below AS DOUBLE)
               * CAST(t.tb AS DOUBLE) / CAST(t.ta + t.tb AS DOUBLE))
        ) AS chi2
        FROM g CROSS JOIN t)
    SELECT g.grp AS o_orderpriority, g.above, g.at_or_below,
           ROUND(CAST(g.above AS DOUBLE)
                 / CAST(g.above + g.at_or_below AS DOUBLE), 6)
               AS share_above_median,
           ROUND(chi.chi2, 6) AS moods_chi2
    FROM g CROSS JOIN chi ORDER BY g.grp
    """,
)
def q_stat_moods_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test: do the five order priorities differ in
    MEDIAN order value? Count above/at-or-below the grand median per
    group and chi-square the contingency — the bluntest but most
    assumption-free k-sample location test (it survives arbitrary
    outliers and unequal shapes that degrade Kruskal-Wallis), the
    right first look at heavy-tailed money data. The grand median
    comes from the exact histogram crossing; cells are exact
    integers.

    Scale: value-domain histogram for the median + one conditional
    aggregate per group — two scans, bounded state."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    x = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round("o_totalprice").cast("long").alias("v"),
    )
    h = x.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    n = h.agg(F.sum("c").alias("n"))
    cum = h.select("v", F.sum("c").over(Window.orderBy("v")).alias("cc"))
    med = (
        cum.crossJoin(F.broadcast(n))
        .filter(F.col("cc") >= F.expr("(n + 1) div 2"))
        .agg(F.min("v").alias("m"))
    )
    g = (
        x.crossJoin(F.broadcast(med))
        .groupBy("grp")
        .agg(
            F.sum(F.when(F.col("v") > F.col("m"), 1).otherwise(0)).alias("above"),
            F.sum(F.when(F.col("v") <= F.col("m"), 1).otherwise(0)).alias("at_or_below"),
        )
    )
    t = g.agg(F.sum("above").alias("ta"), F.sum("at_or_below").alias("tb"))
    j = g.crossJoin(F.broadcast(t))
    rowtot = (F.col("above") + F.col("at_or_below")).cast("double")
    grand = (F.col("ta") + F.col("tb")).cast("double")
    ea = rowtot * F.col("ta").cast("double") / grand
    eb = rowtot * F.col("tb").cast("double") / grand
    chi = j.agg(
        F.sum(
            F.pow(F.col("above").cast("double") - ea, F.lit(2)) / ea
            + F.pow(F.col("at_or_below").cast("double") - eb, F.lit(2)) / eb
        ).alias("chi2")
    )
    return (
        g.crossJoin(F.broadcast(chi))
        .select(
            F.col("grp").alias("o_orderpriority"),
            "above",
            "at_or_below",
            F.round(
                F.col("above").cast("double")
                / (F.col("above") + F.col("at_or_below")).cast("double"),
                6,
            ).alias("share_above_median"),
            F.round("chi2", 6).alias("moods_chi2"),
        )
        .orderBy("o_orderpriority")
    )
