"""Round-6 wave 30: lead-lag cross-correlation between event-type
time series (spine-densified hourly grain), per-source quantile
normalization of document lengths (batch-effect removal for corpus
mixing), and degree assortativity of the near-dup graph. All exactly
DuckDB-oracled; the assortativity oracle embeds the ngram-jaccard
pair oracle as a CTE (same reuse pattern as q_graph_degree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle
from .llm_pipeline2 import q_llm_ngram_jaccard


@register(
    "q_ts_crosscorr",
    oracle="""
    WITH ev AS (
        SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h, event_type
        FROM events WHERE event_type IN ('view', 'purchase')),
    bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM ev),
    spine AS (
        SELECT CAST(u.g AS BIGINT) AS h
        FROM bounds, unnest(range(bounds.h0, bounds.h1 + 1)) AS u(g)),
    s AS (
        SELECT spine.h,
               COALESCE(a.n, 0) AS a, COALESCE(b.n, 0) AS b
        FROM spine
        LEFT JOIN (SELECT h, CAST(COUNT(*) AS BIGINT) AS n FROM ev
                   WHERE event_type = 'view' GROUP BY h) a USING (h)
        LEFT JOIN (SELECT h, CAST(COUNT(*) AS BIGINT) AS n FROM ev
                   WHERE event_type = 'purchase' GROUP BY h) b USING (h)),
    lags AS (SELECT CAST(u.g AS BIGINT) AS lag
             FROM unnest(range(-6, 7)) AS u(g)),
    m AS (
        SELECT l.lag,
               CAST(COUNT(*) AS BIGINT) AS n_hours,
               CAST(SUM(s1.a) AS BIGINT) AS sx,
               CAST(SUM(s2.b) AS BIGINT) AS sy,
               CAST(SUM(s1.a * s2.b) AS BIGINT) AS sxy,
               CAST(SUM(s1.a * s1.a) AS BIGINT) AS sxx,
               CAST(SUM(s2.b * s2.b) AS BIGINT) AS syy
        FROM lags l
        JOIN s s1 ON TRUE
        JOIN s s2 ON s2.h = s1.h + l.lag
        GROUP BY l.lag)
    SELECT lag, n_hours,
           ROUND((n_hours * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (SQRT(n_hours * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * sx)
                    * SQRT(n_hours * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * sy)),
                 6) AS r
    FROM m
    """,
)
def q_ts_crosscorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation: does 'view' traffic lead 'purchase'
    traffic, and by how many hours — the Pearson correlation of the
    two hourly count series at every lag in [−6, +6], over an hour
    SPINE (missing hours count as 0, not as missing rows, so quiet
    periods aren't silently skipped). All sums exact integers; one
    final double step per lag. The lead-lag scan behind demand
    forecasting and funnel-latency diagnosis.

    Scale: series reduce to hour grain first (map-side combining), so
    the lag joins operate on the bounded series, not the events; each
    lag is an equi-join on shifted hour index — 13 independent
    aggregates over a series-sized input."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    ).select(
        F.floor(F.unix_timestamp("ts") / 3600)
        .cast("long")
        .alias("h"),
        "event_type",
    )
    bounds = ev.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1")).alias("h")
    )
    a = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("h")
        .agg(F.count("*").alias("na"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("h")
        .agg(F.count("*").alias("nb"))
    )
    s = (
        spine.join(a, "h", "left")
        .join(b, "h", "left")
        .select(
            "h",
            F.coalesce("na", F.lit(0)).alias("a"),
            F.coalesce("nb", F.lit(0)).alias("b"),
        )
    )
    lags = spark.range(-6, 7).select(F.col("id").alias("lag"))
    s1 = s.select(F.col("h").alias("h1x"), F.col("a"))
    s2 = s.select(F.col("h").alias("h2x"), F.col("b"))
    m = (
        s1.crossJoin(F.broadcast(lags))
        .join(s2, F.col("h2x") == F.col("h1x") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count("*").alias("n_hours"),
            F.sum("a").alias("sx"),
            F.sum("b").alias("sy"),
            F.sum(F.col("a") * F.col("b")).alias("sxy"),
            F.sum(F.col("a") * F.col("a")).alias("sxx"),
            F.sum(F.col("b") * F.col("b")).alias("syy"),
        )
    )
    n = F.col("n_hours").cast("double")
    return m.select(
        "lag",
        "n_hours",
        F.round(
            (n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy"))
            / (
                F.sqrt(n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx"))
                * F.sqrt(n * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy"))
            ),
            6,
        ).alias("r"),
    )


@register(
    "q_llm_quantile_normalize",
    oracle="""
    WITH d AS (
        SELECT doc_id, source, n_chars,
               NTILE(100) OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS b,
               NTILE(100) OVER (ORDER BY n_chars, doc_id) AS pb
        FROM documents),
    pooled AS (
        SELECT pb AS b,
               CAST(SUM(n_chars) AS BIGINT) AS psum,
               CAST(COUNT(*) AS BIGINT) AS pn
        FROM d GROUP BY pb),
    src AS (
        SELECT source, b,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS ssum
        FROM d GROUP BY source, b)
    SELECT s.source, CAST(s.b AS BIGINT) AS centile, s.n_docs,
           ROUND(s.ssum / CAST(s.n_docs AS DOUBLE), 6) AS src_mean,
           ROUND(p.psum / CAST(p.pn AS DOUBLE), 6) AS pooled_mean,
           ROUND(p.psum / CAST(p.pn AS DOUBLE)
                 - s.ssum / CAST(s.n_docs AS DOUBLE), 6) AS shift
    FROM src s JOIN pooled p ON p.b = s.b
    """,
)
def q_llm_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization report for corpus mixing: each source's
    document-length distribution is banded into centiles and aligned
    against the POOLED distribution at the same centile — the shift
    column is the correction that maps a source's length profile onto
    the corpus-wide one (the batch-effect-removal recipe, applied to
    data mixing: a source whose 90th centile sits far from the pooled
    90th is over/under-long at that band). Deterministic banding via
    (n_chars, doc_id) order; sums exact integers.

    Scale: two ntile bandings (global / per-source sort — at 100 TB
    replace with histogram-quantile banding as in the gains/lift
    table; band grain, not row grain, flows onward) then one
    aggregate per grain and a 100-row broadcast join."""
    d = load_table(spark, sf_dir, "documents")
    wsrc = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wall = Window.orderBy("n_chars", "doc_id")
    banded = d.select(
        "source",
        "n_chars",
        F.ntile(100).over(wsrc).alias("b"),
        F.ntile(100).over(wall).alias("pb"),
    )
    pooled = banded.groupBy(F.col("pb").alias("b")).agg(
        F.sum("n_chars").alias("psum"), F.count("*").alias("pn")
    )
    src = banded.groupBy("source", "b").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("ssum")
    )
    src_mean = F.col("ssum") / F.col("n_docs").cast("double")
    pooled_mean = F.col("psum") / F.col("pn").cast("double")
    return src.join(F.broadcast(pooled), "b").select(
        "source",
        F.col("b").cast("long").alias("centile"),
        "n_docs",
        F.round(src_mean, 6).alias("src_mean"),
        F.round(pooled_mean, 6).alias("pooled_mean"),
        F.round(pooled_mean - src_mean, 6).alias("shift"),
    )


@register("q_graph_assortativity")
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the near-dup graph: the Pearson
    correlation of endpoint degrees over the (symmetrized) edge list —
    positive means hub documents duplicate other hubs (template
    families), negative means hubs link to leaves (one boilerplate
    stamped onto many singletons). With the edge list symmetrized the
    x/y moments coincide, so r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²)
    from exact integer sums; one final double step.

    Scale (r10 rewrite): was edge-grain (explode degrees + join back
    onto edges), which consumed the candidate-verify pair lineage
    through TWO un-pinned branches — at sf10 (0.941×, the family's
    closest-to-linear row) that lineage was the whole cost. Now
    quotient-grain: true-twin groups are internal cliques and
    quotient-adjacent groups complete bipartite, so every Pearson
    moment expands analytically from (gsz, degree) per group — the
    sym-edge multiset is Σ_A gsz·(gsz−1) intra rows at (degA, degA)
    plus gszA·gszB rows per ordered quotient edge at (degA, degB).
    Exact integer sums; the DuckDB oracle is unchanged."""
    from ..operators.graph import twin_degrees, twin_quotient

    pairs = q_llm_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    e0 = pairs.select(F.col("doc_a").alias("src"),
                      F.col("doc_b").alias("dst"))
    # pin the symmetric edge list BEFORE the quotient fan-out (the
    # wave90 discipline the triangle family follows)
    sym = (e0.unionAll(e0.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
           .distinct().localCheckpoint(eager=True))
    _member, sizes, qedges = twin_quotient(sym)
    degg = twin_degrees(sizes, qedges)
    intra = degg.select(
        (F.col("gsz") * (F.col("gsz") - 1)).cast("long").alias("w"),
        F.col("degree").alias("x"), F.col("degree").alias("y"),
    )
    da = degg.select(F.col("gid").alias("src"), F.col("gsz").alias("sza"),
                     F.col("degree").alias("dxa"))
    db = degg.select(F.col("gid").alias("dst"), F.col("gsz").alias("szb"),
                     F.col("degree").alias("dyb"))
    cross = (
        qedges.join(da, "src").join(db, "dst")
        .select((F.col("sza") * F.col("szb")).cast("long").alias("w"),
                F.col("dxa").alias("x"), F.col("dyb").alias("y"))
    )
    rows = intra.unionAll(cross)
    m = rows.agg(
        F.sum("w").alias("m2"),
        F.sum(F.col("w") * F.col("x")).alias("sx"),
        F.sum(F.col("w") * F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("w") * F.col("x") * F.col("x")).alias("sxx"),
    )
    m2 = F.col("m2").cast("double")
    return m.select(
        (F.col("m2") / 2).cast("long").alias("n_edges"),
        F.round(
            (m2 * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sx"))
            / (m2 * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")),
            6,
        ).alias("assortativity"),
    )


set_oracle(
    "q_graph_assortativity",
    f"""
    WITH pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
    deg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree
        FROM (SELECT doc_a AS doc_id FROM pairs
              UNION ALL SELECT doc_b AS doc_id FROM pairs)
        GROUP BY doc_id),
    e AS (
        SELECT da.degree AS dx, db.degree AS dy
        FROM pairs p
        JOIN deg da ON da.doc_id = p.doc_a
        JOIN deg db ON db.doc_id = p.doc_b),
    sym AS (
        SELECT dx AS x, dy AS y FROM e
        UNION ALL SELECT dy AS x, dx AS y FROM e),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m2,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM sym)
    SELECT CAST(m2 / 2 AS BIGINT) AS n_edges,
           ROUND((m2 * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                 / (m2 * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx),
                 6) AS assortativity
    FROM m
    """,
)
