"""Round-6 wave 110: SaaS-style revenue bridge (new / churned /
expanded / contracted decomposition between eras), deterministic
integer RANSAC line fitting (hash-seeded candidate pairs, exact
integer inlier tests), and LSH precision/recall against exact-Jaccard
truth (the dedup-stage quality scorecard). All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import ORACLES, register, set_oracle

from .llm_pipeline2 import q_llm_ngram_jaccard


@register(
    "q_fin_revenue_bridge",
    oracle="""
    WITH c AS (
        SELECT o_custkey,
               SUM(CASE WHEN o_orderdate < DATE '1998-04-01'
                        THEN CAST(ROUND(o_totalprice) AS BIGINT)
                        ELSE 0 END) AS r1,
               SUM(CASE WHEN o_orderdate >= DATE '1998-04-01'
                        THEN CAST(ROUND(o_totalprice) AS BIGINT)
                        ELSE 0 END) AS r2
        FROM orders GROUP BY o_custkey),
    b AS (
        SELECT CASE
                 WHEN r1 = 0 AND r2 > 0 THEN 'new'
                 WHEN r1 > 0 AND r2 = 0 THEN 'churned'
                 WHEN r2 > r1 THEN 'expanded'
                 WHEN r2 < r1 THEN 'contracted'
                 ELSE 'flat'
               END AS segment,
               r1, r2
        FROM c),
    t AS (SELECT CAST(SUM(r1) AS BIGINT) AS tot1,
                 CAST(SUM(r2) AS BIGINT) AS tot2 FROM b)
    SELECT b.segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(b.r2 - b.r1) AS BIGINT) AS revenue_delta,
           ROUND(CAST(SUM(b.r2 - b.r1) AS DOUBLE)
                 / CAST(t.tot1 AS DOUBLE), 6) AS delta_vs_era1,
           ROUND(CAST(t.tot2 AS DOUBLE) / CAST(t.tot1 AS DOUBLE) - 1, 6)
               AS total_growth
    FROM b CROSS JOIN t
    GROUP BY b.segment, t.tot1, t.tot2 ORDER BY b.segment
    """,
)
def q_fin_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge between the pre-/post-1998-04 eras: total growth
    decomposed into NEW, CHURNED, EXPANDED, and CONTRACTED customer
    contributions — the SaaS revenue waterfall that explains "+4%
    overall" as "+30% new − 26% churn", two very different companies.
    Complements q_evt_growth_accounting (user counts) with the
    REVENUE-weighted bridge. Exact integer per-customer era revenues
    and deltas; the segment deltas sum to the total by construction.

    Scale: one conditional aggregate to customer grain, one 5-row
    fold — the bridge is free at any order volume."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-04-01").cast("date")
    v = F.round("o_totalprice").cast("long")
    c = o.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderdate") < cut, v).otherwise(0)).alias("r1"),
        F.sum(F.when(F.col("o_orderdate") >= cut, v).otherwise(0)).alias("r2"),
    )
    seg = (
        F.when((F.col("r1") == 0) & (F.col("r2") > 0), "new")
        .when((F.col("r1") > 0) & (F.col("r2") == 0), "churned")
        .when(F.col("r2") > F.col("r1"), "expanded")
        .when(F.col("r2") < F.col("r1"), "contracted")
        .otherwise("flat")
    )
    b = c.select(seg.alias("segment"), "r1", "r2")
    t = b.agg(F.sum("r1").alias("tot1"), F.sum("r2").alias("tot2"))
    return (
        b.crossJoin(F.broadcast(t))
        .groupBy("segment", "tot1", "tot2")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("r2") - F.col("r1")).alias("revenue_delta"),
        )
        .select(
            "segment",
            "n_customers",
            "revenue_delta",
            F.round(F.col("revenue_delta").cast("double") / F.col("tot1").cast("double"), 6).alias(
                "delta_vs_era1"
            ),
            F.round(F.col("tot2").cast("double") / F.col("tot1").cast("double") - 1, 6).alias(
                "total_growth"
            ),
        )
        .orderBy("segment")
    )


@register(
    "q_stat_ransac",
    oracle="""
    WITH d AS (
        SELECT ROW_NUMBER() OVER (ORDER BY day) AS i,
               CAST(DATEDIFF('day', DATE '1992-01-01', day) AS BIGINT) AS t,
               v
        FROM (SELECT o_orderdate AS day,
                     SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS v
              FROM orders GROUP BY 1)),
    n AS (SELECT CAST(MAX(i) AS BIGINT) AS n FROM d),
    seeds AS (
        SELECT s.k,
               1 + ((s.k * 2654435761) % 4294967296) % n.n AS i1,
               1 + ((s.k * 40503 + 17) % 65536) % n.n AS i2
        FROM (SELECT UNNEST(range(0, 16)) AS k) s CROSS JOIN n),
    lines AS (
        SELECT seeds.k, a.t AS t1, a.v AS v1, b.t AS t2, b.v AS v2
        FROM seeds
        JOIN d a ON a.i = seeds.i1
        JOIN d b ON b.i = seeds.i2
        WHERE a.t <> b.t),
    scored AS (
        SELECT l.k, CAST(COUNT(*) AS BIGINT) AS inliers
        FROM lines l CROSS JOIN d
        WHERE ABS((d.v - l.v1) * (l.t2 - l.t1) - (l.v2 - l.v1) * (d.t - l.t1))
              <= 100000 * ABS(l.t2 - l.t1)
        GROUP BY l.k),
    best AS (
        SELECT s.k, s.inliers, l.t1, l.v1, l.t2, l.v2,
               ROW_NUMBER() OVER (ORDER BY s.inliers DESC, s.k) AS rn
        FROM scored s JOIN lines l ON l.k = s.k)
    SELECT CAST(best.k AS BIGINT) AS seed, best.inliers,
           ROUND(CAST(best.inliers AS DOUBLE) / CAST(n.n AS DOUBLE), 6)
               AS inlier_share,
           ROUND(CAST(best.v2 - best.v1 AS DOUBLE)
                 / CAST(best.t2 - best.t1 AS DOUBLE), 6) AS slope
    FROM best CROSS JOIN n WHERE best.rn = 1
    """,
)
def q_stat_ransac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic RANSAC line fit on daily revenue: 16 hash-seeded
    candidate day pairs each propose a line; every candidate counts
    its inliers (|residual| ≤ 100k revenue units) and the consensus
    winner is reported — the robust-fitting scheme that survives
    gross outliers OLS and even Theil-Sen bend under. The inlier test
    is cross-multiplied into pure integers (|(v−v1)(t2−t1) −
    (v2−v1)(t−t1)| ≤ c·|t2−t1|), so membership cannot flip on float
    noise and the consensus count is exactly oracled.

    Scale: candidate lines broadcast (16 rows); scoring is one pass
    of the day series per candidate batch (a 16× map, no shuffle);
    the argmax is a 16-row fold. Classic RANSAC sampling is random —
    hash-seeding makes it reproducible across engines AND runs, which
    production refits want anyway."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    d = (
        o.groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.sum(F.round("o_totalprice").cast("long")).alias("v"))
        .select(
            F.row_number().over(Window.orderBy("day")).alias("i"),
            F.datediff("day", F.lit("1992-01-01").cast("date")).cast("long").alias("t"),
            "v",
        )
        .persist()
    )
    n = d.agg(F.max("i").cast("long").alias("n"))
    seeds = (
        spark.range(16)
        .select(F.col("id").alias("k"))
        .crossJoin(F.broadcast(n))
        .select(
            "k",
            (1 + F.expr("((k * 2654435761) % 4294967296) % n")).alias("i1"),
            (1 + F.expr("((k * 40503 + 17) % 65536) % n")).alias("i2"),
        )
    )
    a = d.select(F.col("i").alias("ia"), F.col("t").alias("t1"), F.col("v").alias("v1"))
    b = d.select(F.col("i").alias("ib"), F.col("t").alias("t2"), F.col("v").alias("v2"))
    lines = (
        seeds.join(F.broadcast(a), F.col("ia") == F.col("i1"))
        .join(F.broadcast(b), F.col("ib") == F.col("i2"))
        .filter(F.col("t1") != F.col("t2"))
        .select("k", "t1", "v1", "t2", "v2")
    )
    resid = F.abs(
        (F.col("v") - F.col("v1")) * (F.col("t2") - F.col("t1"))
        - (F.col("v2") - F.col("v1")) * (F.col("t") - F.col("t1"))
    )
    scored = (
        d.crossJoin(F.broadcast(lines))
        .filter(resid <= 100000 * F.abs(F.col("t2") - F.col("t1")))
        .groupBy("k", "t1", "v1", "t2", "v2")
        .agg(F.count(F.lit(1)).alias("inliers"))
    )
    rn = F.row_number().over(Window.orderBy(F.desc("inliers"), "k"))
    return (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .crossJoin(F.broadcast(n))
        .select(
            F.col("k").cast("long").alias("seed"),
            "inliers",
            F.round(F.col("inliers").cast("double") / F.col("n").cast("double"), 6).alias(
                "inlier_share"
            ),
            F.round(
                (F.col("v2") - F.col("v1")).cast("double")
                / (F.col("t2") - F.col("t1")).cast("double"),
                6,
            ).alias("slope"),
        )
    )


@register("q_llm_lsh_pr")
def q_llm_lsh_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH stage quality scorecard: precision and recall of the
    banded portable-MinHash candidate pairs (8 hashes, 4 bands × 2,
    the q_llm_lsh_bucket_stats construction) against the EXACT
    shingle-Jaccard ≥ 0.05 truth set — the measurement that turns
    "we use LSH" into "our LSH finds 9X% of true pairs while
    verifying Y× fewer candidates than all-pairs". Both pipelines
    are md5-deterministic, so TP/FP/FN are exact integers.

    Scale: candidates come from band-bucket self-joins (never
    all-pairs); truth from the df-capped inverted index; the
    comparison is two set-grain joins. This is the eval loop every
    banded-dedup parameter change should re-run."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("toks"),
    )
    sh = (
        t.filter(F.size("toks") >= 4)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 3),"
                    " i -> array_join(slice(toks, i, 4), ' '))"
                )
            ).alias("s"),
        )
        .distinct()
    )
    # single-pass 8-way signature aggregation (see q_llm_lsh_bucket_stats)
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(str(j)), F.lit("|"), F.col("s")))).alias(f"s{j}")
            for j in range(8)
        ]
    )
    band = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("long").alias("band_id"),
                        F.concat(F.col(f"s{2 * b}"), F.lit("|"), F.col(f"s{2 * b + 1}")).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band_id").alias("band_id"), F.col("bk.key").alias("key"))
    ba = band.select(F.col("doc_id").alias("da"), "band_id", "key")
    bb = band.select(F.col("doc_id").alias("db"), F.col("band_id").alias("b2"), F.col("key").alias("k2"))
    cand = (
        ba.join(bb, (F.col("band_id") == F.col("b2")) & (F.col("key") == F.col("k2")) & (F.col("da") < F.col("db")))
        .select(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"))
        .distinct()
        .persist()
    )
    truth = q_llm_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b").distinct().persist()
    tp = cand.join(truth, ["doc_a", "doc_b"]).agg(F.count(F.lit(1)).alias("tp"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    return (
        tp.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(nt))
        .select(
            "n_cand",
            "n_truth",
            "tp",
            F.round(F.col("tp").cast("double") / F.col("n_cand").cast("double"), 6).alias(
                "precision"
            ),
            F.round(F.col("tp").cast("double") / F.col("n_truth").cast("double"), 6).alias(
                "recall"
            ),
        )
    )


set_oracle("q_llm_lsh_pr", f"""
WITH t AS (
    SELECT doc_id, REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+') AS toks
    FROM documents),
sh AS (
    SELECT DISTINCT doc_id,
           ARRAY_TO_STRING(toks[CAST(i AS INT):CAST(i + 3 AS INT)], ' ') AS s
    FROM t, UNNEST(RANGE(1, LEN(toks) - 2)) u(i)
    WHERE LEN(toks) >= 4),
sig AS (
    SELECT doc_id, g.j,
           MIN(MD5(CAST(g.j AS VARCHAR) || '|' || s)) AS sig
    FROM sh CROSS JOIN (SELECT UNNEST(RANGE(0, 8)) AS j) g
    GROUP BY doc_id, g.j),
band AS (
    SELECT doc_id, j // 2 AS band_id,
           STRING_AGG(sig, '|' ORDER BY j) AS key
    FROM sig GROUP BY doc_id, j // 2),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM band a JOIN band b
      ON b.band_id = a.band_id AND b.key = a.key AND a.doc_id < b.doc_id),
truth AS (SELECT DISTINCT doc_a, doc_b FROM ({ORACLES["q_llm_ngram_jaccard"]})),
tp AS (SELECT CAST(COUNT(*) AS BIGINT) AS tp
       FROM cand JOIN truth USING (doc_a, doc_b)),
nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand FROM cand),
nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth)
SELECT nc.n_cand, nt.n_truth, tp.tp,
       ROUND(CAST(tp.tp AS DOUBLE) / CAST(nc.n_cand AS DOUBLE), 6)
           AS precision,
       ROUND(CAST(tp.tp AS DOUBLE) / CAST(nt.n_truth AS DOUBLE), 6)
           AS recall
FROM tp CROSS JOIN nc CROSS JOIN nt
""")
