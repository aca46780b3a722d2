"""Round-6 wave 33: simplified-silhouette clustering evaluation
(order-free exact centroids via decimal component sums), MDM
survivorship / golden-record construction over fingerprint clusters,
and asymmetric shingle containment (quote/subset detection). All
exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_ml_silhouette",
    oracle="""
    WITH comp AS (
        SELECT label, CAST(u.i AS BIGINT) AS dim,
               ROUND(CAST(SUM(CAST(embedding[CAST(u.i AS INT)]
                                   AS DECIMAL(38,12))) AS DOUBLE)
                     / COUNT(*), 6) AS c
        FROM embeddings,
             unnest(range(1, len(embedding) + 1)) AS u(i)
        GROUP BY label, u.i),
    cent AS (
        SELECT label AS cl, list(c ORDER BY dim) AS cvec
        FROM comp GROUP BY label),
    dists AS (
        SELECT e.vec_id, e.label, c.cl,
               ROUND(SQRT(list_sum(list_transform(
                   list_zip(e.embedding, c.cvec),
                   p -> (CAST(p[1] AS DOUBLE) - p[2])
                        * (CAST(p[1] AS DOUBLE) - p[2])))), 6) AS d
        FROM embeddings e CROSS JOIN cent c),
    ab AS (
        SELECT vec_id, label,
               MIN(CASE WHEN cl = label THEN d END) AS a,
               MIN(CASE WHEN cl <> label THEN d END) AS b
        FROM dists GROUP BY vec_id, label),
    s AS (
        SELECT label,
               CAST(ROUND(1e6 * (b - a) / GREATEST(a, b)) AS BIGINT)
                   AS si_u,
               CAST(ROUND(1e6 * a) AS BIGINT) AS a_u
        FROM ab)
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(si_u) / COUNT(*) / 1e6, 6) AS mean_silhouette,
           ROUND(SUM(a_u) / COUNT(*) / 1e6, 6) AS mean_intra_dist
    FROM s GROUP BY label
    """,
)
def q_ml_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette score per cluster label: each vector's
    cohesion a (distance to its own label centroid) vs separation b
    (distance to the nearest other centroid), s = (b−a)/max(a,b) —
    the O(n·k) clustering-quality metric (true silhouette is O(n²)).
    Exactness discipline: centroid component sums accumulate in
    DECIMAL(38,12) (float addition would be summation-order-
    dependent across partitions), centroids and distances round to
    6dp, and per-point silhouettes quantize to integer micro-units so
    the per-label mean is an exact integer sum.

    Scale: one component-grain aggregate (map-side combining) builds
    k·d centroids that broadcast; each vector computes k distances
    JVM-side (zip_with + ordered fold) — the same per-pass shape as
    distributed k-means scoring, no pairwise joins."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = (
        emb.select(
            "label", F.posexplode("embedding").alias("p", "x")
        )
        .groupBy("label", (F.col("p") + 1).alias("dim"))
        .agg(
            F.round(
                F.sum(F.col("x").cast("decimal(38,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("c")
        )
    )
    cent = comp.groupBy(F.col("label").alias("cl")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))),
            lambda s: s["c"],
        ).alias("cvec")
    )
    dist = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    "embedding",
                    "cvec",
                    lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ),
        6,
    )
    dists = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "cl", dist.alias("d")
    )
    ab = dists.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("cl") == F.col("label"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("cl") != F.col("label"), F.col("d"))).alias("b"),
    )
    s = ab.select(
        "label",
        F.round(
            1e6 * (F.col("b") - F.col("a")) / F.greatest("a", "b")
        )
        .cast("long")
        .alias("si_u"),
        F.round(1e6 * F.col("a")).cast("long").alias("a_u"),
    )
    return s.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.count("*").alias("n"),
        F.round(F.sum("si_u") / F.count("*") / 1e6, 6).alias(
            "mean_silhouette"
        ),
        F.round(F.sum("a_u") / F.count("*") / 1e6, 6).alias(
            "mean_intra_dist"
        ),
    )


@register(
    "q_er_golden_record",
    oracle="""
    WITH k AS (
        SELECT doc_id, text, source, n_chars,
               array_to_string(list_sort(list_distinct(
                   string_split(lower(text), ' '))), ' ') AS fkey
        FROM documents),
    clusters AS (
        SELECT fkey FROM k GROUP BY fkey HAVING COUNT(*) > 1),
    m AS (SELECT k.* FROM k JOIN clusters USING (fkey)),
    survived AS (
        SELECT fkey, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY fkey
                                  ORDER BY n_chars DESC, doc_id)
                   AS len_rank
        FROM m),
    src_counts AS (
        SELECT fkey, source, CAST(COUNT(*) AS BIGINT) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY fkey
                                  ORDER BY COUNT(*) DESC, source)
                   AS src_rank
        FROM m GROUP BY fkey, source)
    SELECT g.canonical_doc, g.n_members, g.total_chars,
           s.doc_id AS survived_doc, s.n_chars AS survived_chars,
           sc.source AS modal_source, sc.cnt AS modal_source_docs
    FROM (SELECT fkey, MIN(doc_id) AS canonical_doc,
                 CAST(COUNT(*) AS BIGINT) AS n_members,
                 CAST(SUM(n_chars) AS BIGINT) AS total_chars
          FROM m GROUP BY fkey) g
    JOIN survived s ON s.fkey = g.fkey AND s.len_rank = 1
    JOIN src_counts sc ON sc.fkey = g.fkey AND sc.src_rank = 1
    """,
)
def q_er_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship / golden-record construction: within each
    fingerprint-key duplicate cluster (sorted-token key, the ER rung
    above exact hash), apply attribute survival rules — LONGEST text
    wins (id tie-break), MOST FREQUENT source wins (lexicographic
    tie-break) — emitting one mastered record per cluster with its
    canonical id and provenance counts. The MDM merge step that
    follows any duplicate detection.

    Scale: all rules are per-cluster windows/aggregates keyed by the
    fingerprint (shuffle the key digest, not the text, at 100 TB);
    rule evaluation is rank-1 selection, not pairwise comparison —
    linear in cluster membership."""
    d = load_table(spark, sf_dir, "documents")
    fkey = F.array_join(
        F.array_sort(F.array_distinct(F.split(F.lower(F.col("text")), " "))),
        " ",
    )
    k = d.select("doc_id", "source", "n_chars", fkey.alias("fkey"))
    clusters = (
        k.groupBy("fkey")
        .agg(
            F.count("*").alias("n_members"),
            F.min("doc_id").alias("canonical_doc"),
            F.sum("n_chars").alias("total_chars"),
        )
        .filter(F.col("n_members") > 1)
    )
    m = k.join(clusters.select("fkey"), "fkey")
    wlen = Window.partitionBy("fkey").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    survived = (
        m.select(
            "fkey",
            F.col("doc_id").alias("survived_doc"),
            F.col("n_chars").alias("survived_chars"),
            F.row_number().over(wlen).alias("len_rank"),
        )
        .filter(F.col("len_rank") == 1)
        .drop("len_rank")
    )
    src_counts = m.groupBy("fkey", "source").agg(F.count("*").alias("cnt"))
    wsrc = Window.partitionBy("fkey").orderBy(F.col("cnt").desc(), "source")
    modal = (
        src_counts.select(
            "fkey",
            F.col("source").alias("modal_source"),
            F.col("cnt").alias("modal_source_docs"),
            F.row_number().over(wsrc).alias("src_rank"),
        )
        .filter(F.col("src_rank") == 1)
        .drop("src_rank")
    )
    return (
        clusters.join(survived, "fkey")
        .join(modal, "fkey")
        .select(
            "canonical_doc",
            "n_members",
            "total_chars",
            "survived_doc",
            "survived_chars",
            "modal_source",
            "modal_source_docs",
        )
    )


@register(
    "q_llm_shingle_containment",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    s AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ')
                 AS sh
      FROM t, unnest(range(1, len(toks) - 3)) AS u(i)
      WHERE len(toks) >= 5),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
              FROM s GROUP BY doc_id),
    rare AS (SELECT sh FROM s GROUP BY sh
             HAVING COUNT(DISTINCT doc_id) <= 100),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      WHERE a.sh IN (SELECT sh FROM rare)),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM cands c
      JOIN s a ON a.doc_id = c.doc_a
      JOIN s b ON b.doc_id = c.doc_b AND b.sh = a.sh
      GROUP BY 1, 2)
    SELECT i.doc_a, i.doc_b, i.n_common,
           ROUND(CAST(i.n_common AS DOUBLE)
                 / LEAST(sa.n, sb.n), 6) AS containment
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.n_common AS DOUBLE) / LEAST(sa.n, sb.n) >= 0.5
    """,
)
def q_llm_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle CONTAINMENT: |A∩B| / min(|A|, |B|) ≥ 0.5 —
    the quote/subset detector. A short document wholly embedded in a
    long one scores near 1.0 here while its symmetric Jaccard stays
    low (the union is dominated by the long side), so this catches
    excerpt duplication that q_llm_ngram_jaccard structurally cannot.
    Same df-capped candidate generation (shared rare shingle) and
    one-pass intersection counting.

    NOTE on the candidate bound: a containment hit needs
    n_common ≥ 0.5·min(|A|,|B|) shared shingles, so unless the
    smaller document consists almost entirely of viral (df>100)
    shingles — boilerplate the dedup ladder removes upstream — the
    pair shares a rare shingle and is generated. Same recall cap
    contract as the Jaccard query, mirrored exactly by the oracle.

    Scale: Σ min(bucket, df_cap)² candidate work + one aggregate at
    pair grain — never n²; sizes broadcast."""
    from ..catalog import spread_scan
    from ..operators.dedup import shingle_index, shingle_pair_common_counts

    d = load_table(spark, sf_dir, "documents")
    # r12 capped spread ahead of the many-consumer checkpoint — see
    # q_llm_ngram_jaccard
    s = shingle_index(spread_scan(d, cap=8), k=5).localCheckpoint(eager=True)
    inter = shingle_pair_common_counts(s)
    sizes = s.groupBy("doc_id").agg(F.count("*").alias("n"))
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    cont = F.col("n_common").cast("double") / F.least("na", "nb")
    return (
        inter.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .filter(cont >= 0.5)
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.round(cont, 6).alias("containment"),
        )
    )
