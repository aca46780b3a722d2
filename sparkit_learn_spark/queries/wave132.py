"""Round-8 wave 132: exact-substring (sliding-window) dedup — the
Lee et al. 2022 "Deduplicating Training Data Makes Language Models
Better" family: verbatim >=L-token spans repeated across documents,
at EVERY offset (the sliding complement of q_llm_dup_passages'
non-overlapping windows) — plus the mini-batch KMeans query surfacing
the r8 incremental estimator path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import tokens
from ..registry import register

#: window length in tokens — long enough that a shared window is
#: near-certain copying, short enough that the fixture's 1-token-edit
#: near-dups still share many windows
WIN = 10


@register(
    "q_llm_substring_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    w AS (
      SELECT doc_id, array_to_string(toks[i:i + {WIN - 1}], ' ') AS win
      FROM t, unnest(range(1, len(toks) - {WIN} + 2)) AS u(i)
      WHERE len(toks) >= {WIN}),
    dupw AS (
      SELECT win FROM w GROUP BY win
      HAVING COUNT(DISTINCT doc_id) > 1),
    per AS (
      SELECT w.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(SUM(CASE WHEN d.win IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS dup_windows
      FROM w LEFT JOIN dupw d ON d.win = w.win
      GROUP BY w.doc_id)
    SELECT doc_id, n_windows, dup_windows,
           ROUND(CAST(dup_windows AS DOUBLE) / n_windows, 6) AS dup_rate
    FROM per
    WHERE dup_windows > 0
    ORDER BY dup_rate DESC, doc_id
    LIMIT 15
    """,
)
def q_llm_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication coverage (Lee et al. 2022,
    arXiv:2107.06499 — the dedup that most improves LM quality):
    every {WIN}-token window at EVERY offset, a window counted
    duplicated when it appears verbatim in more than one document;
    per-doc duplicated-window rate, worst 15 docs. The sliding form
    catches copied spans at arbitrary alignment, which
    q_llm_dup_passages' stride-{WIN} windows can miss.

    Scale: explode is per-doc (tokens-per-doc windows, no shuffle);
    the dup-window table is built by ONE hash aggregate on the window
    text and joined back semi-style — a boilerplate window that
    appears millions of times is one aggregate row, never a pair
    join. At 100 TB the window string would be replaced by its
    64-bit rolling hash (same plan shape, 8-byte keys); the string
    key keeps the fixture oracle exact."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("toks"))
    w = (
        t.filter(F.size("toks") >= WIN)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("toks") - F.lit(WIN - 1))
            ).alias("i"),
            "toks",
        )
        .select(
            "doc_id",
            F.array_join(F.slice("toks", F.col("i"), WIN), " ").alias("win"),
        )
    )
    # per-window duplication in ONE pass: COUNT(DISTINCT doc_id)>1 over
    # a window group ⟺ min(doc_id) ≠ max(doc_id) over the same group —
    # so the window table is built and shuffled ONCE (by win) instead
    # of aggregated separately (2 distinct-exchanges) and then joined
    # back against a second full build of itself (guide §2.4)
    wwin = Window.partitionBy("win")
    per = (
        w.select(
            "doc_id",
            (F.min("doc_id").over(wwin) != F.max("doc_id").over(wwin))
            .cast("long").alias("_dup"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("_dup").alias("dup_windows"),
        )
    )
    return (
        per.filter(F.col("dup_windows") > 0)
        .select(
            "doc_id", "n_windows", "dup_windows",
            F.round(
                F.col("dup_windows").cast("double") / F.col("n_windows"), 6
            ).alias("dup_rate"),
        )
        .orderBy(F.col("dup_rate").desc(), "doc_id")
        .limit(15)
    )


@register(
    "q_llm_substring_savings",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
               FROM documents),
    w AS (
      SELECT doc_id, source,
             array_to_string(toks[i:i + {WIN - 1}], ' ') AS win
      FROM t, unnest(range(1, len(toks) - {WIN} + 2)) AS u(i)
      WHERE len(toks) >= {WIN}),
    g AS (SELECT win, CAST(COUNT(*) AS BIGINT) AS occ FROM w
          GROUP BY win)
    SELECT w.source,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN g.occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_occurrences,
           CAST(COUNT(DISTINCT CASE WHEN g.occ > 1 THEN w.win END)
                AS BIGINT) AS dup_distinct
    FROM w JOIN g ON g.win = w.win
    GROUP BY w.source
    ORDER BY w.source
    """,
)
def q_llm_substring_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impact side of the sliding-window dedup: per source, how many
    window occurrences sit in corpus-repeated spans (dup_occurrences)
    vs how many distinct repeated windows exist (dup_distinct) — the
    measurement that justifies running span removal on a source
    before training (occurrence inflation >> distinct count means a
    few boilerplate spans dominate).

    Scale: window grain aggregate (one shuffle on the window key) +
    a key-grain join back; both sides collapse map-side before the
    exchange. Repetition here counts ALL occurrences (within-doc
    too), matching the removal step's token accounting."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "source", tokens("text").alias("toks"))
    w = (
        t.filter(F.size("toks") >= WIN)
        .select(
            "doc_id", "source",
            F.explode(
                F.sequence(F.lit(1), F.size("toks") - F.lit(WIN - 1))
            ).alias("i"),
            "toks",
        )
        .select(
            "doc_id", "source",
            F.array_join(F.slice("toks", F.col("i"), WIN), " ").alias("win"),
        )
    )
    # occurrence counts via a window COUNT(*) over the win partition —
    # one build + one shuffle of the window table instead of an
    # aggregate + join-back against a second full build (guide §2.4)
    return (
        w.select(
            "source", "win",
            F.count(F.lit(1)).over(Window.partitionBy("win")).alias("occ"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("occ") > 1).cast("bigint")).alias("dup_occurrences"),
            F.countDistinct(
                F.when(F.col("occ") > 1, F.col("win"))
            ).alias("dup_distinct"),
        )
        .orderBy("source")
    )


@register("q_ml_kmeans_minibatch")  # rows-only: center trajectories are
# seed/init-dependent; the update rule is numpy-replica-asserted in
# tests/test_refit_parity.py
def q_ml_kmeans_minibatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mini-batch KMeans via the r8 incremental estimator path
    (ml/estimators.py SparkKMeans.partial_fit — StreamingKMeans-style
    cumulative center updates): the embeddings corpus split into two
    vec_id-parity batches fed through a partial_fit chain, output the
    final cluster sizes ranked desc (ids are init-dependent, sizes are
    the stable surface — same contract as q_ml_kmeans).

    Scale: each partial_fit is one distributed assign+sum pass
    (mapInPandas BLAS per batch, k x d driver state); the chain never
    re-reads earlier batches — the out-of-core fit path for corpora
    too large for multi-pass Lloyd's."""
    from pyspark.ml.functions import array_to_vector

    from ..ml.estimators import SparkKMeans

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>"))
        .alias("features"),
    )
    km = SparkKMeans(n_clusters=5, seed=42)
    km.partial_fit(e.filter(F.col("vec_id") % 2 == 0))
    km.partial_fit(e.filter(F.col("vec_id") % 2 == 1))
    pred = km.predict(e)
    sizes = pred.groupBy("prediction").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), F.col("prediction"))
    return sizes.select(
        F.row_number().over(w).cast("long").alias("size_rank"), "n"
    )
