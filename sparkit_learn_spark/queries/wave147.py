"""Round-9 wave 147: the INCREMENTAL corpus-prep funnel (VERDICT r8
#8) — the ingest-time contract the batch capstone (wave140) implies.

A production corpus is not rebuilt per run: new batches arrive against
a standing history. The funnel composes the registry's incremental
primitives in ingest order, one exactly-oracled row per stage:

  0 raw_batch        the incoming batch (doc_id % 7 = 0)
  1 exact_dedup      intra-batch keep-min per normalized-text sha256
                     + anti-join against the HISTORY digest set
                     (q_llm_dedup_incremental's two-stage contract)
  2 neardup_gate     8-head-token fingerprint anti-join vs history
                     fingerprints + earliest-arrival-per-fp within
                     the batch — EXACTLY the streaming ingest dedup
                     (streaming/transforms.neardup_dedup_stream);
                     batch≡stream parity incl. a two-trigger
                     checkpoint restart is asserted in
                     tests/test_ann_index.py::test_funnel_neardup_*
  3 quality_gate     ≥ MIN_TOKENS surviving tokens
  4 decontaminated   drop held-out docs (doc_id % 97 = 0) and any doc
                     sharing an 8-token head prefix with one

Scale: every stage is a digest/fingerprint anti-join or hash agg at
doc grain — 32-byte keys, text never shuffles past the projection;
the batch is ≪ history, so AQE broadcasts the batch side. The same
shapes wave140 pinned at sf10, applied to the ingest slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import tokens
from ..registry import register

#: incoming batch selector (matches q_llm_dedup_incremental).
BATCH_MOD = 7

#: minimum surviving token count (matches wave140's quality gate).
MIN_TOKENS = 30

#: held-out "test set" selector (matches wave140).
TEST_MOD = 97

#: the DuckDB form of streaming/transforms.neardup_fingerprint —
#: sha256 over the 8 normalized head tokens (the q_stream_neardup_dedup
#: oracle's expression, verbatim).
_FP_SQL = """sha256(array_to_string(
    (string_split_regex(
         regexp_replace(lower(trim(text)), '[^a-z0-9 ]', ' ', 'g'),
         ' +'))[1:8], ' '))"""


@register(
    "q_llm_pipeline_funnel_incremental",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, text,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
               sha256(lower(trim(text))) AS text_sha,
               {_FP_SQL} AS fp
        FROM documents),
    batch AS (SELECT * FROM d WHERE doc_id % {BATCH_MOD} = 0),
    history AS (SELECT * FROM d WHERE doc_id % {BATCH_MOD} <> 0),
    hist_sha AS (SELECT DISTINCT text_sha FROM history),
    intra AS (
        SELECT MIN(doc_id) AS doc_id FROM batch GROUP BY text_sha),
    s1 AS (
        SELECT b.* FROM batch b
        JOIN intra USING (doc_id)
        ANTI JOIN hist_sha h ON h.text_sha = b.text_sha),
    hist_fp AS (SELECT DISTINCT fp FROM history),
    fresh AS (
        SELECT s1.* FROM s1 ANTI JOIN hist_fp h ON h.fp = s1.fp),
    s2 AS (
        SELECT f.* FROM fresh f
        JOIN (SELECT MIN(doc_id) AS doc_id FROM fresh GROUP BY fp) k
        USING (doc_id)),
    s3 AS (SELECT * FROM s2 WHERE n_toks >= {MIN_TOKENS}),
    test_prefixes AS (
        SELECT DISTINCT array_to_string(
            (string_split(text, ' '))[1:8], ' ') AS pfx
        FROM d WHERE doc_id % {TEST_MOD} = 0),
    s4 AS (
        SELECT s3.* FROM (
            SELECT s3.*, array_to_string(
                (string_split(text, ' '))[1:8], ' ') AS pfx
            FROM s3 WHERE doc_id % {TEST_MOD} <> 0) s3
        ANTI JOIN test_prefixes t ON t.pfx = s3.pfx),
    stages AS (
        SELECT 0 AS stage, 'raw_batch' AS stage_name,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS n_tokens FROM batch
        UNION ALL
        SELECT 1, 'exact_dedup', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(n_toks) AS BIGINT) FROM s1
        UNION ALL
        SELECT 2, 'neardup_gate', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(n_toks) AS BIGINT) FROM s2
        UNION ALL
        SELECT 3, 'quality_gate', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(n_toks) AS BIGINT) FROM s3
        UNION ALL
        SELECT 4, 'decontaminated', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(n_toks) AS BIGINT) FROM s4),
    n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM batch)
    SELECT CAST(stage AS BIGINT) AS stage, stage_name, n_docs, n_tokens,
           ROUND(CAST(n_docs AS DOUBLE) / n0.n0, 6) AS batch_share
    FROM stages CROSS JOIN n0
    ORDER BY stage
    """,
)
def q_llm_pipeline_funnel_incremental(
        spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time funnel over the incoming batch (see module doc):
    each stage anti-joins the batch against standing-history keys —
    digests, fingerprints, held-out prefixes — so the marginal cost
    of admitting a batch is batch-sized, not corpus-sized. Stage 2 is
    the exact batch twin of the streaming near-dup gate; the surviving
    set is restart-parity-tested in TRUE stream mode."""
    from ..streaming.transforms import neardup_fingerprint

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text",
        F.size(tokens("text")).cast("long").alias("n_toks"),
        F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("text_sha"),
        neardup_fingerprint(F.col("text")).alias("fp"),
    )
    batch = d.filter(F.col("doc_id") % BATCH_MOD == 0)
    history = d.filter(F.col("doc_id") % BATCH_MOD != 0)

    # stage 1: intra-batch keep-min per digest + history anti-join
    intra = batch.groupBy("text_sha").agg(F.min("doc_id").alias("doc_id"))
    s1 = (
        batch.join(intra.select("doc_id"), "doc_id")
        .join(history.select("text_sha").distinct(), "text_sha", "left_anti")
    )

    # stage 2: near-dup gate (stream semantics, batch twin) — pinned:
    # stages 2-4 and three stat aggregates all sit on this lineage
    fresh = s1.join(history.select("fp").distinct(), "fp", "left_anti")
    s2 = (
        fresh.join(
            fresh.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id"),
            "doc_id")
        .localCheckpoint(eager=True)
    )

    # stage 3: quality gate
    s3 = s2.where(F.col("n_toks") >= MIN_TOKENS)

    # stage 4: decontamination
    prefix = F.array_join(F.slice(tokens("text"), 1, 8), " ")
    test_prefixes = (
        d.where(F.col("doc_id") % TEST_MOD == 0)
        .select(prefix.alias("pfx")).distinct()
    )
    s4 = (
        s3.where(F.col("doc_id") % TEST_MOD != 0)
        .withColumn("pfx", prefix)
        .join(F.broadcast(test_prefixes), "pfx", "left_anti")
        .drop("pfx")
    )

    def stat(df: DataFrame, stage: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(stage).cast("long").alias("stage"),
            F.lit(name).alias("stage_name"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )

    n0 = batch.agg(F.count(F.lit(1)).alias("n0"))
    out = (
        stat(batch, 0, "raw_batch")
        .unionAll(stat(s1, 1, "exact_dedup"))
        .unionAll(stat(s2, 2, "neardup_gate"))
        .unionAll(stat(s3, 3, "quality_gate"))
        .unionAll(stat(s4, 4, "decontaminated"))
    )
    return (
        out.crossJoin(F.broadcast(n0))
        .select(
            "stage", "stage_name", "n_docs", "n_tokens",
            F.round(F.col("n_docs").cast("double") / F.col("n0"), 6)
            .alias("batch_share"),
        )
        .orderBy("stage")
    )
