"""Round-8 wave 140: the corpus-preparation FUNNEL — the capstone
composition query tying the LLM-pipeline family together: raw corpus
→ exact dedup → near-dup dedup → quality gate → decontamination, one
row per stage with surviving docs/tokens and the share of the
original corpus. Production teams read exactly this table after every
pipeline run; each stage reuses the semantics (and for near-dup, the
verbatim oracle SQL) of the standalone queries, so the funnel is
exactly DuckDB-oracled end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import normalized_text, tokens
from ..registry import ORACLES, register, set_oracle

from .llm_pipeline2 import q_llm_ngram_jaccard

#: minimum surviving token count for the quality gate.
MIN_TOKENS = 30

#: held-out "test set": every 97th document.
TEST_MOD = 97


@register("q_llm_pipeline_funnel")
def q_llm_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-prep funnel: (0) raw corpus; (1) exact dedup — keep the
    smallest doc_id per lowercased/trimmed text; (2) near-dup dedup —
    drop the larger id of every exact-Jaccard near-dup pair (the
    q_llm_ngram_jaccard candidates, threshold 0.05); (3) quality gate
    — ≥{MIN_TOKENS} tokens; (4) decontamination — remove the held-out
    docs (doc_id % {TEST_MOD} = 0) AND any doc sharing an 8-token head
    prefix with one. One row per stage: docs, tokens, doc share of
    the raw corpus.

    Scale: each stage is a hash aggregate or a digest/pair anti-join
    at doc grain — the same shapes the standalone queries pinned at
    sf10; composing them adds no new shuffle class. The whole funnel
    reads the corpus text once."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.size(tokens("text")).cast("long").alias("n_toks")
    )

    # stage 1: exact dedup (keep-min per normalized text)
    keep1 = (
        d.groupBy(normalized_text(F.col("text")).alias("norm"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # stage 2: near-dup dedup (drop the larger id of each pair);
    # pinned eagerly — stages 2-4 all sit on this lineage, and without
    # the checkpoint each stage aggregate re-runs the whole candidate-
    # verify pair pipeline (plan audit: 41 broadcast joins -> 5)
    pairs = q_llm_ngram_jaccard(spark, sf_dir)
    losers = (
        pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        .localCheckpoint(eager=True)
    )

    # stages 3-4 inputs: quality gate is a predicate; decontamination
    # removes held-out docs (doc_id % TEST_MOD = 0) and 8-token-head
    # prefix matches against them
    prefix = F.array_join(F.slice(tokens("text"), 1, 8), " ")
    test_prefixes = (
        d.where(F.col("doc_id") % TEST_MOD == 0)
        .select(prefix.alias("pfx")).distinct()
    )

    # ---- stage statistics in ONE corpus pass (r11) ----
    # The funnel's five stages chain on one lineage; the previous form
    # unioned five df.agg() calls, re-running the exact-dedup subtree
    # once per stage (d scanned 6×). Stage membership is monotone, so
    # mark each doc with per-stage survival FLAGS (the semi/anti joins
    # become left joins + null tests — row-identical) and fold ALL
    # stage counts into one aggregate row, then stack() it into the
    # 5-row funnel.
    f = (
        d.withColumn("pfx", prefix)
        .join(keep1.withColumn("_k", F.lit(1)), "doc_id", "left")
        .join(losers.withColumn("_l", F.lit(1)), "doc_id", "left")
        .join(
            F.broadcast(test_prefixes.withColumn("_p", F.lit(1))),
            "pfx", "left",
        )
    )
    in1 = F.col("_k").isNotNull()
    in2 = in1 & F.col("_l").isNull()
    in3 = in2 & (F.col("n_toks") >= MIN_TOKENS)
    in4 = in3 & (F.col("doc_id") % TEST_MOD != 0) & F.col("_p").isNull()
    agg = f.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("n_toks").alias("t0"),
        *[
            c
            for i, cond in ((1, in1), (2, in2), (3, in3), (4, in4))
            for c in (
                F.sum(F.when(cond, 1).otherwise(0)).alias(f"n{i}"),
                F.sum(F.when(cond, F.col("n_toks")).otherwise(0)).alias(f"t{i}"),
            )
        ],
    )
    names = ["raw", "exact_dedup", "neardup_dedup", "quality_gate",
             "decontaminated"]
    stack_args = ", ".join(
        f"CAST({i} AS BIGINT), '{names[i]}', n{i}, t{i}, "
        f"ROUND(CAST(n{i} AS DOUBLE) / n0, 6)"
        for i in range(5)
    )
    return (
        agg.select(
            F.expr(
                f"stack(5, {stack_args}) AS "
                "(stage, stage_name, n_docs, n_tokens, doc_share)"
            )
        )
        .orderBy("stage")
    )


set_oracle("q_llm_pipeline_funnel", f"""
WITH pairs AS ({ORACLES["q_llm_ngram_jaccard"]}),
d AS (
    SELECT doc_id, text,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
    FROM documents),
keep1 AS (
    SELECT MIN(doc_id) AS doc_id
    FROM d GROUP BY lower(trim(text))),
s1 AS (SELECT d.* FROM d JOIN keep1 USING (doc_id)),
losers AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
s2 AS (SELECT s1.* FROM s1 ANTI JOIN losers USING (doc_id)),
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
    SELECT 0 AS stage, 'raw' AS stage_name,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens FROM d
    UNION ALL
    SELECT 1, 'exact_dedup', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_toks) AS BIGINT) FROM s1
    UNION ALL
    SELECT 2, 'neardup_dedup', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_toks) AS BIGINT) FROM s2
    UNION ALL
    SELECT 3, 'quality_gate', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_toks) AS BIGINT) FROM s3
    UNION ALL
    SELECT 4, 'decontaminated', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_toks) AS BIGINT) FROM s4),
n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM d)
SELECT CAST(stage AS BIGINT) AS stage, stage_name, n_docs, n_tokens,
       ROUND(CAST(n_docs AS DOUBLE) / n0.n0, 6) AS doc_share
FROM stages CROSS JOIN n0
ORDER BY stage
""")
