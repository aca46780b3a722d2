"""LLM-pipeline wave 5: dataset-shaping operators — document chunking
(fixed window + overlap), deterministic hash-shard assignment (the
"global shuffle" a training run needs, without a global sort), and a
bigram language-model profile (smoothed conditional log-probs). All
exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import tokens
from ..registry import register

#: Chunk window / stride (tokens). 64/48 = 16-token overlap between
#: consecutive chunks, the usual "context carry-over" shape.
CHUNK_SIZE = 64
CHUNK_STRIDE = 48

#: Number of training shards for the deterministic hash shuffle.
N_SHARDS = 64

_HEX = "0123456789abcdef"


@register(
    "q_llm_chunk_docs",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    c AS (
      SELECT doc_id, toks, CAST(i AS INT) AS start,
             CAST((i - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_id
      FROM t, unnest(range(1, greatest(len(toks), 1) + 1,
                           {CHUNK_STRIDE})) AS u(i)
    )
    SELECT doc_id, chunk_id,
           array_to_string(toks[start:start + {CHUNK_SIZE - 1}], ' ')
             AS chunk_text,
           CAST(least({CHUNK_SIZE}, len(toks) - start + 1) AS BIGINT)
             AS n_tokens
    FROM c
    """,
)
def q_llm_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window document chunking: each doc's tokens cut into
    CHUNK_SIZE-token chunks every CHUNK_STRIDE tokens (16-token
    overlap), the standard pretraining-context preparation step.

    Scale: pure generator + higher-order functions — sequence() start
    positions, posexplode, slice — all codegen, no shuffle at all:
    chunking is embarrassingly parallel per input split, so the plan
    is scan -> project -> generate regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("toks"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    c = t.select(
        "doc_id", "toks", F.posexplode(starts).alias("chunk_id", "start")
    )
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(
            F.slice(F.col("toks"), F.col("start"), F.lit(CHUNK_SIZE)), " "
        ).alias("chunk_text"),
        F.least(
            F.lit(CHUNK_SIZE), F.size("toks") - F.col("start") + F.lit(1)
        ).cast("long").alias("n_tokens"),
    )


@register(
    "q_llm_global_shuffle",
    oracle=f"""
    WITH h AS (SELECT md5(CAST(doc_id AS VARCHAR)) AS h, n_chars
               FROM documents),
    s AS (
      SELECT ((instr('{_HEX}', h[1:1]) - 1) * 16
            + (instr('{_HEX}', h[2:2]) - 1)) % {N_SHARDS} AS shard,
             h, n_chars
      FROM h
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(h) AS min_hash, MAX(h) AS max_hash
    FROM s GROUP BY 1
    """,
)
def q_llm_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training shuffle: every document is assigned to
    one of N_SHARDS shards by the first byte of md5(doc_id) — the
    "global shuffle" a data loader needs, reproducible across runs
    and engines. Output is the per-shard manifest (doc count, byte
    mass, hash range) a writer would use to emit shard files.

    Scale: a global ORDER BY random() is a full-corpus range sort;
    hash-sharding needs none of it — one hash projection (codegen)
    plus a {N_SHARDS}-key aggregation. Writing the shards afterwards
    is `partitionBy(shard)` with files internally ordered by the same
    md5, so the training order is fixed without any global sort."""
    d = load_table(spark, sf_dir, "documents")
    hexval = (
        lambda i: F.instr(F.lit(_HEX), F.substring("h", i, 1)) - F.lit(1)
    )
    s = d.select(
        F.md5(F.col("doc_id").cast("string")).alias("h"), "n_chars"
    ).withColumn(
        "shard", ((hexval(1) * 16 + hexval(2)) % N_SHARDS).cast("long")
    )
    return s.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("h").alias("min_hash"),
        F.max("h").alias("max_hash"),
    )


@register(
    "q_llm_bigram_lm",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    bg AS (
      SELECT toks[CAST(i - 1 AS INT)] AS w1, toks[CAST(i AS INT)] AS w2
      FROM t, unnest(range(2, len(toks) + 1)) AS u(i)
      WHERE len(toks) >= 2
    ),
    uni AS (SELECT COUNT(DISTINCT tok) AS v
            FROM (SELECT unnest(toks) AS tok FROM t)),
    c AS (SELECT w1, w2, COUNT(*) AS cnt FROM bg GROUP BY 1, 2),
    cw AS (SELECT w1, w2, cnt,
                  SUM(cnt) OVER (PARTITION BY w1) AS cnt_w1
           FROM c)
    SELECT w1, w2, CAST(cnt AS BIGINT) AS cnt,
           ROUND(ln((cnt + 1.0) / (cnt_w1 + (SELECT v FROM uni))), 6)
             AS logp
    FROM cw
    ORDER BY cnt DESC, w1, w2 LIMIT 200
    """,
)
def q_llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model profile: corpus bigram counts with
    add-one-smoothed conditional log-probabilities
    ln((c(w1,w2)+1) / (c(w1,·)+V)) — the classical LM signal used for
    perplexity-style quality filtering; top-200 bigrams by count
    (count-then-lexicographic tiebreak, deterministic cross-engine).

    Scale: bigrams come from one higher-order transform over each
    token array (no self-join, no per-doc window); counting shuffles
    only (w1, w2) pairs with map-side partial aggregation. The
    follower-mass window partitions by w1 — group sizes are bounded
    by vocabulary fan-out, not corpus size. V is a 1-row broadcast."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(tokens("text").alias("toks"))
    bg = (
        t.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> named_struct('w1', toks[i - 1], 'w2', toks[i]))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    c = bg.groupBy("w1", "w2").agg(F.count("*").alias("cnt"))
    cw = c.withColumn(
        "cnt_w1", F.sum("cnt").over(Window.partitionBy("w1"))
    )
    v = t.select(F.explode("toks").alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    return (
        cw.crossJoin(F.broadcast(v))
        .select(
            "w1", "w2", "cnt",
            F.round(
                F.log((F.col("cnt") + F.lit(1.0))
                      / (F.col("cnt_w1") + F.col("v"))), 6
            ).alias("logp"),
        )
        .orderBy(F.desc("cnt"), "w1", "w2")
        .limit(200)
    )


#: Duplicate-passage window (tokens): non-overlapping, full windows only.
PASSAGE_LEN = 8


@register(
    "q_llm_dup_passages",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    c AS (
      SELECT doc_id, array_to_string(toks[i:i + {PASSAGE_LEN - 1}], ' ')
               AS passage
      FROM t, unnest(range(1, len(toks) - {PASSAGE_LEN} + 2,
                           {PASSAGE_LEN})) AS u(i)
      WHERE len(toks) >= {PASSAGE_LEN}
    )
    SELECT passage,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM c
    GROUP BY passage
    HAVING COUNT(DISTINCT doc_id) > 1
    """,
)
def q_llm_dup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated passages: non-overlapping
    PASSAGE_LEN-token windows that appear verbatim in more than one
    document — the passage-level complement of whole-document dedup
    (boilerplate headers/footers/license blocks at corpus scale).

    Scale: explode is per-doc (no shuffle); the one shuffle groups by
    passage text. Passages are short fixed-length strings, so the
    group key is bounded; a skewed boilerplate passage is exactly what
    the query EXISTS to find and lands in one partition as a count,
    not a join — no quadratic risk anywhere (contrast: pairing docs
    by shared passage would square the boilerplate bucket)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("toks"))
    starts = F.sequence(
        F.lit(1), F.size("toks") - F.lit(PASSAGE_LEN) + F.lit(1), F.lit(PASSAGE_LEN)
    )
    c = (
        t.filter(F.size("toks") >= PASSAGE_LEN)
        .select("doc_id", "toks", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            F.array_join(
                F.slice("toks", F.col("start"), F.lit(PASSAGE_LEN)), " "
            ).alias("passage"),
        )
    )
    return (
        c.groupBy("passage")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") > 1)
    )


@register(
    "q_llm_corpus_prep",
    oracle="""
    WITH stats AS (
      SELECT doc_id, text, n_chars,
             len(string_split(text, ' '))                 AS n_tok,
             len(list_distinct(string_split(text, ' ')))  AS n_typ
      FROM documents
    ),
    quality AS (
      SELECT doc_id, text, CAST(n_tok AS BIGINT) AS n_tokens
      FROM stats
      WHERE n_chars BETWEEN 100 AND 500
        AND n_tok >= 20
        AND CAST(n_typ AS DOUBLE) / n_tok >= 0.4
    ),
    dedup AS (
      SELECT MIN(doc_id) AS doc_id, MIN(n_tokens) AS n_tokens
      FROM quality GROUP BY sha256(text)
    ),
    o AS (
      SELECT doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tokens
                  AS BIGINT) AS start_offset
      FROM dedup
    )
    SELECT doc_id, n_tokens, start_offset,
           CAST(floor(start_offset / 512) AS BIGINT) AS bin_id,
           CAST(floor((start_offset + n_tokens - 1) / 512) AS BIGINT) AS bin_end
    FROM o
    """,
)
def q_llm_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus preparation in one plan — the funnel a
    training run actually executes: quality filter (char bounds, min
    tokens, unique-token ratio) → exact dedup (sha2 content hash,
    keep the smallest doc_id per group) → global sequence packing
    (512-token budget, distributed prefix sum).

    Composes the standalone operators (q_llm_doc_quality,
    q_llm_exact_dedup, q_llm_pack_sequences) so their individually
    verified semantics chain into one artifact: (doc_id, n_tokens,
    start_offset, bin_id, bin_end) for every KEPT document.

    Scale: the filter prunes at the scan; dedup shuffles 32-byte
    digests, never text; packing is the two-phase distributed prefix
    sum with O(num_partitions) driver state. No stage touches more
    than the surviving rows."""
    from ..operators.packing import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    stats = d.select(
        "doc_id",
        "text",
        "n_chars",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_typ"),
    )
    uniq = F.col("n_typ").cast("double") / F.col("n_tok")
    quality = stats.filter(
        F.col("n_chars").between(100, 500) & (F.col("n_tok") >= 20) & (uniq >= 0.4)
    ).select("doc_id", "text", F.col("n_tok").cast("long").alias("n_tokens"))
    dedup = (
        quality.groupBy(F.sha2("text", 256))
        .agg(F.min("doc_id").alias("doc_id"), F.min("n_tokens").alias("n_tokens"))
        .select("doc_id", "n_tokens")
    )
    return pack_sequences(dedup, budget=512)
