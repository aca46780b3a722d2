"""LLM-pipeline wave 4: corpus hygiene — benchmark decontamination,
intra-document repetition scoring, PII redaction, domain-mixture
accounting. The filter/audit passes that run between dedup and
training. All exactly DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import shingles, tokens
from ..registry import register

#: The held-out source treated as the evaluation/benchmark set by
#: q_llm_decontaminate (pinned for the fixture; a real pipeline takes
#: the benchmark table as a second input).
BENCH_SOURCE = "src0"

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3,4}-[0-9]{4}"


@register(
    "q_llm_decontaminate",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
               FROM documents),
    s AS (
      SELECT DISTINCT doc_id, source,
             array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ') AS sh
      FROM t, unnest(range(1, len(toks) - 3)) AS u(i)
      WHERE len(toks) >= 5
    ),
    bench AS (SELECT DISTINCT sh, doc_id AS bench_id FROM s
              WHERE source = '{BENCH_SOURCE}'),
    train AS (SELECT doc_id, sh FROM s WHERE source <> '{BENCH_SOURCE}')
    SELECT train.doc_id,
           CAST(COUNT(DISTINCT train.sh) AS BIGINT) AS n_overlap_shingles,
           CAST(COUNT(DISTINCT bench.bench_id) AS BIGINT) AS n_bench_docs
    FROM train JOIN bench ON train.sh = bench.sh
    GROUP BY 1
    """,
)
def q_llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: for every training document, count
    5-gram shingles it shares with the held-out benchmark source and
    how many benchmark docs it hits — the contamination report a
    pipeline uses to drop eval-overlapping training data.

    Scale: the benchmark side is tiny relative to a 100 TB train
    corpus (eval sets are fixed-size), so its distinct-shingle index
    is BROADCAST — the train side joins without any shuffle of the
    corpus; the only aggregation keys on (train doc, shingle), which
    the contamination hits bound."""
    from ..catalog import spread_scan

    d = load_table(spark, sf_dir, "documents")
    # r12 (VERDICT r11 #5): tokenize+shingle ONCE — the bench and train
    # branches below each re-ran the full-corpus explode on the
    # single-partition fixture scan. Capped spread parallelizes the
    # one tokenize pass and the checkpoint hands both consumers an
    # 8-partition materialized index (full-32 spread loses — r11).
    # eager=True keeps the one-time index build in the bench's build_s
    # column, the same declared convention as q_llm_ngram_jaccard /
    # q_llm_setjoin_prefix since r11.
    s = (
        spread_scan(d, cap=8)
        .select("doc_id", "source", tokens("text").alias("toks"))
        .filter(F.size("toks") >= 5)
        .select(
            "doc_id", "source",
            F.explode(F.array_distinct(shingles(F.col("toks"), 5))).alias("sh"),
        )
        .localCheckpoint(eager=True)
    )
    bench = (
        s.filter(F.col("source") == BENCH_SOURCE)
        .select("sh", F.col("doc_id").alias("bench_id"))
        .distinct()
    )
    train = s.filter(F.col("source") != BENCH_SOURCE).select("doc_id", "sh")
    return (
        train.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sh").alias("n_overlap_shingles"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


@register(
    "q_llm_repetition",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 2 AS INT)], ' ') AS sh
      FROM t, unnest(range(1, len(toks) - 1)) AS u(i)
      WHERE len(toks) >= 3
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_distinct,
           ROUND(1 - CAST(COUNT(DISTINCT sh) AS DOUBLE) / COUNT(*), 6) AS rep_frac
    FROM s GROUP BY 1
    """,
)
def q_llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition score: fraction of 3-gram windows
    that are duplicates of an earlier window in the SAME document
    (1 − distinct/total) — the Gopher-style repetition filter that
    catches boilerplate loops and degenerate generations.

    Scale: explode + one aggregation keyed by doc_id; windows per doc
    are bounded by doc length, so no key can exceed a single
    document's size — skew-free by construction."""
    d = load_table(spark, sf_dir, "documents")
    s = (
        d.select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("doc_id", F.explode(shingles(F.col("toks"), 3)).alias("sh"))
    )
    return s.groupBy("doc_id").agg(
        F.count("*").alias("n_windows"),
        F.countDistinct("sh").alias("n_distinct"),
        F.round(
            1 - F.countDistinct("sh").cast("double") / F.count("*"), 6
        ).alias("rep_frac"),
    )


@register(
    "q_llm_pii_redact",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
           CAST(length(regexp_replace(regexp_replace(text,
                '{EMAIL_RE}', '<EMAIL>', 'g'),
                '{PHONE_RE}', '<PHONE>', 'g')) AS BIGINT) AS redacted_len
    FROM documents
    """,
)
def q_llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: count and redact email addresses and
    phone-number patterns (regex classes chosen to behave identically
    under Java regex and RE2). The synthetic fixture contains no PII
    (all counts 0 — the oracle still pins the expressions); crafted
    inputs with real matches are value-checked in
    tests/test_llm_pipeline.py.

    Scale: row-local regexp built-ins, zero shuffles, column-pruned
    scan."""
    d = load_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), 0))
        .cast("long").alias("n_phones"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


@register(
    "q_llm_domain_mix",
    oracle="""
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    )
    SELECT source, n_docs, n_tokens,
           ROUND(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (), 6)
             AS token_share
    FROM s
    """,
)
def q_llm_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture accounting: per-source document and token
    counts plus each source's share of total tokens — the table a
    data-mixing policy (e.g. up/down-weighting domains) is computed
    from.

    Scale: one distributed aggregation to source cardinality; the
    share window then runs over the POST-AGGREGATE frame (rows =
    distinct sources, a constant — the single-partition window is on
    a dimension-sized frame, never the data)."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens("text"))).cast("long").alias("n_tokens"),
    )
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(
        Window.partitionBy()
    )
    return s.select("source", "n_docs", "n_tokens",
                    F.round(share, 6).alias("token_share"))


@register(
    "q_llm_dedup_clusters",
    oracle="""
    WITH RECURSIVE t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ') AS sh
      FROM t, unnest(range(1, len(toks) - 3)) AS u(i)
      WHERE len(toks) >= 5
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON inter.doc_a = sa.doc_id
      JOIN sizes sb ON inter.doc_b = sb.doc_id
      WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.3
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, MIN(comp) AS cluster_id,
           node = MIN(comp) AS is_canonical
    FROM reach GROUP BY node
    """,
)
def q_llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END of the dedup funnel: exact-Jaccard near-dup pairs
    (≥ 0.3) → connected components → per-document cluster label +
    canonical-document flag (keep-one-per-cluster policy).

    Spark side: iterative min-label propagation (join + min-aggregate
    per round, lineage checkpointed — see operators/components.py);
    the oracle computes the same fixpoint as a recursive CTE
    (transitive min-reachable-id). Pair generation reuses the
    df-capped candidates-then-verify pipeline of q_llm_ngram_jaccard."""
    from ..operators.components import dedup_clusters
    from ..registry import all_queries

    pairs = (
        all_queries()["q_llm_ngram_jaccard"](spark, sf_dir)
        .filter(F.col("jaccard") >= 0.3)
        .select("doc_a", "doc_b")
    )
    return dedup_clusters(pairs)


@register(
    "q_llm_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    o AS (
      SELECT doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tokens
                  AS BIGINT) AS start_offset
      FROM t
    )
    SELECT doc_id, n_tokens, start_offset,
           CAST(floor(start_offset / 512) AS BIGINT) AS bin_id,
           CAST(floor((start_offset + n_tokens - 1) / 512) AS BIGINT) AS bin_end
    FROM o
    """,
)
def q_llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: documents laid end-to-end in id
    order, chunked into 512-token sequences — each doc gets its global
    token offset and the sequence range it spans (concat-and-chunk,
    computed at preprocessing time so the data loader is a pure range
    read).

    Scale: the global prefix sum is the classic single-task window
    trap; here it is the two-phase distributed form (range partition →
    parallel local cumsums → O(num_partitions) driver offsets →
    broadcast repair — operators/packing.py), the same contract as
    the distributed id assignment in operators/ids.py. The oracle is
    the single-window SQL form, identical by construction."""
    from ..operators.packing import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    return pack_sequences(toks, budget=512)


#: Per-source sampling rates for the resample op. Sources not listed
#: use DEFAULT_SAMPLE_RATE. Rates > 1 would mean upsampling
#: (duplication) — this operator implements the <=1 downsampling side;
#: upsampling is a cross-join with a replica range, same hash trick.
RESAMPLE_RATES = {"src0": 0.25, "src1": 0.5, "src2": 0.1}
DEFAULT_SAMPLE_RATE = 1.0


@register(
    "q_llm_domain_resample",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             CASE source WHEN 'src0' THEN 0.25 WHEN 'src1' THEN 0.5
                         WHEN 'src2' THEN 0.1 ELSE 1.0 END AS rate,
             (((instr('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[1:1]) - 1) * 16
             + (instr('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[2:2]) - 1)) * 256
             + ((instr('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[3:3]) - 1) * 16
             + (instr('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[4:4]) - 1)))
             / 65536.0 AS u
      FROM documents
    )
    SELECT doc_id, source, CAST(rate AS DOUBLE) AS rate
    FROM r WHERE u < rate
    """,
)
def q_llm_domain_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-domain downsampling — the APPLY step of a
    data-mixing policy (q_llm_domain_mix computes the table the rates
    come from): keep each doc iff uniform_hash(doc_id) < rate(source).
    Hash-based (md5 first 16 bits -> u in [0,1)), so the sample is
    reproducible across runs/engines and independent of partitioning —
    unlike rand()-based sampling, which no oracle could ever match.

    Scale: pure row-local projection + filter, no shuffle at all; the
    rate table is a literal CASE (dimension-sized — at 100 TB it would
    broadcast-join a rates dim instead, same plan shape)."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.lit(DEFAULT_SAMPLE_RATE)
    for src, r in sorted(RESAMPLE_RATES.items()):
        rate = F.when(F.col("source") == src, F.lit(r)).otherwise(rate)
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
         .cast("long") / F.lit(65536.0))
    return (
        d.select("doc_id", "source", rate.cast("double").alias("rate"), u.alias("u"))
        .filter(F.col("u") < F.col("rate"))
        .select("doc_id", "source", "rate")
    )
