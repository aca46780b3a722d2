"""LLM-pipeline wave 2: the remaining dedup family (SimHash, exact
n-gram Jaccard, embedding-cosine near-dup), text analysis (language
ID, rolling-hash fingerprint, BPE-ish token counting).

Dedup-family scale map (each attacks O(n²) differently):
  exact       — hash equality, one shuffle               (wave 1)
  minhash LSH — probabilistic bucket join                (wave 1)
  simhash     — 64-bit sketch, band join + Hamming       (this file)
  ngram       — exact Jaccard, candidates from inverted  (this file)
                shingle index (pairs sharing ≥1 shingle)
  embedding   — semantic near-dup at cosine ≥ τ          (this file)
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import shingles, tokens
from ..functions.vector import dot
from ..registry import register


@register("q_llm_simhash_dedup")  # rows-only: xxhash64 is Spark-specific
def q_llm_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: 64-bit sketch per doc (per-bit
    tf-weighted majority vote over xxhash64(term)), then candidate
    pairs from 4×16-bit band buckets with Hamming distance ≤ 8.

    Scale: the sketch is one aggregation (64 conditional sums —
    JVM-side, codegen'd); banding turns all-pairs into per-bucket
    joins exactly like MinHash LSH. No DuckDB oracle (xxhash64);
    pytest asserts determinism + crafted near-dup recall."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.xxhash64("term"))
    )
    # SQL-string expressions, not stacked Column operators: the 64
    # conditional sums cost ~7 py4j round-trips each as F.when chains
    # (~1.5 s of driver-side plan construction, measured); as parsed
    # strings each is ONE call and the whole sketch builds in ~0.1 s.
    # The resulting plan (and codegen) is identical.
    bit_sums = [
        F.expr(f"sum(IF((shiftright(h, {b}) & 1) = 1, tf, -tf)) AS b{b}")
        for b in range(64)
    ]
    # JVM-side shiftleft: bit 63 wraps to Long.MIN_VALUE (two's
    # complement sign bit) — a Python 1<<63 literal would overflow
    sketch_expr = " + ".join(
        f"IF(b{b} > 0, shiftleft(1L, {b}), 0L)" for b in range(64)
    )
    # persist the 16-byte/row sketch: the band self-join consumes it on
    # BOTH sides, and without materialization each side re-ran the
    # tokenize+explode+tf aggregate and the 64 conditional sums (the
    # same double-computation the phash twin had)
    sk = (
        tf.groupBy("doc_id")
        .agg(*bit_sums)
        .select("doc_id", F.expr(sketch_expr).alias("simhash"))
        .persist()
    )
    bands = sk.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                )
                for i in range(4)
            ])
        ).alias("bv"),
    ).select("doc_id", "simhash", "bv.band", "bv.val")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.val") == F.col("b.val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= 8)


@register(
    "q_llm_ngram_jaccard",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ') AS sh
      FROM t, unnest(range(1, len(toks) - 3)) AS u(i)
      WHERE len(toks) >= 5
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY doc_id),
    rare AS (SELECT sh FROM s GROUP BY sh HAVING COUNT(DISTINCT doc_id) <= 100),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      WHERE a.sh IN (SELECT sh FROM rare)
    ),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM cands c
      JOIN s a ON a.doc_id = c.doc_a
      JOIN s b ON b.doc_id = c.doc_b AND b.sh = a.sh
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b, i.n_common,
           ROUND(CAST(i.n_common AS DOUBLE)
                 / (sa.n + sb.n - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.05
    """,
)
def q_llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard similarity, candidates-then-verify:

      1. candidates — pairs sharing ≥1 NON-VIRAL shingle (document
         frequency ≤ DEFAULT_MAX_SHINGLE_DF; the cap keeps one
         boilerplate shingle from creating a quadratic bucket). The
         DuckDB oracle mirrors the cap exactly (rare/cands CTEs), so
         Spark and oracle agree at ANY scale, not just fixtures where
         no shingle is viral;
      2. verify — one-pass: the rare self-join's output is one row per
         shared rare shingle per pair, so aggregating it directly IS
         the exact intersection count (shared hot shingles are counted
         over the tiny hot slice and added back — see
         operators.dedup.shingle_pair_common_counts). No distinct +
         full-index re-join. (Measured at sf0.1: join-back verify
         2.05 s; per-doc collect_list + array_intersect 1.8× slower
         still; this one-pass form with the index checkpointed
         1.65 s.)

    Cost: Σ min(bucket, max_df)² over shingle buckets for candidates
    plus |candidates|·|shingles-per-doc| for verification — never n².
    The exact counterpart of the MinHash estimate."""
    from ..operators.dedup import shingle_index, shingle_pair_common_counts

    from ..catalog import spread_scan

    d = load_table(spark, sf_dir, "documents")
    # materialize the shingle index ONCE: three consumers (self-join
    # ×2 sides, sizes, hot slice) would each re-run tokenize+explode
    # otherwise. Measured at sf0.1: 2.9 s -> 1.65 s steady-state. At
    # cluster scale prefer persisting the index to storage (it is
    # corpus-sized; localCheckpoint pins executor storage and is lost
    # with an executor) — same plan, different materialization.
    # r12 (VERDICT r11 #5): spread the docs scan to a CAPPED partition
    # count before the checkpoint — tokenize+explode parallelizes and
    # every consumer reads 8 real partitions instead of 1, while the
    # r11 full-32 spread (reverted: 0.9 -> 2.2 s) overpaid per-task
    # overhead x consumers on 32 tiny partitions.
    s = shingle_index(spread_scan(d, cap=8), k=5).localCheckpoint(eager=True)
    inter = shingle_pair_common_counts(s)
    sizes = s.groupBy("doc_id").agg(F.count("*").alias("n"))
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        inter.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .filter(jac >= 0.05)
        .select("doc_a", "doc_b", "n_common", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "q_llm_embed_cosine_dedup",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) >= 0.4
    """,
)
def q_llm_embed_cosine_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup pairs: embedding cosine ≥ 0.4 (unit vectors ⇒
    dot), via the candidates-then-verify funnel the text dedup family
    uses — NOT an all-pairs join, and (r9) with a DISTINCT-VECTOR
    pre-group so bit-identical duplicates never enter the quadratic:

      0. group: bit-identical embeddings collapse to one
         representative (min vec_id; array-equality groupBy — exact,
         no hashing). Duplicate-heavy corpora (the sf10 fixture
         replicates every vector 100×; boilerplate embeddings at
         100 TB) pay LSH + BLAS only at DISTINCT-vector scale.
      1. candidates: random-projection LSH bucket join (the
         hand-rolled chunked-BLAS ann_lsh_neighbors, streaming its
         pair output through mapInPandas) over REPRESENTATIVES at
         euclidean radius √(2−2·0.4)·1.05 ≈ 1.15 (for unit vectors
         d² = 2−2·cos; the 5% pad absorbs non-unit norm drift),
         generous bucket_length and NO candidate cap so a near pair
         colliding in NONE of the 8 tables is vanishingly rare
         (recall 1.0 on all fixture scales — verified against the
         exact pair set in tests/test_ml.py).
      2. verify: exact dot product on the representative pairs only,
         keep sim ≥ 0.4.
      3. expand: member-pair output reconstructed by two JVM equi
         joins on group id (cross-group pairs) plus one self-join
         (intra-group pairs, sim = the group's self-dot — members are
         bit-identical, so this IS the oracle's per-pair dot). The
         quadratic true-pair OUTPUT still exists — it is the answer —
         but it streams through whole-stage-codegen joins, never
         through Python.

    Measured trade: pre-r9 the uncapped in-bucket enumeration ran the
    100×-replicated fixture's duplicates through BLAS — 3.54× of
    linear at sf10 (630 s; pre-r8 it Arrow-OOMed). With the distinct
    pre-group the BLAS work is constant in the duplication factor;
    what remains quadratic is the emitted pair set itself
    (output-bound, the q_llm_minhash_banded class). On corpora whose
    DISTINCT vectors are themselves LSH-dense, use q_llm_semdedup
    (√n-cell bounded quadratic) or the capped LSH (0.038× of linear)
    and accept their recall trade instead.

    Scale: candidates shuffle by bucket key (never all-pairs), verify
    joins vectors by id for ~|candidates| rows, expansion shuffles on
    group id. The plan contains no BroadcastNestedLoopJoin (asserted
    in tests/test_plans.py).

    PROBABILISTIC DEPENDENCY (deliberate): every emitted pair is
    exactly verified, so precision is 1.0 by construction, but a true
    pair missed by ALL 8 hash tables would be silently dropped —
    exact-oracle agreement hinges on empirical recall 1.0. The 5%
    radius pad + 8 tables makes a miss vanishingly rare at sim≥0.4;
    tests/test_scale_paths.py recomputes the exact pair set per
    fixture scale and asserts set equality, so a recall miss at a new
    scale/seed fails fast instead of surfacing as an oracle-hash
    mystery. Raise num_hash_tables if a future fixture trips it."""
    import math

    from ..operators.similarity import ann_lsh_neighbors

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # ---- 0. collapse bit-identical vectors ----
    # grp fans out five ways (membership, the LSH input, both verify
    # sides, self_sim) and its groupBy shuffles FULL embedding arrays —
    # persist the distinct-vector table so that array shuffle happens
    # once; membership (8 B/row) likewise feeds both expansion sides.
    grp = e.groupBy("embedding").agg(F.min("vec_id").alias("rep_id")).persist()
    membership = e.join(grp, "embedding").select("vec_id", "rep_id").persist()
    reps = grp.select(F.col("rep_id").alias("vec_id"), "embedding")

    # ---- 1-2. exact-recall LSH + verify, at distinct-vector scale ----
    radius = math.sqrt(2 - 2 * 0.4) * 1.05
    cands = (
        ann_lsh_neighbors(reps, radius=radius, bucket_length=2.0,
                          num_hash_tables=8, seed=42,
                          # recall 1.0 needs FULL in-bucket
                          # enumeration; no candidate cap here
                          bucket_cap=None)
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select(F.col("vec_id_a").alias("rep_a"), F.col("vec_id_b").alias("rep_b"))
        .distinct()
    )
    ra = reps.select(F.col("vec_id").alias("rep_a"), F.col("embedding").alias("va"))
    rb = reps.select(F.col("vec_id").alias("rep_b"), F.col("embedding").alias("vb"))
    rep_sims = (
        cands.join(ra, "rep_a").join(rb, "rep_b")
        .filter(dot("va", "vb") >= 0.4)
        .select("rep_a", "rep_b", dot("va", "vb").alias("sim"))
    )

    # ---- 3. expand back to member pairs ----
    ma = membership.select(F.col("vec_id").alias("vec_a"),
                           F.col("rep_id").alias("rep_a"))
    mb = membership.select(F.col("vec_id").alias("vec_b"),
                           F.col("rep_id").alias("rep_b"))
    cross = (
        rep_sims.join(ma, "rep_a").join(mb, "rep_b")
        .select(F.least("vec_a", "vec_b").alias("vec_a"),
                F.greatest("vec_a", "vec_b").alias("vec_b"), "sim")
    )
    # intra-group pairs: members are bit-identical, sim = self-dot
    self_sim = reps.select(F.col("vec_id").alias("rep_a"),
                           dot("embedding", "embedding").alias("sim"))
    intra = (
        ma.join(mb.withColumnRenamed("rep_b", "rep_a"), "rep_a")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .join(self_sim, "rep_a")
        .filter(F.col("sim") >= 0.4)
        .select("vec_a", "vec_b", "sim")
    )
    return cross.unionAll(intra).select(
        "vec_a", "vec_b", F.round("sim", 6).alias("sim"))


@register(
    "q_llm_lang_id",
    oracle="""
    WITH dt AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY 1, 2
    ),
    lt AS (
      SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY 1, 2
    ),
    langs AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
    vocab AS (SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v FROM dt),
    totals AS (SELECT lang, SUM(c) AS total FROM lt GROUP BY 1),
    grid AS (
      SELECT l.lang, t.term,
             ln((COALESCE(lt.c, 0) + 1)
                / (tot.total + vb.v)) AS logp
      FROM (SELECT DISTINCT term FROM dt) t
      CROSS JOIN langs l
      LEFT JOIN lt ON lt.lang = l.lang AND lt.term = t.term
      JOIN totals tot ON tot.lang = l.lang
      CROSS JOIN vocab vb
    ),
    scores AS (
      SELECT dt.doc_id, g.lang,
             SUM(dt.tf * g.logp)
               + ANY_VALUE(ln(l.n_docs / (SELECT SUM(n_docs) FROM langs))) AS score
      FROM dt JOIN grid g ON dt.term = g.term
      JOIN langs l ON l.lang = g.lang
      GROUP BY 1, 2
    )
    SELECT doc_id, lang AS pred_lang, ROUND(score, 4) AS score
    FROM (SELECT doc_id, lang, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY round(score, 6) DESC, lang) AS rn
          FROM scores)
    WHERE rn = 1
    """,
)
def q_llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via a self-trained word-n-gram Naive Bayes profile:
    per-language term log-probabilities (+1 smoothing) + doc-frequency
    prior, argmax per document (score rounded before argmax, language
    tiebreak — deterministic across engines).

    Scale: profiles are (lang × vocab)-sized DataFrames (broadcast);
    scoring is one join + one aggregation over exploded tokens. The
    train corpus here is the table itself; in production the profile
    table would be a fixed dimension input."""
    d = load_table(spark, sf_dir, "documents")
    # r11 negative result (guide §1.1): catalog.spread_scan on this
    # scan measured SLOWER (1.29 -> 1.92 s interleaved A/B) — dt, lt
    # and vt are three consumers of the exploded lineage, and each
    # re-reads 32 tiny partitions with per-task overhead; the spread
    # only pays off where one heavy JVM map dominates a single
    # consumer (q_llm_lsh_bucket_stats).
    toks = d.select("doc_id", "lang", F.explode(tokens("text")).alias("term"))
    # dt and lt are independent aggregations over the same exploded
    # lineage; Spark recomputes the (cheap, columnar) scan per branch.
    # Benchmarked at sf0.1: this branch-recompute form runs ~1.2 s;
    # persisting the post-shuffle dt/lt aggregates instead was 3.5x
    # SLOWER (4.2 s — blocking materialization + cache-read overhead
    # dominates the re-scan it saves). At 100 TB persist `toks` (the
    # pre-shuffle explode) if the scan itself becomes the bottleneck.
    dt = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    lt = toks.groupBy("lang", "term").agg(F.count("*").alias("c"))
    langs = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    n_total = d.count()  # one scalar
    # r11: persist the VOCABULARY frame (distinct terms — tiny, ~30k
    # single-string rows), not the doc×term aggregates the note above
    # rejects: the vocab_size scalar AND the grid's distinct-term side
    # both read it, which previously re-ran the full explode+distinct
    # once each (exec 2.50 -> 1.66 s, build 7.2 -> 3.1 s at sf0.1,
    # best-of-4 warm).
    vt = dt.select("term").distinct().persist()
    vocab_size = vt.count()  # one scalar, materializes vt
    totals = lt.groupBy("lang").agg(F.sum("c").alias("total"))
    grid = (
        vt
        .crossJoin(F.broadcast(langs.select("lang")))
        .join(lt, ["lang", "term"], "left")
        .join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "term",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + 1)
                / (F.col("total") + float(vocab_size))
            ).alias("logp"),
        )
    )
    prior = langs.select(
        "lang", F.log(F.col("n_docs") / float(n_total)).alias("prior")
    )
    scores = (
        dt.join(F.broadcast(grid), "term")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("tf") * F.col("logp")).alias("loglik"))
        .join(F.broadcast(prior), "lang")
        .select("doc_id", "lang", (F.col("loglik") + F.col("prior")).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.round("score", 6).desc(), "lang")
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"), F.round("score", 4).alias("score"))
    )


@register(
    "q_llm_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id,
             md5(array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ')) AS h
      FROM t, unnest(range(1, len(toks) - 3)) AS u(i)
      WHERE len(toks) >= 5
    )
    SELECT doc_id, MIN(h) AS fingerprint, CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM s GROUP BY doc_id
    """,
)
def q_llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint via rolling 5-token windows: hash every
    window (the rolling-hash pass), keep the minimum digest — a
    1-permutation MinHash/winnowing fingerprint. Equal fingerprints ⇒
    shared rarest window ⇒ near-dup candidates; fingerprints are
    32-hex strings, so downstream dedup shuffles digests, not text.
    md5 chosen for bit-exact cross-engine parity."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") >= 5)
        .select("doc_id", F.explode(shingles(F.col("toks"), 5)).alias("sh"))
        .groupBy("doc_id")
        .agg(F.min(F.md5("sh")).alias("fingerprint"), F.count("*").alias("n_windows"))
    )


@register(
    "q_llm_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS n_bpe_tokens,
           CAST(len(string_split(text, ' ')) AS BIGINT)                    AS n_ws_tokens,
           CAST(n_chars AS BIGINT)                                         AS n_chars,
           ROUND(CAST(n_chars AS DOUBLE)
                 / len(regexp_extract_all(text, '\\w+|[^\\w\\s]')), 6)     AS chars_per_token
    FROM documents
    """,
)
def q_llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex
    (word-runs | single punctuation) alongside whitespace counts —
    the standard cheap proxy for LLM token budgeting. Pure regexp
    built-ins; zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0)
    return d.select(
        "doc_id",
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
        F.size(tokens("text")).cast("long").alias("n_ws_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(F.col("n_chars").cast("double") / F.size(bpe), 6).alias("chars_per_token"),
    )


@register("q_llm_minhash_banded")  # rows-only: xxhash64 salts are engine-specific
def q_llm_minhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIGH-PRECISION banded MinHash: num_perm=64, band_rows=4 →
    16 bands of 4 rows. P(candidate) = 1−(1−s⁴)¹⁶ — steeper than the
    default q_llm_minhash_dedup (band_rows=2): near-exact dups
    (s≥0.8) still collide with p≈1.0 while moderate-overlap pairs
    (s=0.4) drop from p≈0.34 of buckets vs 0.94, cutting candidate
    volume ~3× for boilerplate-heavy corpora. Verification stays
    exact Jaccard, so precision of EMITTED pairs is 1.0 in both
    variants; this one trades recall at mid-similarity for less
    shuffle. Same operator family as q_llm_minhash_dedup with
    deliberately different banding (see
    operators/dedup.minhash_banded_pairs)."""
    from ..operators.dedup import minhash_banded_pairs

    return minhash_banded_pairs(load_table(spark, sf_dir, "documents"),
                                num_perm=64, band_rows=4)


@register(
    "q_llm_edit_distance",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents),
    s AS (
      SELECT DISTINCT doc_id,
             array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ') AS sh
      FROM t, unnest(range(1, len(toks) - 3)) AS u(i)
      WHERE len(toks) >= 5
    ),
    rare AS (SELECT sh FROM s GROUP BY sh HAVING COUNT(DISTINCT doc_id) <= 100),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id
      WHERE a.sh IN (SELECT sh FROM rare)
    ),
    gated AS (
      SELECT c.doc_a, c.doc_b
      FROM cands c
      JOIN documents la ON la.doc_id = c.doc_a
      JOIN documents lb ON lb.doc_id = c.doc_b
      WHERE abs(la.n_chars - lb.n_chars) * 5
            <= greatest(la.n_chars, lb.n_chars)
    ),
    lev AS (
      SELECT g.doc_a, g.doc_b,
             CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS edit_dist,
             greatest(ta.n_chars, tb.n_chars) AS mx
      FROM gated g
      JOIN documents ta ON ta.doc_id = g.doc_a
      JOIN documents tb ON tb.doc_id = g.doc_b
    )
    SELECT doc_a, doc_b, edit_dist
    FROM lev
    WHERE edit_dist <= 32 AND edit_dist * 5 <= mx
    """,
)
def q_llm_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification layer of the dedup funnel:
    levenshtein over CANDIDATE pairs only (pairs sharing ≥1 shingle —
    the inverted-index pruning), never all pairs: O(len²) per pair
    makes unpruned levenshtein the most expensive dedup check, so it
    runs last in the funnel (hash → sketch → jaccard → edit distance).
    Candidate generation df-caps viral shingles (see
    operators.dedup.shingle_candidate_pairs); the DuckDB oracle mirrors
    the cap (rare/cands CTEs) so both engines agree at any scale.

    LENGTH GATE before the levenshtein stage: levenshtein(a, b) >=
    |len(a) - len(b)|, so any pair whose lengths differ by more than
    20% of the longer text cannot be a near-dup — it is dropped
    BEFORE its texts are joined or compared. The gate joins only the
    (doc_id, n_chars) projection (two ints per doc), so the pruned
    pairs never shuffle text at all; the predicate is pure integer
    arithmetic (|Δ|·5 <= max) and is mirrored verbatim in the
    oracle's gated CTE, so both engines agree at any scale. At sf1
    the fixture's replicated near-dups made pair density the whole
    cost (371k pairs, 197 s) — the gate bounds the O(len²) stage to
    plausibly-duplicate pairs only.

    BANDED VERIFY: the emitted contract is "near-dup pairs" — edit
    distance ≤ 32 AND ≤ 20% of the longer text (both mirrored in the
    oracle's final WHERE). The absolute cap lets Spark run the 3-arg
    ``levenshtein(a, b, threshold)`` — the O(len·threshold) banded
    algorithm — instead of the O(len²) full matrix (measured 2.7×
    per call). DuckDB computes the full distance and filters — same
    rows, C-fast either way. -1 (Spark's "over threshold" sentinel)
    can never leak: only 0 ≤ d ≤ 32 survives.

    Two execution traps, both measured at sf1 and both load-bearing:

      * SINGLE EVALUATION — a plain .filter(d >= 0 & d <= 32 & ...)
        after the projection re-inlines the levenshtein into every
        conjunct (no cross-expression CSE for this function): 3.7×
        the cost (229 s vs 62 s). The array→filter(λ)→explode form
        below references the function EXACTLY ONCE structurally, so
        no optimizer rewrite can duplicate it.
      * COMPUTE REPARTITION — AQE rightly coalesces the ~30 MB pair
        join output to a few partitions, which then serializes the
        expensive scalar stage (53 s on 3 cores → 6 s on 64). The
        explicit repartition spreads pairs by COMPUTE cost, not
        bytes — the generic fix for any cheap-shuffle/expensive-
        projection stage; AQE never coalesces an explicit
        numPartitions repartition.

    sf1 wall: 197 s (r4) → ~23 s (gate + band + checkpointed index +
    single-eval + repartition)."""
    from ..catalog import spread_scan
    from ..operators.dedup import shingle_candidate_pairs, shingle_index

    d = load_table(spark, sf_dir, "documents")
    # checkpoint the shingle index once: candidate generation reads it
    # three times (hot-df agg + both self-join sides) — same
    # materialization tradeoff as q_llm_ngram_jaccard above (and the
    # same r12 capped spread: parallel tokenize, 8-partition index)
    idx = shingle_index(spread_scan(d, cap=8), k=5).localCheckpoint(eager=True)
    cands = shingle_candidate_pairs(idx)
    la = d.select(F.col("doc_id").alias("doc_a"), F.col("n_chars").alias("ca"))
    lb = d.select(F.col("doc_id").alias("doc_b"), F.col("n_chars").alias("cb"))
    gated = (
        cands.join(la, "doc_a")
        .join(lb, "doc_b")
        .filter(F.abs(F.col("ca") - F.col("cb")) * 5
                <= F.greatest("ca", "cb"))
        .select("doc_a", "doc_b")
    )
    # text joins by SHUFFLE on the id, not broadcast: a 100 TB document
    # table never fits an executor; AQE may still choose broadcast when
    # the fixture side is actually small — that is size-based, not forced
    ta = d.select(F.col("doc_id").alias("doc_a"),
                  F.col("text").alias("text_a"),
                  F.col("n_chars").alias("na"))
    tb = d.select(F.col("doc_id").alias("doc_b"),
                  F.col("text").alias("text_b"),
                  F.col("n_chars").alias("nb"))
    lev = F.levenshtein("text_a", "text_b", 32).cast("long")
    keep = F.filter(
        F.array(lev),  # ONE structural reference — see docstring
        lambda x: (x >= 0) & (x <= 32) & (x * 5 <= F.greatest("na", "nb")),
    )
    return (
        gated.join(ta, "doc_a")
        .join(tb, "doc_b")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_a", "doc_b", F.explode(keep).alias("edit_dist"))
    )
