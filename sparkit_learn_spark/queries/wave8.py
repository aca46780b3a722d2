"""Round-6 final wave: broadcast Bloom-pruned semi-join, rolling
median windows, and perceptual-hash (dHash) image near-dup — the last
scale-pattern gaps (runtime-filter-style pruning, order-statistic
frames, multimodal dedup).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_join_bloom_prune",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM lineitem
    WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_19')
    GROUP BY l_returnflag
    """,
)
def q_join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join through a hand-built broadcast Bloom bitset
    (operators/bloomjoin.py): NATION_19 suppliers' keys (a nation with
    suppliers at every fixture SF; the original GERMANY literal built
    the Bloom from an EMPTY key set — r6 vacuous-oracle defect) compress to a
    1 KiB array<bigint> that prunes lineitem with pure-codegen bit
    tests BEFORE the exact semi-join removes false positives — the
    shape Spark's runtime row-level filtering injects, built from
    public primitives. Result is exactly the plain semi-join's.

    Scale: the 100 TB fact side never shuffles for the pruning step;
    only Bloom survivors (~keys/25 of rows + ~0.1% false positives at
    8192 bits / 3 hashes) reach the exact join, which is itself a
    broadcast."""
    from ..operators.bloomjoin import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_19")
    keys = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    return (
        bloom_semi_join(li, keys, "l_suppkey")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6)
             .alias("revenue"),
        )
    )


@register(
    "q_win_rolling_median",
    oracle="""
    SELECT o_orderkey,
           ROUND(median(o_totalprice) OVER w, 6) AS roll_median,
           ROUND(avg(o_totalprice)    OVER w, 6) AS roll_avg
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling MEDIAN over a 7-row frame — the order-statistic window
    Spark's aggregate ``median`` refuses a frame for. Expressed as
    ``array_sort(collect_list(...))`` over the frame + positional
    middle (interpolating even counts exactly like quantile_cont 0.5),
    so the whole thing stays JVM-side.

    Scale: one window pass; per-row state is the O(frame)=7-element
    array, constant in table size — safe at any scale so long as the
    frame, not the partition, bounds the collect_list."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, Window.currentRow)
    )
    return (
        o.select(
            "o_orderkey",
            F.array_sort(F.collect_list("o_totalprice").over(w)).alias("_a"),
            F.round(F.avg("o_totalprice").over(w), 6).alias("roll_avg"),
        )
        .withColumn(
            "roll_median",
            F.round(
                F.expr(
                    "CASE WHEN size(_a) % 2 = 1"
                    " THEN element_at(_a, CAST((size(_a) + 1) DIV 2 AS INT))"
                    " ELSE (element_at(_a, CAST(size(_a) DIV 2 AS INT))"
                    "     + element_at(_a, CAST(size(_a) DIV 2 + 1 AS INT))) / 2 END"
                ),
                6,
            ),
        )
        .select("o_orderkey", "roll_median", "roll_avg")
    )


def _make_pixel_blob(doc_id: int, n_chars: int) -> bytes:
    """Deterministic fake 8x9 'pixel grid' blob with PLANTED near-dups:
    docs share a base grid per group of 5; member m perturbs the first
    m bytes' positions (rows 0-3 only, so dHash bits 32-63 — bands 3
    and 4 — stay identical within a group, guaranteeing band recall)."""
    group, member = doc_id // 5, doc_id % 5
    base = bytearray((hashlib.sha256(b"px%d" % group).digest() * 3)[:72])
    for j in range(member):
        base[(j * 11) % 36] ^= 0x24
    return bytes(base)


@register("q_mm_phash_neardup")  # rows-only: dHash banding — pytest-oracled
def q_mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs via perceptual hash: dHash-64 per
    image (operators/multimodal.py dhash64 — mapInPandas, no shuffle),
    4x16-bit LSH bands to candidates, exact Hamming <= 10 verify —
    the image-side twin of q_llm_simhash_dedup, completing dedup
    coverage across modalities. Blobs are synthesized distributed with
    planted per-group near-dups; a real pipeline swaps the synth for
    a pixel decoder, everything downstream unchanged.

    Scale: banded (never all-pairs); hashes are 8 bytes/image, so the
    band join shuffles id+hash only — image bytes never shuffle."""
    from ..operators.multimodal import dhash64
    from .multimodal_q import _blob_frame

    d = load_table(spark, sf_dir, "documents")
    # persist the 12-byte/row (id, dhash) sketch: the band self-join
    # consumes it on BOTH sides, and without materialization each side
    # re-ran the whole mapInPandas blob-synth + dhash pipeline (the
    # before-plan had 8 ArrowEval/MapInPandas nodes — guide §4: pay the
    # Python boundary once).
    sk = dhash64(_blob_frame(d, _make_pixel_blob)).persist()
    bands = sk.select(
        "item_id",
        "dhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright("dhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("val"),
            )
            for i in range(4)
        ])).alias("bv"),
    ).select("item_id", "dhash", "bv.band", "bv.val")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.val") == F.col("b.val"))
               & (F.col("a.item_id") < F.col("b.item_id")))
        .select(
            F.col("a.item_id").alias("item_a"),
            F.col("b.item_id").alias("item_b"),
            F.bit_count(F.col("a.dhash").bitwiseXOR(F.col("b.dhash")))
             .alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 10)
    )


@register(
    "q_llm_domain_kl",
    oracle="""
    WITH lt AS (
      SELECT lang, term, CAST(COUNT(*) AS DOUBLE) AS c
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY lang, term
    ),
    l AS (SELECT lang, SUM(c) AS lc FROM lt GROUP BY lang),
    g AS (SELECT term, SUM(c) AS gc FROM lt GROUP BY term),
    n AS (SELECT SUM(c) AS total FROM lt)
    SELECT lt.lang,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           ROUND(SUM((lt.c / l.lc)
                     * ln((lt.c / l.lc) / (g.gc / n.total))), 6)
             AS kl_vs_corpus
    FROM lt JOIN l USING (lang) JOIN g USING (term) CROSS JOIN n
    GROUP BY lt.lang
    """,
)
def q_llm_domain_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health divergence: KL(P_lang || P_corpus) of unigram
    distributions per language subcorpus — the standard 'which domain
    drifts from the global token mix' check run before fixing a
    training data mixture. Support of each subcorpus is a subset of
    the global support by construction, so ln never sees 0.

    Scale: all hash aggregates on (lang, term); the per-lang and
    global-total sides are vocab/constant-sized and broadcast — the
    corpus shuffles once to build term counts, nothing else grows."""
    d = load_table(spark, sf_dir, "documents")
    from ..functions.text import tokens

    lt = (
        d.select("lang", F.explode(tokens("text")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").cast("double").alias("c"))
    )
    l = lt.groupBy("lang").agg(F.sum("c").alias("lc"))
    g = lt.groupBy("term").agg(F.sum("c").alias("gc"))
    n = lt.agg(F.sum("c").alias("total"))
    return (
        lt.join(F.broadcast(l), "lang")
        .join(g, "term")
        .crossJoin(F.broadcast(n))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_terms"),
            F.round(
                F.sum((F.col("c") / F.col("lc"))
                      * F.log((F.col("c") / F.col("lc"))
                              / (F.col("gc") / F.col("total")))),
                6,
            ).alias("kl_vs_corpus"),
        )
    )


@register(
    "q_agg_mad",
    oracle="""
    WITH m AS (
      SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           ROUND(MIN(m.med), 6) AS med_price,
           ROUND(quantile_cont(abs(o.o_totalprice - m.med), 0.5), 6)
             AS mad_price
    FROM orders o JOIN m USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
)
def q_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust two-pass
    order statistic (median, then median of |x − median|) that plain
    stddev queries can't stand in for on heavy-tailed columns. Exact
    ``percentile`` matches quantile_cont's linear interpolation
    bit-for-bit.

    Scale: two grouped aggregations + a broadcast of the group-count-
    sized median table; exact percentile sorts within groups — at
    100 TB swap ``percentile`` for ``approx_percentile`` (same plan
    shape, sketch-mergeable) and keep the two-pass structure."""
    o = load_table(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    return (
        o.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.min("med"), 6).alias("med_price"),
            F.round(
                F.expr("percentile(abs(o_totalprice - med), 0.5)"), 6
            ).alias("mad_price"),
        )
    )


@register(
    "q_win_rolling_corr",
    oracle="""
    SELECT o_orderkey,
           ROUND(CASE WHEN isnan(corr(o_totalprice, o_custkey % 97) OVER w)
                      THEN NULL
                      ELSE corr(o_totalprice, o_custkey % 97) OVER w END, 6)
             + 0.0 AS roll_corr,
           ROUND(covar_samp(o_totalprice, o_custkey % 97) OVER w, 6)
             + 0.0 AS roll_covar
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
    """,
)
def q_win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling correlation/covariance over a 12-row frame — the
    co-movement window statistic (price vs a synthetic hash-derived
    series) that pairs with q_win_rolling_median's order statistic.
    Unlike median, covar/stddev accept frames natively, so this stays
    one codegen'd window pass. corr is assembled as
    covar/(stddev·stddev) rather than ``F.corr`` because Spark's ANSI
    corr raises DIVIDE_BY_ZERO on a zero-variance frame (n>1, all
    values equal) where the contract wants NULL; degenerate frames
    (n=1 → NaN stddev, or zero variance) normalize to NULL on both
    sides.

    Scale: constant per-row state (Welford moments over the frame);
    one shuffle on the partition key."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-11, Window.currentRow)
    )
    x2 = F.col("o_custkey") % 97
    sx = F.stddev_samp("o_totalprice").over(w)
    sy = F.stddev_samp(x2).over(w)
    cov = F.covar_samp(F.col("o_totalprice"), x2).over(w)
    corr = F.when(
        sx.isNull() | sy.isNull() | F.isnan(sx) | F.isnan(sy)
        | (sx == 0) | (sy == 0),
        F.lit(None).cast("double"),
    ).otherwise(cov / (sx * sy))
    return o.select(
        "o_orderkey",
        F.round(corr, 6).alias("roll_corr"),
        F.round(F.covar_samp("o_totalprice", x2).over(w), 6)
         .alias("roll_covar"),
    )


@register("q_llm_bpe_segment")  # rows-only: merges come from the iterative
                                # trainer (not SQL-expressible); encode
                                # round-trip asserted in tests/test_bpe.py
def q_llm_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end tokenizer pipeline: learn the first 8 BPE merges
    from the corpus (q_llm_bpe_learn's trainer), ENCODE the whole
    corpus with them (operators/bpe.py bpe_segment_batched — Arrow
    batches with per-unique-word memoization), and report the top-40
    BPE token frequencies — train-tokenizer → apply → vocab-stats,
    the full loop a data pipeline runs before budgeting tokens.

    Scale: the merge table is 8 driver rows (bounded by construction);
    encode is shuffle-free mapInPandas whose cost tracks per-batch
    vocabulary (Zipf makes the word cache hit almost always); the
    histogram is one vocab-sized hash aggregate. Deterministic: trainer tiebreaks
    lexicographically, output orders by (freq desc, token)."""
    from ..operators.bpe import bpe_segment_batched, learn_bpe_merges

    d = load_table(spark, sf_dir, "documents")
    merge_rows = learn_bpe_merges(d, n_merges=8).collect()  # 8 rows
    merges = [(r["left"], r["right"])
              for r in sorted(merge_rows, key=lambda r: r["rank"])]
    seg = bpe_segment_batched(d, merges)
    return (
        seg.select(F.explode("bpe_tokens").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "tok")
        .limit(40)
    )


@register(
    "q_str_regexp_battery",
    oracle="""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text, 'th[a-z]+')) ) AS BIGINT)
             AS n_th_words,
           CAST(SUM(CASE WHEN regexp_matches(text, '[a-z]{9,}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_long_word_docs,
           CAST(SUM(length(regexp_replace(text, '[aeiou]', '', 'g')))
             AS BIGINT) AS consonant_chars,
           MIN(regexp_extract(text, '([a-z]{7,})', 1)) AS min_long_word
    FROM documents GROUP BY lang
    """,
)
def q_str_regexp_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function battery over the corpus: regexp_count,
    rlike-as-predicate, global regexp_replace (Spark replaces all
    matches; the oracle needs DuckDB's 'g' flag to agree), and group
    extraction — all JVM-side codegen, patterns restricted to the
    syntax subset where Java regex and RE2 agree (character classes +
    bounded repetition; no backrefs, no lookaround).

    Scale: row-local expressions — scale-free."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(F.regexp_count("text", F.lit("th[a-z]+")))
         .cast("long").alias("n_th_words"),
        F.sum(F.when(F.col("text").rlike("[a-z]{9,}"), 1).otherwise(0))
         .cast("long").alias("n_long_word_docs"),
        F.sum(F.length(F.regexp_replace("text", "[aeiou]", "")))
         .cast("long").alias("consonant_chars"),
        F.min(F.regexp_extract("text", "([a-z]{7,})", 1))
         .alias("min_long_word"),
    )


@register(
    "q_ts_ohlc",
    oracle="""
    WITH r AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY CAST(date_trunc('day', ts) AS DATE),
                                             event_type
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY CAST(date_trunc('day', ts) AS DATE),
                                             event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT day, event_type,
           ROUND(MIN(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(MIN(CASE WHEN rn_d = 1 THEN value END), 6) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM r GROUP BY day, event_type
    """,
)
def q_ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling — the canonical time-series bar aggregation
    (open/high/low/close per day per series). Open/close need a
    POSITIONAL first/last under a total order; expressed as
    row_number in both directions with (ts, event_id) tiebreaks so
    the result is deterministic under any partitioning (min_by/max_by
    alone would be ambiguous on equal timestamps).

    Scale: one shuffle on (day, series) for the windows, reused by
    the aggregate — day-bounded partitions stay small at any corpus
    size."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", "ts")).alias("day")
    base = ev.select(day, "event_type", "value", "ts", "event_id")
    wa = (Window.partitionBy("day", "event_type")
          .orderBy("ts", "event_id"))
    wd = (Window.partitionBy("day", "event_type")
          .orderBy(F.col("ts").desc(), F.col("event_id").desc()))
    r = base.select(
        "day", "event_type", "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("day", "event_type").agg(
        F.round(F.min(F.when(F.col("rn_a") == 1, F.col("value"))), 6)
         .alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.min(F.when(F.col("rn_d") == 1, F.col("value"))), 6)
         .alias("close"),
        F.count("*").alias("n_ticks"),
    )


@register(
    "q_join_asof_forward",
    oracle="""
    SELECT event_id, user_id, ts AS click_ts, next_purchase_ts
    FROM (
      SELECT event_id, user_id, ts, event_type,
             first_value(CASE WHEN event_type = 'purchase' THEN ts END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_purchase_ts
      FROM events
    ) WHERE event_type = 'click'
    """,
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each click, the user's next strictly-
    later purchase (the time-to-convert lookup) — q_join_asof's
    mirror, with first(ignoreNulls) over the FOLLOWING frame instead
    of last() over PRECEDING. Same union-style plan: no pairwise
    click×purchase candidate explosion, one shuffle on user_id,
    linear state.

    Scale: identical to q_join_asof — survives 100×."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    return (
        ev.withColumn("next_purchase_ts",
                      F.first(purchase_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", F.col("ts").alias("click_ts"),
                "next_purchase_ts")
    )


@register(
    "q_evt_rolling_active",
    oracle="""
    WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
                FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
            FROM ud GROUP BY day),
    wau AS (SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
            FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day)
    SELECT dau.day, dau.dau, wau.wau
    FROM dau JOIN wau ON dau.day = wau.day
    """,
)
def q_evt_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU + rolling 7-day WAU — the windowed-DISTINCT problem:
    distinct counts don't sum across days, so a rolling frame over
    daily DAUs is WRONG. Exact form: shrink events to distinct
    (day, user) pairs FIRST (users x days grain, tiny vs the event
    log), then a bounded 7-day range join against the day spine.

    Scale: the event log is touched once (the distinct); the range
    join fans each (day, user) pair out at most 7x at users x days
    grain. At 100 TB, swap the exact distinct for hll_sketch_agg per
    day + hll_union_agg over the trailing frame — same shape, sketch-
    mergeable, constant state."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    wau = (
        days.join(
            ud.select(F.col("day").alias("uday"), "user_id"),
            (F.col("uday") <= F.col("day"))
            & (F.col("uday") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day")


@register("q_llm_countmin_freq")  # rows-only: xxhash64 grid — CMS guarantees
                                  # (never-under, bounded over) in pytest
def q_llm_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation (operators/sketches.py):
    build a 4x1024 counter grid over the token stream in one pass,
    then probe it for the 50 exact heavy hitters — returned beside
    their true counts so the estimate error is visible in the result
    (cms_est >= true_cnt always; overestimate bounded by eps*N).

    Scale: the sketch is 4096 rows whatever the vocabulary — the
    sublinear-space twin of exact q_llm_heavy_hitters, and the only
    of the two that survives a vocabulary that doesn't fit a shuffle."""
    from ..functions.text import tokens
    from ..operators.sketches import cms_build, cms_probe

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens("text")).alias("term"))
    sketch = cms_build(toks, "term")
    top = (
        toks.groupBy("term").agg(F.count("*").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), "term").limit(50)
    )
    return (
        cms_probe(sketch, top.select("term"), "term")
        .join(top, "term")
        .select("term", "true_cnt", "cms_est")
        .orderBy(F.desc("true_cnt"), "term")
    )


@register(
    "q_ts_ewma",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             SUM(value) AS rev
      FROM events GROUP BY day, event_type
    ),
    r AS (
      SELECT day, event_type, rev,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
               - 1 AS rn
      FROM daily
    )
    SELECT day, event_type,
           ROUND(0.3 * pow(0.7, rn)
                 * SUM(rev * pow(1.0 / 0.7, rn))
                   OVER (PARTITION BY event_type ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW), 6) AS ewma_rev
    FROM r
    """,
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue per
    event type (alpha = 0.3, zero-init: s_t = a*sum (1-a)^(t-k) x_k) —
    a RECURSIVE statistic computed in ONE window pass via the
    closed-form u_k = x_k*(1-a)^(-k) prefix-sum trick (no iterative
    self-join, no UDF). The geometric reweighting overflows doubles
    past ~700 rows per partition; day-grain partitions stay far under
    that — at longer horizons, chunk per month and carry the boundary
    (same trick, segmented).

    Scale: day-grain after the first aggregate; one window shuffle."""
    ev = load_table(spark, sf_dir, "events")
    a = 0.3
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.sum("value").alias("rev"))
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    r = daily.withColumn("rn", F.row_number().over(wo) - 1)
    ws = (Window.partitionBy("event_type").orderBy("rn")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return r.select(
        "day", "event_type",
        F.round(
            F.lit(a) * F.pow(F.lit(1 - a), F.col("rn"))
            * F.sum(F.col("rev") * F.pow(F.lit(1.0 / (1 - a)), F.col("rn")))
               .over(ws),
            6,
        ).alias("ewma_rev"),
    )


@register(
    "q_agg_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id % 10 AS cohort, event_type,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY cohort, event_type
    ),
    t AS (SELECT cohort, SUM(n) AS tot FROM c GROUP BY cohort)
    SELECT c.cohort,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           ROUND(-SUM((c.n / t.tot) * ln(c.n / t.tot)), 6) AS entropy
    FROM c JOIN t USING (cohort)
    GROUP BY c.cohort
    """,
)
def q_agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the event-type distribution per user cohort
    — the behavioral-diversity statistic (0 = single-action users,
    ln(k) = uniform across k actions). Two hash aggregates + a
    broadcast of the cohort totals; p*ln(p) never sees 0 because
    empty cells don't exist in a GROUP BY.

    Scale: cohort x type grain after the first aggregate — tiny."""
    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.groupBy((F.col("user_id") % 10).alias("cohort"), "event_type")
        .agg(F.count("*").cast("double").alias("n"))
    )
    t = c.groupBy("cohort").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    return (
        c.join(F.broadcast(t), "cohort")
        .groupBy("cohort")
        .agg(
            F.count("*").alias("n_types"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


@register("q_ml_roc_auc")  # rows-only: scores come from the LBFGS fit
                           # (engine-specific); rank-sum parity vs a
                           # numpy reference in pytest
def q_ml_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC of the embeddings logistic model, distributed:
    the Mann-Whitney rank-sum identity AUC = (R+ - P(P+1)/2)/(P*N)
    with average ranks for ties — no threshold sweep, no curve
    materialization, no driver-side sort. Scores are binned to 6dp
    BEFORE ranking so the rank table is bounded at 1e6+1 rows at any
    corpus size (the bin changes AUC by <1e-5; the pytest reference
    applies the same bin, so parity is exact).

    Scale: one aggregate to score-grain, one bounded window for
    cumulative ranks, one scalar reduce."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import vector_to_array

    from .ml_mllib import _vectors

    vec = _vectors(spark, sf_dir)
    model = LogisticRegression(
        featuresCol="features", labelCol="binlabel", maxIter=50,
        regParam=0.01,
    ).fit(vec)
    scored = model.transform(vec).select(
        F.col("binlabel").alias("y"),
        F.round(F.element_at(vector_to_array("probability"), 2), 6)
         .alias("p"),
    )
    g = scored.groupBy("p").agg(
        F.count("*").cast("double").alias("cnt"),
        F.sum("y").alias("pos"),
    )
    w = (Window.orderBy("p")
         .rowsBetween(Window.unboundedPreceding, -1))
    ranked = g.withColumn(
        "avg_rank",
        F.coalesce(F.sum("cnt").over(w), F.lit(0.0))
        + (F.col("cnt") + 1) / 2,
    )
    return ranked.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).cast("long").alias("n_neg"),
        F.round(
            (F.sum(F.col("pos") * F.col("avg_rank"))
             - F.sum("pos") * (F.sum("pos") + 1) / 2)
            / (F.sum("pos") * F.sum(F.col("cnt") - F.col("pos"))),
            6,
        ).alias("auc"),
    )


@register("q_evt_rolling_active_hll")  # rows-only: HLL estimates are
                                       # engine-specific; <=5% error vs the
                                       # exact twin asserted in pytest
def q_evt_rolling_active_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path q_evt_rolling_active's docstring promises, made
    real: one Datasketches HLL sketch per day (hll_sketch_agg), then
    hll_union_agg over the trailing 7-day WINDOW FRAME — windowed
    COUNT DISTINCT with constant per-day state and no range-join
    fan-out. Day-grain sketches merge associatively, so the same plan
    backfills years of history or runs incrementally in a stream.

    Scale: the event log aggregates once to day-grain sketches
    (~KB/day); the window pass is sketch-merge only."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    w = (Window.orderBy("day")
         .rowsBetween(-6, Window.currentRow))
    return daily.select(
        "day",
        F.hll_sketch_estimate("sk").alias("dau_est"),
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
         .alias("wau_est"),
    ).orderBy("day")


@register("q_llm_dedup_recall")  # rows-only: minhash side is xxhash-based;
                                 # range/determinism asserted in pytest
def q_llm_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-quality evaluation: banded-MinHash emitted pairs scored
    against the exact inverted-index Jaccard truth at the same
    similarity cut (>= 0.4) — the recall measurement a pipeline owner
    runs BEFORE trusting approximate dedup on 100 TB, where the exact
    truth can only be afforded on a sample. Precision can dip below
    1.0 only where the truth's documented viral-shingle df-cap drops
    a pair the sketch kept.

    Scale: both sides are the candidates-then-verify pipelines
    (never all-pairs); the join is pair-grain."""
    from ..operators.dedup import minhash_banded_pairs
    from .llm_pipeline2 import q_llm_ngram_jaccard

    truth = (
        q_llm_ngram_jaccard(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.4)
        .select("doc_a", "doc_b")
    )
    got = (
        minhash_banded_pairs(load_table(spark, sf_dir, "documents"))
        .select("doc_a", "doc_b")
    )
    hit = truth.join(got, ["doc_a", "doc_b"], "inner")
    stats = truth.agg(F.count("*").alias("n_true")).crossJoin(
        got.agg(F.count("*").alias("n_got"))
    ).crossJoin(hit.agg(F.count("*").alias("n_hit")))
    return stats.select(
        "n_true", "n_got", "n_hit",
        F.when(F.col("n_true") > 0,
               F.round(F.col("n_hit") / F.col("n_true"), 6)).alias("recall"),
        F.when(F.col("n_got") > 0,
               F.round(F.col("n_hit") / F.col("n_got"), 6)).alias("precision"),
    )


@register("q_llm_ann_recall")  # rows-only: IVF side is sampled-quantizer
                               # based; bounds asserted in pytest
def q_llm_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: IVF top-5 neighbors scored against the
    exact cosine top-5 truth — recall@5 averaged over all queries,
    plus the fraction of queries with perfect recall. The ANN twin of
    q_llm_dedup_recall: at 100 TB the exact truth runs on a sample
    and this number decides whether the IVF probe budget is enough.

    Scale: both sides are existing bounded pipelines; the comparison
    joins at (query, neighbor) grain."""
    from ..operators.similarity import cosine_topk, ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(e, k=5).select("qid", "nid")
    approx = ivf_topk(e, k=5).select("qid", "nid")
    hit = exact.join(approx, ["qid", "nid"], "inner")
    per_q = (
        exact.groupBy("qid").agg(F.count("*").alias("n_true"))
        .join(hit.groupBy("qid").agg(F.count("*").alias("n_hit")), "qid",
              "left")
        .select("qid", "n_true",
                F.coalesce("n_hit", F.lit(0)).alias("n_hit"))
    )
    return per_q.agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg(F.col("n_hit") / F.col("n_true")), 6)
         .alias("recall_at_5"),
        F.round(F.avg((F.col("n_hit") == F.col("n_true")).cast("double")), 6)
         .alias("frac_perfect"),
    )


@register(
    "q_agg_gini",
    oracle="""
    WITH r AS (
      SELECT c_mktsegment, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS rk,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n,
             SUM(c_acctbal) OVER (PARTITION BY c_mktsegment) AS tot
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           CAST(MIN(n) AS BIGINT) AS n_customers,
           ROUND(2.0 * SUM(rk * c_acctbal) / (MIN(n) * MIN(tot))
                 - (MIN(n) + 1.0) / MIN(n), 6) AS gini
    FROM r GROUP BY c_mktsegment
    """,
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of account-balance concentration per market
    segment — the inequality statistic (0 = uniform, ->1 = one
    customer holds everything) via the rank identity
    G = 2*sum(rank*x)/(n*sum(x)) - (n+1)/n, which needs ONE window
    pass instead of the textbook O(n^2) |x_i - x_j| double sum.
    Deterministic: ranks totally ordered by (value, custkey);
    positive balances only so the denominator is well-defined.

    Scale: one window shuffle on the segment key."""
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_acctbal") > 0))
    wr = (Window.partitionBy("c_mktsegment")
          .orderBy("c_acctbal", "c_custkey"))
    wp = Window.partitionBy("c_mktsegment")
    r = c.select(
        "c_mktsegment", "c_acctbal",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wp).alias("n"),
        F.sum("c_acctbal").over(wp).alias("tot"),
    )
    return r.groupBy("c_mktsegment").agg(
        F.min("n").cast("long").alias("n_customers"),
        F.round(
            2.0 * F.sum(F.col("rk") * F.col("c_acctbal"))
            / (F.min("n") * F.min("tot"))
            - (F.min("n") + 1.0) / F.min("n"),
            6,
        ).alias("gini"),
    )


@register(
    "q_evt_cohort_ltv",
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    j AS (
      SELECT f.cohort_week,
             CAST(FLOOR(date_diff('day', f.cohort_week,
                                  date_trunc('week', e.ts)) / 7.0)
                  AS BIGINT) AS week_offset,
             e.value
      FROM events e JOIN f ON e.user_id = f.user_id
    ),
    wk AS (
      SELECT cohort_week, week_offset, SUM(value) AS rev
      FROM j GROUP BY 1, 2
    )
    SELECT cohort_week, week_offset,
           ROUND(SUM(rev) OVER (PARTITION BY cohort_week
                                ORDER BY week_offset
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW), 6) AS cum_revenue
    FROM wk
    """,
)
def q_evt_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: cumulative revenue per weekly
    signup cohort by weeks-since-signup — the payback statistic
    q_evt_retention's distinct-count can't give (retention says WHO
    came back; LTV says what they were worth). Same cohort spine
    (Monday-start weeks), revenue summed per (cohort, offset) cell,
    then one running-sum window over the offset axis.

    Scale: identical envelope to q_evt_retention (two co-partitioned
    user_id shuffles) + a cohort-grain window — cells, not events."""
    e = load_table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    j = e.join(f, "user_id").select(
        "cohort_week",
        F.floor(
            F.datediff(F.date_trunc("week", F.col("ts")),
                       F.col("cohort_week")) / 7.0
        ).cast("long").alias("week_offset"),
        "value",
    )
    wk = (j.groupBy("cohort_week", "week_offset")
          .agg(F.sum("value").alias("rev")))
    w = (Window.partitionBy("cohort_week").orderBy("week_offset")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return wk.select(
        "cohort_week", "week_offset",
        F.round(F.sum("rev").over(w), 6).alias("cum_revenue"),
    )


@register(
    "q_llm_retrieval_topk",
    oracle="""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id % 20 = 0),
    c AS (SELECT * FROM embeddings WHERE vec_id % 20 <> 0),
    pairs AS (
      SELECT q.vec_id AS qid, c.vec_id AS nid,
             ROUND(list_sum(list_transform(list_zip(q.embedding, c.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6)
               AS sim
      FROM q JOIN c ON TRUE
    )
    SELECT qid, nid, sim, CAST(rn AS BIGINT) AS rn
    FROM (SELECT qid, nid, sim,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY sim DESC, nid) AS rn
          FROM pairs)
    WHERE rn <= 5
    """,
)
def q_llm_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table retrieval: top-5 corpus neighbors for a held-out
    query set (every 20th vector) — the query!=corpus search shape
    (eval-set nearest neighbors, benchmark-vs-train probes) that the
    self-join cosine queries can't express. Exact, broadcast-corpus
    path (operators/similarity.py cosine_retrieve).

    Scale: query stream never shuffles; the corpus broadcast is
    bounded with an explicit error pointing at IVF routing beyond
    it."""
    from ..operators.similarity import cosine_retrieve

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 20 == 0)
    c = e.filter(F.col("vec_id") % 20 != 0)
    return cosine_retrieve(q, c, k=5)


@register(
    "q_llm_winnowing",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents),
    sh AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)],
                                 ' ')) AS h
      FROM t, unnest(range(1, len(toks) - 3)) AS u(i)
      WHERE len(toks) >= 5
    ),
    wmin AS (
      SELECT doc_id,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      FROM sh
    ),
    fps AS (SELECT DISTINCT doc_id, fp FROM wmin),
    rare AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 100)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fp
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    WHERE a.fp IN (SELECT fp FROM rare)
    GROUP BY 1, 2 HAVING COUNT(*) >= 5
    """,
)
def q_llm_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (the MOSS plagiarism-detection
    algorithm): hash every 5-token shingle, slide a 4-shingle window
    and keep each window's MINIMUM hash — guaranteeing any shared run
    of >= w+k-1 tokens yields a shared fingerprint while storing only
    ~2/(w+1) of the hashes. Docs sharing >= 5 selected fingerprints
    are overlap candidates. md5 (not xxhash) precisely so the oracle
    can replay the selection bit-for-bit; the df<=100 viral cap
    mirrors the Jaccard pipeline's.

    Scale: fingerprint selection is one window pass; the candidate
    join runs on the winnowed ~2/(w+1) subset with a df cap — never
    all-pairs, and cheaper-shuffled than full-shingle Jaccard."""
    d = load_table(spark, sf_dir, "documents")
    from ..functions.text import shingles, tokens

    sh = (
        d.select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") >= 5)
        .select("doc_id",
                F.posexplode(shingles(F.col("toks"), k=5))
                 .alias("pos", "shingle"))
        .select("doc_id", "pos", F.md5("shingle").alias("h"))
    )
    w = (Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3))
    fps = (sh.select("doc_id", F.min("h").over(w).alias("fp"))
           .distinct())
    rare = (fps.groupBy("fp").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= 100).select("fp"))
    pruned = fps.join(rare, "fp")
    a = pruned.select(F.col("doc_id").alias("doc_a"), "fp")
    b = pruned.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, ["fp"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared_fp"))
        .filter(F.col("shared_fp") >= 5)
    )


@register(
    "q_dq_benford",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, CAST(COUNT(*) AS DOUBLE) AS n FROM d
          GROUP BY digit),
    t AS (SELECT SUM(n) AS tot FROM c)
    SELECT c.digit,
           CAST(c.n AS BIGINT) AS n,
           ROUND(c.n / t.tot, 6) AS observed_p,
           ROUND(log10(1.0 + 1.0 / c.digit), 6) AS benford_p,
           ROUND(pow(c.n / t.tot - log10(1.0 + 1.0 / c.digit), 2)
                 / log10(1.0 + 1.0 / c.digit), 6) AS chi2_term
    FROM c CROSS JOIN t
    """,
)
def q_dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the
    fabricated-data screen (naturally occurring amounts follow
    P(d) = log10(1 + 1/d); synthetic or manipulated ones usually
    don't). Emits observed vs expected frequency and the per-digit
    chi-square contribution so the auditor sees WHICH digits deviate.
    The fixture's uniform-ish synthetic prices will rightly flag —
    that's the query doing its job on generated data.

    Scale: digit-grain after one aggregate — scale-free."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1)
         .cast("bigint").alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").cast("double").alias("n"))
    t = c.agg(F.sum("n").alias("tot"))
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.col("tot"), 6).alias("observed_p"),
        F.round(benford, 6).alias("benford_p"),
        F.round(F.pow(F.col("n") / F.col("tot") - benford, 2) / benford, 6)
         .alias("chi2_term"),
    )


@register("q_ml_kmeans_elbow")  # rows-only: iterative fits; monotonicity
                                # asserted in pytest
def q_ml_kmeans_elbow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model selection for clustering: k-means inertia (within-set
    sum of squared distances) swept over k in {2, 4, 8} — the elbow
    curve that picks k before the real clustering run. Seeded
    k-means|| so the sweep is reproducible.

    Scale: each fit is MLlib's distributed Lloyd's (per-iteration
    broadcast of k centroids, map-side partial sums); the sweep is
    3 sequential fits — parallelize across a cluster by submitting
    per-k jobs from one driver if wall-clock matters."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.evaluation import ClusteringEvaluator

    from .ml_mllib import SEED, _vectors

    vec = _vectors(spark, sf_dir).cache()
    rows = []
    for k in (2, 4, 8):
        model = KMeans(k=k, seed=SEED, featuresCol="features").fit(vec)
        inertia = float(model.summary.trainingCost)
        sil = float(ClusteringEvaluator(featuresCol="features")
                    .evaluate(model.transform(vec)))
        rows.append((k, round(inertia, 6), round(sil, 6)))
    vec.unpersist()
    return spark.createDataFrame(
        rows, "k long, inertia double, silhouette double")


@register(
    "q_llm_pmi_collocations",
    oracle="""
    WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents
               WHERE length(text) > 0),
    bg AS (
      SELECT toks[CAST(i AS INT)] AS w1, toks[CAST(i + 1 AS INT)] AS w2
      FROM t, unnest(range(1, len(toks))) AS u(i)
      WHERE len(toks) >= 2
    ),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c
            FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(c) AS n1 FROM c12 GROUP BY w1),
    c2 AS (SELECT w2, SUM(c) AS n2 FROM c12 GROUP BY w2),
    n AS (SELECT SUM(c) AS total FROM c12)
    SELECT w1, w2, CAST(c AS BIGINT) AS n_pair,
           ROUND(ln(c * n.total / (c1.n1 * c2.n2)), 6) AS pmi
    FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
    WHERE c >= 5
    ORDER BY pmi DESC, w1, w2 LIMIT 50
    """,
)
def q_llm_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-50 bigrams by pointwise mutual
    information PMI = ln(P(w1,w2)/(P(w1)P(w2))) with a min-count
    floor of 5 — the phrase detector (multiword expressions land at
    high PMI, boilerplate function-word pairs at ~0) used to build
    phrase vocabularies before tokenizer training. Marginals are
    position-consistent (first-slot / second-slot of the same bigram
    stream), so probabilities sum to 1 by construction.

    Scale: one corpus pass to bigram counts, then vocab-sized joins
    with the marginal tables; the total is one broadcast scalar."""
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = d.select(tokens("text").alias("toks")).filter(F.size("toks") >= 2)
    bg = toks.select(
        F.explode(
            F.zip_with(
                F.slice("toks", 1, F.size("toks") - 1),
                F.slice("toks", 2, F.size("toks") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").cast("double").alias("c"))
    c1 = c12.groupBy("w1").agg(F.sum("c").alias("n1"))
    c2 = c12.groupBy("w2").agg(F.sum("c").alias("n2"))
    n = c12.agg(F.sum("c").alias("total"))
    return (
        c12.filter(F.col("c") >= 5)
        .join(c1, "w1").join(c2, "w2").crossJoin(F.broadcast(n))
        .select(
            "w1", "w2",
            F.col("c").cast("long").alias("n_pair"),
            F.round(F.log(F.col("c") * F.col("total")
                          / (F.col("n1") * F.col("n2"))), 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(50)
    )


@register(
    "q_join_scd2_lookup",
    oracle="""
    WITH dim AS (
      SELECT o_custkey,
             o_orderpriority AS attr,
             o_orderdate     AS valid_from,
             LEAD(o_orderdate) OVER w AS valid_to
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    f AS (
      SELECT o.o_custkey, l.l_shipdate AS ts,
             l.l_extendedprice * (1 - l.l_discount) AS rev
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT d.attr AS attr_at_ship,
           CAST(COUNT(*) AS BIGINT) AS n_shipments,
           ROUND(SUM(f.rev), 2) AS revenue
    FROM f JOIN dim d ON f.o_custkey = d.o_custkey
      AND f.ts >= d.valid_from
      AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    GROUP BY d.attr
    """,
)
def q_join_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: every shipment joined to the
    customer attribute that was VALID AT ship time (the SCD2 intervals
    q_scd2_history builds) — the temporal-join semantics that naive
    'join latest dimension' silently gets wrong for historical facts.
    Half-open [from, to) intervals make same-day attribute flips
    zero-width, so exactly one version matches any instant.

    Scale: an EQUI-join on the customer key carrying the interval
    containment as a residual predicate — co-partitioned shuffle,
    never an unbounded theta join; the dimension is change-grain."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dim = o.select(
        F.col("o_custkey").alias("d_custkey"),
        F.col("o_orderpriority").alias("attr"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    f = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_custkey",
        F.col("l_shipdate").alias("ts"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    j = f.join(
        dim,
        (F.col("o_custkey") == F.col("d_custkey"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    # 2dp, not the usual 6: these groups sum ~1e5 doubles to ~5e9,
    # where double ulp (~1e-6) makes the 6th decimal summation-order
    # dependent across engines; at 2dp the result is deterministic
    return j.groupBy(F.col("attr").alias("attr_at_ship")).agg(
        F.count("*").alias("n_shipments"),
        F.round(F.sum("rev"), 2).alias("revenue"),
    )


@register(
    "q_agg_hhi",
    oracle="""
    WITH s AS (
      SELECT n.n_name,
             l.l_suppkey,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
      FROM lineitem l
      JOIN supplier su ON l.l_suppkey = su.s_suppkey
      JOIN nation n ON su.s_nationkey = n.n_nationkey
      GROUP BY n.n_name, l.l_suppkey
    ),
    t AS (SELECT n_name, SUM(rev) AS tot FROM s GROUP BY n_name)
    SELECT s.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(SUM(pow(s.rev / t.tot, 2)), 6) AS hhi
    FROM s JOIN t USING (n_name)
    GROUP BY s.n_name
    """,
)
def q_agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of supplier revenue concentration
    per nation — sum of squared market shares (1/n = perfectly even,
    1.0 = monopoly); the concentration complement to q_agg_gini's
    inequality rank statistic, and share-based so it needs no total
    order at all.

    Scale: supplier-grain aggregate, nation-grain totals broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    s = (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n), su.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
              .alias("rev"))
    )
    t = s.groupBy("n_name").agg(F.sum("rev").alias("tot"))
    return (
        s.join(F.broadcast(t), "n_name")
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum(F.pow(F.col("rev") / F.col("tot"), 2)), 6)
             .alias("hhi"),
        )
    )
