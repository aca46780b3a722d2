"""Round-6 wave 15: big-big interval-overlap join via coarse-bin
bucketing (the equi-join rewrite of a range theta join), vocabulary
coverage curve (OOV budget for tokenizer sizing), a hash-partition
balance audit (shuffle-skew diagnostics with a portable multiplicative
hash), and per-source document-length quantiles. All exactly
DuckDB-oracled in integer space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "q_join_interval_bucketed",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id, epoch_us(ts) AS s,
               epoch_us(ts) + (event_id % 3600) * 1000000 AS e
        FROM events),
    p AS (
        SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS n_conflicts
        FROM iv a JOIN iv b
          ON a.user_id = b.user_id AND a.event_id < b.event_id
         AND a.s <= b.e AND b.s <= a.e
        GROUP BY a.user_id)
    SELECT user_id, n_conflicts FROM p
    """,
)
def q_join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big interval-overlap self-join (per-user schedule conflicts:
    events as [ts, ts + (event_id mod 3600) s] intervals, count
    overlapping pairs per user) — executed as a BUCKETED EQUI-JOIN:
    each interval explodes into the 1-hour bins it covers, candidates
    equi-join on (user, bin), pairs dedupe (an overlap straddling a
    bin boundary appears twice), then the exact overlap predicate
    verifies. The DuckDB oracle is the direct theta self-join — same
    rows, different plan.

    Scale: THIS is how two fact-sized interval sets join at 100 TB —
    a raw range theta join degenerates to per-key nested loops, while
    bin expansion keeps it a hash join with bounded fan-out (interval
    length ≤ bin width ⇒ ≤2 bins per interval). The companion
    q_join_interval_overlap handles the small-grid case by broadcast;
    this one handles big-big by bucketing."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    iv = e.select(
        "user_id",
        "event_id",
        us.alias("s"),
        (us + (F.col("event_id") % 3600) * 1000000).alias("e"),
    )
    binned = iv.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / 3600000000),
                F.floor(F.col("e") / 3600000000),
            )
        ).alias("bin"),
    )
    a = binned.alias("a")
    b = binned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.bin") == F.col("b.bin"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .filter((F.col("a.s") <= F.col("b.e")) & (F.col("b.s") <= F.col("a.e")))
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("ea"),
            F.col("b.event_id").alias("eb"),
        )
        .distinct()
    )
    return pairs.groupBy("user_id").agg(F.count("*").alias("n_conflicts"))


@register(
    "q_llm_vocab_coverage",
    oracle="""
    WITH tok AS (
        SELECT t.tok, CAST(COUNT(*) AS BIGINT) AS freq
        FROM documents, unnest(string_split(text, ' ')) AS t(tok)
        GROUP BY t.tok),
    r AS (
        SELECT freq,
               ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rnk,
               SUM(freq) OVER (ORDER BY freq DESC, tok
                               ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(freq) OVER () AS total,
               COUNT(*) OVER () AS n_vocab
        FROM tok),
    k AS (SELECT unnest([100, 1000, 10000]) AS k)
    SELECT k.k AS vocab_k,
           CAST(MIN(r.n_vocab) AS BIGINT) AS n_vocab,
           CAST(MAX(CASE WHEN r.rnk <= k.k THEN r.cum ELSE 0 END) AS BIGINT)
               AS covered,
           ROUND(MAX(CASE WHEN r.rnk <= k.k THEN r.cum ELSE 0 END)
                 / CAST(MIN(r.total) AS DOUBLE), 6) AS coverage
    FROM k CROSS JOIN r
    GROUP BY k.k
    """,
)
def q_llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all token
    occurrences the top-k most frequent tokens cover (k = 100 / 1k /
    10k) — the OOV-budget measurement that sizes a tokenizer
    vocabulary before training one. Rank ties break on the token
    string so the cut is engine-deterministic; counts are exact
    integers end-to-end.

    Scale: token counting is the map-side-combining wordcount; the
    ranking window runs over the VOCABULARY (bounded domain), never
    the corpus. The cross join against 3 k-values is constant."""
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    wr = Window.orderBy(F.col("freq").desc(), "tok")
    r = tok.select(
        "freq",
        F.row_number().over(wr).alias("rnk"),
        F.sum("freq")
        .over(wr.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("freq").over(Window.partitionBy()).alias("total"),
        F.count("*").over(Window.partitionBy()).alias("n_vocab"),
    )
    k = spark.createDataFrame([(100,), (1000,), (10000,)], "k: int")
    covered = F.max(
        F.when(F.col("rnk") <= F.col("k"), F.col("cum")).otherwise(F.lit(0))
    )
    return (
        k.crossJoin(r)
        .groupBy(F.col("k").alias("vocab_k"))
        .agg(
            F.min("n_vocab").alias("n_vocab"),
            covered.cast("long").alias("covered"),
            F.round(covered / F.min("total").cast("double"), 6).alias(
                "coverage"
            ),
        )
    )


@register(
    "q_dq_partition_balance",
    oracle="""
    WITH b AS (
        SELECT (o_custkey * 2654435761) % 4294967296 % 32 AS bucket
        FROM orders),
    c AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY bucket),
    t AS (SELECT SUM(n) AS total, CAST(COUNT(*) AS BIGINT) AS n_buckets FROM c)
    SELECT CAST(bucket AS BIGINT) AS bucket, n,
           ROUND(n * 32 / CAST(t.total AS DOUBLE), 6) AS load_factor
    FROM c CROSS JOIN t
    """,
)
def q_dq_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-partition balance audit: bucket the join key with a
    Knuth multiplicative hash into 32 partitions and report each
    bucket's row count and load factor (1.0 = perfectly even) — the
    pre-flight skew check run before keying a 100 TB shuffle on a
    column. The hash is plain 64-bit integer arithmetic (key ·
    2654435761 mod 2³², mod 32), so Spark and DuckDB agree exactly —
    unlike engine-native hashes (xxhash64 vs DuckDB hash), which are
    deliberately NOT comparable cross-engine.

    Scale: one map-side-combining aggregate; load factors near 32/n
    flag a key whose skew would hot-spot a reducer (cf.
    q_join_skew_salted for the fix)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (F.col("o_custkey") * 2654435761) % 4294967296 % 32
    c = o.groupBy(bucket.cast("long").alias("bucket")).agg(
        F.count("*").alias("n")
    )
    t = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "bucket",
        "n",
        F.round(F.col("n") * 32 / F.col("total").cast("double"), 6).alias(
            "load_factor"
        ),
    )


@register(
    "q_llm_length_quantiles",
    oracle="""
    WITH h AS (
        SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM documents GROUP BY 1, 2),
    c AS (
        SELECT source, n_chars, cnt,
               SUM(cnt) OVER (PARTITION BY source ORDER BY n_chars) AS cum,
               SUM(cnt) OVER (PARTITION BY source) AS n
        FROM h)
    SELECT source, CAST(MIN(n) AS BIGINT) AS n_docs,
           MIN(n_chars) FILTER (WHERE cum * 2 >= n) AS p50_chars,
           MIN(n_chars) FILTER (WHERE cum * 10 >= 9 * n) AS p90_chars,
           MIN(n_chars) FILTER (WHERE cum * 100 >= 99 * n) AS p99_chars
    FROM c GROUP BY source
    """,
)
def q_llm_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length quantiles (p50/p90/p99 of n_chars)
    via the histogram + integer cumulative-crossing pattern — the
    length-distribution audit that sets truncation and packing budgets
    per corpus source before training. Discrete quantile semantics,
    exact integers, no interpolation variance.

    Scale: lengths collapse to a (source, n_chars) histogram with
    map-side combine; the window runs per source over the bounded
    length domain — never over documents."""
    d = load_table(spark, sf_dir, "documents")
    h = d.groupBy("source", "n_chars").agg(F.count("*").alias("cnt"))
    c = h.select(
        "source",
        "n_chars",
        F.sum("cnt")
        .over(Window.partitionBy("source").orderBy("n_chars"))
        .alias("cum"),
        F.sum("cnt").over(Window.partitionBy("source")).alias("n"),
    )

    def q_at(num: int, den: int):
        return F.min(
            F.when(F.col("cum") * den >= num * F.col("n"), F.col("n_chars"))
        )

    return c.groupBy("source").agg(
        F.min("n").alias("n_docs"),
        q_at(1, 2).alias("p50_chars"),
        q_at(9, 10).alias("p90_chars"),
        q_at(99, 100).alias("p99_chars"),
    )
