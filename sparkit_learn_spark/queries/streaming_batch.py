"""Batch forms of the streaming operators (q_stream_*).

The driver's DuckDB oracle can only check batch semantics; these run
the shared transforms (streaming/transforms.py) in batch mode. The
pytest suite re-runs the same transforms through Structured Streaming
and asserts batch ≡ stream (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..streaming import transforms as T


@register(
    "q_stream_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts)                      AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR    AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT)                    AS n_events,
           ROUND(SUM(value), 6)                        AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window counts/sums (epoch-aligned, so Spark's
    window() ≡ date_trunc('hour'))."""
    return T.tumbling_counts(load_table(spark, sf_dir, "events"))


@register(
    "q_stream_sliding",
    oracle="""
    WITH offs AS (SELECT unnest(range(0, 4)) AS i),
    placed AS (
      SELECT TIMESTAMP '1970-01-01 00:00:00'
               + CAST((CAST(floor(epoch(ts) / 900) AS BIGINT) - o.i) * 900 AS BIGINT)
                 * INTERVAL 1 SECOND AS window_start
      FROM events, offs o
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           CAST(COUNT(*) AS BIGINT)       AS n_events
    FROM placed
    GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding 15 min. Oracle places each event into
    its 4 windows explicitly (start = floor(epoch/900)*900 − i·900)."""
    return T.sliding_counts(load_table(spark, sf_dir, "events"))


@register(
    "q_stream_session",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           MIN(ts)                        AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE   AS session_end,
           CAST(COUNT(*) AS BIGINT)       AS n_events,
           ROUND(SUM(value), 6)           AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap session windows per user. Spark: native
    session_window (streaming-state capable); oracle: the equivalent
    gaps-and-islands SQL (lag -> cumsum -> group)."""
    return T.session_counts(load_table(spark, sf_dir, "events"))


@register(
    "q_stream_dedup",
    oracle="""
    SELECT event_id, user_id, event_type, ts, value
    FROM (
      SELECT event_id, user_id, event_type, ts, value,
             row_number() OVER (
               PARTITION BY user_id, event_type, date_trunc('day', ts)
               ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic earliest-per-key dedup (batch twin of streaming
    dropDuplicates-with-watermark)."""
    return T.dedup_earliest(load_table(spark, sf_dir, "events"))


@register(
    "q_stream_late",
    oracle="""
    WITH horizon AS (SELECT MAX(ts) - INTERVAL 10 MINUTE AS h FROM events)
    SELECT date_trunc('hour', e.ts)  AS window_start,
           CAST(COUNT(*) AS BIGINT)  AS n_events
    FROM events e, horizon
    WHERE e.ts > horizon.h - INTERVAL 1 HOUR
    GROUP BY 1
    """,
)
def q_stream_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-semantics declaration in batch form: with a 10-min
    watermark at end-of-stream, only windows newer than
    max(ts) − 10 min − 1 h are still open/accepting. The true
    drop-late-rows behavior is asserted in the streaming parity test
    with an out-of-order replay."""
    ev = load_table(spark, sf_dir, "events")
    horizon = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 10 MINUTE")).alias("h")
    )
    return (
        ev.crossJoin(F.broadcast(horizon))
        .filter(F.col("ts") > F.col("h") - F.expr("INTERVAL 1 HOUR"))
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"))
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "q_stream_static_join",
    oracle="""
    SELECT c.c_mktsegment, e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 6)   AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: events ⋈ customer dim (broadcast),
    aggregated per (segment, event_type)."""
    return T.static_enrich(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "customer"),
    )


@register(
    "q_stream_stream_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.event_id AS click_id, c.ts AS click_ts
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    JOIN (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts < p.ts
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (batch form): each purchase matched
    to the same user's clicks in the preceding hour. In streaming both
    sides carry watermarks and the interval bounds join state to the
    watermark horizon per side (parity asserted in
    tests/test_streaming.py::test_stream_stream_interval_join_parity)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return T.purchase_click_interval_join(p, c)


@register(
    "q_stream_neardup_dedup",
    oracle="""
    WITH d AS (
        SELECT doc_id, source,
               TIMESTAMP '2024-02-01 00:00:00'
                 + doc_id * INTERVAL 1 SECOND AS ingest_ts,
               sha256(array_to_string(
                   (string_split_regex(
                        regexp_replace(lower(trim(text)),
                                       '[^a-z0-9 ]', ' ', 'g'),
                        ' +'))[1:8], ' ')) AS fp
        FROM documents),
    half AS (SELECT MAX(doc_id) // 2 AS cut FROM d),
    corpus AS (SELECT DISTINCT fp FROM d, half WHERE doc_id < cut),
    incoming AS (SELECT d.* FROM d, half WHERE doc_id >= cut),
    fresh AS (
        SELECT i.* FROM incoming i
        ANTI JOIN corpus c ON c.fp = i.fp),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp
                                     ORDER BY ingest_ts, doc_id) AS rn
        FROM fresh)
    SELECT doc_id, source, ingest_ts, fp FROM ranked WHERE rn = 1
    """,
)
def q_stream_neardup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the streaming near-dup ingest dedup
    (streaming/transforms.py neardup_dedup_stream): incoming docs
    (upper half of doc_id) fingerprinted on their 8 normalized head
    tokens, anti-joined against the existing-corpus fingerprint set
    (lower half), then deduped within the batch keeping the earliest
    arrival per fingerprint. The STREAMING twin (stream-static anti
    join + watermarked dropDuplicatesWithinWatermark, checkpointed
    state across triggers) is parity-tested in tests/test_streaming.py
    ::test_neardup_dedup_stream_matches_batch / _survives_restart —
    this was the one LLM-pipeline op still batch-only (VERDICT r6 #7).

    Scale: state = one 32-byte digest per in-watermark fingerprint;
    the corpus key table is digest-grain and broadcastable; text never
    travels past the fingerprint projection."""
    from ..sources.parquet_io import documents_batch_with_ingest_ts
    from ..streaming.transforms import (neardup_dedup_batch,
                                        neardup_fingerprint)

    batch = documents_batch_with_ingest_ts(spark, sf_dir)
    # Fingerprint the whole batch ONCE and persist the 32-byte keyed
    # projection: previously the regex-normalize + sha256 over the text
    # ran separately for the corpus half, the incoming half, and the
    # max(doc_id) cut probe re-scanned the table a third time. Every
    # consumer below reads the cached keyed rows; text never leaves the
    # first projection (guide §2.3: shuffle/scan keys, not payloads).
    keyed = batch.select(
        "doc_id", "source", "ingest_ts",
        neardup_fingerprint(F.col("text")).alias("fp"),
    ).persist()
    cut = keyed.agg((F.max("doc_id") / 2).cast("long").alias("cut"))
    b = keyed.crossJoin(F.broadcast(cut))
    corpus_fps = b.filter(F.col("doc_id") < F.col("cut")).select("fp").distinct()
    incoming = b.filter(F.col("doc_id") >= F.col("cut")).drop("cut")
    return neardup_dedup_batch(incoming, corpus_fps).select(
        "doc_id", "source", "ingest_ts", "fp"
    )


@register(
    "q_stream_session_dynamic",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, value,
               CASE WHEN event_type = 'purchase'
                    THEN INTERVAL 30 MINUTE
                    ELSE INTERVAL 10 MINUTE END AS gap
        FROM events),
    marked AS (
        SELECT user_id, ts, value, gap,
               CASE WHEN ts > COALESCE(MAX(ts + gap) OVER (
                        PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING),
                        TIMESTAMP '1900-01-01')
                    THEN 1 ELSE 0 END AS is_start
        FROM g),
    sess AS (
        SELECT user_id, ts, value, gap,
               SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts + gap) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 6) AS sum_value
    FROM sess
    GROUP BY user_id, sid
    """,
)
def q_stream_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows (batch form of
    streaming/transforms.session_counts_dynamic): each event extends
    its session by an EVENT-DEPENDENT gap (purchase 30 min, else 10),
    overlapping extents merging — Spark's expression-gap
    session_window, the API real funnels need ("checkout keeps the
    visit alive"). Oracled via the variable-extension islands
    construction: a session starts where ts exceeds the running max
    of every earlier event's ts+gap; session end = max(ts+gap).

    Scale: one shuffle on user_id; per-key streaming state is the
    open-session extent (native session-window merge), identical to
    the fixed-gap entry."""
    from ..streaming.transforms import session_counts_dynamic

    return session_counts_dynamic(load_table(spark, sf_dir, "events"))
