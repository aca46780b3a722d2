"""Round-8 wave 135: streaming-engine depth, batch forms — the
LEFT OUTER stream-stream interval join (watermark-gated null
emission), chained time-window aggregations (Spark 3.4+: agg over an
agg's window column in ONE streaming query), and a stream-stream join
chained into a windowed aggregation (Spark 3.5+ stateful-after-
stateful). Each batch form is exactly DuckDB-oracled here; the TRUE
stream runs and their batch-parity contracts live in
tests/test_streaming.py (wave-135 section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..streaming import transforms as T


def _split_pc(ev: DataFrame):
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    return p, c


@register(
    "q_stream_outer_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.event_id AS click_id, c.ts AS click_ts
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts < p.ts
    """,
)
def q_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join (batch form): every
    purchase, matched to same-user clicks in the preceding hour, with
    click-less purchases kept as NULL rows. The semantics the inner
    join can't give you — conversion analysis needs the unmatched
    purchases too. In TRUE streaming the null rows are emitted only
    when the watermark proves no click can still arrive; the
    emitted-vs-pending split is asserted in tests/test_streaming.py
    ::test_stream_outer_join_parity.

    Scale: identical join shape to q_stream_stream_join — state
    bounded to the interval horizon per side; the outer side adds one
    'has emitted' bit per buffered purchase."""
    p, c = _split_pc(load_table(spark, sf_dir, "events"))
    return T.purchase_click_interval_join(p, c, "left_outer")


@register(
    "q_stream_chained_agg",
    oracle="""
    WITH m AS (
        SELECT event_type,
               date_trunc('minute', ts) AS mw,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
    w AS (
        SELECT event_type,
               TIMESTAMP '1970-01-01 00:00:00'
                 + CAST(CAST(floor(epoch(mw) / 600) AS BIGINT) * 600
                        AS BIGINT) * INTERVAL 1 SECOND AS window_start,
               MAX(c) AS peak_minute,
               CAST(SUM(c) AS BIGINT) AS n_events
        FROM m GROUP BY 1, 2)
    SELECT window_start,
           window_start + INTERVAL 10 MINUTE AS window_end,
           event_type, peak_minute, n_events
    FROM w
    """,
)
def q_stream_chained_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained time-window aggregations (batch form): per-minute event
    counts rolled up into 10-minute windows (peak minute + total per
    event type). In streaming this is ONE query — Spark 3.4+ lets the
    second groupBy window over the first aggregation's window column,
    where pre-3.4 pipelines needed an intermediate sink; stream parity
    in tests/test_streaming.py::test_chained_window_agg_parity.

    Scale: event-grain shuffle once, then minute-grain — the rollup
    costs nothing; streaming state is one count per open (minute,
    type) plus one per open 10-minute window."""
    return T.minute_then_ten_minute_counts(
        load_table(spark, sf_dir, "events"))


@register(
    "q_stream_join_then_agg",
    oracle="""
    WITH jj AS (
        SELECT p.ts, c.event_id AS click_id
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        JOIN (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click') c
          ON p.user_id = c.user_id
         AND c.ts >= p.ts - INTERVAL 1 HOUR
         AND c.ts < p.ts)
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN click_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_even_clicks
    FROM jj GROUP BY 1, 2
    """,
)
def q_stream_join_then_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join chained into a windowed aggregation (batch
    form): hourly counts of purchase←click attribution pairs. One
    streaming query holds BOTH stateful operators (Spark 3.5+); the
    availableNow replay's closed-window parity is asserted in
    tests/test_streaming.py::test_join_then_agg_parity.

    Scale: join state is interval-bounded per side; the agg adds one
    row per open hour — nothing here outlives its watermark."""
    p, c = _split_pc(load_table(spark, sf_dir, "events"))
    return T.join_then_window_counts(p, c)
