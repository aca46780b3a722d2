"""Batch ≡ stream parity (SURVEY §5.2 #3): every q_stream_* transform
re-run through Structured Streaming (file source, availableNow
trigger, memory sink) must equal its batch result. Plus watermark
late-row semantics on an out-of-order replay.
"""

from __future__ import annotations


import pytest

from pyspark.sql import functions as F

from sparkit_learn_spark.catalog import load_table
from sparkit_learn_spark.sources.parquet_io import read_events_stream
from sparkit_learn_spark.streaming import transforms as T
from sparkit_learn_spark.testing import compare_frames


def run_stream_to_memory(stream_df, name: str, spark):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return read_events_stream(spark, sf_dir)


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.mark.parametrize(
    "tname, fn, needs_watermark",
    [
        ("tumbling", T.tumbling_counts, True),
        ("sliding", T.sliding_counts, True),
        ("session", T.session_counts, True),
        ("session_dynamic", T.session_counts_dynamic, True),
    ],
)
def test_windowed_parity(spark, events_stream, events_batch, tname, fn, needs_watermark):
    src = events_stream.withWatermark("ts", "10 minutes") if needs_watermark else events_stream
    got = run_stream_to_memory(fn(src), f"mem_{tname}", spark).toPandas()
    expect = fn(events_batch).toPandas()
    # complete output mode + availableNow replays everything: no late
    # drops possible on a single ordered file, so results must be equal
    compare_frames(got, expect, name=f"stream_{tname}")


def test_dedup_stream_parity(spark, events_stream, events_batch):
    src = events_stream.withWatermark("ts", "10 minutes")
    q = (
        T.dedup_stream(src)
        .writeStream.format("memory")
        .queryName("mem_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM mem_dedup").first()
    expect = events_batch.select("event_id").distinct().count()
    assert got["n"] == got["d"] == expect


def test_static_join_parity(spark, sf_dir, events_stream, events_batch):
    customer = load_table(spark, sf_dir, "customer")
    got = run_stream_to_memory(
        T.static_enrich(events_stream, customer), "mem_enrich", spark
    ).toPandas()
    expect = T.static_enrich(events_batch, customer).toPandas()
    compare_frames(got, expect, name="stream_static_join")


def test_watermark_drops_late_rows(spark, tmp_path):
    """Out-of-order replay: batch 1 advances event time to 12:00;
    batch 2 delivers a row at 10:00 — far older than the 10-minute
    watermark — plus a fresh row. With update mode + per-file
    triggers, the stale row must NOT create/modify a closed window."""
    indir = str(tmp_path / "in")
    schema = "event_id long, ts timestamp, user_id long, value double"
    raw_schema = "event_id long, ts string, user_id long, value double"
    rows1 = [(1, "2024-01-01 10:00:00", 1, 1.0), (2, "2024-01-01 12:00:00", 1, 1.0)]
    rows2 = [(3, "2024-01-01 10:00:01", 1, 1.0), (4, "2024-01-01 12:01:00", 1, 1.0)]

    def mk(rows):
        return spark.createDataFrame(rows, schema=raw_schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )

    mk(rows1).coalesce(1).write.mode("append").parquet(indir)

    stream = (
        spark.readStream.schema(schema)
        .parquet(indir)
        .withWatermark("ts", "10 minutes")
    )
    agg = stream.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count("*").alias("n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("mem_late")
        .outputMode("update")
        .start()
    )
    # batch 1: watermark advances to 12:00 - 10min = 11:50
    q.processAllAvailable()
    # batch 2: event 3 (10:00:01) is now behind the watermark -> dropped
    mk(rows2).coalesce(1).write.mode("append").parquet(indir)
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT w.start AS s, MAX(n) AS n FROM mem_late GROUP BY 1 ORDER BY 1"
    ).toPandas()
    by_hour = {str(r["s"]): r["n"] for _, r in got.iterrows()}
    # the 10:00 window saw only event 1 before closing; late event 3 dropped
    assert by_hour.get("2024-01-01 10:00:00") == 1
    # the 12:00 window accumulated both fresh events
    assert by_hour.get("2024-01-01 12:00:00") == 2


def test_stream_stream_interval_join_parity(spark, sf_dir, events_batch):
    """Stream-stream inner join (purchases ⋈ clicks within 1h,
    watermarks both sides): availableNow replay must produce exactly
    the batch join's rows — inner interval joins emit on match, so no
    late-drop divergence is possible on an ordered replay."""
    from sparkit_learn_spark.sources.parquet_io import read_events_stream

    def split(df):
        p = df.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        c = df.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        return p, c

    sp, sc = split(read_events_stream(spark, sf_dir))
    joined = T.purchase_click_interval_join(
        sp.withWatermark("ts", "10 minutes"),
        sc.withWatermark("ts", "10 minutes"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("mem_ssj")
        .outputMode("append")  # joins emit on match; append is the only legal mode
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM mem_ssj").toPandas()
    bp, bc = split(events_batch)
    expect = T.purchase_click_interval_join(bp, bc).toPandas()
    assert len(expect) > 0  # fixture must actually exercise the join
    compare_frames(got, expect, name="stream_stream_join")


def test_rate_source_smoke(spark):
    """Beyond the file source: the rate source drives a windowed
    aggregation end-to-end (readStream → transform → memory sink).
    Proves the transforms are source-agnostic — a Kafka source plugs
    into the same pipeline with only the reader swapped."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .load()  # schema: timestamp timestamp, value long
        .select(
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 7).alias("user_id"),
            (F.col("value") % 100 / 10.0).alias("value"),
        )
    )
    q = (
        T.tumbling_counts(stream.withWatermark("ts", "10 seconds")
                          .withColumn("event_type", F.lit("rate")))
        .writeStream.format("memory")
        .queryName("mem_rate")
        .outputMode("complete")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            q.processAllAvailable()
            n = spark.sql("SELECT COALESCE(SUM(n_events),0) AS n FROM mem_rate").first()["n"]
            if n and n > 0:
                break
            time.sleep(1)
        assert n > 0
    finally:
        q.stop()


def test_transform_with_state_matches_batch(spark, sf_dir, events_stream, events_batch):
    """transformWithStateInPandas (Spark 4 typed-state API, RocksDB
    provider): latest emitted state per user == batch aggregate —
    the same parity contract as the applyInPandasWithState test.
    The operator's driver-side worker requires google.protobuf
    (not shipped in this container) — skip cleanly where absent."""
    pytest.importorskip("google.protobuf.descriptor")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            T.running_user_totals_tws(events_stream)
            .writeStream.format("memory")
            .queryName("mem_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            """
            SELECT user_id, n_events, sum_value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                                           ORDER BY n_events DESC) AS rn
              FROM mem_tws) WHERE rn = 1
            """
        ).toPandas()
        expect = T.running_user_totals_batch(events_batch).toPandas()
        compare_frames(got, expect, name="transform_with_state")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stateful_running_totals_matches_batch(spark, sf_dir, events_stream, events_batch):
    """applyInPandasWithState: after consuming the whole stream, the
    latest emitted state per user must equal the batch aggregate."""
    q = (
        T.running_user_totals_stream(events_stream)
        .writeStream.format("memory")
        .queryName("mem_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        """
        SELECT user_id, n_events, sum_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY n_events DESC) AS rn
          FROM mem_state) WHERE rn = 1
        """
    ).toPandas()
    expect = T.running_user_totals_batch(events_batch).toPandas()
    compare_frames(got, expect, name="stateful_running_totals")


def test_foreachbatch_idempotent_sink(spark, events_stream, events_batch, tmp_path):
    """foreachBatch exactly-once pattern: the sink writes each micro-
    batch to a batchId-named directory and SKIPS directories that
    already exist, so a replayed batch (the at-least-once delivery
    Structured Streaming guarantees on restart) cannot double-write.
    We drive the same batch function twice to simulate the replay and
    assert the sink's contents equal the batch aggregate exactly once."""
    out = str(tmp_path / "sink")
    agg = T.tumbling_counts(events_stream)

    seen: list[int] = []

    def write_batch(batch_df, batch_id: int) -> None:
        import os

        target = f"{out}/batch_id={batch_id}"
        if os.path.exists(target):  # replayed batch — idempotent skip
            return
        batch_df.write.mode("errorifexists").parquet(target)
        seen.append(batch_id)
        # simulate the at-least-once redelivery: run the writer again
        # with the same batch id — it must no-op, not duplicate
        if os.path.exists(target):
            before = len(os.listdir(target))
            write_batch(batch_df, batch_id)
            assert len(os.listdir(target)) == before

    q = (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert seen, "no micro-batch was delivered"
    got = spark.read.parquet(f"{out}/batch_id={max(seen)}")
    compare_frames(got.toPandas(),
                   T.tumbling_counts(events_batch).toPandas(),
                   name="foreachbatch_idempotent")


def test_stateful_incremental_multi_trigger(spark, events_batch, tmp_path):
    """Incremental-aggregation parity across MULTIPLE availableNow
    triggers (verdict r5 #7): the events land in three separate file
    drops, each processed by a separate query run sharing ONE
    checkpoint, so per-user state must survive query restarts and keep
    accumulating. Every user's LAST emission (across all three runs)
    must equal the batch aggregate over the full table — the property
    an incrementally-maintained aggregate needs in production, where
    the stream is never replayed from scratch."""
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ev = events_batch.select("user_id", "value", "event_id")
    schema = "user_id long, value double, event_id long"

    sink_dir = str(tmp_path / "sink")
    for i in range(3):
        (ev.filter(F.pmod("event_id", F.lit(3)) == i)
           .write.mode("append").parquet(src_dir))
        stream = spark.readStream.schema(schema).parquet(src_dir)

        def write_batch(batch_df, batch_id, run=i):
            (batch_df.withColumn("run", F.lit(run))
             .write.mode("append").parquet(sink_dir))

        # memory sink cannot recover from a checkpoint; foreachBatch can
        q = (
            T.running_user_totals_stream(stream)
            .writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    all_rows = spark.read.parquet(sink_dir).toPandas()
    # last emission per user = highest n_events (totals only grow)
    last = (all_rows.sort_values(["user_id", "n_events"])
            .groupby("user_id").tail(1).set_index("user_id"))
    expect = T.running_user_totals_batch(events_batch).toPandas().set_index("user_id")
    assert len(last) == len(expect)
    assert (last["n_events"].sort_index() == expect["n_events"].sort_index()).all()
    # chunked accumulation order differs from the batch sum's, so the
    # 6dp-rounded floats compare with tolerance, not bit equality
    diff = (last["sum_value"].sort_index() - expect["sum_value"].sort_index()).abs()
    assert float(diff.max()) < 2e-6
    # state really carried across runs: run-2 emissions include counts
    # from earlier chunks (strictly greater than run 2's own rows)
    r2 = all_rows[all_rows["run"] == 2]
    own = ev.filter(F.pmod("event_id", F.lit(3)) == 2).groupBy("user_id").count().toPandas()
    merged = r2.merge(own, on="user_id")
    assert (merged["n_events"] > merged["count"]).any()


def test_attribution_stream_matches_batch_window(spark, sf_dir, events_stream, events_batch):
    """Streaming last-touch attribution (stateful, one timestamp per
    user) aggregated to day grain equals the batch window form
    (q_evt_attribution's logic): same purchases, same attributed
    count, same attributed value."""
    q = (
        T.attribution_stream(events_stream)
        .writeStream.format("memory")
        .queryName("mem_attr")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        """
        SELECT CAST(date_trunc('day', timestamp_micros(purchase_us)) AS DATE) AS day,
               COUNT(*) AS purchases,
               COUNT(CASE WHEN click_us >= 0 THEN 1 END) AS attributed,
               ROUND(SUM(CASE WHEN click_us >= 0 THEN value ELSE 0 END), 6)
                 AS attributed_value
        FROM mem_attr GROUP BY 1
        """
    ).toPandas()
    from sparkit_learn_spark.registry import all_queries

    expect = all_queries()["q_evt_attribution"](
        spark, sf_dir
    ).toPandas()
    compare_frames(got, expect, name="attribution_stream")


def test_session_timeout_emits_on_idle(spark, sf_dir, tmp_path):
    """Processing-time state timeout: once the only file is consumed
    and the 5s gap lapses, the engine's self-scheduled timeout batches
    must EMIT every open session (state removed) — totals equal the
    batch per-user aggregate. Polling, not processAllAvailable: with
    processing-time timeouts the engine always has future work
    scheduled, so processAllAvailable would never settle."""
    import time

    src = str(tmp_path / "src")
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value").limit(2000)
    ev.write.parquet(src)
    n_users = ev.select("user_id").distinct().count()
    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    q = (
        T.session_timeout_stream(stream, gap_s=5)
        .writeStream.format("memory")
        .queryName("mem_sess_to")
        .outputMode("append")
        .start()
    )
    got = None
    try:
        deadline = time.time() + 180
        while time.time() < deadline:
            time.sleep(5)
            got = spark.sql(
                "SELECT user_id, SUM(n_events) AS n, ROUND(SUM(sum_value), 6) AS v "
                "FROM mem_sess_to GROUP BY user_id"
            ).toPandas()
            if len(got) >= n_users:
                break
    finally:
        q.stop()
    expect = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("v"))
        .toPandas()
    )
    assert len(got) == len(expect) == n_users
    g = got.set_index("user_id").sort_index()
    e = expect.set_index("user_id").sort_index()
    assert (g["n"] == e["n"]).all()
    assert (g["v"] - e["v"]).abs().max() < 2e-6


def test_foreachbatch_idempotent_merge(spark, sf_dir, tmp_path):
    """foreachBatch exactly-once sink pattern: each micro-batch MERGEs
    into a keyed target (last-write-wins per user) instead of blind
    appends, so replaying a batch cannot double-count — the sink-side
    idempotency contract a production stream needs on top of
    checkpointed sources. Verified: the merged target equals the batch
    ground truth (per-user event counts), and re-applying the final
    batch leaves the target unchanged (idempotence)."""
    events = load_table(spark, sf_dir, "events")
    target: dict[int, int] = {}
    applied = []

    def merge_batch(batch_df, batch_id: int):
        # batch_df IS the complete-mode aggregate (user_id, n)
        rows = batch_df.collect()
        applied.append({int(r["user_id"]): int(r["n"]) for r in rows})
        # keyed overwrite (complete-mode aggregate): replay-safe
        for r in rows:
            target[int(r["user_id"])] = int(r["n"])

    src = read_events_stream(spark, sf_dir)
    agg = src.groupBy("user_id").agg(F.count("*").alias("n"))
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(lambda df, bid: merge_batch(df, bid))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    truth = {
        int(r["user_id"]): int(r["n"])
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert target == truth
    # idempotence: re-applying the last seen batch changes nothing
    before = dict(target)
    for uid, n in applied[-1].items():
        target[uid] = n
    assert target == before


def test_python_streaming_datasource_matches_batch(spark, tmp_path):
    """Custom Python STREAMING data source (SimpleDataSourceStreamReader):
    counter offsets, deterministic micro-batches, availableNow drain —
    the collected stream must equal the pure-function batch rendering
    of the same id range (order-insensitive compare on sorted rows)."""
    from sparkit_learn_spark.sources.pysource import (
        register_telemetry_stream_source,
    )

    register_telemetry_stream_source(spark)
    q = (
        spark.readStream.format("telemetry_stream")
        .option("max_rows", 500)
        .option("batch", 128)
        .load()
        .writeStream.format("memory")
        .queryName("pystream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT COUNT(*) FROM pystream_sink").first()[0] >= 500:
            break
        time.sleep(1)
    q.stop()
    got = sorted(
        spark.sql("SELECT * FROM pystream_sink").collect(),
        key=lambda r: r.id,
    )
    assert len(got) == 500
    for i, r in enumerate(got):
        assert r.id == i
        assert r.sensor == f"s{i % 7}"
        assert abs(r.reading - (i * 37 % 1000) / 10.0) < 1e-12


def test_neardup_dedup_stream_matches_batch(spark, sf_dir):
    """Streaming near-dup ingest dedup (fingerprint anti-join against
    the static corpus + watermarked within-stream dropDuplicates) must
    keep exactly the batch twin's surviving-fingerprint set. The
    representative row is arrival-order-dependent by contract, so
    parity is asserted on the fp set + count, and on the full rows
    where the batch pick is unique."""
    from sparkit_learn_spark.sources.parquet_io import (
        documents_batch_with_ingest_ts, read_documents_stream)

    batch = documents_batch_with_ingest_ts(spark, sf_dir)
    median = batch.approxQuantile("doc_id", [0.5], 0.0)[0]
    corpus_fps = (
        batch.filter(F.col("doc_id") < median)
        .select(T.neardup_fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .cache()
    )
    newdocs_stream = read_documents_stream(spark, sf_dir).filter(
        F.col("doc_id") >= median
    )
    # full-input parity needs the dedup horizon to cover the fixture's
    # max intra-fingerprint ingest_ts spread (ADVICE r7): derive it
    # instead of assuming the 1 h default happens to be wide enough
    spread_s = (
        batch.filter(F.col("doc_id") >= median)
        .select(T.neardup_fingerprint(F.col("text")).alias("fp"), "ingest_ts")
        .groupBy("fp")
        .agg((F.unix_timestamp(F.max("ingest_ts"))
              - F.unix_timestamp(F.min("ingest_ts"))).alias("spread"))
        .agg(F.max("spread")).first()[0]
    )
    horizon = f"{int(spread_s) + 60} seconds"
    q = (
        T.neardup_dedup_stream(newdocs_stream, corpus_fps, horizon=horizon)
        .writeStream.format("memory")
        .queryName("neardup_dedup_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM neardup_dedup_mem").toPandas()
    expect = T.neardup_dedup_batch(
        batch.filter(F.col("doc_id") >= median), corpus_fps
    ).toPandas()
    assert len(got) == len(expect) > 0
    assert set(got["fp"]) == set(expect["fp"])
    # every kept doc's fp must be absent from the corpus
    corpus = {r["fp"] for r in corpus_fps.collect()}
    assert not (set(got["fp"]) & corpus)


def test_neardup_dedup_stream_state_survives_restart(spark, sf_dir, tmp_path):
    """Cross-trigger dedup state: a fingerprint emitted in trigger 1
    must NOT re-emit when its duplicate arrives in trigger 2 after a
    query restart from the checkpoint (the multi-trigger pattern of
    test_stateful_incremental_multi_trigger, applied to the ingest
    dedup)."""
    import os

    from sparkit_learn_spark.sources.parquet_io import (
        documents_batch_with_ingest_ts)

    batch = documents_batch_with_ingest_ts(spark, sf_dir).select(
        "doc_id", "text", "source", "ingest_ts"
    )
    median = batch.approxQuantile("doc_id", [0.5], 0.0)[0]
    corpus_fps = (
        batch.filter(F.col("doc_id") < median)
        .select(T.neardup_fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .cache()
    )
    new = batch.filter(F.col("doc_id") >= median).cache()
    # trigger 1: even new docs; trigger 2: odd new docs PLUS exact
    # re-sends of the even docs (planted cross-trigger duplicates)
    src = str(tmp_path / "src")
    os.makedirs(src)
    even = new.filter(F.col("doc_id") % 2 == 0)
    odd = new.filter(F.col("doc_id") % 2 == 1)
    even.coalesce(1).write.parquet(src + "/batch1.dir")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_available():
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, source string, ingest_ts timestamp"
            ).option("recursiveFileLookup", "true").parquet(src)
        )
        q = (
            T.neardup_dedup_stream(stream, corpus_fps)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_available()
    n1 = spark.read.parquet(sink).count()
    assert n1 > 0
    odd.unionAll(even).coalesce(1).write.parquet(src + "/batch2.dir")
    run_available()
    out = spark.read.parquet(sink)
    n2 = out.count()
    # the re-sent even docs must NOT re-emit: growth == odd's new fps
    batch_all = T.neardup_dedup_batch(new, corpus_fps)
    assert n2 == batch_all.count()
    assert out.groupBy("fp").count().filter(F.col("count") > 1).count() == 0


def test_session_dynamic_state_survives_restart(spark, sf_dir, tmp_path):
    """Dynamic-gap session windows in TRUE stream mode with state
    carried across a checkpoint restart (VERDICT r7 item 8): trigger 1
    sees only events before the time cutoff, trigger 2 (a fresh query
    start on the same checkpoint) sees only events after it — sessions
    straddling the cutoff exist in neither trigger's input alone, so
    final parity with the batch islands construction proves the
    expression-gap session state merged across triggers."""
    import os

    batch = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).cache()
    cutoff = batch.approxQuantile("value", [0.0], 0.0) and \
        batch.selectExpr("percentile_approx(ts, 0.5) AS m").first()["m"]
    early = batch.filter(F.col("ts") < F.lit(cutoff))
    late = batch.filter(F.col("ts") >= F.lit(cutoff))
    assert early.count() > 0 and late.count() > 0

    src = str(tmp_path / "src")
    os.makedirs(src)
    early.coalesce(1).write.parquet(src + "/batch1.dir")
    ckpt = str(tmp_path / "ckpt")

    def run_available():
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double"
            ).option("recursiveFileLookup", "true").parquet(src)
            .withWatermark("ts", "10 minutes")
        )
        q = (
            T.session_counts_dynamic(stream)
            .writeStream.format("memory")
            .queryName("sess_dyn_restart")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_available()
    n1 = spark.sql("SELECT COUNT(*) AS n FROM sess_dyn_restart").first()["n"]
    assert n1 > 0
    late.coalesce(1).write.parquet(src + "/batch2.dir")
    run_available()

    got = spark.sql("SELECT * FROM sess_dyn_restart").toPandas()
    expect = T.session_counts_dynamic(batch).toPandas()
    compare_frames(got, expect, name="session_dynamic_restart")
    # the merge is only proven non-vacuous if some session straddles
    # the cutoff (present in neither trigger's input alone)
    straddlers = (
        (got["session_start"] < cutoff) & (got["session_end"] > cutoff)
    ).sum()
    assert straddlers > 0, "no session straddles the cutoff; merge untested"


# ---------------------------------------------------------------- wave 135


def _split_pc(df):
    p = df.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = df.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return p, c


def test_stream_outer_join_parity(spark, sf_dir, events_batch):
    """LEFT OUTER stream-stream interval join: matched rows must equal
    the batch inner join exactly; null rows may only appear for
    purchases the batch left join also leaves unmatched; and every
    unmatched purchase old enough that the final watermark has
    provably closed it (ts + join horizon + watermark delay < max
    event time) MUST have been emitted as a null row."""
    sp, sc = _split_pc(read_events_stream(spark, sf_dir))
    joined = T.purchase_click_interval_join(
        sp.withWatermark("ts", "10 minutes"),
        sc.withWatermark("ts", "10 minutes"),
        "left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("mem_soj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM mem_soj").toPandas()

    bp, bc = _split_pc(events_batch)
    inner = T.purchase_click_interval_join(bp, bc, "inner").toPandas()
    outer = T.purchase_click_interval_join(bp, bc, "left_outer").toPandas()
    unmatched = set(
        outer.loc[outer["click_id"].isnull(), "event_id"].astype(int)
    )
    assert unmatched, "fixture must contain click-less purchases"

    got_matched = got[got["click_id"].notnull()].copy()
    # the nullable outer column arrives as float64 in pandas; restore
    # the int dtype of the inner-join frame before the hash compare
    got_matched["click_id"] = got_matched["click_id"].astype("int64")
    compare_frames(got_matched, inner, name="stream_outer_join_matched")

    got_null_ids = set(got.loc[got["click_id"].isnull(), "event_id"].astype(int))
    assert got_null_ids <= unmatched  # no spurious null emission

    # closed-horizon completeness: watermark delay 10min + interval 1h,
    # with 1h slack for Spark's internal eviction cadence
    import pandas as pd

    max_ts = events_batch.agg(F.max("ts")).collect()[0][0]
    closed = outer[
        outer["click_id"].isnull()
        & (outer["ts"] + pd.Timedelta(hours=2, minutes=10) < max_ts)
    ]
    missing = set(closed["event_id"].astype(int)) - got_null_ids
    assert not missing, f"closed unmatched purchases never emitted: {missing}"


def test_chained_window_agg_parity(spark, sf_dir, events_batch):
    """Two chained time-window aggregations in ONE streaming query
    (Spark 3.4+): on an availableNow replay with watermark, every
    10-minute window the watermark closed must equal the batch rollup;
    complete coverage of all-but-the-final-horizon windows."""
    stream = T.minute_then_ten_minute_counts(
        read_events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("mem_chain")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM mem_chain").toPandas()
    expect = T.minute_then_ten_minute_counts(events_batch).toPandas()

    import pandas as pd

    max_ts = events_batch.agg(F.max("ts")).collect()[0][0]
    # windows whose end precedes the final watermark minus one rollup
    # width are certainly closed and emitted
    horizon = max_ts - pd.Timedelta(minutes=30)
    exp_closed = expect[expect["window_end"] <= horizon]
    got_keyed = got.set_index(["window_start", "event_type"])
    assert len(exp_closed) > 0
    for _, r in exp_closed.iterrows():
        g = got_keyed.loc[(r["window_start"], r["event_type"])]
        assert int(g["peak_minute"]) == int(r["peak_minute"])
        assert int(g["n_events"]) == int(r["n_events"])
    # and nothing the stream emitted disagrees with batch
    exp_keyed = expect.set_index(["window_start", "event_type"])
    for _, r in got.iterrows():
        e = exp_keyed.loc[(r["window_start"], r["event_type"])]
        assert int(r["peak_minute"]) == int(e["peak_minute"])
        assert int(r["n_events"]) == int(e["n_events"])


def test_join_then_agg_parity(spark, sf_dir, events_batch):
    """Stream-stream join chained into a windowed agg (Spark 3.5+
    stateful-after-stateful): closed hourly windows equal batch."""
    sp, sc = _split_pc(read_events_stream(spark, sf_dir))
    stream = T.join_then_window_counts(
        sp.withWatermark("ts", "10 minutes"),
        sc.withWatermark("ts", "10 minutes"),
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("mem_jta")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM mem_jta").toPandas()

    bp, bc = _split_pc(events_batch)
    expect = T.join_then_window_counts(bp, bc).toPandas()

    import pandas as pd

    max_ts = events_batch.agg(F.max("ts")).collect()[0][0]
    # join horizon (1h) + watermark (10min) + agg window (1h) + slack
    horizon = max_ts - pd.Timedelta(hours=4)
    exp_closed = expect[expect["window_end"] <= horizon]
    assert len(exp_closed) > 0
    got_keyed = got.set_index("window_start")
    for _, r in exp_closed.iterrows():
        g = got_keyed.loc[r["window_start"]]
        assert int(g["n_pairs"]) == int(r["n_pairs"])
        assert int(g["n_even_clicks"]) == int(r["n_even_clicks"])
    exp_keyed = expect.set_index("window_start")
    for _, r in got.iterrows():
        e = exp_keyed.loc[r["window_start"]]
        assert int(r["n_pairs"]) == int(e["n_pairs"])
        assert int(r["n_even_clicks"]) == int(e["n_even_clicks"])


def test_neardup_dedup_batch_precomputed_fp_path(spark, sf_dir):
    """r11 optimization seam: neardup_dedup_batch with a precomputed
    `fp` column (q_stream_neardup_dedup fingerprints the whole batch
    once and persists the keyed projection) must return exactly the
    rows of the compute-from-text path."""
    from sparkit_learn_spark.sources.parquet_io import (
        documents_batch_with_ingest_ts)

    batch = documents_batch_with_ingest_ts(spark, sf_dir)
    median = batch.approxQuantile("doc_id", [0.5], 0.0)[0]
    corpus_fps = (
        batch.filter(F.col("doc_id") < median)
        .select(T.neardup_fingerprint(F.col("text")).alias("fp"))
        .distinct()
    )
    incoming_text = batch.filter(F.col("doc_id") >= median)
    incoming_fp = incoming_text.select(
        "doc_id", "source", "ingest_ts",
        T.neardup_fingerprint(F.col("text")).alias("fp"),
    )
    compare_frames(
        T.neardup_dedup_batch(incoming_fp, corpus_fps).toPandas(),
        T.neardup_dedup_batch(incoming_text, corpus_fps).toPandas(),
        name="neardup_batch_fp_seam",
    )
