"""End-to-end Structured Streaming tests: NDJSON file-tail source ->
processors -> record projection -> stubbed Kinesis sink, plus windowed
aggregation and watermark dedup under readStream.

This is the engine twin of the reference's e2e smoke (filebeat --once
against the example config, .travis.yml:18-23) — prove the pipeline
wires up and moves real bytes with the documented record contract.
"""

from __future__ import annotations

import json
import uuid
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from awsbeats_spark.sinks.kinesis import SinkConfig
from awsbeats_spark.sources.streams import CORRUPT_COL, event_schema, ndjson_stream
from awsbeats_spark.streaming.pipeline import start_delivery, transform_events

LINES = [
    {"event_id": 1, "ts": "2024-01-01T00:00:01.000Z", "user_id": 7,
     "event_type": "click", "value": 1.5, "props": '{"k": 1}'},
    {"event_id": 2, "ts": "2024-01-01T00:00:02.000Z", "user_id": 7,
     "event_type": "error", "value": 2.5, "props": '{"k": 2}'},
    {"event_id": 3, "ts": "2024-01-01T00:40:00.000Z", "user_id": 8,
     "event_type": "purchase", "value": 9.0, "props": '{"k": 3}'},
]
MALFORMED = '{"event_id": '  # truncated JSON -> corrupt-record path


from awsbeats_spark.sinks.local import FileDumpClient, FlakyFileDumpClient


@pytest.fixture
def in_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.ndjson").write_text(
        "\n".join(json.dumps(line) for line in LINES[:2]) + "\n" + MALFORMED + "\n"
    )
    (d / "b.ndjson").write_text(json.dumps(LINES[2]) + "\n")
    return str(d)


def test_pipeline_end_to_end_delivers_records(spark, in_dir, tmp_path):
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    cfg = SinkConfig(
        region="us-east-1",
        stream_name="events",
        partition_key="props.k",
        batch_size=2,
    )
    events = ndjson_stream(spark, in_dir)
    q = start_delivery(
        events,
        cfg,
        checkpoint_dir=str(tmp_path / "ckpt"),
        client_factory=lambda _cfg: FileDumpClient(str(out_dir)),
        drop_event_type_regex="^error$",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    delivered = []
    for f in out_dir.glob("call-*.json"):
        delivered.extend(json.loads(f.read_text()))
    # 3 valid lines - 1 dropped by regex = 2 delivered; malformed line absent
    assert len(delivered) == 2
    by_key = {r["partition_key"]: r for r in delivered}
    assert set(by_key) == {"1", "3"}  # field provider: props.k values
    for r in delivered:
        assert r["data"].endswith("\n")  # newline contract (client_test.go:76-78)
        payload = json.loads(r["data"])
        assert payload["cloud_provider"] == "aws"  # enrichment applied
        assert payload["event_type"] in {"click", "purchase"}


def test_corrupt_record_column_captures_bad_lines(spark, in_dir):
    # batch read through the same parse path (B2: json.add_error_key)
    from awsbeats_spark.sources.streams import parse_with_corrupt

    raw = spark.read.text(in_dir)
    df = raw.select(parse_with_corrupt(F.col("value"), event_schema()))
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).collect()
    assert len(bad) == 1 and bad[0][CORRUPT_COL].startswith('{"event_id"')
    good = df.filter(F.col(CORRUPT_COL).isNull()).collect()
    assert sorted(r["event_id"] for r in good) == [1, 2, 3]


def test_streaming_tumbling_window_agg(spark, in_dir):
    events = transform_events(ndjson_stream(spark, in_dir))
    agg = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"win_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # append mode only emits closed windows; use complete-mode recount
    finally:
        q.stop()
    # complete mode for deterministic assertion
    name2 = f"win_{uuid.uuid4().hex[:8]}"
    q2 = (
        agg.writeStream.outputMode("complete").format("memory").queryName(name2).start()
    )
    try:
        q2.processAllAvailable()
        rows = spark.sql(f"SELECT event_type, n FROM {name2}").collect()
    finally:
        q2.stop()
    counts = {r["event_type"]: r["n"] for r in rows}
    assert counts == {"click": 1, "error": 1, "purchase": 1}


def test_streaming_watermark_dedup(spark, tmp_path):
    # duplicated delivery (two files with the same events) -> dropDuplicates
    d = tmp_path / "dup"
    d.mkdir()
    body = "\n".join(json.dumps(line) for line in LINES) + "\n"
    (d / "a.ndjson").write_text(body)
    (d / "b.ndjson").write_text(body)

    events = ndjson_stream(spark, str(d))
    clean = transform_events(events)
    deduped = (
        clean.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .select("event_id")
    )
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append").format("memory").queryName(name).start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(f"SELECT event_id FROM {name}").collect()
    finally:
        q.stop()
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]


def test_pipeline_retries_partial_failures_end_to_end(spark, in_dir, tmp_path):
    """Every record fails once with simulated_error, then succeeds on the
    in-batch retry — all records still arrive exactly through the
    partial-failure path (reference scenario: retry exactly the failed
    subset, streams/client_test.go:109-226)."""
    out_dir = tmp_path / "out2"
    out_dir.mkdir()
    state_dir = tmp_path / "state"
    state_dir.mkdir()
    cfg = SinkConfig(
        region="us-east-1",
        stream_name="events",
        partition_key_provider="xid",
        backoff_init_s=0.01,
        backoff_max_s=0.02,
    )
    q = start_delivery(
        ndjson_stream(spark, in_dir),
        cfg,
        checkpoint_dir=str(tmp_path / "ckpt2"),
        client_factory=lambda _cfg: FlakyFileDumpClient(str(out_dir), str(state_dir)),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    delivered = []
    for f in out_dir.glob("call-*.json"):
        delivered.extend(json.loads(f.read_text()))
    assert len(delivered) == 3  # all arrived despite first-attempt failures
    keys = [r["partition_key"] for r in delivered]
    assert len(set(keys)) == 3 and all(len(k) == 28 for k in keys)  # xid: 16+12 chars


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-user state across micro-batches:
    file 2 arrives as a second batch and the user-7 totals accumulate."""
    from awsbeats_spark.streaming.stateful import running_user_totals

    d = tmp_path / "stateful"
    d.mkdir()
    (d / "a.ndjson").write_text(json.dumps(LINES[0]) + "\n")

    events = transform_events(ndjson_stream(spark, str(d)))
    name = f"state_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_totals(events)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch: two more events (one user 7, one user 8)
        (d / "b.ndjson").write_text(
            json.dumps(LINES[1]) + "\n" + json.dumps(LINES[2]) + "\n"
        )
        q.processAllAvailable()
        rows = spark.sql(
            f"SELECT user_id, n_events, total_value FROM {name}"
        ).collect()
    finally:
        q.stop()
    # last update per user wins
    latest = {}
    for r in rows:
        latest[r["user_id"]] = (r["n_events"], r["total_value"])
    assert latest[7] == (2, 4.0)  # 1.5 + 2.5 accumulated across batches
    assert latest[8] == (1, 9.0)


def test_heartbeat_stream_schema(spark):
    from awsbeats_spark.sources.streams import heartbeat_stream

    hb = heartbeat_stream(spark)
    assert set(hb.columns) == {"ts", "monitor_id", "status"}
    assert hb.isStreaming


def test_stream_stream_interval_join(spark, tmp_path):
    """Two live streams join within a 30-minute interval: the user-7
    click at 00:00:01 attributes a (synthetic) purchase at 00:10:00;
    the user-8 purchase at 00:40:00 has no click within the gap."""
    from awsbeats_spark.streaming.joins import interval_join_clicks_to_purchases

    d = tmp_path / "ss"
    d.mkdir()
    rows = [
        dict(LINES[0]),  # user 7 click at 00:00:01
        {"event_id": 10, "ts": "2024-01-01T00:10:00.000Z", "user_id": 7,
         "event_type": "purchase", "value": 42.0, "props": "{}"},
        dict(LINES[2]),  # user 8 purchase at 00:40:00, no prior click
    ]
    (d / "a.ndjson").write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    events = transform_events(ndjson_stream(spark, str(d)))
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    joined = interval_join_clicks_to_purchases(clicks, purchases)
    assert joined.isStreaming

    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()
    assert len(out) == 1
    r = out[0]
    assert (r["p_user"], r["click_id"], r["purchase_id"], r["amount"]) == (7, 1, 10, 42.0)


def test_tws_stateful_totals_across_batches(spark, tmp_path):
    """transformWithStateInPandas accumulates named ValueState across
    micro-batches (Spark 4.x API with timers/TTL; the richer twin of
    test_stateful_running_totals_across_batches)."""
    from awsbeats_spark.streaming.stateful import HAS_TWS, running_user_totals_tws

    if not HAS_TWS:
        pytest.skip("requires Spark 4.x transformWithStateInPandas")

    d = tmp_path / "tws"
    d.mkdir()
    (d / "a.ndjson").write_text(json.dumps(LINES[0]) + "\n")
    events = transform_events(ndjson_stream(spark, str(d)))
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_totals_tws(events)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .start()
    )
    try:
        q.processAllAvailable()
        (d / "b.ndjson").write_text(
            json.dumps(LINES[1]) + "\n" + json.dumps(LINES[2]) + "\n"
        )
        q.processAllAvailable()
        rows = spark.sql(f"SELECT user_id, n_events, total_value FROM {name}").collect()
    finally:
        q.stop()
    latest = {}
    for r in rows:
        latest[r["user_id"]] = (r["n_events"], r["total_value"])
    assert latest[7] == (2, 4.0)
    assert latest[8] == (1, 9.0)


def test_guaranteed_mode_fails_on_missing_key(spark):
    """A10 engine version: in guaranteed mode a missing partition key
    FAILS the batch (typed error) instead of silently dropping; default
    mode drops and delivers the rest."""
    from awsbeats_spark.streaming.pipeline import project_records

    cfg = SinkConfig(region="r", stream_name="s", partition_key="props.missing")
    events = spark.createDataFrame(
        [(1, "click", '{"k": "a"}')], "event_id long, event_type string, props string"
    )
    # default: dropped
    assert project_records(events, cfg).count() == 0
    # guaranteed: batch fails loudly
    with pytest.raises(Exception, match="guaranteed event has no partition key"):
        project_records(events, cfg, guaranteed=True).collect()


def test_checkpoint_restart_resumes_without_reprocessing(spark, in_dir, tmp_path):
    """Stop the delivery query, add new input, restart against the SAME
    checkpoint: the file-source offset log must skip already-delivered
    files (no duplicate records) and pick up only the new ones — the
    engine's version of libbeat's registry-file resume semantics."""
    out_dir = tmp_path / "out_ckpt"
    out_dir.mkdir()
    ckpt = str(tmp_path / "ckpt_resume")
    cfg = SinkConfig(
        region="us-east-1", stream_name="events",
        partition_key="props.k", batch_size=10,
    )

    def deliver():
        q = start_delivery(
            ndjson_stream(spark, in_dir), cfg,
            checkpoint_dir=ckpt,
            client_factory=lambda _cfg: FileDumpClient(str(out_dir)),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    deliver()
    first = []
    for f in out_dir.glob("call-*.json"):
        first.extend(json.loads(f.read_text()))
    assert {json.loads(r["data"])["event_id"] for r in first} == {1, 2, 3}

    late = {"event_id": 4, "ts": "2024-01-01T01:00:00.000Z", "user_id": 9,
            "event_type": "click", "value": 4.0, "props": '{"k": 4}'}
    (Path(in_dir) / "c.ndjson").write_text(json.dumps(late) + "\n")
    deliver()

    all_recs = []
    for f in out_dir.glob("call-*.json"):
        all_recs.extend(json.loads(f.read_text()))
    ids = [json.loads(r["data"])["event_id"] for r in all_recs]
    assert sorted(ids) == [1, 2, 3, 4]  # old files not reprocessed


def test_stream_stream_outer_join_emits_unmatched_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: the matched purchase emits with
    its click; the unmatched purchase emits with NULL click columns —
    but only after the watermark proves no qualifying click can still
    arrive. Later files advance event time to force that eviction."""
    from awsbeats_spark.streaming.joins import interval_join_attribution_outer

    d = tmp_path / "sso"
    d.mkdir()
    rows = [
        dict(LINES[0]),  # user 7 click at 00:00:01
        {"event_id": 10, "ts": "2024-01-01T00:10:00.000Z", "user_id": 7,
         "event_type": "purchase", "value": 42.0, "props": "{}"},
        dict(LINES[2]),  # user 8 purchase at 00:40:00, no prior click
    ]
    (d / "a.ndjson").write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    events = transform_events(ndjson_stream(spark, str(d)))
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    joined = interval_join_attribution_outer(clicks, purchases)
    assert joined.isStreaming

    name = f"sso_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt_sso"))
        .start()
    )
    try:
        q.processAllAvailable()
        # advance BOTH sides' watermarks (global watermark is the min
        # across inputs; rows filtered out before withWatermark don't
        # count) with late click+purchase pairs for unrelated users
        for i, ts in enumerate(
            ["2024-01-01T02:00:00.000Z", "2024-01-01T03:00:00.000Z"]
        ):
            (d / f"wm{i}.ndjson").write_text(
                "\n".join(
                    json.dumps({"event_id": 100 + 2 * i + j, "ts": ts,
                                "user_id": 90 + j, "event_type": et,
                                "value": 0.0, "props": "{}"})
                    for j, et in enumerate(["click", "purchase"])
                )
                + "\n"
            )
            q.processAllAvailable()
        out = {r["purchase_id"]: r for r in spark.sql(f"SELECT * FROM {name}").collect()}
    finally:
        q.stop()

    assert out[10]["click_id"] == 1 and out[10]["amount"] == 42.0
    assert 3 in out, f"unmatched purchase not emitted; got {out}"
    assert out[3]["click_id"] is None


def test_drop_duplicates_within_watermark_evicts_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates arriving within the
    watermark delay are suppressed, but once the watermark passes a key's
    eviction point its state is dropped — a LATER re-occurrence is
    re-emitted. That bounded-state contract is what makes streaming
    dedup viable at 100 TB (plain dropDuplicates keeps key state
    forever and OOMs); re-emission after eviction is in-contract for an
    at-least-once pipeline (reference semantics: duplicates allowed,
    /root/reference/streams/client.go:72-80)."""
    d = tmp_path / "wmdup"
    d.mkdir()

    def emit(fname, *rows):
        (d / fname).write_text(
            "\n".join(
                json.dumps(
                    {"event_id": eid, "ts": ts, "user_id": 1,
                     "event_type": "click", "value": 1.0, "props": "{}"}
                )
                for eid, ts in rows
            )
            + "\n"
        )

    events = ndjson_stream(spark, str(d))
    deduped = (
        transform_events(events)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "ts")
    )
    name = f"wmdedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        emit("f1.ndjson", (1, "2024-01-01T00:00:00.000Z"))
        q.processAllAvailable()
        # duplicate of id 1 within the delay + a watermark-advancing event
        emit("f2.ndjson",
             (1, "2024-01-01T00:00:30.000Z"),
             (2, "2024-01-01T01:00:00.000Z"))
        q.processAllAvailable()
        # id 1's state expired (watermark 00:50 > 00:00 + 10 min) -> re-emit
        emit("f3.ndjson", (1, "2024-01-01T01:00:00.000Z"))
        q.processAllAvailable()
        rows = spark.sql(f"SELECT event_id FROM {name}").collect()
    finally:
        q.stop()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 1, 2], ids


def test_available_now_trigger_drains_and_stops(spark, tmp_path):
    """Trigger.AvailableNow: process everything present, in bounded
    micro-batches, then stop — the batch-over-stream mode used for
    backfills and scheduled catch-up runs of the delivery pipeline."""
    d = tmp_path / "avnow"
    d.mkdir()
    body = "\n".join(json.dumps(line) for line in LINES) + "\n"
    (d / "a.ndjson").write_text(body)

    counts = (
        transform_events(ndjson_stream(spark, str(d)))
        .groupBy("event_type")
        .count()
    )
    name = f"avnow_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow query did not self-stop"
    got = {r["event_type"]: r["count"] for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert got == {"click": 1, "error": 1, "purchase": 1}


def test_metrics_listener_captures_batch_progress(spark, in_dir, tmp_path):
    """The StreamingQueryListener metrics surface (reference Observer
    counters, A21) must account for every input row the delivery
    pipeline processed, and expose them as a queryable DataFrame."""
    import time

    from awsbeats_spark.streaming.metrics import PipelineMetricsListener

    listener = PipelineMetricsListener()
    spark.streams.addListener(listener)
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    cfg = SinkConfig(
        region="eu-west-1", stream_name="metrics-test", batch_size=2,
        partition_key_provider="xid",
    )
    q = start_delivery(
        ndjson_stream(spark, in_dir),
        cfg,
        str(tmp_path / "ckpt"),
        client_factory=lambda _cfg: FileDumpClient(str(out_dir)),
    )
    try:
        q.processAllAvailable()
        qid = str(q.id)
        # listener events are delivered async on the listener bus
        deadline = time.time() + 30
        while listener.total_input_rows(qid) < 3 and time.time() < deadline:
            time.sleep(0.2)
    finally:
        q.stop()
        spark.streams.removeListener(listener)
    assert listener.total_input_rows(qid) >= 3  # the 3 valid LINES (+ corrupt line)
    mdf = listener.as_dataframe(spark).filter(F.col("query_id") == qid)
    got = mdf.selectExpr(
        "sum(num_input_rows) AS rows", "count(*) AS batches"
    ).first()
    assert got["rows"] >= 3 and got["batches"] >= 1


def test_stream_static_broadcast_enrichment_join(spark, in_dir):
    """Stream-static join: each micro-batch broadcast-joins a static
    dimension table — the streaming twin of the reference's
    add_cloud_metadata enrichment (B3, example/streams/filebeat.yml:16-17).
    Unmatched stream rows survive (left join); the static side is
    re-read per batch, so it never holds watermark state."""
    from pyspark.sql.functions import broadcast

    dim = spark.createDataFrame(
        [(7, "emea", "gold"), (99, "apac", "basic")],
        "user_id long, region string, tier string",
    )
    enriched = transform_events(ndjson_stream(spark, in_dir)).join(
        broadcast(dim), "user_id", "left"
    )
    name = f"enrich_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = {r["event_id"]: r for r in spark.table(name).collect()}
    assert rows[1]["region"] == "emea" and rows[1]["tier"] == "gold"
    assert rows[2]["region"] == "emea"
    assert rows[3]["region"] is None  # user 8: no dim row, event kept


def test_rocksdb_state_store_session_window(spark, tmp_path):
    """Stateful aggregation on the RocksDB state store provider — the
    off-heap store that keeps 100-TB-scale streaming state out of
    executor heap (bounded memory, native compaction). The provider is
    a SESSION conf captured at query start (a per-writer option is
    ignored), so it is set before start() and restored after; the
    assertions check RocksDB-specific evidence — rocksdb* custom
    metrics in the progress and the provider's .zip/.changelog
    checkpoint artifacts instead of HDFS provider .delta files."""
    import pandas as pd

    src = tmp_path / "sess_in"
    src.mkdir()
    pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [7, 7, 7, 9],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:10:00",
                    "2024-01-01 02:00:00",
                    "2024-01-01 00:05:00",
                ]
            ),
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    ).to_json(src / "part-0.json", orient="records", lines=True, date_format="iso")
    schema = "event_id long, user_id long, ts timestamp, value double"
    stream = spark.readStream.schema(schema).json(str(src))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    name = f"rocks_{uuid.uuid4().hex[:8]}"
    ckpt = tmp_path / "ckpt"
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(
        conf_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql(
                f"SELECT user_id, n, total FROM {name} ORDER BY user_id, n"
            ).collect()
            metrics = q.lastProgress["stateOperators"][0]["customMetrics"]
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
    # RocksDB-specific custom metrics prove the provider actually ran
    assert any(k.startswith("rocksdb") for k in metrics), metrics
    # and the checkpoint holds RocksDB artifacts (.zip snapshots or
    # .changelog files), not the HDFS provider's .delta files
    state_files = [
        p.name for p in (ckpt / "state").rglob("*") if p.is_file()
    ]
    assert any(
        n.endswith(".zip") or n.endswith(".changelog") for n in state_files
    ), state_files
    assert not any(n.endswith(".delta") for n in state_files), state_files
    got = {(r["user_id"], r["n"]): r["total"] for r in rows}
    # user 7: events at 00:00/00:10 merge into one session (gap<30m),
    # 02:00 opens a second; user 9 has one session
    assert got[(7, 2)] == 3.0
    assert got[(7, 1)] == 3.0
    assert got[(9, 1)] == 4.0
