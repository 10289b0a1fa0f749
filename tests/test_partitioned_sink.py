"""Partitioned-parquet sink tests: layout, file-size bounding, and —
the part that matters at 100 TB — partition pruning on read-back."""

from __future__ import annotations

import os

from awsbeats_spark.catalog import tables
from awsbeats_spark.plans.inspect import formatted_plan
from awsbeats_spark.sinks.partitioned import read_pruned, write_date_partitioned


def test_write_creates_dt_directories(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    events = tables(spark, sf_dir).events
    write_date_partitioned(events, out)
    dts = sorted(d for d in os.listdir(out) if d.startswith("dt="))
    assert len(dts) >= 2  # testdata spans multiple days
    assert all(len(d) == len("dt=2024-01-01") for d in dts)


def test_readback_prunes_partitions(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    events = tables(spark, sf_dir).events
    write_date_partitioned(events, out)
    some_dt = sorted(
        d.split("=", 1)[1] for d in os.listdir(out) if d.startswith("dt=")
    )[0]
    pruned = read_pruned(spark, out, some_dt)
    plan = formatted_plan(pruned)
    # the dt filter must be a PartitionFilters entry (directory pruning),
    # not a post-scan Filter
    assert "PartitionFilters" in plan and "dt" in plan.split("PartitionFilters", 1)[1][:200]
    rows = pruned.count()
    assert 0 < rows < events.count()


def test_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    events = tables(spark, sf_dir).events
    write_date_partitioned(events, out)
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    # event payload survives (dt is additive)
    assert set(events.columns).issubset(set(back.columns))


def test_streaming_foreachbatch_to_partitioned_lake(spark, tmp_path):
    """Streaming events land in the date-partitioned lake through
    foreachBatch — the Firehose->S3 delivery path with the engine's
    partitioned writer as the destination. Partition directories appear
    per event day; rows survive exactly once per micro-batch."""
    import json

    from awsbeats_spark.sinks.partitioned import write_date_partitioned
    from awsbeats_spark.sources.streams import ndjson_stream
    from awsbeats_spark.streaming.pipeline import transform_events

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    lines = [
        {"event_id": 1, "ts": "2024-01-01T10:00:00.000Z", "user_id": 1,
         "event_type": "click", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-02T10:00:00.000Z", "user_id": 2,
         "event_type": "view", "value": 2.0, "props": "{}"},
    ]
    (in_dir / "a.ndjson").write_text("\n".join(json.dumps(x) for x in lines) + "\n")

    out = str(tmp_path / "lake")
    events = transform_events(ndjson_stream(spark, str(in_dir)))

    q = (
        events.writeStream.foreachBatch(
            lambda df, _id: write_date_partitioned(df, out, mode="append")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_lake"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    import os

    dts = sorted(d for d in os.listdir(out) if d.startswith("dt="))
    assert dts == ["dt=2024-01-01", "dt=2024-01-02"]
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert {r["event_id"] for r in back.collect()} == {1, 2}


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC is the second columnar lake format the engine writes/reads
    (built into Spark; Avro needs an external package and is gated off
    in this environment). Full-fidelity round-trip of the orders table."""
    out = str(tmp_path / "orders_orc")
    orders = tables(spark, sf_dir).orders
    orders.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.count() == orders.count()
    assert dict(back.dtypes) == dict(orders.dtypes)
    a = {tuple(r) for r in orders.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Schema evolution: a v2 writer adds a column; mergeSchema reads
    both generations with the unified schema and nulls for the old
    files — the lake-format contract a 100-TB dataset lives by (columns
    get added over years; readers must not break)."""
    out = tmp_path / "evolving"
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v1.write.parquet(str(out / "batch=1"))
    v2 = spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double")
    v2.write.parquet(str(out / "batch=2"))

    merged = spark.read.option("mergeSchema", "true").parquet(str(out))
    assert set(merged.columns) >= {"id", "name", "score"}
    rows = {r["id"]: (r["name"], r["score"]) for r in merged.collect()}
    assert rows[1] == ("a", None)
    assert rows[2] == ("b", 9.5)
