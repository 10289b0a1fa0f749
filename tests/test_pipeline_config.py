"""Config-driven pipeline tests: a dict mirroring the reference's
example/streams/filebeat.yml assembles into a running pipeline with the
same observable behavior (processors applied, records delivered,
invalid config rejected before start)."""

from __future__ import annotations

import json

import pytest

from awsbeats_spark.pipeline_config import build_pipeline, build_sink_config
from awsbeats_spark.sinks.local import FileDumpClient


@pytest.fixture
def in_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    lines = [
        {"event_id": 1, "ts": "2024-01-01T00:00:01.000Z", "user_id": 7,
         "event_type": "click", "value": 1.5, "props": '{"k": "a"}'},
        {"event_id": 2, "ts": "2024-01-01T00:00:02.000Z", "user_id": 7,
         "event_type": "debug", "value": 0.0, "props": '{"k": "b"}'},
        {"event_id": 3, "ts": "2024-01-01T00:00:03.000Z", "user_id": 8,
         "event_type": "purchase", "value": 9.0, "props": '{"k": "c"}'},
    ]
    (d / "a.ndjson").write_text("\n".join(json.dumps(x) for x in lines) + "\n")
    return str(d)


def test_config_pipeline_end_to_end(spark, in_dir, tmp_path):
    out_dir = tmp_path / "delivered"
    out_dir.mkdir()
    config = {
        "input": {"paths": in_dir, "json_add_error_key": True},
        "processors": [
            {"add_cloud_metadata": {"provider": "aws", "region": "eu-west-1"}},
            {"drop_event": {"when_regexp": {"event_type": "^debug$"}}},
        ],
        "output": {
            "streams": {
                "region": "ap-northeast-1",
                "stream_name": "test1",
                "partition_key": "props.k",
                "batch_size": 2,
            }
        },
        "queue": {"flush_timeout_s": 1.0},
    }
    q = build_pipeline(
        spark,
        config,
        checkpoint_dir=str(tmp_path / "ckpt"),
        client_factory=lambda _c: FileDumpClient(str(out_dir)),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    records = []
    for f in out_dir.glob("call-*.json"):
        records.extend(json.loads(f.read_text()))
    # debug event dropped by the processor; 2 delivered
    assert len(records) == 2
    keys = sorted(r["partition_key"] for r in records)
    assert keys == ["a", "c"]
    payloads = [json.loads(r["data"]) for r in records]
    assert all(p["cloud_region"] == "eu-west-1" for p in payloads)
    assert all(r["data"].endswith("\n") for r in records)


def test_config_rejects_invalid_before_start(spark):
    with pytest.raises(ValueError, match="region"):
        build_sink_config({"streams": {"stream_name": "s", "partition_key": "k"}})
    with pytest.raises(ValueError, match="batch_size"):
        build_sink_config(
            {"streams": {"region": "r", "stream_name": "s",
                         "partition_key": "k", "batch_size": 501}}
        )
    with pytest.raises(ValueError, match="exactly one sink"):
        build_sink_config({})
    with pytest.raises(ValueError, match="input.paths"):
        build_pipeline(spark, {"output": {"streams": {}}}, checkpoint_dir="/tmp/x")


def test_firehose_output_mode(spark, in_dir, tmp_path):
    out_dir = tmp_path / "fh"
    out_dir.mkdir()
    config = {
        "input": {"paths": in_dir},
        "output": {"firehose": {"region": "us-east-1", "stream_name": "fh1"}},
    }
    q = build_pipeline(
        spark,
        config,
        checkpoint_dir=str(tmp_path / "ckpt_fh"),
        client_factory=lambda _c: FileDumpClient(str(out_dir)),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    records = []
    for f in out_dir.glob("call-*.json"):
        records.extend(json.loads(f.read_text()))
    assert len(records) == 3  # no drop processor; all delivered
