"""Config-driven pipeline assembly: the reference's YAML surface
(filebeat.yml prospectors + processors + output + queue.mem — see
/root/reference/example/streams/filebeat.yml) mapped onto the engine.

A user of the reference configures the whole job declaratively; this
module gives the engine the same UX: one dict in, a running streaming
query out. Keys intentionally mirror the beats config names so a
reference config translates line by line:

    build_pipeline(spark, {
        "input": {"paths": "/mnt/log", "json_add_error_key": True},
        "processors": [
            {"add_cloud_metadata": {"provider": "aws", "region": "us-east-1"}},
            {"drop_event": {"when_regexp": {"event_type": "^debug$"}}},
        ],
        "output": {
            "streams": {                       # or "firehose"
                "region": "ap-northeast-1",
                "stream_name": "test1",
                "partition_key": "props.k",    # or partition_key_provider: xid
                "batch_size": 500,
            }
        },
        "queue": {"flush_timeout_s": 3.0},     # queue.mem flush.timeout
    }, checkpoint_dir=..., client_factory=...)
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbeats_spark.sinks.kinesis import SinkConfig
from awsbeats_spark.sources.streams import ndjson_stream
from awsbeats_spark.streaming.pipeline import start_delivery


def _apply_processors(df: DataFrame, processors: list[dict[str, Any]]) -> DataFrame:
    """Apply the beats-style processor list in order. Supported:
    add_cloud_metadata (B3), drop_event.when_regexp (B4 — regex match
    on a field DROPS the event, matching beats semantics)."""
    out = df
    for proc in processors:
        if len(proc) != 1:
            raise ValueError(f"each processor must have exactly one key: {proc}")
        kind, spec = next(iter(proc.items()))
        spec = spec or {}
        if kind == "add_cloud_metadata":
            out = out.withColumn(
                "cloud_provider", F.lit(spec.get("provider", "aws"))
            ).withColumn("cloud_region", F.lit(spec.get("region", "us-east-1")))
        elif kind == "drop_event":
            when = spec.get("when_regexp") or {}
            for field, pattern in when.items():
                out = out.filter(~F.col(field).rlike(pattern))
        else:
            raise ValueError(f"unknown processor {kind!r}")
    return out


def build_sink_config(output: dict[str, Any]) -> SinkConfig:
    """output.streams / output.firehose block -> validated SinkConfig
    (the reference's A2-A5: unpack, default batch_size, validate)."""
    if len(output) != 1:
        raise ValueError("output must configure exactly one sink")
    mode, spec = next(iter(output.items()))
    if mode not in ("streams", "firehose"):
        raise ValueError(f"unknown output {mode!r} (use streams|firehose)")
    # provider: None = field provider (requires partition_key), "xid" =
    # generated keys — the reference's exact dichotomy (A11-A13); when
    # neither is configured for streams, default to xid like the engine's
    # uniform-spread preference
    provider = spec.get("partition_key_provider")
    if provider is None and not spec.get("partition_key"):
        provider = "xid"
    cfg = SinkConfig(
        mode=mode,
        region=spec.get("region", ""),
        stream_name=spec.get("stream_name", ""),
        partition_key=spec.get("partition_key"),
        partition_key_provider=provider,
        batch_size=int(spec.get("batch_size", 50)),
        max_retries=int(spec.get("max_retries", 3)),
        backoff_init_s=float(spec.get("backoff_init_s", 1.0)),
        backoff_max_s=float(spec.get("backoff_max_s", 60.0)),
    )
    cfg.validate()
    return cfg


def build_pipeline(
    spark: SparkSession,
    config: dict[str, Any],
    checkpoint_dir: str,
    client_factory=None,
):
    """Assemble and START the configured pipeline; returns the
    StreamingQuery. Raises on invalid config BEFORE starting (the
    reference aborts at output construction — streams/streams.go:26-29).
    """
    inp = config.get("input") or {}
    if "paths" not in inp:
        raise ValueError("input.paths is required")
    events = ndjson_stream(spark, inp["paths"])
    # corrupt-row drop (json.add_error_key semantics) without the
    # default enrichment — processors control enrichment explicitly here
    from awsbeats_spark.sources.streams import CORRUPT_COL

    if CORRUPT_COL in events.columns:
        events = events.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)

    processors = config.get("processors") or []
    events = _apply_processors(events, processors)

    cfg = build_sink_config(config.get("output") or {})
    queue = config.get("queue") or {}
    return start_delivery(
        events,
        cfg,
        checkpoint_dir=checkpoint_dir,
        client_factory=client_factory,
        trigger_seconds=float(queue.get("flush_timeout_s", 3.0)),
        transform=False,  # configured processors already applied above
    )
