"""End-to-end streaming pipeline: the reference's actual job, on
Structured Streaming.

Reference dataflow (SURVEY.md §3.2): file-tail source -> JSON parse ->
processors (enrich, drop-filter) -> project to {data, partition_key}
records -> batched, retried Kinesis delivery with at-least-once acks.

Engine dataflow: ndjson_stream -> transform_events -> project_records ->
writeStream.foreachBatch(kinesis writer) with checkpointing. The
micro-batch trigger is the size+time flush duality of the libbeat
memory queue (example/streams/filebeat.yml:25-28): processingTime
trigger = flush.timeout, sink-side chunking = batch_size.

Scale: every stage is a narrow per-row transform — no shuffle anywhere
between source and sink, so the pipeline throughput is source-read +
sink-RPC bound at any cluster width. Partition keys (field or xid)
control the Kinesis-side distribution exactly as in the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from awsbeats_spark.sinks.kinesis import SinkConfig, foreach_batch_writer
from awsbeats_spark.sources.streams import CORRUPT_COL


def xid_partition_key() -> Column:
    """Deterministic xid-style key (time-sortable, unique):
    zero-padded micros ++ zero-padded event_id
    (reference: streams/partition_key.go:41-47)."""
    return F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 16, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )


def field_partition_key(field: str) -> Column:
    """Field provider: the configured field's value, NULL when missing
    (NULL rows are dropped+counted downstream, mirroring mapEvents'
    drop-not-retry — streams/client.go:109-125)."""
    if field.startswith("props."):
        return F.get_json_object("props", "$." + field.split(".", 1)[1])
    return F.col(field).cast("string")


def transform_events(
    df: DataFrame,
    drop_event_type_regex: str | None = None,
    cloud_provider: str = "aws",
    cloud_region: str = "us-east-1",
) -> DataFrame:
    """Processor chain: add_cloud_metadata enrichment (B3) + regex
    drop-filter (B4). Corrupt rows (parse failures) are dropped here and
    countable upstream via the `_corrupt_record` column."""
    out = df
    if CORRUPT_COL in df.columns:
        out = out.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    if drop_event_type_regex:
        out = out.filter(~F.col("event_type").rlike(drop_event_type_regex))
    return out.withColumn("cloud_provider", F.lit(cloud_provider)).withColumn(
        "cloud_region", F.lit(cloud_region)
    )


def project_records(df: DataFrame, cfg: SinkConfig, guaranteed: bool = False) -> DataFrame:
    """Event -> {data, partition_key} delivery record: compact JSON of
    all event fields + trailing newline (streams/client.go:127-154), key
    per the configured provider.

    Rows with a NULL key are dropped (the mapEvents drop-and-count path,
    streams/client.go:109-125) — unless ``guaranteed=True``, the engine's
    version of the reference's guaranteed-event branch
    (firehose/client.go:116-121: the reference can only escalate the log
    level, both paths still drop; an engine with typed errors can do
    better and FAIL the batch so the data is never silently lost)."""
    if cfg.partition_key_provider == "xid":
        pk = xid_partition_key()
    else:
        pk = field_partition_key(cfg.partition_key or "event_id")
    payload_cols = [c for c in df.columns]
    data = F.concat(F.to_json(F.struct(*payload_cols)), F.lit("\n"))
    out = df.select(data.alias("data"), pk.alias("partition_key"))
    if cfg.mode == "streams":
        if guaranteed:
            fail = F.raise_error(
                F.concat(
                    F.lit("guaranteed event has no partition key: "), F.col("data")
                )
            )
            out = out.withColumn(
                "partition_key",
                F.when(F.col("partition_key").isNull(), fail).otherwise(
                    F.col("partition_key")
                ),
            )
        else:
            out = out.filter(F.col("partition_key").isNotNull())
    return out


def start_delivery(
    events: DataFrame,
    cfg: SinkConfig,
    checkpoint_dir: str,
    client_factory=None,
    trigger_seconds: float = 3.0,
    drop_event_type_regex: str | None = None,
    transform: bool = True,
):
    """Wire source -> processors -> records -> Kinesis sink and start
    the query. Checkpointing + foreachBatch give the at-least-once
    end-to-end contract (B9): an epoch re-run after failure re-sends its
    records, exactly as the reference's RetryEvents re-enqueue does.

    ``transform=False`` skips the default processor chain — for callers
    (pipeline_config.build_pipeline) that already applied their own
    configured processors."""
    cfg.validate()
    from awsbeats_spark.catalog import _ensure_package_shipped

    _ensure_package_shipped(events.sparkSession)
    if transform:
        events = transform_events(events, drop_event_type_regex=drop_event_type_regex)
    records = project_records(events, cfg)
    kwargs = {} if client_factory is None else {"client_factory": client_factory}
    return (
        records.writeStream.foreachBatch(foreach_batch_writer(cfg, **kwargs))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
