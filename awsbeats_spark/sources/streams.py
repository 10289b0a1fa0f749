"""Streaming sources.

Reference parity (SURVEY.md §2.B):
* B1 file-tail with glob paths  -> ndjson_stream (file source; Spark's
  file stream discovers new files, the streaming analog of tailing)
* B2 JSON-line parse, keys under root, error key -> ndjson_stream's
  corrupt-record column
* B8 scheduled probes (heartbeat) -> heartbeat_stream (rate source)
* Kinesis as a SOURCE (BASELINE.json "Structured Streaming + Kinesis
  source") -> kinesis_stream: a thin adapter that uses the external
  spark-sql-kinesis connector when its jar is on the classpath and
  otherwise raises with instructions — the connector is not bundled in
  this environment, so the file-based source stands in locally (same
  downstream pipeline either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def event_schema() -> T.StructType:
    """Schema of the NDJSON event lines used by the pipeline tests
    (FIXTURES.md B1: filebeat-tailed lines like
    {"mykey":"...","myvalue":"..."})."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def ndjson_stream(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """File-tail NDJSON source with keys promoted to top level and an
    error column for corrupt lines.

    filebeat analog: `paths: [glob]` + `json.keys_under_root: true` +
    `json.add_error_key: true` (example/streams/filebeat.yml:9-14).
    Implemented as text-stream + from_json so corrupt lines survive as
    rows with `_corrupt_record` set (PERMISSIVE semantics) instead of
    being silently dropped.
    """
    schema = schema or event_schema()
    raw = spark.readStream.format("text").load(path)
    return raw.select(parse_with_corrupt(F.col("value"), schema))


def parse_with_corrupt(value: F.Column, schema: T.StructType) -> list[F.Column]:
    """from_json with PERMISSIVE corrupt capture: malformed input yields
    a row whose CORRUPT_COL holds the raw line (filebeat's
    json.add_error_key semantics) — note Spark returns an all-null
    struct, NOT a null struct, for malformed lines, so detection must go
    through columnNameOfCorruptRecord, not isNull()."""
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    parsed = F.from_json(
        value, full, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    )
    return [parsed.getField(f.name).alias(f.name) for f in full.fields]


def heartbeat_stream(spark: SparkSession, rows_per_second: int = 1) -> DataFrame:
    """Scheduled-probe source (heartbeat.yml:1-16): the rate source emits
    one row per tick; downstream attaches monitor id + status columns."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 3).alias("monitor_id"),
            F.lit("up").alias("status"),
        )
    )


def kinesis_stream(
    spark: SparkSession, stream_name: str, region: str, endpoint: str | None = None
) -> DataFrame:
    """Kinesis source via the external spark-sql-kinesis connector.

    The connector jar (e.g. `com.qubole.spark:spark-sql-kinesis` or the
    AWS `spark-streaming-kinesis-asl` successor) is NOT bundled here;
    when present on the classpath this returns the raw stream with the
    standard (data, partitionKey, sequenceNumber, approximateArrivalTimestamp)
    columns. Locally, ndjson_stream is the stand-in (SURVEY.md §2.C
    scan_events_stream).
    """
    try:
        reader = (
            spark.readStream.format("kinesis")
            .option("streamName", stream_name)
            .option("region", region)
        )
        if endpoint:
            reader = reader.option("endpointUrl", endpoint)
        return reader.load()
    except Exception as exc:  # noqa: BLE001
        raise NotImplementedError(
            "no Kinesis connector on the classpath; use ndjson_stream locally "
            "or submit with --packages for a Kinesis source"
        ) from exc
