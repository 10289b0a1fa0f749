"""Date-partitioned parquet writer — the batch-sink analog of Firehose's
S3 delivery (the reference's Firehose output ultimately lands NDJSON in
date-prefixed S3 objects for Athena; see /root/reference/README.md
firehose section). At 100 TB the partition layout IS the index: readers
prune whole directories via partition filters before touching a footer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    mode: str = "overwrite",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write `df` as parquet partitioned by event date (dt=YYYY-MM-DD).

    - `partitionBy("dt")` → one directory per day; partition pruning on
      read (`WHERE dt = ...`) skips everything else.
    - `maxRecordsPerFile` bounds file size so a hot day splits into many
      files instead of one unsplittable giant.
    - The dt column is DERIVED here, not required upstream — callers
      keep their event-time column untouched.
    """
    (
        df.withColumn("dt", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("dt")
        .parquet(path)
    )


def read_pruned(spark, path: str, dt: str) -> DataFrame:
    """Read back a single day — the partition filter must show up as a
    PartitionFilters entry (asserted in tests), meaning non-matching
    directories are never listed into the scan."""
    return spark.read.parquet(path).filter(F.col("dt") == dt)
