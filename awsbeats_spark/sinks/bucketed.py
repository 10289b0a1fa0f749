"""Bucketed-table writer — the co-located-join layout for 100 TB.

Partitioning (sinks/partitioned.py) prunes scans; BUCKETING removes the
join/aggregate shuffle itself: two tables written with the same bucket
count on the same key hash-place matching rows in matching files, so a
join between them (or a groupBy on the bucket key) runs with ZERO
Exchange — at 1000 executors that is the difference between moving
100 TB over the network per join and moving nothing. The reference has
no storage layer at all (it delivers to Kinesis — SURVEY.md §0); this is
the engine-side layout its Athena-facing users would need.

Spark only honors bucket metadata through the catalog (saveAsTable, not
path-based parquet), so writers here create managed tables in the
session's warehouse.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a managed parquet table bucketed (and by default
    sorted) by `key`. Sorting within buckets additionally enables
    merge-join without a per-task sort and better run-length/dictionary
    compression on the key column."""
    spark = df.sparkSession
    if mode == "overwrite":
        # A managed table's LOCATION outlives the (in-memory/derby)
        # catalog entry across sessions; a fresh session then fails with
        # LOCATION_ALREADY_EXISTS because "overwrite" can't see a table
        # it never registered. Drop the entry AND the orphaned location.
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        loc = os.path.join(warehouse, table.lower())
        if os.path.isdir(loc):
            shutil.rmtree(loc)
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (required — a raw
    path read loses the bucket spec and reintroduces the shuffle)."""
    return spark.table(table)
