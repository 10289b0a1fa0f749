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
        # it never registered. Drop the entry AND the orphaned location —
        # but resolve the location from the catalog when the entry exists
        # (a convention-derived path is wrong for qualified db.tbl names),
        # and for a truly orphaned directory only delete what this writer
        # could have produced (unqualified name, parquet/bucket files).
        loc = None
        # probe existence via the catalog API first: DESCRIBE on a
        # missing table raises AnalysisException, which Spark's query
        # logger prints as a full ERROR stack trace even when swallowed
        # — pure log noise on the common (table absent) path
        if spark.catalog.tableExists(table):
            try:
                rows = spark.sql(
                    f"DESCRIBE TABLE EXTENDED {table}"
                ).collect()
                loc = next(
                    (r[1] for r in rows if r[0] == "Location"), None
                )
            except Exception:
                pass  # dropped concurrently between probe and describe
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if loc is not None:
            loc = loc.removeprefix("file:")
            if os.path.isdir(loc):
                shutil.rmtree(loc)
        elif "." not in table:
            warehouse = spark.conf.get(
                "spark.sql.warehouse.dir", "spark-warehouse"
            ).removeprefix("file:")
            cand = os.path.join(warehouse, table.lower())
            if os.path.isdir(cand) and _looks_like_table_dir(cand):
                shutil.rmtree(cand)
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def _looks_like_table_dir(path: str) -> bool:
    """True only if every regular file under `path` is something a Spark
    parquet table writer emits — the guard that keeps overwrite-cleanup
    from deleting an unrelated same-named directory in the warehouse."""
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not (
                f.endswith(".parquet")
                or f.endswith(".parquet.crc")
                or f.startswith("_SUCCESS")
                or f.startswith("._SUCCESS")
                or f.startswith(".part-")
            ):
                return False
    return True


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (required — a raw
    path read loses the bucket spec and reintroduces the shuffle)."""
    return spark.table(table)
