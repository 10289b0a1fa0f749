"""Table-maintenance writers: small-file compaction and range-sorted
(clustered) layout.

Engine extensions (SURVEY.md §2.C sinks): the reference only ever
appends micro-batches (each Firehose flush lands one S3 object —
/root/reference/example/firehose/filebeat.yml:11-14, 500 events / 30 s),
which at cluster scale produces the classic small-files problem: a
100 TB table written in 500-row objects has ~10^9 files and dies on
metadata alone. These two writers are the compaction / clustering pass
every long-lived streaming table needs.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_small_files(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a many-small-files parquet dataset into ceil(size/target)
    files and return that file count.

    Sizing comes from the ACTUAL on-disk bytes (what HDFS/S3 listing
    reports), not a row-count guess, so compressed width is respected.
    The rewrite is one job: scan → round-robin repartition (no key, so
    no skew) → write. On a real cluster this runs per partition
    directory (dt=...) so only closed partitions rewrite, and the
    128 MiB default matches the HDFS-block / S3-range-request sweet
    spot that keeps one task per file on read."""
    n_files = max(1, math.ceil(_tree_bytes(src) / target_file_bytes))
    spark.read.parquet(src).repartition(n_files).write.mode("overwrite").parquet(dst)
    return n_files


def write_range_sorted(
    df: DataFrame,
    path: str,
    col: str,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write `df` clustered by `col`: range-partition into `n_files`
    non-overlapping key ranges, sort within each, one file per range.

    The payoff is read-side data skipping: every parquet footer carries
    disjoint min/max for `col`, so a point or range predicate prunes to
    the one file (and, within it, the few row groups) that can match —
    the poor man's z-order for a single key. repartitionByRange samples
    the key distribution, so skewed keys still yield balanced files."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode(mode)
        .parquet(path)
    )
