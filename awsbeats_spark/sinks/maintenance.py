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


def zorder_expr(df: DataFrame, cols: list[str], bits: int = 16):
    """A Column computing the Z-order (Morton) value of `cols`: each
    column is min/max-normalized into a `bits`-bit bucket, then the
    buckets' bits are interleaved. Pure built-in expressions (floor /
    shiftright / bitwise ops), so the whole computation stays inside
    whole-stage codegen — no UDF, no shuffle beyond the one min/max agg.

    Interleaving makes points close in ALL dimensions close in z-value,
    so sorting by it clusters every dimension at once — the multi-column
    generalization of write_range_sorted. Bucket edges come from a
    single global min/max aggregate (one cheap job); for heavily skewed
    dimensions substitute quantile edges from approx_percentile.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).first()
    k = len(cols)
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1.0
        bucket = F.least(
            F.lit(top),
            F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * F.lit(top)),
        ).cast("long")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(bucket, i).bitwiseAND(F.lit(1)), k * i + j)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write `df` clustered on the Z-order curve over `cols`:
    range-partition by z-value into `n_files` files, sorted within each.

    Read-side payoff: parquet footer min/max on EVERY listed column is
    tight per file, so conjunctive range predicates over any subset of
    `cols` skip most files — where a linear sort only skips on its
    leading column. This is the layout pass behind multi-dimensional
    data skipping at 100 TB (Delta/Iceberg OPTIMIZE ZORDER does the
    same thing); rewriting costs one full shuffle, amortized across
    every subsequent scan."""
    zcol = zorder_expr(df, cols, bits)
    (
        df.withColumn("__z", zcol)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
