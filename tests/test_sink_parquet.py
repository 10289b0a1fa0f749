"""Batch write-side tests: partitioned parquet layout and partition
pruning on read-back.

At 100 TB the table layout IS the query plan: a date/type-partitioned
directory tree lets Catalyst prune entire partitions before any IO.
These tests pin (a) the writer produces the hive-style layout, (b) a
filter on the partition column becomes a PartitionFilter (not a data
filter), and (c) pruned reads touch only the matching files.
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables


@pytest.fixture(scope="module")
def part_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_part") / "events_by_day")
    ev = tables(spark, sf_dir).events.withColumn("event_date", F.to_date("ts"))
    (
        ev.repartition("event_date")  # one shuffle -> one file per partition
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(out)
    )
    return out


def test_partitioned_layout_is_hive_style(spark, part_dir, sf_dir):
    days = sorted(
        p.name for p in Path(part_dir).iterdir() if p.name.startswith("event_date=")
    )
    n_days = (
        tables(spark, sf_dir)
        .events.select(F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    assert len(days) == n_days
    # repartition by the partition column -> exactly one data file each
    for p in Path(part_dir).iterdir():
        if p.name.startswith("event_date="):
            files = [f for f in p.iterdir() if f.name.endswith(".parquet")]
            assert len(files) == 1, p.name


def test_partition_filter_prunes_scan(spark, part_dir):
    from awsbeats_spark.plans.inspect import formatted_plan

    df = spark.read.parquet(part_dir).filter(F.col("event_date") == "2024-01-05")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    # the predicate must land in PartitionFilters, not in PushedFilters
    seg = plan[plan.index("PartitionFilters") :]
    assert "event_date" in seg.split("PushedFilters")[0]


def test_pruned_read_matches_unpartitioned(spark, part_dir, sf_dir):
    day = "2024-01-05"
    pruned = spark.read.parquet(part_dir).filter(F.col("event_date") == day)
    full = tables(spark, sf_dir).events.filter(F.to_date("ts") == day)
    assert pruned.count() == full.count() > 0
    # round-trip preserves the row content (spot-check aggregate)
    a = pruned.agg(F.sum("value"), F.count_distinct("user_id")).collect()[0]
    b = full.agg(F.sum("value"), F.count_distinct("user_id")).collect()[0]
    assert abs(a[0] - b[0]) < 1e-6 and a[1] == b[1]


# ---------------------------------------------------------------------------
# ORC: the other columnar format Spark writes natively (no extra jars).
# A Firehose->S3 lake is often ORC for Athena/Hive consumers; prove the
# engine round-trips it losslessly and pushes filters into the ORC scan.
# ---------------------------------------------------------------------------


def test_orc_roundtrip_lossless(spark, sf_dir, tmp_path):
    src = tables(spark, sf_dir).events.select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    out = str(tmp_path / "events_orc")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == src.schema
    assert back.count() == src.count()
    # full-row symmetric difference is empty -> lossless
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_orc_scan_pushes_filters(spark, sf_dir, tmp_path):
    src = tables(spark, sf_dir).events.select("event_id", "event_type", "value")
    out = str(tmp_path / "events_orc_f")
    src.write.mode("overwrite").orc(out)
    df = spark.read.orc(out).filter(F.col("event_type") == "click").select("event_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "event_type" in plan


def test_compaction_reduces_files_preserving_rows(spark, sf_dir, tmp_path):
    """Small-file compaction: a deliberately fragmented copy of events
    (64 files) compacts down to the byte-sized target count with
    identical content."""
    from awsbeats_spark.catalog import tables
    from awsbeats_spark.sinks.maintenance import compact_small_files

    frag = str(tmp_path / "frag")
    compacted = str(tmp_path / "compacted")
    events = tables(spark, sf_dir).events
    events.repartition(64).write.parquet(frag)
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_frag >= 32  # actually fragmented

    n_target = compact_small_files(spark, frag, compacted,
                                   target_file_bytes=256 * 1024)
    n_out = len([f for f in os.listdir(compacted) if f.endswith(".parquet")])
    assert n_out == n_target < n_frag

    a = {r["event_id"] for r in spark.read.parquet(frag).collect()}
    b = {r["event_id"] for r in spark.read.parquet(compacted).collect()}
    assert a == b and len(b) == events.count()


def test_range_sorted_write_gives_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """Range-sorted layout: per-file user_id min/max are pairwise
    disjoint (footer-level data skipping works), and a point lookup
    still pushes its filter to the scan and answers correctly."""
    import pyarrow.parquet as papq

    from awsbeats_spark.catalog import tables
    from awsbeats_spark.plans.inspect import has_pushed_filters
    from awsbeats_spark.sinks.maintenance import write_range_sorted

    out = str(tmp_path / "sorted")
    events = tables(spark, sf_dir).events
    write_range_sorted(events, out, "user_id", n_files=8)

    ranges = []
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        md = papq.read_metadata(os.path.join(out, f))
        idx = md.schema.names.index("user_id")
        lo = min(md.row_group(i).column(idx).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max
                 for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) >= 4
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next, f"overlapping file ranges: {ranges}"

    probe_uid = events.select("user_id").first()["user_id"]
    lookup = spark.read.parquet(out).filter(F.col("user_id") == probe_uid)
    assert has_pushed_filters(lookup, "user_id")
    expect = events.filter(F.col("user_id") == probe_uid).count()
    assert lookup.count() == expect > 0


def test_zorder_layout_skips_on_every_dimension(spark, tmp_path):
    """Z-order clustering must give tight per-file min/max boxes on BOTH
    columns: a predicate on the non-leading dimension prunes most files,
    where a linear single-column sort layout prunes none."""
    import pyarrow.parquet as papq

    from awsbeats_spark.sinks.maintenance import write_range_sorted, write_zordered

    df = spark.range(40000).select(
        (F.col("id") % 200).alias("x"),
        ((F.col("id") * 2654435761) % 1000003 % 200).alias("y"),
        F.col("id").alias("payload"),
    )
    z_dir, lin_dir = str(tmp_path / "zorder"), str(tmp_path / "linear")
    write_zordered(df, z_dir, ["x", "y"], n_files=16)
    write_range_sorted(df, lin_dir, "x", n_files=16)

    def file_boxes(path, cols):
        boxes = []
        for f in sorted(os.listdir(path)):
            if not f.endswith(".parquet"):
                continue
            md = papq.read_metadata(os.path.join(path, f))
            box = {}
            for c in cols:
                idx = md.schema.names.index(c)
                box[c] = (
                    min(md.row_group(i).column(idx).statistics.min
                        for i in range(md.num_row_groups)),
                    max(md.row_group(i).column(idx).statistics.max
                        for i in range(md.num_row_groups)),
                )
            boxes.append(box)
        return boxes

    z_boxes = file_boxes(z_dir, ["x", "y"])
    lin_boxes = file_boxes(lin_dir, ["x", "y"])
    assert len(z_boxes) == 16 and len(lin_boxes) == 16

    def candidates(boxes, pred):  # pred: {col: (lo, hi)}
        return sum(
            1
            for b in boxes
            if all(b[c][0] <= hi and b[c][1] >= lo for c, (lo, hi) in pred.items())
        )

    y_pred = {"y": (100, 109)}
    # x-sorted files each span the full y range: nothing prunes
    assert candidates(lin_boxes, y_pred) == 16
    # z-ordered files carve y into bands: most files prune
    assert candidates(z_boxes, y_pred) <= 8
    # conjunctive rectangle: z-order touches only the matching cell(s)
    rect = {"x": (50, 59), "y": (100, 109)}
    assert candidates(z_boxes, rect) <= 4
    # layout change loses nothing
    assert spark.read.parquet(z_dir).count() == 40000
    got = spark.read.parquet(z_dir).filter(
        "x BETWEEN 50 AND 59 AND y BETWEEN 100 AND 109"
    ).count()
    expect = df.filter("x BETWEEN 50 AND 59 AND y BETWEEN 100 AND 109").count()
    assert got == expect > 0
