"""Partitioned-parquet sink tests: layout, file-size bounding, and —
the part that matters at 100 TB — partition pruning on read-back."""

from __future__ import annotations

import os

from awsbeats_spark.catalog import tables
from awsbeats_spark.plans.inspect import formatted_plan
from awsbeats_spark.sinks.partitioned import read_pruned, write_date_partitioned


def test_write_creates_dt_directories(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    events = tables(spark, sf_dir).events
    write_date_partitioned(events, out)
    dts = sorted(d for d in os.listdir(out) if d.startswith("dt="))
    assert len(dts) >= 2  # testdata spans multiple days
    assert all(len(d) == len("dt=2024-01-01") for d in dts)


def test_readback_prunes_partitions(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    events = tables(spark, sf_dir).events
    write_date_partitioned(events, out)
    some_dt = sorted(
        d.split("=", 1)[1] for d in os.listdir(out) if d.startswith("dt=")
    )[0]
    pruned = read_pruned(spark, out, some_dt)
    plan = formatted_plan(pruned)
    # the dt filter must be a PartitionFilters entry (directory pruning),
    # not a post-scan Filter
    assert "PartitionFilters" in plan and "dt" in plan.split("PartitionFilters", 1)[1][:200]
    rows = pruned.count()
    assert 0 < rows < events.count()


def test_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    events = tables(spark, sf_dir).events
    write_date_partitioned(events, out)
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    # event payload survives (dt is additive)
    assert set(events.columns).issubset(set(back.columns))
