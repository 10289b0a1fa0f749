"""Catalog load-path regression tests.

The round-1 regression: driver testdata writes ``events.ts`` as parquet
``timestamp[us]`` with no timezone, which Spark loads as TIMESTAMP_NTZ —
and NTZ breaks ``unix_micros()`` (partition keys) and ``cast("double")``
(as-of joins) downstream. The catalog must normalize ``ts`` to the
session TimestampType regardless of the on-disk unit (ns / us / ms).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from awsbeats_spark.catalog import _ts_unit, tables


def test_events_ts_is_session_timestamp(spark, sf_dir):
    t = tables(spark, sf_dir)
    assert isinstance(t.events.schema["ts"].dataType, TimestampType)


def test_events_ts_supports_unix_micros(spark, sf_dir):
    # the exact expression that regressed (streaming/pipeline.py xid key)
    t = tables(spark, sf_dir)
    row = t.events.select(F.unix_micros("ts").alias("us")).first()
    assert row["us"] is not None


@pytest.mark.parametrize("unit", ["ns", "us", "ms"])
def test_catalog_normalizes_any_unit(spark, tmp_path, unit):
    ts = pa.array([1_600_000_000_000_000], type=pa.timestamp("us")).cast(
        pa.timestamp(unit)
    )
    tbl = pa.table(
        {
            "event_id": pa.array([1], type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([7], type=pa.int64()),
            "event_type": pa.array(["click"]),
            "value": pa.array([1.5]),
            "props": pa.array(["{}"]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    t = tables(spark, str(tmp_path))
    df = t.events
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = df.select(F.unix_micros("ts").alias("us")).first()["us"]
    assert got == 1_600_000_000_000_000


def test_ts_unit_probes_partitioned_layout(tmp_path):
    # dt=... subdirectory layout: the probe must recurse, not default
    part_dir = tmp_path / "events.parquet" / "dt=2026-01-01"
    os.makedirs(part_dir)
    tbl = pa.table(
        {"ts": pa.array([1_600_000_000_000_000], type=pa.timestamp("ns"))}
    )
    pq.write_table(tbl, str(part_dir / "part-0.parquet"))
    assert _ts_unit(str(tmp_path / "events.parquet")) == "ns"


def test_ts_unit_remote_uri_falls_back(tmp_path):
    # remote URIs aren't probeable with local I/O; fall back, don't raise
    assert _ts_unit("s3://bucket/events.parquet") in ("ns", "us")
    assert _ts_unit(str(tmp_path / "missing.parquet")) in ("ns", "us")


def test_relation_cache_reuses_plan_and_invalidates_on_rewrite(spark, tmp_path):
    # round-11 optimization: the lazy relation (an unexecuted plan) is
    # reused across Catalog instances — no data is cached, but the
    # driver-side footer/schema re-read per operator invocation is gone.
    tbl = pa.table(
        {"r_regionkey": pa.array([0], type=pa.int32()), "r_name": pa.array(["ASIA"])}
    )
    path = tmp_path / "region.parquet"
    pq.write_table(tbl, str(path))
    df1 = tables(spark, str(tmp_path)).region
    df2 = tables(spark, str(tmp_path)).region
    assert df1 is df2  # same lazy plan object, zero re-resolution
    # rewrite the file (different mtime/size) -> cache entry must drop
    tbl2 = pa.table(
        {
            "r_regionkey": pa.array([0, 1], type=pa.int32()),
            "r_name": pa.array(["ASIA", "EMEA"]),
        }
    )
    os.utime(path, (1, 1))  # force mtime change even on coarse filesystems
    pq.write_table(tbl2, str(path))
    df3 = tables(spark, str(tmp_path)).region
    assert df3 is not df1
    assert df3.count() == 2  # fresh data visible, not a stale plan


def test_relation_cache_result_is_recomputed_from_disk(spark, tmp_path):
    # the cache holds a PLAN, not rows: executing the same cached
    # DataFrame after the underlying file grew in place must reflect the
    # new bytes (parquet scans re-list/re-read at execution)
    tbl = pa.table({"r_regionkey": pa.array([0], type=pa.int32())})
    path = tmp_path / "region.parquet"
    pq.write_table(tbl, str(path))
    df = tables(spark, str(tmp_path)).region
    assert df.count() == 1


def test_pair_repartition_width_scales_quadratically(spark, tmp_path):
    """pair_repartition (round 12): the exchange width must track the
    QUADRATIC candidate-pair volume of the source corpus — cores at the
    measured bench calibration point, ~1k partitions at the 10x replica
    (where 512 OOMs a default session and 1024 completes), and the
    AQE-owned column-only repartition past the size gate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from awsbeats_spark.catalog import (
        _CAL_ROWS,
        _PAIR_WIDTH_CAP,
        pair_repartition,
    )

    def width_for(rows: int) -> int:
        d = tmp_path / f"rows{rows}"
        d.mkdir()
        pq.write_table(
            pa.table({"doc_id": pa.array(range(rows), type=pa.int64())}),
            str(d / "documents.parquet"),
        )
        df = spark.range(10).selectExpr("id AS doc_a", "id AS doc_b")
        out = pair_repartition(df, str(d), "documents", "doc_a", "doc_b")
        return out.rdd.getNumPartitions()

    cores = spark.sparkContext.defaultParallelism
    assert width_for(_CAL_ROWS) == max(cores, 11)  # 1.13M pairs / 110k
    w10 = width_for(10 * _CAL_ROWS)
    assert 1000 <= w10 <= 1100  # quadratic: ~113M pairs / 110k ≈ 1027
    assert width_for(100 * _CAL_ROWS) == _PAIR_WIDTH_CAP  # clamped


def test_pair_repartition_rows_unchanged(spark, tmp_path):
    """Repartitioning must never change the relation's rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from awsbeats_spark.catalog import pair_repartition

    pq.write_table(
        pa.table({"doc_id": pa.array(range(100), type=pa.int64())}),
        str(tmp_path / "documents.parquet"),
    )
    df = spark.range(500).selectExpr("id AS doc_a", "(id * 7) % 13 AS doc_b")
    out = pair_repartition(df, str(tmp_path), "documents", "doc_a", "doc_b")
    assert sorted(r["doc_a"] for r in out.collect()) == list(range(500))
