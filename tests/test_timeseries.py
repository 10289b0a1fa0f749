"""Invariant tests for the time-series operators (operators/timeseries.py).

Oracle parity is checked by the driver / tools/verify_local.py; these
tests pin the semantic laws that a hash comparison alone would not
explain when broken.
"""

from __future__ import annotations

import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def gap_rows(spark, sf_dir):
    return SPECS["ts_gap_fill_ffill"].fn(spark, sf_dir).collect()


def test_gap_fill_grid_is_dense_and_aligned(spark, sf_dir, gap_rows):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_types = ev.select("event_type").distinct().count()
    hours = {r["hour"] for r in gap_rows}
    assert len(gap_rows) == n_types * len(hours)
    # every hour is on the hour, and the hour set is contiguous
    assert all(h.minute == 0 and h.second == 0 for h in hours)
    lo, hi = min(hours), max(hours)
    assert len(hours) == int((hi - lo).total_seconds()) // 3600 + 1


def test_gap_fill_forward_fill_law(gap_rows):
    per_type: dict[str, list] = {}
    for r in gap_rows:
        per_type.setdefault(r["event_type"], []).append(r)
    saw_gap = False
    for rs in per_type.values():
        rs.sort(key=lambda r: r["hour"])
        last = None
        for r in rs:
            if r["is_gap"]:
                saw_gap = True
                assert r["n_events"] == 0
                assert r["value_ffill"] == last
            else:
                assert r["n_events"] > 0
                last = r["value_ffill"]
                assert last is not None
    assert saw_gap  # the fixture data actually exercises the fill path


def test_ohlc_bounds_and_volume(spark, sf_dir):
    rows = SPECS["ts_ohlc_hourly"].fn(spark, sf_dir).collect()
    ev_count = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r["volume"] for r in rows) == ev_count
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        if r["volume"] == 1:
            assert r["open"] == r["close"] == r["high"] == r["low"]


def test_retention_cohort_laws(spark, sf_dir):
    rows = SPECS["events_retention_cohort"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["week_no"] >= 0
        assert 0 < r["active_users"] <= r["cohort_size"]
        # week 0 retention is exactly 1: the first event is in that week
        if r["week_no"] == 0:
            assert r["retention"] == 1.0
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["cohort_size"] for r in rows if r["week_no"] == 0) == n_users


def test_anomaly_mad_flags_match_definition(spark, sf_dir):
    rows = SPECS["ts_anomaly_mad"].fn(spark, sf_dir).collect()
    n_anom = 0
    for r in rows:
        expected = int(r["mad"] > 0 and abs(r["hourly_avg"] - r["med"]) > 3 * r["mad"])
        assert r["is_anomaly"] == expected
        n_anom += r["is_anomaly"]
    # MAD on ~700 hourly buckets per type must flag something but not most
    assert 0 < n_anom < len(rows) * 0.2


def test_open_backlog_sweep_matches_bruteforce(spark, sf_dir):
    """The running sum must equal the brute-force interval count on a
    sample of days, and return to zero after the last end."""
    rows = sorted(
        SPECS["orders_open_backlog"].fn(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows[-1]["open_orders"] == 0  # every order eventually closes
    assert all(r["open_orders"] >= 0 for r in rows)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    from pyspark.sql import functions as F

    ends = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.max("l_shipdate").alias("end_ts")
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .join(ends, "o_orderkey")
        .withColumn("end_ts", F.greatest("end_ts", "o_orderdate"))
    )
    for r in rows[:: max(1, len(rows) // 7)]:
        d = r["day"]
        brute = orders.filter(
            (F.date_trunc("day", "o_orderdate") <= d)
            & (F.date_trunc("day", "end_ts") >= d)
        ).count()
        assert r["open_orders"] == brute, d
