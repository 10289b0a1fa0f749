"""Semantic checks for the round-3g operators (bounce rate, lifecycle
stages, DAU/WAU/MAU actives).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def _sessions(g: pd.DataFrame) -> list[int]:
    g = g.sort_values(["ts", "event_id"])
    gaps = g["ts"].diff().dt.total_seconds()
    new = (gaps.isna()) | (gaps > 1800)
    sizes = []
    count = 0
    for n in new:
        if n and count:
            sizes.append(count)
            count = 0
        count += 1
    if count:
        sizes.append(count)
    return sizes


def test_bounce_rate_matches_pandas(run, sf_dir):
    out = run("events_bounce_rate").set_index("user_id")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    for uid, g in ev.groupby("user_id"):
        sizes = _sessions(g)
        n_bounce = sum(1 for s in sizes if s == 1)
        assert out.loc[uid, "n_sessions"] == len(sizes)
        assert out.loc[uid, "n_bounces"] == n_bounce
        assert abs(
            out.loc[uid, "bounce_rate"] - round(n_bounce / len(sizes), 6)
        ) < 1e-6


def test_lifecycle_stages_partition_users(run, sf_dir):
    out = run("events_lifecycle_stages")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert len(out) == ev["user_id"].nunique()
    t1 = ev["ts"].max()
    spans = ev.groupby("user_id")["ts"].agg(["min", "max"])
    for r in out.itertuples():
        tenure = (t1.normalize() - spans.loc[r.user_id, "min"].normalize()).days
        recency = (t1.normalize() - spans.loc[r.user_id, "max"].normalize()).days
        assert r.tenure_days == tenure
        assert r.recency_days == recency
        if tenure <= 7:
            assert r.stage == "new"
        elif recency > 14:
            assert r.stage == "churned"
        elif recency > 7:
            assert r.stage == "at_risk"
        else:
            assert r.stage == "active"


def test_dau_wau_mau_monotone_and_exact(run, sf_dir):
    out = run("events_dau_wau_mau")
    assert (out["dau"] <= out["wau"]).all()
    assert (out["wau"] <= out["mau"]).all()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["d"] = ev["ts"].dt.normalize()
    ud = ev[["user_id", "d"]].drop_duplicates()
    for r in out.itertuples():
        day = pd.Timestamp(r.day)
        dau = ud.loc[ud.d == day, "user_id"].nunique()
        wau = ud.loc[(ud.d > day - pd.Timedelta(days=7)) & (ud.d <= day), "user_id"].nunique()
        mau = ud.loc[(ud.d > day - pd.Timedelta(days=30)) & (ud.d <= day), "user_id"].nunique()
        assert (r.dau, r.wau, r.mau) == (dau, wau, mau)
        assert abs(r.stickiness - round(dau / mau, 6)) < 1e-6
