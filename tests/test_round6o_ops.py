"""Semantic checks for the round-6o batch (point-in-time SCD2 join,
time-weighted average)."""

from __future__ import annotations

import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_pit_join_matches_pandas(run, spark, sf_dir):
    dim = SPECS["upsert_scd2_merge"].fn(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["d"] = o["o_orderdate"].astype("datetime64[us]").dt.strftime(
        "%Y-%m-%d"
    )
    counts = {}
    dim_by_key = {
        k: g.to_dict("records") for k, g in dim.groupby("custkey")
    }
    n_unmatched = 0
    for _, row in o.iterrows():
        versions = dim_by_key.get(row["o_custkey"], [])
        hit = [
            v for v in versions
            if row["d"] >= v["valid_from"]
            and (pd.isna(v["valid_to"]) or row["d"] < v["valid_to"])
        ]
        assert len(hit) <= 1  # interval partitioning invariant
        if hit:
            key = (hit[0]["segment"], int(hit[0]["version"]))
            counts[key] = counts.get(key, 0) + 1
        else:
            n_unmatched += 1
    out = run("join_point_in_time_scd2")
    got = {
        (r.segment, int(r.version)): int(r.n_orders)
        for r in out.itertuples()
    }
    assert got == counts
    # both versions must receive traffic (the change date splits 92-98)
    assert any(v == 1 for _, v in got) and any(v == 2 for _, v in got)


def test_twap_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["ts", "event_id"]
    )
    ev["s"] = ev["ts"].astype("datetime64[us]").astype("int64") // 10**6
    out = run("ts_time_weighted_average").set_index("event_type")
    for tp, g in ev.groupby("event_type"):
        s = g["s"].to_numpy()
        v = g["value"].to_numpy()
        dur = s[1:] - s[:-1]
        keep = dur > 0
        w, x = dur[keep], v[:-1][keep]
        r = out.loc[tp]
        assert r["n_intervals"] == keep.sum()
        assert r["total_seconds"] == w.sum()
        assert r["twap"] == pytest.approx(
            (x * w).sum() / w.sum(), abs=2e-5
        )
        assert r["event_weighted_mean"] == pytest.approx(
            x.mean(), abs=2e-5
        )
