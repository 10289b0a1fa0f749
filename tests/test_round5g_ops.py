"""Semantic checks for the round-5g batch (Markov top-1 eval, grid
k-NN, manual HLL registers, Bollinger bands) — independent
recomputation in pandas/numpy, not just oracle parity."""

from __future__ import annotations

import hashlib
import math

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


def test_markov_top1_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["prev"] = ev.groupby("user_id")["event_type"].shift()
    tr = ev[ev["prev"].notna()]
    counts = tr.groupby(["prev", "event_type"]).size()
    total = counts.sum()
    top1 = counts.groupby(level=0).max().sum() / total
    baseline = counts.groupby(level=1).sum().max() / total
    out = run("eval_markov_top1_accuracy").iloc[0]
    assert out["n_transitions"] == total
    assert out["n_states"] == counts.index.get_level_values(0).nunique()
    assert out["top1_accuracy"] == pytest.approx(top1, abs=2e-6)
    assert out["baseline_accuracy"] == pytest.approx(baseline, abs=2e-6)
    assert out["lift"] == pytest.approx(top1 - baseline, abs=2e-6)
    # argmax-per-state can never do worse than the global marginal
    assert out["lift"] >= -1e-9


def _lcg(key, a, b):
    return (key * a + b) % 233280 / 233280


def test_geo_knn_matches_bruteforce_within_ring(run, sf_dir):
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet")

    def coords(keys, *_):
        lat = _lcg(keys, 9301, 49297) * 170 - 85
        lon = _lcg(keys, 49297, 9301) * 360 - 180
        return lat, lon

    clat, clon = coords(c["c_custkey"].values)
    slat, slon = coords(s["s_suppkey"].values)
    out = run("geo_knn_grid")
    assert (out.groupby("c_custkey")["rn"].max() <= 3).all()
    # verify one customer end-to-end: candidates = suppliers whose
    # 3x3-expanded cells cover the customer cell, ranked by haversine
    cust_i = 0
    ck = c["c_custkey"].values[cust_i]
    ccell = (np.floor(clat[cust_i] / 5), np.floor(clon[cust_i] / 5))
    cands = []
    for j, sk in enumerate(s["s_suppkey"].values):
        cell = (np.floor(slat[j] / 5), np.floor(slon[j] / 5))
        for dla in (-1, 0, 1):
            for dlo in (-1, 0, 1):
                wrapped = ((cell[1] + dlo + 36) % 72 + 72) % 72 - 36
                if (cell[0] + dla, wrapped) == ccell:
                    dlat = math.radians(clat[cust_i] - slat[j])
                    dlon = math.radians(clon[cust_i] - slon[j])
                    h = (
                        math.sin(dlat / 2) ** 2
                        + math.cos(math.radians(slat[j]))
                        * math.cos(math.radians(clat[cust_i]))
                        * math.sin(dlon / 2) ** 2
                    )
                    d = round(2 * 6371 * math.asin(math.sqrt(h)), 3)
                    cands.append((d, sk))
    cands.sort()
    got = out[out["c_custkey"] == ck].sort_values("rn")
    assert len(got) == min(3, len(cands))
    for row, (d, sk) in zip(got.itertuples(), cands[:3]):
        assert row.s_suppkey == sk
        assert row.dist_km == pytest.approx(d, abs=2e-3)


def test_hll_registers_match_reference_impl(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    out = run("sketch_hll_manual_registers").set_index("event_type")
    for et, grp in ev.groupby("event_type"):
        regs = [0] * 64
        for uid in grp["user_id"].unique():
            x = int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16)
            j, w = x % 64, x // 64
            rho = 27 if w == 0 else 26 - int(math.floor(math.log2(w)))
            regs[j] = max(regs[j], rho)
        z = sum(2.0 ** -r for r in regs)
        v = regs.count(0)
        raw = 0.709 * 64 * 64 / z
        est = 64 * math.log(64 / v) if (raw <= 160 and v > 0) else raw
        n = grp["user_id"].nunique()
        r = out.loc[et]
        assert r["n_exact"] == n
        assert r["n_empty_registers"] == v
        assert r["est_distinct"] == pytest.approx(est, abs=0.02)
        assert r["rel_err"] == pytest.approx((est - n) / n, abs=2e-4)
        # m=64 gives ~13% standard error; allow 4 sigma
        assert abs(r["rel_err"]) < 0.52


def test_bollinger_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].astype("datetime64[us]").dt.floor("D")
    out = run("window_bollinger_breach")
    daily = (
        ev.groupby(["event_type", "day"])["value"].sum().reset_index()
    )
    checked = 0
    for et, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day").reset_index(drop=True)
        for i in range(len(grp)):
            win = grp["value"].iloc[max(0, i - 7 + 1) : i]  # strictly prior
            win = grp["value"].iloc[max(0, i - 6) : i]
            row = out[
                (out["event_type"] == et)
                & (out["day"] == grp["day"].iloc[i].strftime("%Y-%m-%d"))
            ]
            if len(win) < 5 or win.std(ddof=1) == 0:
                assert len(row) == 0
                continue
            checked += 1
            r = row.iloc[0]
            mu, sd = win.mean(), win.std(ddof=1)
            assert r["band_mid"] == pytest.approx(mu, abs=2e-3)
            assert r["band_lo"] == pytest.approx(mu - 2 * sd, abs=2e-3)
            assert r["band_hi"] == pytest.approx(mu + 2 * sd, abs=2e-3)
            v = grp["value"].iloc[i]
            assert bool(r["breach_hi"]) == bool(v > mu + 2 * sd)
            assert bool(r["breach_lo"]) == bool(v < mu - 2 * sd)
    assert checked > 50
