"""Semantic checks for the round-5j batch (Spearman rank correlation,
mutual information, Poisson burst Chernoff bound, Hurst R/S, Cutler
RSI) — independent recomputation in pandas/numpy/scipy-free form, not
just oracle parity."""

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


def test_spearman_matches_pandas(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    out = run("agg_spearman_corr").set_index(["l_returnflag", "l_linestatus"])
    g = li.groupby(["l_returnflag", "l_linestatus"])
    assert len(out) == g.ngroups
    for key, grp in g:
        r = out.loc[key]
        assert r["n"] == len(grp)
        # midrank (average-rank) convention, Pearson on the ranks —
        # scipy-free recomputation of the scipy/pandas definition
        rq = grp["l_quantity"].rank(method="average")
        rp = grp["l_extendedprice"].rank(method="average")
        rho = rq.corr(rp)
        assert r["spearman_rho"] == pytest.approx(rho, abs=2e-4)


def test_spearman_in_valid_range_and_near_zero(run):
    out = run("agg_spearman_corr")
    assert ((out["spearman_rho"] >= -1) & (out["spearman_rho"] <= 1)).all()
    # the synthetic lineitem draws quantity and extendedprice
    # independently, so the estimate must sit near zero — a |rho|
    # blow-up would mean the rank windows leaked across groups
    assert (out["spearman_rho"].abs() < 0.1).all()


def test_mutual_information_matches_numpy(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    ct = pd.crosstab(o["o_orderpriority"], o["o_orderstatus"]).values
    n = ct.sum()
    pxy = ct / n
    px = pxy.sum(axis=1, keepdims=True)
    py = pxy.sum(axis=0, keepdims=True)
    mask = pxy > 0
    mi = (pxy[mask] * np.log(pxy[mask] / (px @ py)[mask])).sum()
    hx = -(px[px > 0] * np.log(px[px > 0])).sum()
    hy = -(py[py > 0] * np.log(py[py > 0])).sum()
    out = run("agg_mutual_information").iloc[0]
    assert out["n_rows"] == n
    assert out["mi_nats"] == pytest.approx(mi, abs=2e-6)
    assert out["h_priority"] == pytest.approx(hx, abs=2e-6)
    assert out["h_status"] == pytest.approx(hy, abs=2e-6)
    assert out["nmi"] == pytest.approx(mi / min(hx, hy), abs=2e-6)
    # MI is bounded by both marginal entropies
    assert 0 <= out["mi_nats"] <= min(hx, hy) + 1e-9
    assert 0 <= out["nmi"] <= 1


def test_poisson_burst_chernoff_matches_numpy(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    hours = (
        ev["ts"].astype("datetime64[us]").dt.floor("h")
    )
    hourly = (
        ev.assign(hour=hours)
        .groupby(["event_type", "hour"])
        .size()
        .rename("k")
        .reset_index()
    )
    lam = hourly.groupby("event_type")["k"].mean()
    out = run("events_poisson_burst_chernoff")
    assert (out.groupby("event_type").size() <= 20).all()
    for _, r in out.iterrows():
        lv = lam[r["event_type"]]
        k = r["k"]
        assert k > lv
        expected = (-lv + k * (1 + np.log(lv / k))) / np.log(10)
        assert r["log10_pbound"] == pytest.approx(expected, abs=2e-4)
        assert r["is_burst"] == (r["log10_pbound"] < -3.0)
        # Chernoff bound is a valid upper bound: log10 P <= 0
        assert r["log10_pbound"] <= 0


def test_poisson_burst_keeps_most_significant(run):
    out = run("events_poisson_burst_chernoff")
    # within each type the kept rows are sorted-unique and the bound
    # column is the ranking key: max kept <= any plausible dropped row
    # is driver-checked; here assert per-type monotone consistency
    for _, grp in out.groupby("event_type"):
        g = grp.sort_values(["log10_pbound", "hour"])
        assert list(g.index) == sorted(g.index, key=lambda i: (
            out.loc[i, "log10_pbound"], out.loc[i, "hour"]))


def test_hurst_rs_matches_numpy(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    hours = ev["ts"].astype("datetime64[us]").dt.floor("h")
    series = (
        ev.assign(hour=hours).groupby("hour").size().sort_index().values
    )
    rows = {}
    for m in (8, 16, 32, 64):
        rs = []
        for b in range(len(series) // m):
            blk = series[b * m : (b + 1) * m].astype(float)
            sd = blk.std()  # population
            if sd <= 0:
                continue
            c = np.cumsum(blk - blk.mean())
            rs.append((c.max() - c.min()) / sd)
        if rs:
            rows[m] = (len(rs), float(np.mean(rs)))
    out = run("ts_hurst_rs").set_index("block_size")
    assert set(out.index) == set(rows)
    for m, (nb, mean_rs) in rows.items():
        assert out.loc[m, "n_blocks"] == nb
        assert out.loc[m, "mean_rs"] == pytest.approx(mean_rs, abs=2e-4)
    ms = sorted(rows)
    x = np.log(ms)
    y = np.log([rows[m][1] for m in ms])
    slope = np.polyfit(x, y, 1)[0]
    assert out["hurst_exponent"].nunique() == 1
    assert out["hurst_exponent"].iloc[0] == pytest.approx(slope, abs=2e-4)
    # R/S grows with block size for any non-degenerate series
    assert (np.diff([rows[m][1] for m in ms]) > 0).all()


def test_rsi_cutler_matches_pandas(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["day"] = (
        o["o_orderdate"].astype("datetime64[us]").dt.strftime("%Y-%m-%d")
    )
    daily = (
        o.groupby(["o_orderpriority", "day"])["o_totalprice"]
        .sum()
        .round(2)
        .rename("revenue")
        .reset_index()
        .sort_values(["o_orderpriority", "day"])
    )
    out = run("window_rsi_cutler")
    merged = 0
    for pr, grp in daily.groupby("o_orderpriority"):
        rev = grp["revenue"].values
        d = np.diff(rev)
        gains = np.maximum(d, 0)
        losses = np.maximum(-d, 0)
        sub = out[out["priority"] == pr].set_index("day")
        # rows rn>14 survive: indices 14..len-1 of the daily series
        assert len(sub) == max(0, len(rev) - 14)
        for i in range(14, len(rev)):
            day = grp["day"].iloc[i]
            ag = gains[i - 14 : i].mean()
            al = losses[i - 14 : i].mean()
            rsi = 100.0 if al == 0 else 100 - 100 / (1 + ag / al)
            assert sub.loc[day, "rsi"] == pytest.approx(rsi, abs=2e-3)
            merged += 1
    assert merged == len(out)
    assert ((out["rsi"] >= 0) & (out["rsi"] <= 100)).all()
