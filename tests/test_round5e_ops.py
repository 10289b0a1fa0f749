"""Semantic checks for the round-5e batch (decomposition strength, DFT
periodogram peak, Theil inequality decomposition, BMP color moments) —
independent recomputation in pandas/numpy, not just oracle parity."""

from __future__ import annotations

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


def test_decomposition_strength_matches_components(run, sf_dir):
    d = run("ts_seasonal_decompose")
    out = run("ts_decomposition_strength").iloc[0]
    assert out["n_buckets"] == len(d)
    vy = d["y"].var(ddof=1)
    vr = d["residual"].var(ddof=1)
    assert out["var_y"] == pytest.approx(vy, abs=2e-3)
    assert out["var_residual"] == pytest.approx(vr, abs=2e-3)
    assert out["seasonal_strength"] == pytest.approx(
        max(0.0, 1 - vr / vy), abs=2e-4
    )
    assert 0.0 <= out["seasonal_strength"] <= 1.0


def test_spectral_peak_matches_numpy(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["e"] = (
        ev["ts"].astype("datetime64[us]").astype("int64") // 10**6 // 3600
    )
    out = run("ts_spectral_peak_dft").set_index("event_type")
    for et, grp in ev.groupby("event_type"):
        hourly = grp.groupby("e").size().astype(float)
        yd = hourly - hourly.mean()
        e = hourly.index.values
        r = out.loc[et]
        assert r["n_hours"] == len(hourly)
        powers = {}
        for p, col in [(24, "power_24h"), (12, "power_12h"),
                       (168, "power_168h")]:
            ang = 2 * np.pi * (e % p) / p
            pw = (
                (yd.values * np.cos(ang)).sum() ** 2
                + (yd.values * np.sin(ang)).sum() ** 2
            ) / len(yd)
            powers[p] = pw
            assert r[col] == pytest.approx(pw, rel=1e-6, abs=0.02)
        # argmax with the documented tiebreak order 24 > 12 > 168
        best = max([24, 12, 168], key=lambda p: (powers[p], -p))
        assert r["dominant_period_h"] == best


def test_theil_decomposition_reconstructs_global_index(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    x = o.groupby("o_custkey")["o_totalprice"].sum().rename("x").reset_index()
    x = x.merge(c[["c_custkey", "c_nationkey"]],
                left_on="o_custkey", right_on="c_custkey")
    x = x.merge(n[["n_nationkey", "n_name"]],
                left_on="c_nationkey", right_on="n_nationkey")
    out = run("agg_theil_inequality_decomp").set_index("n_name")
    mu = x["x"].mean()
    t_global = float(np.mean((x["x"] / mu) * np.log(x["x"] / mu)))
    recon = 0.0
    for name, grp in x.groupby("n_name"):
        mug = grp["x"].mean()
        tg = float(np.mean((grp["x"] / mug) * np.log(grp["x"] / mug)))
        sg = grp["x"].sum() / x["x"].sum()
        r = out.loc[name]
        assert r["n_customers"] == len(grp)
        assert r["revenue_share"] == pytest.approx(sg, abs=2e-6)
        assert r["theil_within"] == pytest.approx(tg, abs=2e-6)
        assert r["between_term"] == pytest.approx(
            sg * math.log(mug / mu), abs=2e-6
        )
        recon += sg * tg + sg * math.log(mug / mu)
    # the decomposition must reassemble the global Theil index exactly
    assert recon == pytest.approx(t_global, abs=1e-9)
    assert out["revenue_share"].sum() == pytest.approx(1.0, abs=1e-4)


def test_bmp_color_moments_match_direct_decode(run, sf_dir):
    from awsbeats_spark.operators.llm.multimodal import synthesize_bmp

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    payloads = docs["text"].str.encode("utf-8")
    imgs = docs[(payloads.str.len() % 3 == 0) & (payloads.str.len() > 0)]
    out = run("multimodal_bmp_color_moments").set_index("doc_id")
    assert len(out) == len(imgs)
    for _, row in imgs.head(8).iterrows():
        raw = row["text"].encode("utf-8")
        bmp = synthesize_bmp(raw)
        n = len(raw)
        wd, ht = 4 + n % 29, 4 + (7 * n) % 17
        stride = ((3 * wd + 3) // 4) * 4
        grid = (
            np.frombuffer(bmp, np.uint8, count=stride * ht, offset=54)
            .reshape(ht, stride)[:, : 3 * wd]
            .reshape(ht, wd, 3)
            .astype(np.float64)
        )
        r = out.loc[row["doc_id"]]
        assert (r["width"], r["height"]) == (wd, ht)
        for ch, tag in [(0, "b"), (1, "g"), (2, "r")]:
            plane = grid[:, :, ch]
            assert r[f"{tag}_mean"] == pytest.approx(
                plane.mean(), abs=2e-4
            )
            assert r[f"{tag}_std"] == pytest.approx(
                plane.std(), abs=2e-4
            )
