"""Semantic checks for the round-5f batch (empirical-Bayes shrinkage,
discount elasticity, EMD value drift, audio fingerprint) — independent
recomputation in pandas/numpy, not just oracle parity."""

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


def test_eb_shrinkage_matches_and_contracts(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    j = li.merge(o[["o_orderkey", "o_custkey"]],
                 left_on="l_orderkey", right_on="o_orderkey")
    g = j.groupby("o_custkey").agg(
        n=("l_returnflag", "size"),
        k=("l_returnflag", lambda s: (s == "R").sum()),
    )
    rates = g["k"] / g["n"]
    m, v = rates.mean(), rates.var(ddof=1)
    prior_ss = m * (1 - m) / v - 1
    assert prior_ss > 0
    out = run("agg_eb_shrunk_rates").set_index("custkey")
    assert len(out) == len(g)
    for cust in list(g.index)[:20]:
        r = out.loc[cust]
        n, k = g.loc[cust, "n"], g.loc[cust, "k"]
        assert (r["n"], r["k"]) == (n, k)
        shrunk = (k + m * prior_ss) / (n + prior_ss)
        assert r["rate_raw"] == pytest.approx(k / n, abs=2e-6)
        assert r["rate_shrunk"] == pytest.approx(shrunk, abs=2e-6)
        # shrinkage contract: shrunk lies strictly between raw and the
        # population mean (or equals both when raw == mean)
        lo, hi = sorted((k / n, m))
        assert lo - 1e-9 <= r["rate_shrunk"] <= hi + 1e-9
    # heavier shrinkage for smaller n: |shrunk - raw| decreasing in n
    out["pull"] = (out["rate_shrunk"] - out["rate_raw"]).abs()
    big = out[out["n"] >= out["n"].quantile(0.8)]["pull"].mean()
    small = out[out["n"] <= out["n"].quantile(0.2)]["pull"].mean()
    assert small >= big


def test_discount_elasticity_matches_numpy(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    j = li.merge(p[["p_partkey", "p_brand"]],
                 left_on="l_partkey", right_on="p_partkey")
    out = run("q_discount_elasticity").set_index("p_brand")
    for brand, grp in j.groupby("p_brand"):
        if len(grp) < 3:
            assert brand not in out.index
            continue
        r = out.loc[brand]
        assert r["n_lines"] == len(grp)
        slope = np.polyfit(grp["l_discount"], grp["l_quantity"], 1)[0]
        corr = np.corrcoef(grp["l_discount"], grp["l_quantity"])[0, 1]
        assert r["qty_discount_slope"] == pytest.approx(slope, abs=2e-3)
        assert r["qty_discount_corr"] == pytest.approx(corr, abs=2e-4)
        # generator independence: discount shouldn't drive quantity
        assert abs(r["qty_discount_corr"]) < 0.5


def test_emd_matches_numpy(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["value"].notna()].copy()
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    a = ev[ev["ts"] < pd.Timestamp("2024-01-16")]["value"].values
    b = ev[ev["ts"] >= pd.Timestamp("2024-01-16")]["value"].values
    mn, mx = ev["value"].min(), ev["value"].max()
    bins = np.clip(
        np.floor((np.concatenate([a, b]) - mn) / (mx - mn) * 10), 0, 9
    ).astype(int)
    ba, bb = bins[: len(a)], bins[len(a):]
    ha = np.bincount(ba, minlength=10) / len(a)
    hb = np.bincount(bb, minlength=10) / len(b)
    gaps = np.abs(np.cumsum(ha) - np.cumsum(hb))
    out = run("dq_value_drift_emd").iloc[0]
    assert (out["n_before"], out["n_after"]) == (len(a), len(b))
    assert out["emd"] == pytest.approx(
        gaps.sum() * (mx - mn) / 10, abs=2e-4
    )
    assert out["max_cdf_gap"] == pytest.approx(gaps.max(), abs=2e-6)
    assert out["emd"] >= 0


def test_audio_fingerprint_matches_and_discriminates(run, sf_dir):
    from awsbeats_spark.operators.llm.multimodal import synthesize_wav

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    payloads = docs["text"].str.encode("utf-8")
    audio = docs[payloads.str.len() % 3 == 1]
    out = run("multimodal_audio_fingerprint").set_index("doc_id")
    assert len(out) == len(audio)
    for _, row in audio.head(8).iterrows():
        raw = row["text"].encode("utf-8")
        wav = synthesize_wav(raw)
        off = wav.index(b"data") + 8
        n = int.from_bytes(wav[off - 4 : off], "little")
        arr = np.frombuffer(wav, np.uint8, count=n, offset=off)[::8]
        acc = 0
        for v in arr.tolist():
            acc = (acc * 131 + v) % 2147483647
        r = out.loc[row["doc_id"]]
        assert r["fingerprint"] == acc
        assert r["n_sampled"] == len(arr)
    # distinct recordings should (overwhelmingly) get distinct prints
    assert out["fingerprint"].nunique() >= 0.95 * len(out)
