"""Semantic checks for the round-5k batch (Durbin-Levinson PACF,
BH-FDR burst gate, hapax ratio, MSTTR diversity, audio dynamic range)
— independent recomputation in pandas/numpy, not just oracle parity."""

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


def test_pacf_recursion_matches_acf(run):
    acf = run("ts_acf_hourly").set_index("lag")["acf"]
    r1, r2, r3 = acf[1], acf[2], acf[3]
    out = run("ts_pacf_durbin_levinson").iloc[0]
    assert out["acf_lag1"] == pytest.approx(r1, abs=1e-9)
    assert out["pacf_lag1"] == pytest.approx(r1, abs=2e-6)
    p2 = (r2 - r1 * r1) / (1 - r1 * r1)
    assert out["pacf_lag2"] == pytest.approx(p2, abs=2e-6)
    phi21 = r1 * (1 - p2)
    p3 = (r3 - phi21 * r2 - p2 * r1) / (1 - phi21 * r1 - p2 * r2)
    assert out["pacf_lag3"] == pytest.approx(p3, abs=2e-6)
    # PACF values are correlations
    for c in ("pacf_lag1", "pacf_lag2", "pacf_lag3"):
        assert -1 <= out[c] <= 1


def test_bh_fdr_matches_numpy(run):
    scored = run("events_poisson_burst_chernoff")  # only top-20 view
    full = run("events_burst_fdr_bh")
    m = full["m_total"].iloc[0]
    assert (full["m_total"] == m).all()
    assert full["n_tests"].sum() == m
    k_star = full["k_star"].iloc[0]
    assert (full["k_star"] == k_star).all()
    assert 0 <= k_star <= m
    assert (full["n_discoveries"] <= full["n_tests"]).all()
    assert full["n_discoveries"].sum() == k_star
    # the family minimum per type must agree with the detector's best
    # kept row (detector keeps the top-20 by the same ranking)
    best = scored.groupby("event_type")["log10_pbound"].min()
    for _, r in full.iterrows():
        assert r["min_log10_p"] == pytest.approx(
            best[r["event_type"]], abs=1e-9
        )


def test_bh_step_up_property(run, sf_dir):
    # recompute the BH threshold from the raw hourly counts
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    hours = ev["ts"].astype("datetime64[us]").dt.floor("h")
    hourly = (
        ev.assign(hour=hours)
        .groupby(["event_type", "hour"])
        .size()
        .rename("k")
        .reset_index()
    )
    lam = hourly.groupby("event_type")["k"].transform("mean")
    sc = hourly[hourly["k"] > lam].copy()
    lv = lam[hourly["k"] > lam]
    sc["lp"] = np.round(
        (-lv + sc["k"] * (1 + np.log(lv / sc["k"]))) / np.log(10), 4
    )
    sc = sc.sort_values(["lp", "event_type", "hour"]).reset_index(drop=True)
    m = len(sc)
    i = np.arange(1, m + 1)
    passing = sc["lp"].values <= np.log10(i * 0.01 / m)
    k_star = int(i[passing].max()) if passing.any() else 0
    out = run("events_burst_fdr_bh")
    assert out["m_total"].iloc[0] == m
    assert out["k_star"].iloc[0] == k_star
    nd = sc.iloc[:k_star].groupby("event_type").size()
    for _, r in out.iterrows():
        assert r["n_discoveries"] == int(nd.get(r["event_type"], 0))


def test_hapax_ratio_matches_pandas(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = run("text_hapax_ratio").set_index("source")
    for src, grp in docs.groupby("source"):
        toks = grp["text"].str.lower().str.split().explode()
        toks = toks[toks.notna() & (toks != "")]
        tf = toks.value_counts()
        r = out.loc[src]
        assert r["vocab"] == len(tf)
        assert r["n_tokens"] == int(tf.sum())
        assert r["n_hapax"] == int((tf == 1).sum())
        assert r["hapax_ratio"] == pytest.approx(
            (tf == 1).mean(), abs=2e-6
        )
        assert r["type_token_ratio"] == pytest.approx(
            len(tf) / tf.sum(), abs=2e-6
        )


def test_msttr_matches_pandas(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").sort_values(
        "doc_id"
    )
    out = run("corpus_msttr_diversity").set_index("source")
    for src, grp in docs.groupby("source"):
        stream = []
        for t in grp["text"]:
            stream.extend(w for w in t.lower().split() if w)
        n_seg = len(stream) // 50
        ttrs = [
            len(set(stream[s * 50 : (s + 1) * 50])) / 50.0
            for s in range(n_seg)
        ]
        r = out.loc[src]
        assert r["n_segments"] == n_seg
        assert r["msttr"] == pytest.approx(np.mean(ttrs), abs=2e-6)
        # MSTTR is a proportion of distinct tokens
        assert 0 < r["msttr"] <= 1


def test_audio_dynamic_range_matches_energy(run):
    e = run("multimodal_audio_energy")
    out = run("multimodal_audio_dynamic_range").set_index("doc_id")
    g = e.groupby("doc_id")["rms"]
    assert len(out) == g.ngroups
    for doc, rms in g:
        r = out.loc[doc]
        assert r["n_windows"] == len(rms)
        assert r["rms_max"] == rms.max()
        assert r["rms_min"] == rms.min()
        assert r["rms_mean"] == pytest.approx(rms.mean(), abs=2e-4)
        if rms.min() > 0:
            assert r["dynamic_range_db"] == pytest.approx(
                20 * np.log10(rms.max() / rms.min()), abs=2e-3
            )
            assert r["dynamic_range_db"] >= 0
        else:
            assert pd.isna(r["dynamic_range_db"])
        if rms.mean() > 0:
            assert r["crest_db"] == pytest.approx(
                20 * np.log10(rms.max() / rms.mean()), abs=2e-3
            )
            # crest is bounded by the full dynamic range
            if rms.min() > 0:
                assert r["crest_db"] <= r["dynamic_range_db"] + 1e-9
