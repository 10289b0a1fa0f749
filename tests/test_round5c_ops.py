"""Semantic checks for the round-5c batch (CUPED A/B adjustment,
lead-lag regression, gaps-and-islands, JL random projection, audio
zero-crossing rate) — independent recomputation in pandas/numpy, not
just oracle parity."""

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


def _events(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    return ev


def test_cuped_matches_pandas(run, sf_dir):
    ev = _events(sf_dir)
    ev = ev[ev["value"].notna()].copy()
    cutoff = pd.Timestamp("2024-01-16")
    ev["px"] = np.where(ev["ts"] < cutoff, ev["value"], 0.0)
    ev["py"] = np.where(ev["ts"] >= cutoff, ev["value"], 0.0)
    out = run("events_ab_cuped").set_index("event_type")
    assert len(out) > 0
    for et, grp in ev.groupby("event_type"):
        u = grp.groupby("user_id").agg(x=("px", "sum"), y=("py", "sum"))
        u["variant"] = (u.index % 2).astype(int)
        if u["x"].var(ddof=1) <= 0 or u["y"].var(ddof=1) <= 0:
            assert et not in out.index
            continue
        theta = np.cov(u["x"], u["y"], ddof=1)[0, 1] / u["x"].var(ddof=1)
        u["y_adj"] = u["y"] - theta * (u["x"] - u["x"].mean())
        a, b = u[u["variant"] == 0], u[u["variant"] == 1]
        r = out.loc[et]
        assert r["n_users"] == len(u)
        assert r["theta"] == pytest.approx(theta, abs=2e-4)
        assert r["lift_raw"] == pytest.approx(
            a["y"].mean() - b["y"].mean(), abs=2e-4
        )
        assert r["lift_cuped"] == pytest.approx(
            a["y_adj"].mean() - b["y_adj"].mean(), abs=2e-4
        )
        vr = 1 - u["y_adj"].var(ddof=1) / u["y"].var(ddof=1)
        assert r["var_reduction"] == pytest.approx(vr, abs=2e-4)
        # CUPED can only shrink pooled variance (theta is the argmin)
        assert r["var_reduction"] >= -1e-9


def test_cuped_same_expectation_structure(run):
    out = run("events_ab_cuped")
    # adjusted lift differs from raw by theta * (pre-period imbalance);
    # both must be finite, and the correction is bounded by |theta| *
    # the covariate range — sanity: no NaN/inf leaked through guards
    assert out[["theta", "lift_raw", "lift_cuped", "var_reduction"]].apply(
        lambda c: np.isfinite(c).all()
    ).all()


def test_lagged_regression_matches_numpy(run, sf_dir):
    ev = _events(sf_dir)
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.floor("D")
    out = run("ts_lagged_regression").set_index("event_type")
    assert len(out) > 0
    for et, grp in ev.groupby("event_type"):
        daily = grp.groupby("day")["value"].sum().sort_index()
        x = daily.values[:-1]
        y = daily.values[1:]
        if len(x) < 3:
            assert et not in out.index
            continue
        slope, intercept = np.polyfit(x, y, 1)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        r = out.loc[et]
        assert r["n_pairs"] == len(x)
        assert r["slope"] == pytest.approx(slope, abs=2e-4)
        assert r["intercept"] == pytest.approx(intercept, abs=2e-3)
        assert r["r2"] == pytest.approx(r2, abs=2e-4)


def test_gap_islands_matches_pandas(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["d"] = o["o_orderdate"].astype("datetime64[us]")
    o["mi"] = o["d"].dt.year * 12 + o["d"].dt.month
    out = run("window_gap_islands").set_index("custkey")
    months = o.groupby("o_custkey")["mi"].apply(
        lambda s: np.sort(s.unique())
    )
    assert len(out) == len(months)
    for cust, mis in months.items():
        # islands = runs of consecutive month indexes
        breaks = np.where(np.diff(mis) > 1)[0]
        starts = np.concatenate([[0], breaks + 1])
        ends = np.concatenate([breaks, [len(mis) - 1]])
        lens = ends - starts + 1
        best = np.argmax(lens)  # first max = earliest-start tiebreak
        r = out.loc[cust]
        assert r["n_islands"] == len(starts)
        assert r["longest_len"] == lens[best]
        smi = int(mis[starts[best]])
        assert r["longest_start"] == f"{(smi - 1) // 12:04d}-{(smi - 1) % 12 + 1:02d}"


def _jl_gauss(i: int, j: int) -> float:
    h = hashlib.md5(f"{i}:{j}".encode()).hexdigest()
    u1 = (int(h[:8], 16) + 0.5) / 2**32
    u2 = (int(h[8:16], 16) + 0.5) / 2**32
    return math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.pi * u2)


def test_jl_projection_matches_numpy(run, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    out = run("embed_random_projection_jl").set_index("vec_id")
    assert len(out) == len(emb)
    g = np.array(
        [[_jl_gauss(i, j) for j in (1, 2, 3, 4)] for i in range(1, 65)]
    )
    for _, row in emb.head(8).iterrows():
        e = np.asarray(row["embedding"], dtype=np.float64)
        p = e @ g
        r = out.loc[row["vec_id"]]
        for j in range(4):
            assert r[f"p{j + 1}"] == pytest.approx(p[j], abs=2e-4)
        ratio = (p @ p / 4.0) / (e @ e)
        assert r["norm_ratio"] == pytest.approx(ratio, abs=2e-4)


def test_jl_norm_concentration(run):
    out = run("embed_random_projection_jl")
    # the JL lemma in action: E[||p||^2/k] = ||e||^2/d, so the mean
    # ratio over hundreds of rows concentrates near 1 even at k=4
    assert 0.75 < out["norm_ratio"].mean() < 1.25
    assert (out["norm_ratio"] > 0).all()


def test_audio_zcr_matches_direct_decode(run, sf_dir):
    from awsbeats_spark.operators.llm.multimodal import synthesize_wav

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    payloads = docs["text"].str.encode("utf-8")
    audio = docs[payloads.str.len() % 3 == 1]
    out = run("multimodal_audio_zero_crossing").set_index("doc_id")
    assert len(out) == len(audio)
    for _, row in audio.head(8).iterrows():
        raw = row["text"].encode("utf-8")
        wav = synthesize_wav(raw)
        off = wav.index(b"data") + 8
        n = int.from_bytes(wav[off - 4 : off], "little")
        arr = np.frombuffer(wav, np.uint8, count=n, offset=off)
        hi = arr >= 128
        zc = int(np.count_nonzero(hi[:-1] != hi[1:]))
        r = out.loc[row["doc_id"]]
        assert r["n_samples"] == n == 600 + len(raw) % 500
        assert r["zcr_count"] == zc
        assert r["zcr_rate"] == pytest.approx(zc / (n - 1), abs=1e-6)
