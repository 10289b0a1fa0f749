"""Semantic checks for the round-5m batch (Poisson bootstrap CI,
inter-arrival CV, image histogram entropy, linear counting sketch) —
independent recomputation in pandas/numpy."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()

_POIS_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
]


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def _pois(u: float) -> int:
    for k, c in enumerate(_POIS_CDF):
        if u < c:
            return k
    return 8


def test_bootstrap_ci_matches_numpy(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    x = o["o_totalprice"].values
    keys = o["o_orderkey"].astype(str).values
    # replicate b = 8 i + j: digest md5("key:i"), 60-bit hex words
    # hi/lo, four 15-bit shift/mask uniforms per word
    weights = {b: np.empty(len(keys)) for b in range(64)}
    for r, k in enumerate(keys):
        for i in range(8):
            dig = hashlib.md5(f"{k}:{i}".encode()).hexdigest()
            hi, lo = int(dig[:15], 16), int(dig[15:30], 16)
            for j in range(8):
                word = hi if j < 4 else lo
                u = (((word >> (15 * (j % 4))) & 32767) + 0.5) / 32768.0
                weights[8 * i + j][r] = _pois(u)
    means = []
    for b in range(64):
        w = weights[b]
        means.append(round((w * x).sum() / w.sum(), 4))
    means.sort()
    out = run("agg_bootstrap_ci_poisson").iloc[0]
    assert out["n_replicates"] == 64
    assert out["point_mean"] == pytest.approx(x.mean(), abs=2e-3)
    assert out["ci_lo"] == pytest.approx(means[1], abs=2e-3)
    assert out["ci_hi"] == pytest.approx(means[62], abs=2e-3)
    assert out["se_boot"] == pytest.approx(
        np.std(means, ddof=1), abs=2e-3
    )
    # the interval must bracket the point estimate
    assert out["ci_lo"] < out["point_mean"] < out["ci_hi"]
    # Poisson bootstrap SE ~ sigma/sqrt(n): sanity band, not exactness
    se_theory = x.std(ddof=1) / math.sqrt(len(x))
    assert 0.5 * se_theory < out["se_boot"] < 2.0 * se_theory


def test_interarrival_cv_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    out = run("events_interarrival_cv").set_index("event_type")
    for tp, grp in ev.groupby("event_type"):
        g = grp.sort_values(["us", "event_id"])
        gaps = np.diff(g["us"].values) / 1e6
        r = out.loc[tp]
        assert r["n_gaps"] == len(gaps)
        assert r["mean_gap_s"] == pytest.approx(gaps.mean(), abs=2e-4)
        assert r["std_gap_s"] == pytest.approx(
            gaps.std(ddof=1), abs=2e-4
        )
        assert r["cv"] == pytest.approx(
            gaps.std(ddof=1) / gaps.mean(), abs=2e-4
        )
        s = np.sort(gaps)
        assert r["p50_gap_s"] == pytest.approx(
            s[math.ceil(0.5 * len(s)) - 1], abs=1e-9
        )
        assert r["p90_gap_s"] == pytest.approx(
            s[math.ceil(0.9 * len(s)) - 1], abs=1e-9
        )


def test_image_histogram_entropy_matches_numpy(run, sf_dir):
    from awsbeats_spark.operators.llm.multimodal import (
        decode_media,
        synthesize_bmp,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    payloads = docs["text"].str.encode("utf-8")
    sel = docs[(payloads.str.len() % 3 == 0) & (payloads.str.len() > 0)]
    out = run("multimodal_image_histogram_entropy").set_index("doc_id")
    assert len(out) == len(sel)
    for doc_id, raw in zip(sel["doc_id"], sel["text"]):
        bmp = synthesize_bmp(raw.encode("utf-8"))
        meta = decode_media(bmp)
        wd, ht = meta["width"], meta["height"]
        stride = ((3 * wd + 3) // 4) * 4
        green = (
            np.frombuffer(bmp, np.uint8, count=stride * ht, offset=54)
            .reshape(ht, stride)[:, : 3 * wd]
            .reshape(ht, wd, 3)[:, :, 1]
        )
        counts = np.bincount(green.ravel() >> 4, minlength=16)
        p = counts[counts > 0] / (wd * ht)
        r = out.loc[doc_id]
        assert r["width"] == wd and r["height"] == ht
        assert r["n_bins_used"] == int((counts > 0).sum())
        assert r["entropy_bits"] == pytest.approx(
            -(p * np.log2(p)).sum(), abs=2e-6
        )
        assert 0 <= r["entropy_bits"] <= 4 + 1e-9


def test_linear_counting_matches_formula(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    out = run("sketch_linear_counting_distinct").set_index("event_type")
    for tp, grp in ev.groupby("event_type"):
        users = grp["user_id"].unique()
        bits = {
            int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 1024
            for u in users
        }
        r = out.loc[tp]
        assert r["n_bits_set"] == len(bits)
        assert r["n_exact"] == len(users)
        est = -1024 * math.log((1024 - len(bits)) / 1024)
        assert r["est_distinct"] == pytest.approx(est, abs=2e-2)
        assert r["rel_err"] == pytest.approx(
            (est - len(users)) / len(users), abs=2e-6
        )
        # linear counting should be tight while occupancy is moderate
        if r["n_bits_set"] < 600:
            assert abs(r["rel_err"]) < 0.15
