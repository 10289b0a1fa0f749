"""Semantic checks for the round-6p batch (Cohen's d effect sizes,
RGB channel correlation)."""

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


def test_cohens_d_matches_numpy(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    base = j[j["c_mktsegment"] == "BUILDING"]["o_totalprice"]
    out = run("events_cohens_d_effect_size").set_index("segment")
    assert "BUILDING" not in out.index
    for seg, g in j.groupby("c_mktsegment"):
        if seg == "BUILDING":
            continue
        v = g["o_totalprice"]
        pooled = math.sqrt(
            (
                (len(v) - 1) * v.var(ddof=1)
                + (len(base) - 1) * base.var(ddof=1)
            )
            / (len(v) + len(base) - 2)
        )
        d = (v.mean() - base.mean()) / pooled
        r = out.loc[seg]
        assert r["n"] == len(v)
        assert r["mean_diff"] == pytest.approx(
            v.mean() - base.mean(), abs=2e-3
        )
        assert r["cohens_d"] == pytest.approx(d, abs=2e-6)
        mag = (
            "negligible" if abs(d) < 0.2
            else "small" if abs(d) < 0.5
            else "medium" if abs(d) < 0.8
            else "large"
        )
        assert r["magnitude"] == mag


def test_rgb_correlation_matches_numpy(run, sf_dir):
    from awsbeats_spark.operators.llm.multimodal import (
        decode_media,
        synthesize_bmp,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    payloads = docs["text"].str.encode("utf-8")
    sel = docs[(payloads.str.len() % 3 == 0) & (payloads.str.len() > 0)]
    out = run("multimodal_rgb_channel_correlation").set_index("doc_id")
    checked = 0
    for doc_id, text in zip(sel["doc_id"], sel["text"]):
        bmp = synthesize_bmp(text.encode("utf-8"))
        meta = decode_media(bmp)
        w, h = meta["width"], meta["height"]
        stride = ((3 * w + 3) // 4) * 4
        px = np.frombuffer(
            bmp, np.uint8, count=stride * h, offset=54
        ).reshape(h, stride)
        b = px[:, 0 : 3 * w : 3].astype(float).ravel()
        g = px[:, 1 : 3 * w : 3].astype(float).ravel()
        r = px[:, 2 : 3 * w : 3].astype(float).ravel()
        if b.std() == 0 or g.std() == 0 or r.std() == 0:
            assert doc_id not in out.index
            continue
        row = out.loc[doc_id]
        assert row["corr_rg"] == pytest.approx(
            float(np.corrcoef(r, g)[0, 1]), abs=2e-5
        )
        assert row["corr_gb"] == pytest.approx(
            float(np.corrcoef(g, b)[0, 1]), abs=2e-5
        )
        assert -1 - 1e-9 <= row["corr_rg"] <= 1 + 1e-9
        checked += 1
    assert checked == len(out)
