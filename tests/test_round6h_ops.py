"""Semantic checks for the round-6h batch (Moran's I spatial
autocorrelation, token-pack efficiency eval)."""

from __future__ import annotations

import re

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


def test_morans_i_matches_numpy(run, sf_dir):
    from awsbeats_spark.operators.llm.multimodal import (
        decode_media,
        synthesize_bmp,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    payloads = docs["text"].str.encode("utf-8")
    sel = docs[(payloads.str.len() % 3 == 0) & (payloads.str.len() > 0)]
    out = run("multimodal_bmp_spatial_autocorr").set_index("doc_id")
    n_checked = 0
    for doc_id, text in zip(sel["doc_id"], sel["text"]):
        bmp = synthesize_bmp(text.encode("utf-8"))
        meta = decode_media(bmp)
        w, h = meta["width"], meta["height"]
        stride = ((3 * w + 3) // 4) * 4
        g = (
            np.frombuffer(bmp, np.uint8, count=stride * h, offset=54)
            .reshape(h, stride)[:, 1 : 3 * w : 3]
            .astype(np.float64)
        )
        m = g.mean()
        d = g - m
        denom = (d * d).sum()
        if denom <= 0:
            assert doc_id not in out.index
            continue
        cross = (d[:, :-1] * d[:, 1:]).sum() + (d[:-1, :] * d[1:, :]).sum()
        n_pairs = h * (w - 1) + (h - 1) * w
        i_ref = (g.size / n_pairs) * cross / denom
        r = out.loc[doc_id]
        assert r["width"] == w and r["height"] == h
        assert r["morans_i"] == pytest.approx(i_ref, abs=2e-5)
        assert -1.5 <= r["morans_i"] <= 1.5
        n_checked += 1
    assert n_checked == len(out)


def test_pack_efficiency_matches_pandas(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs["n_tokens"] = docs["text"].apply(
        lambda t: len([w for w in re.split(r"\s+", t.lower()) if w])
    )
    out = run("eval_token_pack_efficiency").set_index("source")
    for src, grp in docs.groupby("source"):
        g = grp.sort_values("doc_id")
        before = g["n_tokens"].cumsum().shift(fill_value=0)
        pack = (before // 2048).astype(int)  # _PACK_BUDGET
        sums = g.groupby(pack.values)["n_tokens"].sum()
        over = (sums - 2048).clip(lower=0)
        r = out.loc[src]
        assert r["n_packs"] == len(sums)
        assert r["mean_fill"] == pytest.approx(
            (sums / 2048).mean(), abs=2e-6
        )
        assert r["mean_overflow_tokens"] == pytest.approx(
            over.mean(), abs=2e-4
        )
        assert r["max_overflow_tokens"] == over.max()
    # offset packing: full packs must be filled at or above budget
    full = out[out["n_packs"] > 1]
    if len(full):
        assert (full["mean_fill"] > 0.5).all()
