"""Semantic checks for the round-6g batch (dedup chain application,
eta-squared dimension scan)."""

from __future__ import annotations

import hashlib

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


def test_dedup_chain_survivorship(run, spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    fp = docs["text"].apply(lambda t: hashlib.md5(t.encode()).hexdigest())
    keeper = docs.assign(fp=fp).groupby("fp")["doc_id"].transform("min")
    exact_kept = set(docs.loc[docs["doc_id"] == keeper, "doc_id"])
    cc = (
        SPECS["dedup_connected_components"].fn(spark, sf_dir).toPandas()
    )
    dropped_near = set(
        cc.loc[cc["doc_id"] != cc["cluster_id"], "doc_id"]
    )
    final_kept = exact_kept - dropped_near
    out = run("corpus_dedup_apply_chain").set_index("source")
    by_src = docs.groupby("source")["doc_id"]
    assert len(out) == docs["source"].nunique()
    for src, ids in by_src:
        r = out.loc[src]
        ids = set(ids)
        assert r["n_docs"] == len(ids)
        assert r["n_after_exact"] == len(ids & exact_kept)
        assert r["n_final"] == len(ids & final_kept)
        assert r["retention"] == pytest.approx(
            len(ids & final_kept) / len(ids), abs=2e-6
        )
    # chain is monotone: final <= after_exact <= docs
    assert (out["n_final"] <= out["n_after_exact"]).all()
    assert (out["n_after_exact"] <= out["n_docs"]).all()


def test_eta_squared_matches_numpy(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    v = ev["value"].to_numpy()
    sst = ((v - v.mean()) ** 2).sum()
    dims = {
        "event_type": ev["event_type"],
        "hour_of_day": ev["ts"].astype("datetime64[us]").dt.hour,
        "user_bucket": ev["user_id"] % 10,
    }
    out = run("agg_eta_squared_by_keys").set_index("dimension")
    assert set(out.index) == set(dims)
    for name, key in dims.items():
        g = pd.Series(v).groupby(key.values)
        ssb = sum(
            len(grp) * (grp.mean() - v.mean()) ** 2 for _, grp in g
        )
        r = out.loc[name]
        assert r["n_groups"] == key.nunique()
        assert r["eta_squared"] == pytest.approx(ssb / sst, abs=2e-6)
        assert -1e-9 <= r["eta_squared"] <= 1 + 1e-9
