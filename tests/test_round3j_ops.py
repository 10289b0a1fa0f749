"""Semantic checks for the round-3j operators (MinHash-vs-exact eval,
activity heatmap, new-vs-returning, bitmask flags).
"""

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


def test_minhash_eval_matches_direct_sets(run):
    exact = run("dedup_ngram_jaccard")
    mh = run("dedup_minhash")
    out = run("eval_minhash_vs_exact").iloc[0]
    e = set(zip(exact["doc_a"], exact["doc_b"]))
    m = set(zip(mh["doc_a"], mh["doc_b"]))
    assert out["n_exact"] == len(e)
    assert out["n_minhash"] == len(m)
    assert out["n_hits"] == len(e & m)
    if len(e):
        assert abs(out["recall"] - round(len(e & m) / len(e), 6)) < 1e-6
    if len(m):
        assert abs(out["precision"] - round(len(e & m) / len(m), 6)) < 1e-6


def test_heatmap_covers_all_traffic(run, sf_dir):
    out = run("events_activity_heatmap")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert out["n_events"].sum() == len(ev)
    assert abs(out["share"].sum() - 1.0) < 1e-3
    assert (out["dow"].between(1, 7)).all()
    assert (out["hod"].between(0, 23)).all()
    # spot-check one cell against pandas (dow: 1=Sunday)
    r = out.iloc[0]
    mask = (ev["ts"].dt.dayofweek.add(1).mod(7).add(1) == r["dow"]) & (
        ev["ts"].dt.hour == r["hod"]
    )
    assert mask.sum() == r["n_events"]
    assert ev.loc[mask, "user_id"].nunique() == r["n_users"]


def test_new_vs_returning_conserves_users(run, sf_dir):
    out = run("events_new_vs_returning")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    # every user is new exactly once
    assert out["new_users"].sum() == ev["user_id"].nunique()
    ev["d"] = ev["ts"].dt.normalize()
    daily_users = ev.groupby("d")["user_id"].nunique().sort_index()
    got = (out["new_users"] + out["returning_users"]).to_numpy()
    assert (np.sort(got) == np.sort(daily_users.to_numpy())).all()
    # first day is 100% new
    first = out.sort_values("day").iloc[0]
    assert first["returning_users"] == 0
    assert first["new_share"] == 1.0


def test_bitmask_decode_consistent(run, sf_dir):
    out = run("scalar_bitmask_flags")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet").set_index("o_orderkey")
    o = orders.loc[out["o_orderkey"]]
    exp_mask = (
        (o["o_orderstatus"] == "F").astype(int)
        + (o["o_totalprice"] > 150000).astype(int) * 2
        + o["o_orderpriority"].str.startswith("1").astype(int) * 4
        + (o["o_orderdate"].dt.year >= 1998).astype(int) * 8
    ).to_numpy()
    assert (out["mask"].to_numpy() == exp_mask).all()
    # decoded bits reassemble the mask; popcount matches
    reassembled = (
        out["is_filled"]
        + out["is_big"] * 2
        + out["is_urgent"] * 4
        + out["is_recent"] * 8
    )
    assert (reassembled == out["mask"]).all()
    assert (
        out["n_flags"]
        == out[["is_filled", "is_big", "is_urgent", "is_recent"]].sum(axis=1)
    ).all()
    assert (out["inverted"] == 15 - out["mask"]).all()
