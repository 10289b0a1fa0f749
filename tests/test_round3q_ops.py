"""Semantic checks for the round-3q operators (difference-in-
differences, IVF cluster purity).
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


def test_did_matches_pandas(run, sf_dir):
    out = run("events_diff_in_diff").iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    t0, t1 = ev["ts"].min(), ev["ts"].max()
    t_mid = pd.Timestamp(
        (t0.value // 1000 + t1.value // 1000) // 2 * 1000
    )
    week1 = t0 + pd.Timedelta(days=7)
    treated = set(
        ev.loc[(ev.event_type == "signup") & (ev.ts < week1), "user_id"]
    )
    ev = ev.assign(
        tr=ev["user_id"].isin(treated), post=ev["ts"] >= t_mid
    )
    means = ev.groupby(["tr", "post"])["value"].mean()
    cells = {k: means.get(k, np.nan) for k in
             [(True, False), (True, True), (False, False), (False, True)]}
    for key, col in [
        ((True, False), "treated_pre"),
        ((True, True), "treated_post"),
        ((False, False), "control_pre"),
        ((False, True), "control_post"),
    ]:
        if np.isnan(cells[key]):
            # tiny SFs can lack a control group entirely; the operator
            # must degrade to NULL, not crash
            assert np.isnan(out[col])
        else:
            assert abs(out[col] - round(cells[key], 4)) < 2e-4
    if not any(np.isnan(v) for v in cells.values()):
        did = (cells[(True, True)] - cells[(True, False)]) - (
            cells[(False, True)] - cells[(False, False)]
        )
        assert abs(out["did_estimate"] - did) < 1e-3
    assert out["n_events"] == len(ev)


def test_cluster_purity_consistent_with_ivf_cells(run, sf_dir):
    out = run("embed_cluster_purity")
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    # every vector lands in exactly one cell
    assert out["n_members"].sum() == len(emb)
    assert (out["n_majority"] <= out["n_members"]).all()
    assert ((out["purity"] > 0) & (out["purity"] <= 1)).all()
    # Simpson diversity and purity bound each other:
    # 1 - purity^2 >= diversity >= 1 - purity (loose but direction-true)
    assert (out["simpson_diversity"] <= 1 - out["purity"] ** 2 + 1e-9).all()
    # single-label cell means zero diversity and purity 1
    ones = out[out["purity"] == 1.0]
    assert (ones["simpson_diversity"].abs() < 1e-9).all()
    # exact recompute for one cell via numpy assignment
    from awsbeats_spark.operators.llm.similarity import (
        CENTROID_ID_CAP,
        CENTROID_MOD,
    )

    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    mask = (ids % CENTROID_MOD == 0) & (ids < CENTROID_ID_CAP)
    cents, cent_ids = vecs[mask], ids[mask]
    sims = (vecs @ cents.T) / (
        np.linalg.norm(vecs, axis=1)[:, None]
        * np.linalg.norm(cents, axis=1)[None, :]
    )
    # argmax with cent_id ascending tiebreak (sims ties broken by first)
    assign = cent_ids[np.argmax(sims, axis=1)]
    labels = emb["label"].to_numpy()
    got = out.set_index("cent_id")
    for cid in cent_ids:
        members = labels[assign == cid]
        if len(members) == 0:
            assert cid not in got.index
            continue
        counts = pd.Series(members).value_counts()
        assert got.loc[cid, "n_members"] == len(members)
        assert got.loc[cid, "n_majority"] == counts.iloc[0]
