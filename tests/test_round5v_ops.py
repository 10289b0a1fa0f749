"""Semantic checks for the round-5v batch (IVF-PQ, k-core peel, Neyman
stratified sampling, split leakage audit) — independent recomputation
in pandas/numpy."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

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


def test_ivfpq_matches_numpy(run, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    idx = {v: i for i, v in enumerate(ids)}
    # coarse centroids and assignment by cosine
    cent_ids = sorted(v for v in ids if v % 50 == 0 and v < 5000)
    C = V[[idx[c] for c in cent_ids]]
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    cos = Vn @ Cn.T
    # argmax with (cosine desc, cent_id asc) tie-break
    assign = {}
    for i, v in enumerate(ids):
        order = sorted(
            range(len(cent_ids)), key=lambda j: (-cos[i, j], cent_ids[j])
        )
        assign[v] = cent_ids[order[0]]
    # PQ codebook (sampled) and codes
    cb_ids = sorted(v for v in ids if v % 16 == 0 and v < 512)
    codes = {}
    for v in ids:
        codes[v] = []
        for s in range(8):
            sub = V[idx[v], 8 * s : 8 * s + 8]
            best = min(
                cb_ids,
                key=lambda c: ((V[idx[c], 8 * s : 8 * s + 8] - sub) ** 2).sum()
                + c * 1e-9,
            )
            codes[v].append(best)
    out = run("sim_search_ivfpq")
    for qid in range(10):
        probes = sorted(
            range(len(cent_ids)),
            key=lambda j: (-cos[idx[qid], j], cent_ids[j]),
        )[:3]
        cells = {cent_ids[j] for j in probes}
        cand = [v for v in ids if assign[v] in cells and v != qid]
        scores = {}
        for v in cand:
            d2 = 0.0
            for s in range(8):
                cv = V[idx[codes[v][s]], 8 * s : 8 * s + 8]
                qs = V[idx[qid], 8 * s : 8 * s + 8]
                d2 += ((qs - cv) ** 2).sum()
            scores[v] = d2
        top = sorted(scores.items(), key=lambda kv: (kv[1], kv[0]))[:10]
        got = out[out["query_id"] == qid].sort_values("rn")
        assert list(got["neighbor_id"]) == [v for v, _ in top]
        for (_, d2), g in zip(top, got["approx_d2"]):
            assert g == pytest.approx(d2, abs=2e-5)
        # recall column: fraction of exact cosine top-10 recovered
        sims = Vn[idx[qid]] @ Vn.T
        exact = sorted(
            (v for v in ids if v != qid),
            key=lambda v: (-sims[idx[v]], v),
        )[:10]
        rec = len(set(exact) & {v for v, _ in top}) / 10.0
        assert got["recall_at_k"].iloc[0] == pytest.approx(rec, abs=2e-6)


def test_kcore_matches_pure_python(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    e = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")[
            ["o_custkey", "l_partkey"]
        ]
        .drop_duplicates()
    )
    edges = set(zip(e["o_custkey"], e["l_partkey"]))
    for _ in range(3):
        dc, dp = defaultdict(int), defaultdict(int)
        for c, p in edges:
            dc[c] += 1
            dp[p] += 1
        edges = {
            (c, p) for c, p in edges if dc[c] >= 20 and dp[p] >= 20
        }
    dc, dp = defaultdict(int), defaultdict(int)
    for c, p in edges:
        dc[c] += 1
        dp[p] += 1
    out = run("graph_kcore_peel")
    got_c = {
        int(r.node_id): int(r.degree)
        for r in out[out["side"] == "cust"].itertuples()
    }
    got_p = {
        int(r.node_id): int(r.degree)
        for r in out[out["side"] == "part"].itertuples()
    }
    assert got_c == dict(dc)
    assert got_p == dict(dp)
    # peeling must actually remove something on this data
    assert len(got_c) < e["o_custkey"].nunique()


def test_neyman_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    stats = ev.groupby("event_type")["value"].agg(["count", "std", "mean"])
    w = (stats["count"] * stats["std"]).sum()
    out = run("sample_stratified_neyman").set_index("event_type")
    for tp, row in stats.iterrows():
        n_alloc = math.floor(500 * row["count"] * row["std"] / w)
        r = out.loc[tp]
        assert r["n_pop"] == row["count"]
        assert r["s_h"] == pytest.approx(row["std"], abs=2e-6)
        assert r["n_alloc"] == n_alloc == r["n_sampled"]
        grp = ev[ev["event_type"] == tp].copy()
        grp["h"] = grp["event_id"].apply(
            lambda i: hashlib.md5(str(i).encode()).hexdigest()
        )
        samp = grp.sort_values(["h", "event_id"]).head(n_alloc)
        assert r["sample_mean"] == pytest.approx(
            samp["value"].mean(), abs=2e-4
        )
        assert r["pop_mean"] == pytest.approx(row["mean"], abs=2e-4)
    # allocation respects the budget
    assert out["n_alloc"].sum() <= 500


def test_split_leakage_matches_pandas(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    bucket = docs["doc_id"].apply(
        lambda d: hashlib.md5(str(d).encode()).hexdigest()[0]
    )
    split = np.where(
        bucket <= "b", "train", np.where(bucket <= "d", "val", "test")
    )
    fp = docs["text"].apply(
        lambda t: hashlib.md5(
            re.sub(r"\s+", " ", t.lower()).strip().encode()
        ).hexdigest()
    )
    d = pd.DataFrame(
        {"source": docs["source"], "split": split, "fp": fp}
    )
    train_fps = set(d[d["split"] == "train"]["fp"])
    held = d[d["split"] != "train"].copy()
    held["leaked"] = held["fp"].isin(train_fps)
    exp = held.groupby(["split", "source"]).agg(
        n_docs=("fp", "size"), n_leaked=("leaked", "sum")
    )
    out = run("corpus_split_leakage_audit").set_index(["split", "source"])
    assert len(out) == len(exp)
    for key, row in exp.iterrows():
        r = out.loc[key]
        assert r["n_docs"] == row["n_docs"]
        assert r["n_leaked"] == row["n_leaked"]
        assert r["leak_rate"] == pytest.approx(
            row["n_leaked"] / row["n_docs"], abs=2e-6
        )
