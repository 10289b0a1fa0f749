"""Semantic checks for the round-5u batch (LPA communities, image
ahash near-dup pairs, MaxSim late interaction, Holt forecast) —
independent recomputation in pandas/numpy."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

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


def _cooc_edges_pandas(sf_dir: str):
    """Replicate _cooc_edges: canonical (wa < wb) pairs co-occurring in
    >= 20% of docs (graph.py's _COOC_FRAC)."""
    import re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n_docs = len(docs)
    pair_count: Counter = Counter()
    for text in docs["text"]:
        ws = sorted({w for w in re.split(r"\s+", text.lower()) if w})
        for i in range(len(ws)):
            for j in range(i + 1, len(ws)):
                pair_count[(ws[i], ws[j])] += 1
    thr = 0.2 * n_docs
    return [p for p, c in pair_count.items() if c >= thr]


def test_lpa_matches_pure_python(run, sf_dir):
    edges = _cooc_edges_pandas(sf_dir)
    nbr = defaultdict(list)
    for a, b in edges:
        nbr[a].append(b)
        nbr[b].append(a)
    labels = {v: v for v in nbr}
    for _ in range(3):
        nxt = {}
        for v, ns in nbr.items():
            votes = Counter(labels[u] for u in ns)
            # mode, tie-break: count desc then label asc
            nxt[v] = min(votes, key=lambda l: (-votes[l], l))
        labels = nxt
    sizes = Counter(labels.values())
    out = run("graph_lpa_communities").set_index("node")
    assert len(out) == len(nbr)
    for v, lbl in labels.items():
        assert out.loc[v, "community"] == lbl
        assert out.loc[v, "community_size"] == sizes[lbl]
    # LPA must coarsen: fewer communities than nodes on a dense graph
    if len(nbr) > 5:
        assert len(sizes) < len(nbr)


def _ahash_bands(raw: bytes):
    from awsbeats_spark.operators.llm.multimodal import (
        decode_media,
        synthesize_bmp,
    )

    bmp = synthesize_bmp(raw)
    meta = decode_media(bmp)
    w, h = meta["width"], meta["height"]
    stride = ((3 * w + 3) // 4) * 4
    px = np.frombuffer(bmp, np.uint8, count=stride * h, offset=54).reshape(
        h, stride
    )
    green = px[:, 1 : 3 * w : 3].astype(np.int64)
    grid = green[np.ix_((np.arange(8) * h) // 8, (np.arange(8) * w) // 8)]
    flat = grid.ravel()
    bits = (64 * flat > flat.sum()).astype(np.int64)
    return [
        int((bits[8 * j : 8 * j + 8] << np.arange(8)).sum())
        for j in range(8)
    ]


def test_image_ahash_pairs_matches_numpy(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    payloads = docs["text"].str.encode("utf-8")
    sel = docs[(payloads.str.len() % 3 == 0) & (payloads.str.len() > 0)]
    bands = {
        int(d): _ahash_bands(t.encode("utf-8"))
        for d, t in zip(sel["doc_id"], sel["text"])
    }
    # banded candidates with the hot-bucket cap (<= 32 docs per bucket)
    buckets = defaultdict(list)
    for d, bs in bands.items():
        for j, b in enumerate(bs):
            buckets[(j, b)].append(d)
    assert all(len(bs) == 8 for bs in bands.values())
    cand = set()
    for ds in buckets.values():
        if len(ds) > 32:
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    scored = [
        (a, b, sum(bin(x ^ y).count("1") for x, y in zip(bands[a], bands[b])))
        for a, b in cand
    ]
    by_anchor = defaultdict(list)
    for a, b, hd in scored:
        by_anchor[a].append((hd, b))
    expected = set()
    for a, lst in by_anchor.items():
        for hd, b in sorted(lst)[:5]:
            expected.add((a, b, hd))
    out = run("dedup_image_ahash_pairs")
    got = {
        (int(r.doc_a), int(r.doc_b), int(r.hamming))
        for r in out.itertuples()
    }
    assert got == expected
    # bounded-output contract
    assert out.groupby("doc_a").size().max() <= 5


def test_maxsim_matches_numpy(run, sf_dir):
    import re

    def gauss(i, j):
        dig = hashlib.md5(f"{i}:{j}".encode()).hexdigest()
        u1 = (int(dig[:8], 16) + 0.5) / 4294967296.0
        u2 = (int(dig[8:16], 16) + 0.5) / 4294967296.0
        return math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.pi * u2)

    vecs = np.array(
        [[gauss(b + 1, j) for j in (1, 2, 3, 4)] for b in range(64)]
    )
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    sim = vecs @ vecs.T

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    bucket_sets = {}
    for d, text in zip(docs["doc_id"], docs["text"]):
        ws = {w for w in re.split(r"\s+", text.lower()) if w}
        bucket_sets[int(d)] = {
            int(hashlib.md5(w.encode()).hexdigest()[:4], 16) % 64
            for w in ws
        }
    out = run("retrieval_maxsim_late_interaction")
    for qid in range(5):
        qb = sorted(bucket_sets[qid])
        scores = {}
        for d, db in bucket_sets.items():
            if d < 5 or not db:
                continue
            dl = sorted(db)
            scores[d] = sum(max(sim[b, c] for c in dl) for b in qb)
        top = sorted(scores.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))[
            :10
        ]
        got = out[out["query_id"] == qid].sort_values("rank")
        assert list(got["doc_id"]) == [d for d, _ in top]
        for (_, s), m in zip(top, got["maxsim"]):
            assert m == pytest.approx(round(s, 4), abs=2e-4)


def test_holt_matches_numpy(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["d"] = o["o_orderdate"].astype("datetime64[us]").dt.date
    daily = (
        o.groupby(["o_orderpriority", "d"])["o_totalprice"]
        .sum()
        .round(2)
        .reset_index()
    )
    out = run("ts_holt_linear_forecast").set_index("priority")
    for p, grp in daily.groupby("o_orderpriority"):
        y = grp.sort_values("d")["o_totalprice"].to_numpy()[-156:]
        n = len(y)
        if n < 60:
            assert p not in out.index
            continue
        ntr = n - 28
        lvl, b = y[0], y[1] - y[0]
        for k in range(1, ntr):
            ln = 0.5 * y[k] + 0.5 * (lvl + b)
            b = 0.25 * (ln - lvl) + 0.75 * b
            lvl = ln
        h = np.arange(1, 29)
        yt = y[ntr:]
        r = out.loc[p]
        assert r["n_train"] == ntr and r["n_test"] == 28
        assert r["level_final"] == pytest.approx(lvl, abs=2e-3)
        assert r["trend_final"] == pytest.approx(b, abs=2e-3)
        assert r["mae_holt"] == pytest.approx(
            np.abs(yt - (lvl + h * b)).mean(), abs=2e-3
        )
        assert r["mae_naive"] == pytest.approx(
            np.abs(yt - y[ntr - 1]).mean(), abs=2e-3
        )
