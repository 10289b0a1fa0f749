"""Semantic checks for the round-5x batch (ahash band recall eval,
SCD-2 merge, overlap-vs-disjoint chunk eval)."""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()

_QUERY_TERMS = {
    0: ("table", "scan", "filter"),
    1: ("vector", "hash", "join"),
    2: ("stream", "batch", "window"),
}


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_ahash_recall_consistent_with_both_sides(run, spark, sf_dir):
    """Recompute recall from the two ops' own outputs plus the exact
    all-pairs top-5 in python over the shared hash helper."""
    from awsbeats_spark.operators.llm.multimodal import _ahash_hashes

    hashes = _ahash_hashes(spark, sf_dir).toPandas()
    hd = {
        int(r.doc_id): [int(getattr(r, f"b{j}")) for j in range(8)]
        for r in hashes.itertuples()
    }
    import hashlib

    anchors = set(
        sorted(
            hd,
            key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d),
        )[:64]
    )
    ids = sorted(hd)
    exact = defaultdict(list)
    for i, a in enumerate(ids):
        if a not in anchors:
            continue
        for b in ids[i + 1 :]:
            h = sum(
                bin(x ^ y).count("1") for x, y in zip(hd[a], hd[b])
            )
            exact[a].append((h, b))
    exact_top = {
        a: {(h, b) for h, b in sorted(lst)[:5]} for a, lst in exact.items()
    }
    banded = run("dedup_image_ahash_pairs")
    banded_pairs = defaultdict(set)
    for r in banded.itertuples():
        banded_pairs[int(r.doc_a)].add(int(r.doc_b))
    out = run("eval_ahash_band_recall").set_index("doc_a")
    assert len(out) == len(exact_top)
    for a, top in exact_top.items():
        n_exact = len(top)
        n_hit = sum(1 for _, b in top if b in banded_pairs.get(a, set()))
        r = out.loc[a]
        assert r["n_exact"] == n_exact
        assert r["n_hit"] == n_hit
        assert r["recall"] == pytest.approx(n_hit / n_exact, abs=2e-4)
    # capped 8x8 banding should deliver usable recall on this corpus
    assert out["recall"].mean() > 0.3


def test_scd2_merge_semantics(run, sf_dir):
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    changed = cust[
        (cust["c_custkey"] % 7 == 0) & (cust["c_mktsegment"] != "MACHINERY")
    ]
    out = run("upsert_scd2_merge")
    assert len(out) == len(cust) + len(changed)
    v2 = out[out["version"] == 2]
    assert set(v2["custkey"]) == set(changed["c_custkey"])
    assert (v2["segment"] == "MACHINERY").all()
    assert (v2["is_current"]).all()
    assert v2["valid_to"].isna().all()
    v1 = out[out["version"] == 1].set_index("custkey")
    for _, row in changed.iterrows():
        r = v1.loc[row["c_custkey"]]
        assert r["segment"] == row["c_mktsegment"]
        assert not r["is_current"]
        assert r["valid_to"] == "1997-06-01"
    untouched = cust[~cust["c_custkey"].isin(changed["c_custkey"])]
    for _, row in untouched.head(20).iterrows():
        r = v1.loc[row["c_custkey"]]
        assert r["is_current"] and pd.isna(r["valid_to"])
    # exactly one current row per key
    cur = out[out["is_current"]]
    assert cur["custkey"].is_unique and len(cur) == len(cust)


def test_chunk_eval_matches_python(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    token_lists = [
        [w for w in re.split(r"\s+", t.lower()) if w] for t in docs["text"]
    ]

    def best(stride):
        out = {}
        for qid, terms in _QUERY_TERMS.items():
            ts = set(terms)
            b = 0
            for ws in token_lists:
                n = len(ws)
                if n < 1:
                    continue
                for i in range((n - 1) // stride + 1):
                    cw = ws[i * stride : min(i * stride + 50, n)]
                    b = max(b, len(ts & set(cw)))
            out[qid] = b
        return out

    ov, dj = best(35), best(50)
    out = run("eval_chunk_overlap_vs_disjoint").set_index("query_id")
    for qid in _QUERY_TERMS:
        r = out.loc[qid]
        assert r["best_overlap"] == ov[qid]
        assert r["best_disjoint"] == dj[qid]
        assert r["gain"] == ov[qid] - dj[qid]
