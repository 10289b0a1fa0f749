"""Semantic checks for the round-5w batch (JSON flatten UDTF, user
travel haversine, MMR diversification, overlapping chunker)."""

from __future__ import annotations

import hashlib
import json
import math
import re

import numpy as np
import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()

_M = 233280


def _lat(key: int) -> float:
    return ((key * 9301 + 49297) % _M) / _M * 170.0 - 85.0


def _lon(key: int) -> float:
    return ((key * 49297 + 9301) % _M) / _M * 360.0 - 180.0


def _hav(lat1, lon1, lat2, lon2) -> float:
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    h = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlon / 2) ** 2
    )
    return 2 * 6371.0 * math.asin(math.sqrt(h))


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_json_flatten_matches_python(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    expected = []
    for eid, props in zip(ev["event_id"], ev["props"]):
        obj = json.loads(props)
        for k, v in obj.items():
            if isinstance(v, bool):
                expected.append((eid, k, "true" if v else "false", "boolean"))
            elif isinstance(v, (int, float)):
                expected.append((eid, k, str(v), "number"))
            elif isinstance(v, str):
                expected.append((eid, k, v, "string"))
    out = run("udtf_json_flatten")
    got = {
        (int(r.event_id), r.key, r.value_str, r.value_type)
        for r in out.itertuples()
    }
    assert got == set(expected)
    assert len(out) == len(expected)


def test_travel_matches_python(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.sort_values(["ts", "event_id"])
    totals = {}
    for uid, grp in ev.groupby("user_id"):
        pts = [
            (_lat(int(e)), _lon(int(e))) for e in grp["event_id"]
        ]
        hops = [
            round(_hav(*pts[i - 1], *pts[i]), 6) for i in range(1, len(pts))
        ]
        if hops:
            totals[uid] = (
                len(hops), round(sum(hops), 4), round(max(hops), 4)
            )
    top = sorted(totals.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    out = run("geo_user_travel_haversine")
    assert list(out["user_id"]) == [u for u, _ in top]
    for (_, (n, tot, mx)), r in zip(top, out.itertuples()):
        assert r.n_hops == n
        assert r.total_km == pytest.approx(tot, abs=2e-3)
        assert r.max_hop_km == pytest.approx(mx, abs=2e-4)


def test_mmr_properties(run, spark, sf_dir):
    """MMR invariants vs its own inputs: rank-1 is BM25's argmax,
    selections are unique candidates, and each step's winner actually
    maximizes lambda*rel - (1-lambda)*maxsim among the remaining."""
    cand = SPECS["retrieval_bm25_topk"].fn(spark, sf_dir).toPandas()
    dense = (
        SPECS["text_dense_hashed_embedding"]
        .fn(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    out = run("retrieval_mmr_diversify")
    for qid, sel in out.groupby("query_id"):
        sel = sel.sort_values("select_rank")
        pool = cand[cand["query_id"] == qid]
        rels = dict(zip(pool["doc_id"], pool["bm25"]))
        assert set(sel["doc_id"]) <= set(rels)
        assert sel["doc_id"].is_unique
        # rank 1 = max relevance (tie-break doc_id)
        best = min(rels, key=lambda d: (-rels[d], d))
        assert sel.iloc[0]["doc_id"] == best
        assert sel.iloc[0]["mmr_score"] == pytest.approx(
            0.7 * rels[best], abs=2e-6
        )
        vecs = {
            d: dense.loc[d][["d1", "d2", "d3", "d4"]].to_numpy(float)
            for d in rels
        }
        chosen = [best]
        for _, row in sel.iloc[1:].iterrows():
            scores = {}
            for d in rels:
                if d in chosen:
                    continue
                msim = max(float(vecs[d] @ vecs[c]) for c in chosen)
                scores[d] = 0.7 * rels[d] - 0.3 * msim
            exp = min(scores, key=lambda d: (-round(scores[d], 9), d))
            assert row["doc_id"] == exp
            assert row["mmr_score"] == pytest.approx(
                scores[exp], abs=2e-6
            )
            chosen.append(exp)


def test_overlap_chunks_match_python(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    expected = set()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        ws = [w for w in re.split(r"\s+", text.lower()) if w]
        n = len(ws)
        if n < 1:
            continue
        for i in range((n - 1) // 35 + 1):
            cw = ws[i * 35 : min(i * 35 + 50, n)]
            expected.add(
                (
                    int(doc_id),
                    i,
                    len(cw),
                    hashlib.md5(" ".join(cw).encode()).hexdigest(),
                )
            )
    out = run("corpus_chunk_overlap_windows")
    got = {
        (int(r.doc_id), int(r.chunk_idx), int(r.n_words), r.chunk_fp)
        for r in out.itertuples()
    }
    assert got == expected
    # consecutive chunks overlap by size - stride = 15 words (full chunks)
    full = out[out["n_words"] == 50].groupby("doc_id")["chunk_idx"].count()
    assert (full >= 1).all()
