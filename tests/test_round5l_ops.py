"""Semantic checks for the round-5l batch (clustering coefficient,
SQ8 cosine-preservation eval, label centroid cosine, OOV rate,
correlation matrix) — independent recomputation in pandas/numpy."""

from __future__ import annotations

import itertools

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


def _cooc_graph(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n_docs = len(docs)
    pairs = {}
    for t in docs["text"]:
        ws = sorted(set(w for w in t.lower().split() if w))
        for a, b in itertools.combinations(ws, 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return {e for e, c in pairs.items() if c >= 0.2 * n_docs}


def test_clustering_coefficient_matches_bruteforce(run, sf_dir):
    edges = _cooc_graph(sf_dir)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = run("graph_clustering_coefficient").set_index("node")
    expected = {v for v, ns in adj.items() if len(ns) >= 2}
    assert set(out.index) == expected
    for v in expected:
        ns = adj[v]
        t = sum(
            1
            for a, b in itertools.combinations(sorted(ns), 2)
            if (a, b) in edges
        )
        r = out.loc[v]
        assert r["degree"] == len(ns)
        assert r["n_triangles"] == t
        lcc = 2 * t / (len(ns) * (len(ns) - 1))
        assert r["lcc"] == pytest.approx(lcc, abs=2e-6)
        assert 0 <= r["lcc"] <= 1


def test_clustering_consistent_with_triangle_count(run):
    tri = run("graph_triangle_count").iloc[0]
    lcc = run("graph_clustering_coefficient")
    # every canonical triangle credits exactly 3 corners
    assert lcc["n_triangles"].sum() == 3 * tri["n_triangles"]


def test_sq8_eval_matches_numpy(run, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb["embedding"].values).astype(np.float64)
    mn, mx = X.min(axis=0), X.max(axis=0)
    span = mx - mn
    code = np.where(
        span > 0, np.floor((X - mn) / np.where(span > 0, span, 1) * 255 + 0.5), 0
    )
    R = mn + (code / 255.0) * span
    cos = np.round(
        (X * R).sum(1) / (np.linalg.norm(X, axis=1) * np.linalg.norm(R, axis=1)),
        6,
    )
    err = np.round(np.abs(X - R).max(1), 6)
    out = run("eval_sq8_cosine_preservation").iloc[0]
    assert out["n_vecs"] == len(X)
    assert out["mean_cosine"] == pytest.approx(cos.mean(), abs=2e-6)
    assert out["min_cosine"] == pytest.approx(cos.min(), abs=2e-6)
    assert out["mean_max_abs_err"] == pytest.approx(err.mean(), abs=2e-6)
    assert out["worst_abs_err"] == pytest.approx(err.max(), abs=2e-6)
    # 8-bit codes must essentially preserve cosine on this corpus
    assert out["mean_cosine"] > 0.999


def test_label_centroid_cosine_matches_numpy(run, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb["embedding"].values).astype(np.float64)
    labels = sorted(emb["label"].unique())
    cents = {
        lb: X[emb["label"].values == lb].mean(axis=0) for lb in labels
    }
    counts = emb["label"].value_counts()
    out = run("embed_label_centroid_cosine").set_index(
        ["label_a", "label_b"]
    )
    assert len(out) == len(labels) * (len(labels) - 1) // 2
    for a, b in itertools.combinations(labels, 2):
        ca, cb = cents[a], cents[b]
        cos = ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb))
        r = out.loc[(a, b)]
        assert r["n_a"] == counts[a]
        assert r["n_b"] == counts[b]
        assert r["centroid_cosine"] == pytest.approx(cos, abs=2e-6)


def test_oov_rate_matches_pandas(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = docs.assign(
        toks=docs["text"].str.lower().str.split()
    ).explode("toks")
    toks = toks[toks["toks"].notna() & (toks["toks"] != "")]
    gtf = toks["toks"].value_counts()
    order = sorted(gtf.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = {t for t, _ in order[:2000]}
    out = run("corpus_oov_rate_topk_vocab").set_index("source")
    for src, grp in toks.groupby("source"):
        n = len(grp)
        oov = int((~grp["toks"].isin(vocab)).sum())
        r = out.loc[src]
        assert r["n_tokens"] == n
        assert r["n_oov"] == oov
        assert r["oov_rate"] == pytest.approx(oov / n, abs=2e-6)


def test_corr_matrix_matches_pandas(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    out = run("agg_corr_matrix_pairs").set_index(["col_a", "col_b"])
    assert len(out) == 6
    for a, b in itertools.combinations(cols, 2):
        r = out.loc[(a, b)]
        assert r["pearson_r"] == pytest.approx(
            li[a].corr(li[b]), abs=2e-5
        )
        # covar is rounded to 6 dp on both engine sides
        assert r["covar"] == pytest.approx(li[a].cov(li[b]), abs=6e-7)
