"""Semantic twins for the round-7b additions, independent of the DuckDB
oracle parity: RM3 pseudo-relevance feedback against a pure-Python
BM25+relevance-model implementation, the unigram perplexity filter
against a hand-rolled LM scorer, and the epoch shard plan against
hashlib md5 arithmetic."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pyarrow.parquet as pq
import pytest

from awsbeats_spark.operators.llm.retrieval import (
    BM25_B,
    BM25_K1,
    PRF_FB_DOCS,
    PRF_FB_TERMS,
    PRF_LAMBDA,
    QUERY_TERMS,
    RETR_TOP_K,
)
from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


@pytest.fixture(scope="module")
def docs(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    return t


def _words(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.lower()) if w]


def _rnd(x: float, n: int) -> float:
    p = 10.0**n
    return math.floor(x * p + 0.5) / p


def _corpus_stats(docs: pd.DataFrame):
    tf = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        c = Counter(_words(text))
        if c:
            tf[doc_id] = c
    dl = {d: sum(c.values()) for d, c in tf.items()}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    avgdl = sum(dl.values()) / len(dl)
    return tf, dl, df, avgdl, len(dl)


def _bm25_contrib(tf_td, df_t, dl_d, avgdl, n_docs):
    idf = math.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
    return (
        idf
        * (tf_td * (BM25_K1 + 1.0))
        / (tf_td + BM25_K1 * (1.0 - BM25_B + BM25_B * dl_d / avgdl))
    )


def _py_rm3(docs: pd.DataFrame):
    tf, dl, df, avgdl, n_docs = _corpus_stats(docs)
    out = {}
    for qid, terms in QUERY_TERMS.items():
        base = {}
        for d, c in tf.items():
            s = sum(
                _bm25_contrib(c[t], df[t], dl[d], avgdl, n_docs)
                for t in terms
                if t in c
            )
            if s:
                base[d] = s
        fb = sorted(base, key=lambda d: (-_rnd(base[d], 6), d))[:PRF_FB_DOCS]
        relw = defaultdict(float)
        for d in fb:
            for t, n in tf[d].items():
                if t not in terms:
                    relw[t] += n / dl[d]
        sel = sorted(relw, key=lambda t: (-_rnd(relw[t], 8), t))[:PRF_FB_TERMS]
        wsum = sum(relw[t] for t in sel)
        weights = {t: PRF_LAMBDA / len(terms) for t in terms}
        for t in sel:
            weights[t] = weights.get(t, 0.0) + (1 - PRF_LAMBDA) * relw[t] / wsum
        scores = {}
        for d, c in tf.items():
            s = sum(
                w * _bm25_contrib(c[t], df[t], dl[d], avgdl, n_docs)
                for t, w in weights.items()
                if t in c
            )
            if s:
                scores[d] = s
        top = sorted(scores, key=lambda d: (-_rnd(scores[d], 6), d))[
            :RETR_TOP_K
        ]
        out[qid] = [(d, _rnd(scores[d], 6)) for d in top]
    return out


def test_prf_rm3_matches_python(run, docs):
    got = run("retrieval_prf_rm3")
    want = _py_rm3(docs)
    for qid, rows in got.groupby("query_id"):
        rows = rows.sort_values("rn")
        exp = want[qid]
        assert list(rows.doc_id) == [d for d, _ in exp]
        for s_got, (_, s_exp) in zip(rows.rm3_score, exp):
            assert abs(s_got - s_exp) < 1e-9


def test_prf_rm3_expansion_changes_ranking(run):
    """PRF must actually move the ranking vs plain BM25 for at least
    one query — otherwise the expansion stage is dead code on this
    corpus."""
    base = run("retrieval_bm25_topk")
    prf = run("retrieval_prf_rm3")
    moved = 0
    for qid in base.query_id.unique():
        b = list(base[base.query_id == qid].sort_values("rn").doc_id)
        p = list(prf[prf.query_id == qid].sort_values("rn").doc_id)
        if b != p:
            moved += 1
    assert moved >= 1


def test_unigram_perplexity_matches_python(run, docs):
    got = run("text_unigram_perplexity").set_index("doc_id")
    tf, dl, df, _, _ = _corpus_stats(docs)
    ctf = Counter()
    for c in tf.values():
        ctf.update(c)
    coll = sum(ctf.values())
    ppl = {}
    for d, c in tf.items():
        h = -sum(n * math.log(k / coll) for k, n in ((ctf[t], n) for t, n in c.items())) / dl[d]
        ppl[d] = _rnd(math.exp(h), 6)
    assert len(got) == len(ppl)
    for d, row in got.iterrows():
        assert row.n_tokens == dl[d]
        assert abs(row.ppl - ppl[d]) < 1e-9
    # tercile buckets: sizes differ by at most 1 doc, ordered by ppl
    counts = got.ppl_bucket.value_counts()
    n = len(got)
    assert counts["head"] == n // 3 + (1 if n % 3 else 0) or counts["head"] == n // 3
    assert got[got.ppl_bucket == "head"].ppl.max() <= got[
        got.ppl_bucket == "tail"
    ].ppl.min()


def test_epoch_shard_plan_matches_hashlib(run, docs):
    got = run("corpus_epoch_shard_plan")
    n_docs = len(docs)
    assert len(got) == 2 * n_docs
    hs = {}
    for _, row in got.iterrows():
        key = f"{row.doc_id}:{row.epoch}".encode()
        h = int(hashlib.md5(key).hexdigest()[:8], 16)
        assert row.shard == h % 8
        hs[(row.epoch, row.doc_id)] = h
    # positions are 1..n contiguous per (epoch, shard), ordered by h
    for (epoch, shard), grp in got.groupby(["epoch", "shard"]):
        grp = grp.sort_values("position")
        assert list(grp.position) == list(range(1, len(grp) + 1))
        keys = [(hs[(epoch, d)], d) for d in grp.doc_id]
        assert keys == sorted(keys)
    # epochs produce different orders (the point of per-epoch keys)
    e0 = got[got.epoch == 0].sort_values(["shard", "position"]).doc_id
    e1 = got[got.epoch == 1].sort_values(["shard", "position"]).doc_id
    assert list(e0) != list(e1)
