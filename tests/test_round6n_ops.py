"""Semantic checks for the round-6n batch (prefix boilerplate miner,
transition conformance checker)."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()

_LEGAL = {
    ("signup", "view"), ("signup", "click"),
    ("view", "view"), ("view", "click"), ("view", "error"),
    ("click", "view"), ("click", "click"), ("click", "purchase"),
    ("click", "error"),
    ("purchase", "view"), ("purchase", "signup"),
    ("error", "view"), ("error", "error"),
}


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_prefix_topk_matches_pandas(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    prefixes = []
    for t in docs["text"]:
        ws = [w for w in re.split(r"\s+", t.lower()) if w]
        if len(ws) >= 5:
            prefixes.append(" ".join(ws[:5]))
    counts = Counter(prefixes)
    n_total = len(prefixes)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    out = run("corpus_prefix_boilerplate_topk")
    assert list(out["prefix"]) == [p for p, _ in top]
    for (p, n), r in zip(top, out.itertuples()):
        assert r.n_docs == n
        assert r.share == pytest.approx(n / n_total, abs=2e-6)


def test_conformance_matches_pandas(run, spark, sf_dir):
    trans = (
        SPECS["events_markov_transitions"].fn(spark, sf_dir).toPandas()
    )
    total = trans["n_trans"].sum()
    illegal = trans[
        ~trans.apply(
            lambda r: (r["src_type"], r["dst_type"]) in _LEGAL, axis=1
        )
    ]
    out = run("events_conformance_illegal_transitions")
    got = {
        (r.src_type, r.dst_type): (int(r.n_trans), float(r.share))
        for r in out.itertuples()
    }
    assert set(got) == {
        (r.src_type, r.dst_type) for r in illegal.itertuples()
    }
    for r in illegal.itertuples():
        n, share = got[(r.src_type, r.dst_type)]
        assert n == r.n_trans
        assert share == pytest.approx(r.n_trans / total, abs=2e-6)
    # no sanctioned transition may appear
    assert not (set(got) & _LEGAL)
