"""Semantic checks for the round-6f batch (contrastive pair mining,
Simpson's paradox probe)."""

from __future__ import annotations

import re

import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_contrastive_pairs_properties(run, spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index(
        "doc_id"
    )
    pos_pairs = {
        (int(r.doc_a), int(r.doc_b))
        for r in SPECS["dedup_minhash"].fn(spark, sf_dir).toPandas().itertuples()
    }
    out = run("corpus_contrastive_pair_mining")
    got_pos = out[out["pair_type"] == "pos"]
    got_neg = out[out["pair_type"] == "neg"]
    # positives are exactly the minhash pairs (with nonempty unions)
    assert {
        (int(r.doc_a), int(r.doc_b)) for r in got_pos.itertuples()
    } <= pos_pairs
    # negatives: same source, same 50-char length block, not a positive
    for r in got_neg.itertuples():
        a, b = docs.loc[int(r.doc_a)], docs.loc[int(r.doc_b)]
        assert a["source"] == b["source"]
        assert a["n_chars"] // 50 == b["n_chars"] // 50
        assert (int(r.doc_a), int(r.doc_b)) not in pos_pairs
    # jaccard is the exact word-set jaccard for both classes
    for r in out.sample(min(25, len(out)), random_state=7).itertuples():
        wa = {w for w in re.split(r"\s+", docs.loc[int(r.doc_a), "text"].lower()) if w}
        wb = {w for w in re.split(r"\s+", docs.loc[int(r.doc_b), "text"].lower()) if w}
        assert r.jaccard == pytest.approx(
            len(wa & wb) / len(wa | wb), abs=2e-6
        )
    # the signal separates: positives score far above negatives
    if len(got_pos) and len(got_neg):
        assert got_pos["jaccard"].mean() > got_neg["jaccard"].mean() + 0.2


def test_simpsons_probe_matches_pandas(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j = j[j["c_mktsegment"].isin(["BUILDING", "MACHINERY"])]
    a = j[j["c_mktsegment"] == "BUILDING"]
    b = j[j["c_mktsegment"] == "MACHINERY"]
    pooled_a_wins = a["o_totalprice"].mean() > b["o_totalprice"].mean()
    out = run("dq_simpsons_paradox_probe").set_index("stratum")
    for st in out.index:
        sa = a[a["o_orderpriority"] == st]["o_totalprice"]
        sb = b[b["o_orderpriority"] == st]["o_totalprice"]
        r = out.loc[st]
        assert r["n_a"] == len(sa) and r["n_b"] == len(sb)
        assert r["avg_a"] == pytest.approx(sa.mean(), abs=2e-3)
        assert r["avg_b"] == pytest.approx(sb.mean(), abs=2e-3)
        assert bool(r["a_wins"]) == (sa.mean() > sb.mean())
        assert bool(r["reversed_vs_pooled"]) == (
            (sa.mean() > sb.mean()) != pooled_a_wins
        )
