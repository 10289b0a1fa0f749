"""Semantic twins for the round-7d additions: the run-length UDTF
against a pure-Python scanner, and the PRF rank-shift eval against a
recomputation from the two rankings it compares."""

from __future__ import annotations

import re

import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def _py_rle(text: str):
    words = [w for w in re.split(r"\s+", (text or "").lower()) if w]
    out = []
    run_idx = 0
    i = 0
    while i < len(words):
        j = i
        while j < len(words) and words[j] == words[i]:
            j += 1
        if j - i >= 2:
            out.append((run_idx, words[i], j - i, i + 1))
        run_idx += 1
        i = j
    return out


def test_rle_matches_python(run, spark, sf_dir):
    from awsbeats_spark.catalog import tables

    docs = tables(spark, sf_dir).documents.toPandas()
    got = run("udtf_run_length_encode")
    by_doc = {d: g for d, g in got.groupby("doc_id")}
    n_with_runs = 0
    for _, row in docs.iterrows():
        exp = _py_rle(row.text)
        g = by_doc.get(row.doc_id)
        rows = (
            []
            if g is None
            else list(
                g.sort_values("run_idx")[
                    ["run_idx", "word", "run_len", "start_pos"]
                ].itertuples(index=False, name=None)
            )
        )
        assert rows == exp, f"doc {row.doc_id}"
        if exp:
            n_with_runs += 1
    # the ~30-word uniform vocab makes adjacent repeats common: the
    # fixture must actually exercise the stateful path
    assert n_with_runs > 10


def test_rle_hand_case():
    assert _py_rle("a a a b c c  a") == [(0, "a", 3, 1), (2, "c", 2, 5)]
    assert _py_rle("x y z") == []
    assert _py_rle("") == []


def test_prf_rank_shift_recomputes(run):
    base = run("retrieval_bm25_topk")
    prf = run("retrieval_prf_rm3")
    got = run("eval_prf_rank_shift").set_index("query_id")
    for qid in base.query_id.unique():
        b = base[base.query_id == qid].set_index("doc_id").rn
        r = prf[prf.query_id == qid].set_index("doc_id").rn
        both = b.index.intersection(r.index)
        row = got.loc[qid]
        assert row.overlap_at_k == len(both)
        assert row.n_promoted == len(r.index.difference(b.index))
        assert row.n_dropped == len(b.index.difference(r.index))
        assert row.n_promoted == row.n_dropped  # both lists are top-k
        if len(both):
            exp = (b[both] - r[both]).abs().mean()
            # the op rounds to 4 dp
            assert abs(row.mean_abs_rank_shift - exp) < 5.1e-5
