"""Semantic laws for the retrieval operators (llm/retrieval.py) beyond
the DuckDB parity check in test_oracle_parity.py."""

from __future__ import annotations

import math

import pytest

from awsbeats_spark.operators.llm import retrieval as R
from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def bm25(spark, sf_dir):
    return SPECS["retrieval_bm25_topk"].fn(spark, sf_dir).toPandas()


@pytest.fixture(scope="module")
def ql(spark, sf_dir):
    return SPECS["retrieval_query_likelihood"].fn(spark, sf_dir).toPandas()


@pytest.fixture(scope="module")
def rrf(spark, sf_dir):
    return SPECS["retrieval_rrf_hybrid"].fn(spark, sf_dir).toPandas()


def test_bm25_scores_positive_and_ranked(bm25):
    assert (bm25.bm25 > 0).all()
    for qid, grp in bm25.groupby("query_id"):
        g = grp.sort_values("rn")
        assert list(g.rn) == list(range(1, len(g) + 1))
        assert (g.bm25.diff().dropna() <= 1e-12).all(), "rank order must follow score"
        assert len(g) <= R.RETR_TOP_K


def test_bm25_all_queries_present(bm25):
    assert set(bm25.query_id) == set(R.QUERY_TERMS)


def test_ql_scores_are_valid_log_probs(ql):
    # ln of a probability-like ratio in (0, 1): strictly negative, finite.
    assert (ql.ql < 0).all()
    assert ql.ql.map(math.isfinite).all()
    for _, grp in ql.groupby("query_id"):
        g = grp.sort_values("rn")
        assert (g.ql.diff().dropna() <= 1e-12).all()


def test_ql_and_bm25_agree_on_relevance_direction(bm25, ql):
    # The two lexical scorers should broadly agree: for each query, the
    # overlap of their top-15 sets is substantial (same corpus stats).
    for qid in R.QUERY_TERMS:
        b = set(bm25[bm25.query_id == qid].doc_id)
        q = set(ql[ql.query_id == qid].doc_id)
        assert len(b & q) >= 5, f"query {qid}: top-k sets diverged: {b & q}"


def test_rrf_bounds_and_fusion_monotonicity(rrf):
    # Each modality contributes at most 1/(k+1); two modalities bound
    # the fused score. A doc present in BOTH rankings at depth d beats
    # one present in a single ranking at the same depth.
    hi = 2.0 / (R.RRF_K + 1)
    assert (rrf.rrf > 0).all() and (rrf.rrf <= hi + 1e-12).all()
    for _, grp in rrf.groupby("query_id"):
        g = grp.sort_values("rn")
        assert (g.rrf.diff().dropna() <= 1e-12).all()
        assert len(g) <= R.RETR_TOP_K


def test_rrf_fuses_both_modalities(spark, sf_dir, rrf):
    # The fused list must not be a copy of either single-modality list:
    # at least one query's top-15 should differ from pure-dense order.
    dense = (
        SPECS["sim_search_topk"].fn(spark, sf_dir).toPandas()
    )  # same query ids 0..9 superset
    diffs = 0
    for qid in range(R.RRF_N_QUERIES):
        fused_top = list(
            rrf[rrf.query_id == qid].sort_values("rn").doc_id.head(10)
        )
        dense_top = list(
            dense[dense.query_id == qid].sort_values("rn").neighbor_id.head(10)
        )
        if fused_top != dense_top:
            diffs += 1
    assert diffs >= 1


def test_hashed_bow_bucket_domain(spark, sf_dir):
    pdf = SPECS["text_hashed_bow"].fn(spark, sf_dir).toPandas()
    assert pdf.bucket.between(0, 63).all()
    assert (pdf.rn <= 8).all()
    assert (pdf.cnt > 0).all()
    # top-1 bucket per doc is rank 1
    assert (pdf.groupby("doc_id").rn.min() == 1).all()
