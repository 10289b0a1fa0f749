"""Semantic checks for the round-3f operators (ROUGE pair audit,
try-safe scalar math, ratio-to-report shares).
"""

from __future__ import annotations

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


def test_rouge_overlap_matches_sets(run, sf_dir):
    out = run("eval_pair_rouge_overlap")
    pairs = run("dedup_ngram_jaccard")
    assert len(out) == len(pairs)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    wsets = {
        r.doc_id: set(str(r.text).lower().split())
        for r in docs.itertuples()
    }
    for r in out.itertuples():
        a, b = wsets[r.doc_a], wsets[r.doc_b]
        common = len(a & b)
        assert r.n_common == common
        assert abs(r.rouge1_recall - round(common / len(b), 6)) < 1e-6
        assert abs(r.rouge1_precision - round(common / len(a), 6)) < 1e-6
        f1 = 2.0 * common / (len(a) + len(b))
        assert abs(r.rouge1_f1 - round(f1, 6)) < 1e-6


def test_try_safe_math_nulls_instead_of_errors(run):
    out = run("scalar_try_safe_math")
    # qty==25 rows -> NULL ratio, never an exception
    assert out["price_per_off25"].isna().sum() > 0
    # return flags are never numeric
    assert out["flag_as_int"].isna().all()
    # even line numbers parse, odd (letters) are NULL
    even = out["l_linenumber"] % 2 == 0
    assert (out.loc[even, "qty_int"] == out.loc[even, "l_linenumber"]).all()
    assert out.loc[~even, "qty_int"].isna().all()


def test_share_of_total_sums_to_one(run, sf_dir):
    out = run("window_share_of_total")
    # grand-total shares sum to ~1, region shares sum to ~1 per region
    assert abs(out["share_of_total"].sum() - 1.0) < 1e-3
    for _, g in out.groupby("n_regionkey"):
        assert abs(g["share_of_region"].sum() - 1.0) < 1e-3
        # rank 1 is the region's max revenue
        top = g.loc[g["rank_in_region"] == 1, "revenue"].iloc[0]
        assert top == g["revenue"].max()
