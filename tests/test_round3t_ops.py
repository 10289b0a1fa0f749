"""Semantic checks for the round-3t operators (word burstiness,
source-mix KL to target).
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


def test_burstiness_matches_pandas(run, sf_dir):
    out = run("text_word_burstiness")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tok = docs.assign(ws=docs["text"].str.lower().str.split()).explode("ws")
    cf = tok["ws"].value_counts()
    df = tok.drop_duplicates(["doc_id", "ws"])["ws"].value_counts()
    for r in out.itertuples():
        assert r.cf == cf[r.word]
        assert r.df == df[r.word]
        assert abs(r.burstiness - round(r.cf / r.df, 6)) < 1e-6
        assert r.burstiness >= 1.0  # cf >= df by construction
    # selection = top by cf with word tiebreak
    k = len(out)
    exp = cf.reset_index()
    exp.columns = ["word", "cf"]
    exp = exp.sort_values(["cf", "word"], ascending=[False, True]).head(k)
    assert list(out["word"]) == list(exp["word"])


def test_mix_kl_properties(run, sf_dir):
    out = run("corpus_mix_kl_to_target")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = docs.assign(n=docs["text"].str.lower().str.split().str.len())
    exp = toks.groupby("source")["n"].sum()
    got = out.set_index("source")
    for src, n in exp.items():
        assert got.loc[src, "tokens"] == n
    assert abs(out["actual_share"].sum() - 1.0) < 1e-3
    # total KL >= 0 (Gibbs) and 0 iff uniform
    assert out["kl_term"].sum() >= -1e-6
    # weight_ratio consistent with shares
    ratio = out["actual_share"] / out["target_share"]
    assert np.allclose(out["weight_ratio"], ratio.round(4), atol=2e-3)
