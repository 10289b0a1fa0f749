"""Semantic checks for the round-3p operators (Heaps vocabulary growth,
per-source Jensen-Shannon divergence).
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


def test_heaps_growth_matches_pandas(run, sf_dir):
    out = run("corpus_vocab_growth_heaps").set_index("n_docs").sort_index()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for cp in out.index:
        prefix = docs[docs["doc_id"] < cp]
        vocab = set()
        toks = 0
        for t in prefix["text"]:
            ws = str(t).lower().split()
            toks += len(ws)
            vocab.update(ws)
        assert out.loc[cp, "vocab"] == len(vocab)
        assert out.loc[cp, "n_tokens"] == toks
    # vocabulary growth is monotone and sublinear in tokens (Heaps)
    v = out["vocab"].to_numpy(dtype=float)
    n = out["n_tokens"].to_numpy(dtype=float)
    assert (np.diff(v) >= 0).all()
    if len(v) >= 3:
        beta = np.polyfit(np.log(n), np.log(v), 1)[0]
        assert 0 < beta < 1  # sublinear


def test_js_divergence_matches_scipy_style(run, sf_dir):
    out = run("text_source_js_divergence").set_index("source")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tok = docs.assign(ws=docs["text"].str.lower().str.split()).explode("ws")
    corp = tok["ws"].value_counts(normalize=True)
    for src, g in tok.groupby("source"):
        p = g["ws"].value_counts(normalize=True)
        # full-vocab JS divergence with 0-extension of p
        words = corp.index
        pv = p.reindex(words, fill_value=0.0).to_numpy()
        qv = corp.to_numpy()
        m = 0.5 * (pv + qv)
        with np.errstate(divide="ignore", invalid="ignore"):
            kl_pm = np.where(pv > 0, pv * np.log(pv / m), 0.0).sum()
            kl_qm = np.where(qv > 0, qv * np.log(qv / m), 0.0).sum()
        js = 0.5 * kl_pm + 0.5 * kl_qm
        assert abs(out.loc[src, "js_divergence"] - js) < 2e-4, src
        assert 0 <= out.loc[src, "js_divergence"] <= np.log(2) + 1e-9
        assert out.loc[src, "n_vocab"] == len(p)
