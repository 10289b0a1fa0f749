"""Semantic checks for the round-3o operators (SFT pair synthesis,
Lorenz activity deciles).
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


def test_sft_pairs_reassemble_document(run, sf_dir):
    from awsbeats_spark.operators.llm.corpus import (
        _SFT_MIN_COMPLETION_WORDS,
        _SFT_PROMPT_WORDS,
    )

    out = run("corpus_sft_pair_synth").set_index("doc_id")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    kept = 0
    for r in docs.itertuples():
        ws = str(r.text).lower().split()
        if len(ws) >= _SFT_PROMPT_WORDS + _SFT_MIN_COMPLETION_WORDS:
            kept += 1
            row = out.loc[r.doc_id]
            assert row["prompt"] == " ".join(ws[:_SFT_PROMPT_WORDS])
            assert row["completion"] == " ".join(ws[_SFT_PROMPT_WORDS:])
            assert row["completion_words"] == len(ws) - _SFT_PROMPT_WORDS
        else:
            assert r.doc_id not in out.index
    assert len(out) == kept
    assert (out["prompt_words"] == _SFT_PROMPT_WORDS).all()


def test_lorenz_deciles_monotone_and_complete(run, sf_dir):
    out = run("events_lorenz_deciles").sort_values("decile").reset_index(drop=True)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert out["n_events"].sum() == len(ev)
    assert out["n_users"].sum() == ev["user_id"].nunique()
    # decile 1 holds the heaviest users: shares weakly decreasing
    shares = out["share"].to_numpy()
    assert (np.diff(shares) <= 1e-9).all()
    assert abs(out["cum_share"].iloc[-1] - 1.0) < 1e-3
    assert (np.diff(out["cum_share"]) >= -1e-9).all()
    # exact check of decile 1 against pandas ntile semantics
    counts = ev.groupby("user_id").size().reset_index(name="n")
    counts = counts.sort_values(["n", "user_id"], ascending=[False, True])
    k = len(counts)
    base, rem = divmod(k, 10)
    first_size = base + (1 if rem >= 1 else 0)
    top = counts.head(first_size)
    assert out.loc[0, "n_users"] == first_size
    assert out.loc[0, "n_events"] == top["n"].sum()
