"""Semantic checks for the round-5i batch (SFT lint, lognormal fit
audit, token efficiency by language, corpus modality mix) —
independent recomputation in pandas/numpy, not just oracle parity."""

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


def test_sft_lint_matches_pandas(run, sf_dir):
    pairs = run("corpus_sft_pair_synth")
    out = run("corpus_sft_lint").set_index("source")
    dup_sizes = pairs.groupby(["source", "prompt"])["doc_id"].transform(
        "size"
    )
    pairs = pairs.assign(
        short_c=pairs["completion_words"] < 16,
        leak=[
            p in c for p, c in zip(pairs["prompt"], pairs["completion"])
        ],
        dup_p=(dup_sizes > 1).values,
    )
    g = pairs.groupby("source")
    assert len(out) == g.ngroups
    for src, grp in g:
        r = out.loc[src]
        assert r["n_pairs"] == len(grp)
        assert r["n_short_completion"] == int(grp["short_c"].sum())
        assert r["n_prompt_leak"] == int(grp["leak"].sum())
        assert r["n_dup_prompt"] == int(grp["dup_p"].sum())
        clean = (~(grp["short_c"] | grp["leak"] | grp["dup_p"])).mean()
        assert r["clean_rate"] == pytest.approx(clean, abs=2e-6)


def test_lognormal_fit_matches_numpy(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    y = np.log(o["o_totalprice"].values)
    mu, sigma = y.mean(), y.std(ddof=1)
    z = (y - mu) / sigma
    out = run("agg_lognormal_fit_audit").iloc[0]
    assert out["n_orders"] == len(y)
    assert out["mu_log"] == pytest.approx(mu, abs=2e-6)
    assert out["sigma_log"] == pytest.approx(sigma, abs=2e-6)
    assert out["skew_log"] == pytest.approx((z**3).mean(), abs=2e-4)
    assert out["excess_kurtosis_log"] == pytest.approx(
        (z**4).mean() - 3, abs=2e-4
    )
    assert out["fitted_mean"] == pytest.approx(
        np.exp(mu + sigma**2 / 2), abs=0.02
    )
    # bounded-uniform totalprice is NOT lognormal: the audit must say so
    assert out["skew_log"] < -0.2


def test_token_efficiency_matches_pandas(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs = docs[docs["text"].str.len() > 0].copy()
    docs["n_tokens"] = docs["text"].str.lower().str.split().str.len()
    docs["n_chars"] = docs["text"].str.len()
    out = run("corpus_token_efficiency_by_lang").set_index(
        ["lang", "source"]
    )
    g = docs.groupby(["lang", "source"])
    assert len(out) == g.ngroups
    for key, grp in g:
        r = out.loc[key]
        assert r["n_docs"] == len(grp)
        assert r["total_tokens"] == grp["n_tokens"].sum()
        assert r["total_chars"] == grp["n_chars"].sum()
        assert r["tokens_per_char"] == pytest.approx(
            grp["n_tokens"].sum() / grp["n_chars"].sum(), abs=2e-6
        )
    # whitespace tokens are multi-char: ratio must be < 1 everywhere
    assert (out["tokens_per_char"] < 1).all()


def test_corpus_mix_shares_sum_to_one(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    nbytes = docs["text"].str.encode("utf-8").str.len()
    modality = (nbytes % 3).map({0: "image", 1: "audio", 2: "video"})
    out = run("multimodal_corpus_mix").set_index("modality")
    assert set(out.index) == set(modality.unique())
    assert out["doc_share"].sum() == pytest.approx(1.0, abs=1e-4)
    assert out["byte_share"].sum() == pytest.approx(1.0, abs=1e-4)
    for mod in out.index:
        sel = nbytes[modality == mod]
        r = out.loc[mod]
        assert r["n_docs"] == len(sel)
        assert r["total_bytes"] == sel.sum()
        assert r["avg_bytes"] == pytest.approx(sel.mean(), abs=0.02)
