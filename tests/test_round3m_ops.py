"""Semantic checks for the round-3m operators (LPT shard balancing,
moment-based skewness/kurtosis).
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


def test_shard_balance_covers_and_balances(run, sf_dir):
    from awsbeats_spark.operators.llm.multimodal import _N_SHARDS

    out = run("multimodal_shard_balance_lpt")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert len(out) == _N_SHARDS
    assert out["n_items"].sum() == len(docs)
    total = docs["text"].str.encode("utf-8").str.len().sum()
    assert out["total_bytes"].sum() == total
    # size-ranked round robin keeps shards within a few percent of ideal
    assert out["balance_ratio"].between(0.9, 1.1).all()
    # exact assignment check
    sized = docs.assign(b=docs["text"].str.encode("utf-8").str.len())
    sized = sized.sort_values(["b", "doc_id"], ascending=[False, True])
    sized["shard"] = np.arange(len(sized)) % _N_SHARDS
    exp = sized.groupby("shard")["b"].agg(["size", "sum"])
    got = out.set_index("shard").sort_index()
    assert (got["n_items"].to_numpy() == exp["size"].to_numpy()).all()
    assert (got["total_bytes"].to_numpy() == exp["sum"].to_numpy()).all()


def test_higher_moments_match_scipy_definitions(run, sf_dir):
    out = run("agg_higher_moments").set_index("event_type")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    for et, g in ev.groupby("event_type"):
        x = g["value"].to_numpy(dtype=float)
        mu = x.mean()
        m2 = ((x - mu) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        assert abs(out.loc[et, "mean"] - round(mu, 4)) < 2e-4
        assert abs(out.loc[et, "pop_std"] - round(np.sqrt(m2), 4)) < 2e-3
        assert abs(out.loc[et, "skewness_g1"] - m3 / m2**1.5) < 2e-3
        assert abs(out.loc[et, "excess_kurtosis_g2"] - (m4 / m2**2 - 3)) < 5e-3
