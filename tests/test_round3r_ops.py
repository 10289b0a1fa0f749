"""Semantic checks for the round-3r operators (inter-purchase gaps,
bigram entropy rate).
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


def test_gaps_match_pandas(run, sf_dir):
    out = run("orders_interpurchase_gaps").set_index("o_custkey")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    for ck, g in orders.groupby("o_custkey"):
        g = g.sort_values(["o_orderdate", "o_orderkey"])
        gaps = g["o_orderdate"].diff().dt.days.dropna()
        assert out.loc[ck, "n_orders"] == len(g)
        assert out.loc[ck, "n_gaps"] == len(gaps)
        if len(gaps):
            assert abs(out.loc[ck, "avg_gap_days"] - round(gaps.mean(), 4)) < 2e-4
            assert out.loc[ck, "max_gap_days"] == gaps.max()
            assert out.loc[ck, "min_gap_days"] == gaps.min()
        else:
            assert np.isnan(out.loc[ck, "avg_gap_days"])


def test_bigram_entropy_matches_numpy(run, sf_dir):
    out = run("corpus_bigram_entropy_rate").iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    from collections import Counter

    pairs = Counter()
    for t in docs["text"]:
        ws = str(t).lower().split()
        pairs.update(zip(ws, ws[1:]))
    n = np.array(list(pairs.values()), dtype=float)
    nt = n.sum()
    uni = Counter()
    for (w1, _), c in pairs.items():
        uni[w1] += c
    n1 = np.array([uni[w1] for (w1, _) in pairs], dtype=float)
    h_cond = -((n / nt) * np.log(n / n1)).sum()
    h_joint = -((n / nt) * np.log(n / nt)).sum()
    assert out["n_bigrams"] == int(nt)
    assert out["n_distinct_bigrams"] == len(pairs)
    assert abs(out["entropy_rate_nats"] - h_cond) < 2e-3
    assert abs(out["joint_entropy_nats"] - h_joint) < 2e-3
    # conditioning can only reduce entropy
    assert out["entropy_rate_nats"] <= out["joint_entropy_nats"] + 1e-9
