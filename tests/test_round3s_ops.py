"""Semantic checks for the round-3s operators (tier migration matrix,
seasonal-naive forecast error).
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


def test_migration_matrix_conserves_customers(run, sf_dir):
    out = run("q_customer_migration_matrix")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    t0, t1 = orders["o_orderdate"].min(), orders["o_orderdate"].max()
    t_mid = pd.Timestamp((t0.value // 1000 + t1.value // 1000) // 2 * 1000)
    orders["half"] = np.where(orders["o_orderdate"] < t_mid, 1, 2)
    spend = orders.groupby(["o_custkey", "half"])["o_totalprice"].sum()
    both = (
        spend.unstack("half").dropna().index
    )  # customers active in both halves
    assert out["n_customers"].sum() == len(both)
    assert set(out["tier_h1"]) <= {1, 2, 3, 4}
    assert set(out["tier_h2"]) <= {1, 2, 3, 4}
    # exact tier recompute for half 1
    h1 = spend.xs(1, level="half").reset_index()
    h1 = h1.sort_values(["o_totalprice", "o_custkey"], ascending=[False, True])
    k = len(h1)
    sizes = [k // 4 + (1 if i < k % 4 else 0) for i in range(4)]
    tiers = np.repeat([1, 2, 3, 4], sizes)
    h1["tier"] = tiers
    h2 = spend.xs(2, level="half").reset_index()
    h2 = h2.sort_values(["o_totalprice", "o_custkey"], ascending=[False, True])
    k2 = len(h2)
    sizes2 = [k2 // 4 + (1 if i < k2 % 4 else 0) for i in range(4)]
    h2["tier"] = np.repeat([1, 2, 3, 4], sizes2)
    merged = h1.merge(h2, on="o_custkey", suffixes=("_1", "_2"))
    exp = merged.groupby(["tier_1", "tier_2"]).size()
    got = out.set_index(["tier_h1", "tier_h2"])["n_customers"]
    for key, n in exp.items():
        assert got.loc[key] == n


def test_seasonal_naive_error_matches_pandas(run, sf_dir):
    out = run("ts_seasonal_naive_error").set_index("event_type")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["hour"] = ev["ts"].dt.floor("h")
    for et, g in ev.groupby("event_type"):
        s = g.groupby("hour").size().sort_index()
        pred = s.shift(24)
        mask = ~pred.isna()
        err = (s[mask] - pred[mask]).abs()
        assert out.loc[et, "n_forecasts"] == mask.sum()
        assert abs(out.loc[et, "mae"] - round(err.mean(), 4)) < 2e-4
        rmse = np.sqrt(((s[mask] - pred[mask]) ** 2).mean())
        assert abs(out.loc[et, "rmse"] - rmse) < 2e-3
        mape = (err / s[mask].clip(lower=1)).mean()
        assert abs(out.loc[et, "mape"] - mape) < 2e-4
