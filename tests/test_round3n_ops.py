"""Semantic checks for the round-3n operators (burstiness/Fano,
row-level quarantine).
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


def test_fano_matches_numpy(run, sf_dir):
    out = run("ts_burstiness_fano").set_index("event_type")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["hour"] = ev["ts"].dt.floor("h")
    for et, g in ev.groupby("event_type"):
        counts = g.groupby("hour").size().to_numpy(dtype=float)
        mu, var = counts.mean(), counts.var(ddof=1)
        sd = np.sqrt(var)
        assert out.loc[et, "n_hours"] == len(counts)
        assert abs(out.loc[et, "mean_rate"] - round(mu, 4)) < 2e-4
        assert abs(out.loc[et, "fano_factor"] - var / mu) < 2e-3
        b = (sd - mu) / (sd + mu)
        assert abs(out.loc[et, "burstiness_b"] - b) < 2e-3
        assert -1 <= out.loc[et, "burstiness_b"] <= 1


def test_quarantine_rules_complete_and_sound(run, sf_dir):
    out = run("dq_quarantine_rows")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    bad_status = ~orders["o_orderstatus"].isin(["F", "O", "P"])
    future = orders["o_orderdate"] > pd.Timestamp("2001-12-31")
    nonpos = orders["o_totalprice"] <= 0
    outlier = orders["o_totalprice"] > 450000
    expected = orders[bad_status | future | nonpos | outlier]
    assert len(out) == len(expected)
    assert set(out["o_orderkey"]) == set(expected["o_orderkey"])
    # reasons consistent: n_violations equals the comma-joined length
    n_from_str = out["violations"].str.split(",").str.len()
    assert (n_from_str == out["n_violations"]).all()
    assert (out["n_violations"] >= 1).all()
    # spot-check one known rule on a sampled row
    r = out.iloc[0]
    row = orders.loc[orders.o_orderkey == r["o_orderkey"]].iloc[0]
    if "price_outlier" in r["violations"]:
        assert row["o_totalprice"] > 450000
