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


def test_quarantine_multi_violation_reasons(spark):
    # synthetic rows firing multiple rules pin the comma-join ordering
    # and n_violations for n > 1 (the real testdata only fires one rule)
    import os
    import tempfile

    from awsbeats_spark.registry import QUERIES

    pdf = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [10, 11, 12],
            "o_orderstatus": ["X", "F", "O"],
            "o_totalprice": [-5.0, 500000.0, 1000.0],
            "o_orderdate": pd.to_datetime(
                ["2002-06-01", "2000-01-01", "2001-01-01"]
            ).astype("datetime64[us]"),
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "orders.parquet"))
        out = (
            QUERIES["dq_quarantine_rows"].fn(spark, d)
            .toPandas()
            .set_index("o_orderkey")
        )
    # row 1 fires three rules in declaration order
    assert out.loc[1, "violations"] == "nonpositive_price,bad_status,future_date"
    assert out.loc[1, "n_violations"] == 3
    # row 2 fires exactly one
    assert out.loc[2, "violations"] == "price_outlier"
    assert out.loc[2, "n_violations"] == 1
    # row 3 is clean and quarantined nowhere
    assert 3 not in out.index
