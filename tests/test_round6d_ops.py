"""Semantic checks for the round-6d batch (two-pass exact median,
md5-threshold sampler)."""

from __future__ import annotations

import hashlib
import math

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


def test_two_pass_median_is_exact(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    x = np.sort(li["l_extendedprice"].to_numpy())
    n = len(x)
    k = math.ceil(n / 2)  # lower median, percentile_disc semantics
    exact = round(float(x[k - 1]), 2)
    r = run("agg_median_two_pass_binned").iloc[0]
    assert r["n_rows"] == n
    assert r["median_exact"] == pytest.approx(exact, abs=1e-9)
    # the whole point: the second pass touched a tiny slice
    assert r["n_in_bin"] < max(20, n // 100)
    lo, hi = x[0], x[-1]
    width = (hi - lo) / 1000
    b = min(int((exact - lo) // width), 999)
    assert r["median_bin"] == b


def test_md5_threshold_sampler_matches(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    unif = ev["event_id"].apply(
        lambda i: int(
            hashlib.md5(str(i).encode()).hexdigest()[:8], 16
        )
        / 4294967296.0
    )
    ev = ev.assign(unif=unif, picked=unif < 0.05)
    out = run("sample_md5_threshold").set_index("event_type")
    for tp, grp in ev.groupby("event_type"):
        r = out.loc[tp]
        assert r["n_pop"] == len(grp)
        assert r["n_sampled"] == grp["picked"].sum()
        assert r["achieved_frac"] == pytest.approx(
            grp["picked"].mean(), abs=2e-6
        )
        if grp["picked"].any():
            assert r["sample_mean"] == pytest.approx(
                grp.loc[grp["picked"], "value"].mean(), abs=2e-4
            )
        assert r["pop_mean"] == pytest.approx(
            grp["value"].mean(), abs=2e-4
        )
        # binomial wobble stays near the 5% target on real volumes
        if len(grp) > 1000:
            assert abs(r["achieved_frac"] - 0.05) < 0.02
