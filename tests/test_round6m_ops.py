"""Semantic checks for the round-6m batch (partition checksums,
discount depth bands)."""

from __future__ import annotations

import hashlib
from functools import reduce

import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_partition_checksums_match_python(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].astype("datetime64[us]").dt.strftime("%Y-%m-%d")
    out = run("dq_partition_checksums").set_index("day")
    for day, g in ev.groupby("day"):
        hs = [
            int(
                hashlib.md5(
                    f"{e}|{u}|{t}".encode()
                ).hexdigest()[:15],
                16,
            )
            for e, u, t in zip(
                g["event_id"], g["user_id"], g["event_type"]
            )
        ]
        r = out.loc[day]
        assert r["n_rows"] == len(g)
        assert r["xor_checksum"] == reduce(lambda a, b: a ^ b, hs)
    # order independence: a shuffled recomputation gives the same xor
    g0 = ev[ev["day"] == ev["day"].iloc[0]].sample(frac=1, random_state=3)
    hs = [
        int(hashlib.md5(f"{e}|{u}|{t}".encode()).hexdigest()[:15], 16)
        for e, u, t in zip(g0["event_id"], g0["user_id"], g0["event_type"])
    ]
    assert out.loc[ev["day"].iloc[0], "xor_checksum"] == reduce(
        lambda a, b: a ^ b, hs
    )


def test_discount_bands_match_pandas(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")

    def band(d):
        if d == 0:
            return "0: none"
        if d <= 0.03:
            return "1: 1-3%"
        if d <= 0.06:
            return "2: 4-6%"
        return "3: 7%+"

    li = li.assign(
        band=li["l_discount"].apply(band),
        rev=li["l_extendedprice"] * (1 - li["l_discount"]),
        ga=li["l_extendedprice"] * li["l_discount"],
    )
    total = li["rev"].sum()
    out = run("q_discount_depth_bands").set_index("band")
    for b, g in li.groupby("band"):
        r = out.loc[b]
        assert r["n_lines"] == len(g)
        assert r["revenue"] == pytest.approx(g["rev"].sum(), abs=2e-2)
        assert r["discount_given"] == pytest.approx(
            g["ga"].sum(), abs=2e-2
        )
        assert r["revenue_share"] == pytest.approx(
            g["rev"].sum() / total, abs=2e-6
        )
        assert r["leakage_rate"] == pytest.approx(
            g["ga"].sum() / (g["rev"].sum() + g["ga"].sum()), abs=2e-6
        )
    assert out["revenue_share"].sum() == pytest.approx(1.0, abs=1e-4)
