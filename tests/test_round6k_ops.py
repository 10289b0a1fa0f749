"""Semantic checks for the round-6k batch (daily KPI mart, revenue
bridge decomposition)."""

from __future__ import annotations

import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_kpi_snapshot_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = (
        ev["ts"].astype("datetime64[us]").dt.strftime("%Y-%m-%d")
    )
    out = run("events_kpi_daily_snapshot").set_index("day")
    grp = ev.groupby("day")
    assert set(out.index) == set(grp.groups)
    for day, g in grp:
        r = out.loc[day]
        dau = g["user_id"].nunique()
        assert r["dau"] == dau
        assert r["n_events"] == len(g)
        assert r["total_value"] == pytest.approx(
            round(g["value"].sum(), 2), abs=2e-2
        )
        assert r["error_share"] == pytest.approx(
            (g["event_type"] == "error").mean(), abs=2e-6
        )
        assert r["events_per_user"] == pytest.approx(
            len(g) / dau, abs=2e-4
        )


def test_revenue_bridge_identity(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        p, left_on="l_partkey", right_on="p_partkey"
    )
    m["y"] = m["o_orderdate"].astype("datetime64[us]").dt.year
    m = m[m["y"].isin([1997, 1998])]
    m["rev"] = m["l_extendedprice"] * (1 - m["l_discount"])
    out = run("q_revenue_bridge_decomposition").set_index("ptype")
    for pt, g in m.groupby("p_type"):
        g0, g1 = g[g["y"] == 1997], g[g["y"] == 1998]
        if not len(g0) or not len(g1):
            assert pt not in out.index
            continue
        q0, r0 = g0["l_quantity"].sum(), g0["rev"].sum()
        q1, r1 = g1["l_quantity"].sum(), g1["rev"].sum()
        p0, p1 = r0 / q0, r1 / q1
        r = out.loc[pt]
        assert r["rev_base"] == pytest.approx(r0, abs=2e-2)
        assert r["rev_next"] == pytest.approx(r1, abs=2e-2)
        assert r["volume_effect"] == pytest.approx(
            (q1 - q0) * p0, abs=2e-2
        )
        assert r["price_effect"] == pytest.approx(
            (p1 - p0) * q0, abs=2e-2
        )
        assert r["mix_effect"] == pytest.approx(
            (q1 - q0) * (p1 - p0), abs=2e-2
        )
        # the bridge identity: effects sum to the delta (up to rounding)
        assert (
            r["volume_effect"] + r["price_effect"] + r["mix_effect"]
        ) == pytest.approx(r["delta_total"], abs=0.05)
