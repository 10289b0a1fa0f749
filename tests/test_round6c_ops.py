"""Semantic checks for the round-6c batch (supplier scorecard, schema
contract check)."""

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


def test_scorecard_matches_pandas(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    sup = pd.read_parquet(f"{sf_dir}/supplier.parquet").set_index(
        "s_suppkey"
    )
    li["rev"] = li["l_extendedprice"] * (1 - li["l_discount"])
    k = li.groupby("l_suppkey").agg(
        n_lines=("l_orderkey", "size"),
        revenue=("rev", "sum"),
        avg_discount=("l_discount", "mean"),
        return_rate=("l_returnflag", lambda s: (s == "R").mean()),
    )
    k["revenue"] = k["revenue"].round(2)
    top = k.sort_values(
        ["revenue", "l_suppkey"],
        ascending=[False, True],
        key=lambda c: c if c.name == "revenue" else c,
    )
    top = k.reset_index().sort_values(
        ["revenue", "l_suppkey"], ascending=[False, True]
    ).head(25)
    out = run("supplier_scorecard_composite").sort_values("revenue_rank")
    assert list(out["suppkey"]) == list(top["l_suppkey"])
    for (_, e), r in zip(top.iterrows(), out.itertuples()):
        assert r.n_lines == e["n_lines"]
        assert r.revenue == pytest.approx(e["revenue"], abs=2e-2)
        assert r.avg_discount == pytest.approx(e["avg_discount"], abs=2e-6)
        assert r.return_rate == pytest.approx(e["return_rate"], abs=2e-6)
        assert r.s_name == sup.loc[e["l_suppkey"], "s_name"]
    assert list(out["revenue_rank"]) == list(range(1, len(out) + 1))


def test_schema_contract_verdicts(run, sf_dir):
    out = run("dq_schema_contract_check").set_index("column_name")
    # present, correctly typed columns pass
    for col, tp in [
        ("o_orderkey", "int64"),
        ("o_totalprice", "float64"),
        ("o_orderdate", "timestamp"),
        ("o_orderpriority", "string"),
    ]:
        r = out.loc[col]
        assert r["expected_type"] == tp
        assert r["actual_type"] == tp
        assert bool(r["ok"])
    # contract columns the synthetic table lacks -> detected missing
    for col in ("o_clerk", "o_shippriority", "o_comment"):
        r = out.loc[col]
        assert pd.isna(r["actual_type"])
        assert not bool(r["ok"])
