"""Semantic checks for the round-6i batch (surrogate keys, basket
histogram, rare-category audit, weighted correlation)."""

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


def test_surrogate_uuid_layout(run, sf_dir):
    import re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = run("scalar_surrogate_key_uuid5").set_index("doc_id")
    assert len(out) == len(docs)
    assert out["surrogate_uuid"].is_unique
    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}"
        r"-[0-9a-f]{12}$"
    )
    for doc_id in docs["doc_id"].head(30):
        u = out.loc[int(doc_id), "surrogate_uuid"]
        assert pat.match(u), u
        d = hashlib.md5(f"doc:{doc_id}".encode()).hexdigest()
        # determinism: same input -> same uuid on recompute
        variant = "89ab"[int(d[16], 16) % 4]
        expect = (
            f"{d[0:8]}-{d[8:12]}-5{d[13:16]}-{variant}{d[17:20]}"
            f"-{d[20:32]}"
        )
        assert u == expect


def test_basket_histogram_matches_pandas(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    widths = (
        li.groupby("l_orderkey").size()
        .reindex(o["o_orderkey"], fill_value=0)
    )
    o = o.assign(w=widths.values)
    out = run("orders_basket_size_histogram").set_index("basket_size")
    grp = o.groupby("w")
    assert set(out.index) == set(grp.groups)
    for wsize, g in grp:
        r = out.loc[wsize]
        assert r["n_orders"] == len(g)
        assert r["avg_order_value"] == pytest.approx(
            g["o_totalprice"].mean(), abs=2e-3
        )
        assert r["share"] == pytest.approx(len(g) / len(o), abs=2e-6)
    assert out["share"].sum() == pytest.approx(1.0, abs=1e-4)


def test_rare_category_audit_matches(run, sf_dir):
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    lvl = part["p_brand"] + "/" + part["p_type"]
    counts = lvl.value_counts()
    tot = len(part)
    out = run("dq_rare_category_audit").set_index("level")
    assert len(out) == len(counts)
    for name, n in counts.items():
        r = out.loc[name]
        assert r["n"] == n
        assert r["share"] == pytest.approx(n / tot, abs=2e-6)
        assert bool(r["is_rare"]) == (n / tot < 0.0065)
    # the floor actually splits the vocabulary on this data
    assert 0 < out["is_rare"].sum() < len(out)


def test_weighted_corr_matches_numpy(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    out = run("agg_weighted_corr").set_index("flag")
    for flag, g in li.groupby("l_returnflag"):
        w = g["l_extendedprice"].to_numpy()
        x = g["l_discount"].to_numpy()
        y = g["l_quantity"].to_numpy()
        W = w.sum()
        mx, my = (w * x).sum() / W, (w * y).sum() / W
        vx = (w * x * x).sum() / W - mx * mx
        vy = (w * y * y).sum() / W - my * my
        cov = (w * x * y).sum() / W - mx * my
        if vx <= 0 or vy <= 0:
            assert flag not in out.index
            continue
        r = out.loc[flag]
        assert r["n"] == len(g)
        assert r["weighted_corr"] == pytest.approx(
            cov / math.sqrt(vx * vy), abs=2e-5
        )
        assert r["weighted_mean_discount"] == pytest.approx(mx, abs=2e-6)
        assert r["weighted_mean_quantity"] == pytest.approx(my, abs=2e-4)
        assert -1 - 1e-9 <= r["weighted_corr"] <= 1 + 1e-9


def test_pythagorean_means_match_numpy(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    pos = ev[ev["value"] > 0]
    out = run("agg_pythagorean_means").set_index("event_type")
    for tp, g in pos.groupby("event_type"):
        v = g["value"].to_numpy()
        r = out.loc[tp]
        assert r["n"] == len(v)
        assert r["mean_arith"] == pytest.approx(v.mean(), abs=2e-4)
        assert r["mean_geom"] == pytest.approx(
            float(np.exp(np.log(v).mean())), abs=2e-4
        )
        assert r["mean_harm"] == pytest.approx(
            len(v) / (1.0 / v).sum(), abs=2e-4
        )
        # AM >= GM >= HM
        assert (
            r["mean_arith"] + 1e-9
            >= r["mean_geom"]
            >= r["mean_harm"] - 1e-9
        )
