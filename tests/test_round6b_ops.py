"""Semantic checks for the round-6b batch (user recommendations,
recommender holdout evaluation)."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def _edges(sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    return m


def _sims(edges):
    e = edges[["o_custkey", "l_partkey"]].drop_duplicates()
    deg = e.groupby("l_partkey").size().to_dict()
    cooc = defaultdict(int)
    for _, parts in e.groupby("o_custkey")["l_partkey"]:
        ps = sorted(set(parts))
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                cooc[(a, b)] += 1
    by_anchor = defaultdict(list)
    for (a, b), n in cooc.items():
        if n < 3:
            continue
        c = n / math.sqrt(deg[a] * deg[b])
        by_anchor[a].append((c, b))
        by_anchor[b].append((c, a))
    sims = defaultdict(dict)
    for a, lst in by_anchor.items():
        for c, b in sorted(lst, key=lambda t: (-t[0], t[1]))[:5]:
            sims[a][b] = round(c, 6)
    return e, sims


def test_user_recs_match_python(run, sf_dir):
    m = _edges(sf_dir)
    e, sims = _sims(m)
    users = sorted(e["o_custkey"].unique())[:20]
    hist = {
        u: set(e[e["o_custkey"] == u]["l_partkey"]) for u in users
    }
    out = run("reco_user_recommendations")
    for u in users:
        scores = defaultdict(float)
        srcs = defaultdict(int)
        for p in hist[u]:
            for q, c in sims.get(p, {}).items():
                if q in hist[u]:
                    continue
                scores[q] += c
                srcs[q] += 1
        top = sorted(
            scores, key=lambda q: (-round(scores[q], 6), q)
        )[:5]
        got = out[out["custkey"] == u].sort_values(
            ["score", "part_id"], ascending=[False, True]
        )
        assert list(got["part_id"]) == top
        for q, r in zip(top, got.itertuples()):
            assert r.score == pytest.approx(round(scores[q], 6), abs=2e-6)
            assert r.n_sources == srcs[q]


def test_holdout_eval_consistent(run, sf_dir):
    m = _edges(sf_dir)
    # last order from the ORDERS table (an itemless last order makes
    # the user unevaluable — matches the operator's definition)
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    last = (
        o.sort_values(["o_orderdate", "o_orderkey"])
        .groupby("o_custkey")
        .tail(1)
        .set_index("o_custkey")["o_orderkey"]
    )
    is_hold = m.apply(
        lambda r: last[r["o_custkey"]] == r["o_orderkey"], axis=1
    )
    train = m[~is_hold]
    holdm = m[is_hold]
    e, sims = _sims(train)
    hold_sets = holdm.groupby("o_custkey")["l_partkey"].apply(set)
    train_sets = train.groupby("o_custkey")["l_partkey"].apply(set)
    eligible = set(hold_sets.index) & set(train_sets.index)
    deg = (
        train[["o_custkey", "l_partkey"]]
        .drop_duplicates()
        .groupby("l_partkey")
        .size()
    )
    pop = set(
        deg.reset_index(name="d")
        .sort_values(["d", "l_partkey"], ascending=[False, True])
        .head(5)["l_partkey"]
    )
    n_cf = n_pop = 0
    for u in eligible:
        h = train_sets[u]
        scores = defaultdict(float)
        for p in h:
            for q, c in sims.get(p, {}).items():
                if q not in h:
                    scores[q] += c
        top = sorted(
            scores, key=lambda q: (-round(scores[q], 6), q)
        )[:5]
        if set(top) & hold_sets[u]:
            n_cf += 1
        if pop & hold_sets[u]:
            n_pop += 1
    r = run("eval_reco_holdout_hitrate").iloc[0]
    assert r["n_users"] == len(eligible)
    assert r["n_hits_cf"] == n_cf
    assert r["n_hits_pop"] == n_pop
    assert r["hitrate_cf"] == pytest.approx(n_cf / len(eligible), abs=2e-6)
    assert r["hitrate_pop"] == pytest.approx(
        n_pop / len(eligible), abs=2e-6
    )
