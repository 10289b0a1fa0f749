"""Semantic twin for graph_markov_absorption_time: rebuild the
transition matrix with pandas, run the same truncated iteration in
numpy, and check against the closed-form fundamental-matrix solve."""

from __future__ import annotations

import numpy as np
import pytest

from awsbeats_spark.operators.graph import _ABS_ITERS, _ABSORBING_TYPES
from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_absorption_matches_numpy(run):
    trans = run("events_markov_transitions")
    got = run("graph_markov_absorption_time").set_index("src_type")
    transient = sorted(
        set(trans.src_type) - set(_ABSORBING_TYPES)
    )
    idx = {s: i for i, s in enumerate(transient)}
    q = np.zeros((len(transient), len(transient)))
    for _, r in trans.iterrows():
        if r.src_type in idx and r.dst_type in idx:
            q[idx[r.src_type], idx[r.dst_type]] = r.prob
    # truncated iteration with the op's per-round 12-dp quantization
    t = np.zeros(len(transient))
    prev = t
    for _ in range(_ABS_ITERS):
        prev = t
        t = np.floor((1.0 + q @ t) * 1e12 + 0.5) / 1e12
    assert set(got.index) == set(transient)
    for s in transient:
        assert abs(got.loc[s].expected_steps - t[idx[s]]) < 1e-5
        assert abs(
            got.loc[s].last_round_delta - (t[idx[s]] - prev[idx[s]])
        ) < 1e-5
    # closed form: T = (I - Q)^-1 1 — the iteration must be close and
    # monotone from below (truncation can only undercount)
    exact = np.linalg.solve(np.eye(len(transient)) - q, np.ones(len(transient)))
    for s in transient:
        assert got.loc[s].expected_steps <= exact[idx[s]] + 1e-9
        assert exact[idx[s]] - got.loc[s].expected_steps < 0.2
    # every transient state reaches absorption on this fixture: the
    # tail increment must be shrinking, not +1/round
    assert (got.last_round_delta < 0.5).all()
