"""Semantic twin for stream_watermark_lateness_curve: pandas cumulative
max over arrival order, plus a hypothesis property that the distributed
block-prefix decomposition of a running max is exact."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from awsbeats_spark.operators.streaming_batch import _WM_BLOCK, _WM_DELAYS
from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_lateness_curve_matches_pandas(run, spark, sf_dir):
    from awsbeats_spark.catalog import tables

    ev = tables(spark, sf_dir).events.toPandas().sort_values("event_id")
    es = (ev.ts.astype("int64") // 10**9).to_numpy()
    lateness = np.maximum.accumulate(es) - es
    got = run("stream_watermark_lateness_curve").set_index("delay_s")
    assert set(got.index) == set(_WM_DELAYS)
    for d in _WM_DELAYS:
        n = int((lateness > d).sum())
        assert got.loc[d].n_dropped == n
        assert abs(got.loc[d].frac_dropped - n / len(es)) < 1e-6
    # more delay never drops more (the curve is monotone decreasing)
    ordered = got.sort_index().n_dropped.to_numpy()
    assert (np.diff(ordered) <= 0).all()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=64),
)
def test_block_prefix_max_decomposition_is_exact(values, block):
    """running_max[i] == max(exclusive prefix max of earlier blocks,
    within-block cumulative max) for EVERY block size — the exactness
    the operator's scale shape relies on."""
    vals = np.asarray(values)
    truth = np.maximum.accumulate(vals)
    n_blocks = (len(vals) + block - 1) // block
    bmax = [vals[b * block : (b + 1) * block].max() for b in range(n_blocks)]
    for i, v in enumerate(vals):
        b = i // block
        inb = vals[b * block : i + 1].max()
        pmax = max(bmax[:b]) if b else None
        combined = inb if pmax is None else max(inb, pmax)
        assert combined == truth[i]
