"""Round-7j: ITS segmented regression twin vs numpy polyfit, plus
hypothesis property tests for the closed-form round-robin interleave
position and the RLE parser — pure-Python invariants over random
inputs, no Spark in the property paths."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_its_matches_numpy_polyfit(run, sf_dir):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
    ).to_pandas()
    orders["t"] = (
        orders.o_orderdate.dt.normalize()
        - np.datetime64("1995-01-01")
    ).dt.days
    orders["cents"] = (orders.o_totalprice * 100.0 + 0.5).apply(math.floor)
    tb = (np.datetime64("1999-01-01") - np.datetime64("1995-01-01")).astype(int)
    got = run("ts_intervention_its").set_index("priority")
    for pr, grp in orders.groupby("o_orderpriority"):
        daily = grp.groupby("t").cents.sum() / 100.0
        pre = daily[daily.index < tb]
        post = daily[daily.index >= tb]
        b1, a1 = np.polyfit(pre.index, pre.values, 1)
        b2, a2 = np.polyfit(post.index, post.values, 1)
        row = got.loc[pr]
        assert row.n_pre == len(pre) and row.n_post == len(post)
        assert abs(row.slope_pre - b1) < 1e-4
        assert abs(row.slope_post - b2) < 1e-4
        assert abs(row.slope_change - (b2 - b1)) < 1e-4
        assert abs(
            row.level_change_at_break - ((a2 + b2 * tb) - (a1 + b1 * tb))
        ) < 1e-2


# ---------------------------------------------------------------------------
# hypothesis: the closed-form interleave position equals the simulated merge
# ---------------------------------------------------------------------------


def _closed_form_position(sizes: dict, s: str, r: int) -> int:
    pos = 1
    for s2, n in sizes.items():
        pos += min(n, r - 1)
        if s2 < s and n >= r:
            pos += 1
    return pos


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=6)
)
def test_interleave_closed_form_equals_simulation(sizes_list):
    sizes = {f"src{i}": n for i, n in enumerate(sizes_list)}
    order = []
    r = 1
    while any(n >= r for n in sizes.values()):
        for s in sorted(sizes):
            if sizes[s] >= r:
                order.append((s, r))
        r += 1
    for i, (s, rank) in enumerate(order, start=1):
        assert _closed_form_position(sizes, s, rank) == i


# ---------------------------------------------------------------------------
# hypothesis: the RLE parser round-trips and matches the islands semantics
# ---------------------------------------------------------------------------


def _rle_runs(words):
    out, run_idx, i = [], 0, 0
    while i < len(words):
        j = i
        while j < len(words) and words[j] == words[i]:
            j += 1
        if j - i >= 2:
            out.append((run_idx, words[i], j - i, i + 1))
        run_idx += 1
        i = j
    return out


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(["a", "b", "c"]), max_size=40))
def test_rle_runs_reconstruct_and_partition(words):
    runs = _rle_runs(words)
    covered = set()
    for run_idx, w, n, start in runs:
        assert n >= 2
        seg = words[start - 1 : start - 1 + n]
        assert seg == [w] * n  # run content is uniform
        # maximality: neighbors differ
        if start - 2 >= 0:
            assert words[start - 2] != w
        if start - 1 + n < len(words):
            assert words[start - 1 + n] != w
        covered |= set(range(start - 1, start - 1 + n))
    # positions not in any run are singletons (no 2+ repeat missed)
    for i in range(len(words) - 1):
        if words[i] == words[i + 1]:
            assert i in covered and i + 1 in covered
