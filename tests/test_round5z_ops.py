"""Semantic checks for the round-5z batch (incremental MV refresh,
manifest scan, grid DBSCAN)."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()

_M = 233280
_LON_CELLS = 72


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_mv_refresh_matches_full(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    full = o.groupby("o_orderpriority")["o_totalprice"].agg(
        ["count", "sum", "mean"]
    )
    out = run("mv_incremental_refresh").set_index("priority")
    assert len(out) == len(full)
    for p, row in full.iterrows():
        r = out.loc[p]
        assert r["n_orders"] == row["count"]
        assert r["total"] == pytest.approx(round(row["sum"], 2), abs=2e-2)
        assert r["avg_price"] == pytest.approx(row["mean"], abs=2e-3)
        # the self-audit must hold: merge == full recompute
        assert bool(r["matches_full"])


def test_manifest_scan_reads_only_listed_buckets(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    sel = ev[ev["event_id"] % 4 < 2]
    exp = sel.groupby("event_type")["value"].agg(["size", "sum"])
    out = run("scan_manifest_filelist").set_index("event_type")
    assert len(out) == len(exp)
    for tp, row in exp.iterrows():
        r = out.loc[tp]
        assert r["n_events"] == row["size"]
        assert r["total_value"] == pytest.approx(
            round(row["sum"], 2), abs=2e-2
        )
    # roughly half the table — proves unlisted buckets were not read
    assert out["n_events"].sum() < 0.6 * len(ev)


def test_dbscan_cells_match_python(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    cells = defaultdict(int)
    for k in ev["event_id"]:
        k = int(k)
        lat = ((k * 9301 + 49297) % _M) / _M * 170.0 - 85.0
        lon = ((k * 49297 + 9301) % _M) / _M * 360.0 - 180.0
        cells[(int(lat // 5), int(lon // 5))] += 1
    dense = {c: n for c, n in cells.items() if n >= 5}

    def lin(c):
        la, lo = c
        return (la + 17) * _LON_CELLS + ((lo % _LON_CELLS) + _LON_CELLS) % _LON_CELLS

    nbr = defaultdict(set)
    dl = list(dense)
    for a in dl:
        for b in dl:
            dlon = ((b[1] - a[1]) % _LON_CELLS + _LON_CELLS) % _LON_CELLS
            if abs(b[0] - a[0]) <= 1 and dlon in (0, 1, _LON_CELLS - 1):
                nbr[a].add(b)
    labels = {c: lin(c) for c in dense}
    for _ in range(3):
        labels = {
            c: min(
                min(labels[x] for x in nbr[c]),
                min(labels[x] for x in nbr[c]),
            )
            if nbr[c]
            else labels[c]
            for c in dense
        }
    out = run("geo_dbscan_cells")
    assert len(out) == len(dense)
    got = {
        (int(r.cell_lat), int(r.cell_lon)): (int(r.n_points), int(r.cluster_id))
        for r in out.itertuples()
    }
    for c, n in dense.items():
        assert got[c] == (n, labels[c])
    if len(dense) > 20:
        # propagation must coarsen: fewer clusters than dense cells
        assert len(set(l for _, l in got.values())) < len(dense)
