"""Semantic checks for the round-5b batch (Welch A/B readout, key
candidate scan, ABC classification, embedding dim variance, video luma
stats) — independent recomputation in pandas/numpy, not just oracle
parity."""

from __future__ import annotations

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


def test_welch_ttest_matches_numpy(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["value"].notna()].assign(variant=ev["user_id"] % 2)
    out = run("events_ab_welch_ttest").set_index("event_type")
    assert len(out) > 0
    for et, grp in ev.groupby("event_type"):
        a = grp.loc[grp["variant"] == 0, "value"].values
        b = grp.loc[grp["variant"] == 1, "value"].values
        if len(a) < 2 or len(b) < 2:
            assert et not in out.index
            continue
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(se2)
        df = se2**2 / (
            (va / len(a)) ** 2 / (len(a) - 1)
            + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        r = out.loc[et]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["t_stat"] == pytest.approx(t, abs=1.01e-4)
        assert r["welch_df"] == pytest.approx(df, abs=1.01e-2)
        # Welch df always lands between min arm df and pooled df
        assert min(len(a), len(b)) - 1 <= r["welch_df"] <= len(a) + len(b) - 2


def test_key_candidate_scan_matches_pandas(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    out = run("dq_key_candidate_scan").set_index("column_name")
    assert set(out.index) == set(o.columns)
    for c in o.columns:
        r = out.loc[c]
        assert r["n_rows"] == len(o)
        assert r["n_non_null"] == o[c].notna().sum()
        assert r["n_distinct"] == o[c].nunique(dropna=True)
        assert r["is_key_candidate"] == (
            o[c].nunique(dropna=True) == len(o)
            and o[c].notna().all()
        )
    # the surrogate key must be discovered, a low-cardinality enum must not
    assert bool(out.loc["o_orderkey", "is_key_candidate"])
    assert not bool(out.loc["o_orderstatus", "is_key_candidate"])


def test_abc_classification_matches_pandas(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    rev = (
        (li["l_extendedprice"] * (1 - li["l_discount"]))
        .groupby(li["l_partkey"])
        .sum()
        .map(lambda x: math.floor(x * 100 + 0.5) / 100)
        .sort_values(ascending=False)
    )
    total = rev.sum()
    cum = rev.cumsum()
    cls = np.where(cum <= 0.80 * total, "A", np.where(cum <= 0.95 * total, "B", "C"))
    want = pd.Series(cls).value_counts()
    out = run("orders_abc_classification").set_index("abc_class")
    assert set(out.index) == set(want.index)
    for k in want.index:
        assert out.loc[k, "n_parts"] == want[k]
    # classes partition the parts and shares sum to ~1
    assert out["n_parts"].sum() == len(rev)
    assert out["revenue_share"].sum() == pytest.approx(1.0, abs=1e-3)
    # Pareto shape: A has the large revenue share with a minority of rows
    assert out.loc["A", "revenue_share"] >= out.loc["C", "revenue_share"]


def test_dim_variance_topk_matches_numpy(run, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.stack(emb["embedding"].values).astype(np.float64)
    var = mat.var(axis=0)
    order = np.lexsort((np.arange(1, mat.shape[1] + 1), -var))
    out = run("embed_dim_variance_topk").sort_values("var_rank")
    assert len(out) == 8
    assert list(out["dim"]) == [int(order[i]) + 1 for i in range(8)]
    for _, r in out.iterrows():
        d = int(r["dim"]) - 1
        assert r["var_val"] == pytest.approx(var[d], abs=1.01e-6)
        assert r["mean_val"] == pytest.approx(mat[:, d].mean(), abs=1.01e-6)


def test_video_luma_stats_matches_byte_recompute(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = run("multimodal_video_luma_stats").set_index("doc_id")
    vids = docs[docs["text"].str.encode("utf-8").str.len() % 3 == 2]
    assert len(out) == len(vids)
    for _, row in vids.head(15).iterrows():
        data = row["text"].encode("utf-8")
        n = len(data)
        w, h = 10 + 2 * (n % 7), 10 + 2 * ((7 * n) % 5)
        plane = np.frombuffer(
            (data * (-(-(w * h) // n)))[: w * h], dtype=np.uint8
        ).astype(np.float64)
        r = out.loc[row["doc_id"]]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_frames"] == 1 + n % 24
        assert r["mean_luma"] == pytest.approx(plane.mean(), abs=1.01e-4)
        assert r["luma_contrast"] == pytest.approx(
            plane.std(), abs=1.01e-4
        )
