"""Semantic checks for the round-3e operators (T5 span masking, HHI
concentration, ANN recall evaluation, longest purchase streak).
"""

from __future__ import annotations

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


# --------------------------------------------------------------------------
# corpus_span_mask_t5
# --------------------------------------------------------------------------


def test_span_mask_counts_consistent(run):
    out = run("corpus_span_mask_t5")
    # sentinel occurrences in the masked text == n_masked
    n_sent = out["masked_text"].str.count("<extra_id>")
    assert (n_sent == out["n_masked"]).all()
    # token count preserved (mask substitutes, never drops)
    n_toks = out["masked_text"].str.split().str.len()
    assert (n_toks == out["n_tokens"]).all()
    # spans <= masked tokens; rate near 12.5%
    assert (out["n_spans"] <= out["n_masked"]).all()
    rate = out["n_masked"].sum() / out["n_tokens"].sum()
    assert 0.08 < rate < 0.17


def test_span_mask_deterministic(run):
    a = run("corpus_span_mask_t5").sort_values("doc_id").reset_index(drop=True)
    b = run("corpus_span_mask_t5").sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


# --------------------------------------------------------------------------
# agg_hhi_concentration
# --------------------------------------------------------------------------


def test_hhi_matches_numpy(run, sf_dir):
    out = run("agg_hhi_concentration").set_index("n_name")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    for nk, g in j.groupby("c_nationkey"):
        rev = g.groupby("o_custkey")["o_totalprice"].sum().to_numpy()
        shares = rev / rev.sum()
        hhi = (shares**2).sum()
        name = nation.loc[nation.n_nationkey == nk, "n_name"].iloc[0]
        assert abs(out.loc[name, "hhi"] - round(hhi, 6)) < 2e-6
        assert out.loc[name, "n_customers"] == len(rev)
    # HHI lower bound is 1/n
    assert (out["hhi"] >= 1.0 / out["n_customers"] - 1e-9).all()


# --------------------------------------------------------------------------
# eval_ann_recall_ivf
# --------------------------------------------------------------------------


def test_recall_matches_direct_overlap(run):
    bf = run("sim_search_topk")
    ivf = run("sim_search_ivf")
    out = run("eval_ann_recall_ivf").set_index("query_id")
    for qid in bf["query_id"].unique():
        b = set(bf.loc[bf.query_id == qid, "neighbor_id"])
        v = set(ivf.loc[ivf.query_id == qid, "neighbor_id"])
        assert out.loc[qid, "n_hits"] == len(b & v)
    assert ((out["recall_at_k"] >= 0) & (out["recall_at_k"] <= 1)).all()


# --------------------------------------------------------------------------
# window_streak_longest
# --------------------------------------------------------------------------


def test_streak_matches_pandas(run, sf_dir):
    out = run("window_streak_longest").set_index("user_id")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    p = ev[ev.event_type == "purchase"].copy()
    p["d"] = p["ts"].dt.normalize()
    for uid, g in p.groupby("user_id"):
        days = np.sort(g["d"].unique())
        # split into consecutive runs
        runs, start = [], 0
        for i in range(1, len(days)):
            if (days[i] - days[i - 1]) != np.timedelta64(1, "D"):
                runs.append(days[start:i])
                start = i
        runs.append(days[start:])
        longest = max(len(r) for r in runs)
        best_starts = [r[0] for r in runs if len(r) == longest]
        assert out.loc[uid, "longest_streak"] == longest
        assert out.loc[uid, "n_streaks"] == len(runs)
        assert out.loc[uid, "n_active_days"] == len(days)
        exp_start = pd.Timestamp(min(best_starts)).strftime("%Y-%m-%d")
        assert out.loc[uid, "longest_start"] == exp_start
