"""Semantic checks for the round-3k operators (largest-remainder budget
allocation, cohort LTV curve).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from awsbeats_spark.operators.llm.corpus import _BUDGET_TOKENS
from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_budget_allocation_sums_exactly(run):
    out = run("corpus_budget_allocate_lrm")
    # integer allocations summing exactly to the budget
    assert out["alloc_tokens"].sum() == _BUDGET_TOKENS
    # every allocation is floor(quota) or floor(quota)+1
    diff = out["alloc_tokens"] - np.floor(out["exact_quota"])
    assert set(diff.astype(int)) <= {0, 1}
    # proportionality: bigger source never gets fewer tokens when the
    # exact quotas differ by more than 1
    s = out.sort_values("tokens").reset_index(drop=True)
    for i in range(1, len(s)):
        if s.loc[i, "exact_quota"] - s.loc[i - 1, "exact_quota"] > 1:
            assert s.loc[i, "alloc_tokens"] >= s.loc[i - 1, "alloc_tokens"]


def test_budget_allocation_matches_lrm_reference(run, sf_dir):
    out = run("corpus_budget_allocate_lrm").set_index("source")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tokens = (
        docs.assign(n=docs["text"].str.lower().str.split().str.len())
        .groupby("source")["n"]
        .sum()
    )
    total = tokens.sum()
    quota = tokens * _BUDGET_TOKENS / total
    floor = np.floor(quota).astype(int)
    k = _BUDGET_TOKENS - floor.sum()
    rem = (quota - floor).sort_values(ascending=False)
    # tiebreak by source name ascending within equal remainders
    order = sorted(rem.index, key=lambda s: (-rem[s], s))
    alloc = floor.copy()
    for s in order[:k]:
        alloc[s] += 1
    for src in tokens.index:
        assert out.loc[src, "alloc_tokens"] == alloc[src], src
        assert out.loc[src, "tokens"] == tokens[src]


def test_cohort_ltv_monotone_and_exact_month0(run, sf_dir):
    out = run("orders_cohort_ltv_curve")
    # cumulative per-customer LTV is non-decreasing within a cohort
    for _, g in out.groupby("cohort"):
        vals = g.sort_values("month_idx")["cum_ltv_per_customer"].to_numpy()
        assert (np.diff(vals) >= -1e-9).all()
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    first = orders.groupby("o_custkey")["o_orderdate"].min().dt.to_period("M")
    sizes = first.value_counts()
    # month 0 equals cohort-month revenue / cohort size
    orders["cohort"] = orders["o_custkey"].map(first)
    orders["m"] = orders["o_orderdate"].dt.to_period("M")
    m0 = orders[orders["m"] == orders["cohort"]]
    rev0 = m0.groupby("cohort")["o_totalprice"].sum().round(2)
    got0 = out[out["month_idx"] == 0].set_index("cohort")
    for coh, rev in rev0.items():
        key = str(coh)
        exp = round(rev / sizes[coh], 4)
        assert abs(got0.loc[key, "cum_ltv_per_customer"] - exp) < 1.1e-4
        assert got0.loc[key, "n_customers"] == sizes[coh]
