"""Semantic checks for the round-5y batch (item-item CF, bloom
prefilter audit, SMA crossover, NB feature likelihoods)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

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


def test_item_item_cf_matches_pandas(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    e = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")[
            ["o_custkey", "l_partkey"]
        ]
        .drop_duplicates()
    )
    by_cust = e.groupby("o_custkey")["l_partkey"].apply(set)
    deg = e.groupby("l_partkey").size().to_dict()
    cooc = defaultdict(int)
    for parts in by_cust:
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                cooc[(a, b)] += 1
    by_anchor = defaultdict(list)
    for (a, b), n in cooc.items():
        if n < 3:
            continue
        cos = n / math.sqrt(deg[a] * deg[b])
        by_anchor[a].append((round(cos, 6), b, n))
        by_anchor[b].append((round(cos, 6), a, n))
    expected = {}
    for a, lst in by_anchor.items():
        top = sorted(lst, key=lambda t: (-t[0], t[1]))[:5]
        expected[a] = [(b, n, c) for c, b, n in top]
    out = run("reco_item_item_cooccurrence")
    got = defaultdict(list)
    for r in out.itertuples():
        got[int(r.part_id)].append(
            (int(r.similar_part), int(r.n_common), float(r.cosine))
        )
    assert set(got) == set(expected)
    for a in expected:
        assert [(b, n) for b, n, _ in expected[a]] == [
            (b, n) for b, n, _ in got[a]
        ]
        for (_, _, ce), (_, _, cg) in zip(expected[a], got[a]):
            assert cg == pytest.approx(ce, abs=2e-6)


def test_bloom_audit_matches_python(run, sf_dir):
    sup = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    small = set(sup[sup["s_acctbal"] > 5000]["s_suppkey"])

    def bloom_bits(k):
        d = hashlib.md5(str(k).encode()).hexdigest()
        return {int(d[7 * i : 7 * i + 7], 16) % 4096 for i in range(3)}

    bits = set()
    for k in small:
        bits |= bloom_bits(k)
    big = li["l_suppkey"].to_numpy()
    n_pass = sum(1 for k in big if bloom_bits(int(k)) <= bits)
    n_true = sum(1 for k in big if int(k) in small)
    r = run("join_bloom_prefilter_audit").iloc[0]
    assert r["n_small_keys"] == len(small)
    assert r["n_big_rows"] == len(big)
    assert r["n_pass_bloom"] == n_pass
    assert r["n_true_match"] == n_true
    assert r["n_false_pos"] == n_pass - n_true
    # the prefilter must never drop a true match
    assert r["n_pass_bloom"] >= r["n_true_match"]


def test_sma_crossover_matches_pandas(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["d"] = o["o_orderdate"].astype("datetime64[us]").dt.date
    daily = (
        o.groupby("d")["o_totalprice"].sum().round(2).sort_index()
    )
    y = daily.to_numpy()
    sf = pd.Series(y).rolling(7, min_periods=1).mean().to_numpy()
    ss = pd.Series(y).rolling(28, min_periods=1).mean().to_numpy()
    sgn = np.sign(sf - ss).astype(int)
    days = list(daily.index)
    expected = []
    for i in range(28, len(y)):  # i >= 27 is warm; prev from i-1 >= 27
        if (
            sgn[i] != 0
            and sgn[i - 1] != 0
            and sgn[i] != sgn[i - 1]
            and i - 1 >= 27
        ):
            expected.append(
                (
                    str(days[i]),
                    "golden" if sgn[i] == 1 else "death",
                    round(sf[i] - ss[i], 4),
                )
            )
    out = run("ts_sma_crossover_signals").sort_values("day")
    got = [
        (r.day, r.direction, float(r.spread)) for r in out.itertuples()
    ]
    assert [(d, x) for d, x, _ in got] == [(d, x) for d, x, _ in expected]
    for (_, _, se), (_, _, sg) in zip(expected, got):
        assert sg == pytest.approx(se, abs=2e-4)
    # both directions should appear on a long mean-reverting series
    dirs = {d for _, d, _ in got}
    assert dirs == {"golden", "death"}


def test_nb_loglik_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    flags = ev.groupby("user_id")["event_type"].apply(set)
    is_pos = flags.apply(lambda s: "purchase" in s)
    n_pos, n_neg = int(is_pos.sum()), int((~is_pos).sum())
    out = run("events_nb_feature_loglik").set_index("feature")
    assert set(out.index) == {"click", "view", "signup", "error"}
    for ft in out.index:
        has = flags.apply(lambda s: ft in s)
        npw = int((has & is_pos).sum())
        nnw = int((has & ~is_pos).sum())
        pp = (npw + 1) / (n_pos + 2)
        pn = (nnw + 1) / (n_neg + 2)
        r = out.loc[ft]
        assert r["n_pos_with"] == npw and r["n_neg_with"] == nnw
        assert r["p_given_pos"] == pytest.approx(pp, abs=2e-6)
        assert r["p_given_neg"] == pytest.approx(pn, abs=2e-6)
        assert r["loglik_ratio"] == pytest.approx(
            math.log(pp / pn), abs=2e-6
        )
