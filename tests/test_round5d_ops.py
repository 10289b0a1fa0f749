"""Semantic checks for the round-5d batch (JL distortion eval, dense
hashed embedding, Kneser-Ney bigram LM, order-status mix, seasonality
index) — independent recomputation in pandas/numpy, not just oracle
parity."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

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


def _gauss(key: str) -> float:
    h = hashlib.md5(key.encode()).hexdigest()
    u1 = (int(h[:8], 16) + 0.5) / 2**32
    u2 = (int(h[8:16], 16) + 0.5) / 2**32
    return math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.pi * u2)


def test_jl_distortion_matches_numpy(run, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").set_index(
        "vec_id"
    )["embedding"]
    g = np.array(
        [[_gauss(f"{i}:{j}") for j in (1, 2, 3, 4)] for i in range(1, 65)]
    )
    ratios = []
    for vid in emb.index:
        if vid + 1 not in emb.index:
            continue
        ea = np.asarray(emb.loc[vid], dtype=np.float64)
        eb = np.asarray(emb.loc[vid + 1], dtype=np.float64)
        ed2 = float(((ea - eb) ** 2).sum())
        if ed2 <= 0:
            continue
        pd2 = float((((ea - eb) @ g) ** 2).sum())
        ratios.append(pd2 / 4.0 / ed2)
    out = run("eval_jl_distance_distortion").iloc[0]
    assert out["n_pairs"] == len(ratios)
    assert out["mean_ratio"] == pytest.approx(np.mean(ratios), abs=2e-4)
    assert out["min_ratio"] == pytest.approx(np.min(ratios), abs=2e-4)
    assert out["max_ratio"] == pytest.approx(np.max(ratios), abs=2e-4)
    within = np.mean([(0.5 <= r <= 2.0) for r in ratios])
    assert out["frac_within_2x"] == pytest.approx(within, abs=2e-4)
    # k=4 is deliberately coarse, but the mean must still hug 1
    assert 0.6 < out["mean_ratio"] < 1.6


def test_dense_hashed_embedding_matches_numpy(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = run("text_dense_hashed_embedding").set_index("doc_id")
    checked = 0
    for _, row in docs.head(12).iterrows():
        toks = [w for w in row["text"].lower().split() if w]
        if not toks:
            assert row["doc_id"] not in out.index
            continue
        buckets = Counter(
            int(hashlib.md5(w.encode()).hexdigest()[:4], 16) % 64
            for w in toks
        )
        d = np.array(
            [
                sum(c * _gauss(f"{b + 1}:{j}") for b, c in buckets.items())
                for j in (1, 2, 3, 4)
            ]
        )
        n = np.linalg.norm(d)
        if n == 0:
            assert row["doc_id"] not in out.index
            continue
        checked += 1
        r = out.loc[row["doc_id"]]
        assert r["n_tokens"] == len(toks)
        for j in range(4):
            assert r[f"d{j + 1}"] == pytest.approx(d[j] / n, abs=2e-4)
        # unit norm by construction
        vec = np.array([r[f"d{j + 1}"] for j in range(4)])
        assert np.linalg.norm(vec) == pytest.approx(1.0, abs=5e-4)
    assert checked > 0


def test_kneser_ney_matches_counter(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    pairs: Counter = Counter()
    for text in docs["text"]:
        toks = [w for w in text.lower().split() if w]
        pairs.update(zip(toks, toks[1:]))
    c1: Counter = Counter()
    fanout: Counter = Counter()
    n_hist: Counter = Counter()
    for (w1, w2), n in pairs.items():
        c1[w1] += n
        fanout[w1] += 1
        n_hist[w2] += 1
    n_types = len(pairs)
    out = run("corpus_bigram_kneser_ney")
    assert len(out) == 20
    assert out["rn"].tolist() == list(range(1, 21))
    top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    for row, ((w1, w2), n) in zip(out.itertuples(), top):
        assert (row.w1, row.w2, row.n) == (w1, w2, n)
        d = 0.75
        pkn = max(n - d, 0) / c1[w1] + (d * fanout[w1] / c1[w1]) * (
            n_hist[w2] / n_types
        )
        assert row.p_kn == pytest.approx(pkn, abs=2e-6)
        assert row.p_mle == pytest.approx(n / c1[w1], abs=2e-6)
        # the discount strictly moves mass off seen bigrams, but the
        # continuation term gives some back; both must stay in (0, 1]
        assert 0 < row.p_kn <= 1 and 0 < row.p_mle <= 1


def test_status_mix_shares_sum_to_one(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["yr"] = o["o_orderdate"].astype("datetime64[us]").dt.year
    out = run("q_order_status_mix_yearly")
    g = o.groupby(["yr", "o_orderstatus"])
    assert len(out) == g.ngroups
    sums = out.groupby("order_year")[["share_orders", "share_value"]].sum()
    assert np.allclose(sums, 1.0, atol=5e-3)
    for row in out.itertuples():
        grp = o[(o["yr"] == row.order_year)
                & (o["o_orderstatus"] == row.status)]
        assert row.n_orders == len(grp)
        assert row.total_value == pytest.approx(
            grp["o_totalprice"].sum(), abs=0.02
        )


def test_seasonality_index_matches_pandas(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    d = o["o_orderdate"].astype("datetime64[us]")
    monthly = o.groupby([d.dt.year, d.dt.month])["o_totalprice"].sum()
    gavg = monthly.mean()
    out = run("orders_seasonality_index").set_index("month")
    assert sorted(out.index) == list(range(1, 13))
    for mo, grp in monthly.groupby(level=1):
        r = out.loc[mo]
        assert r["n_years"] == len(grp)
        assert r["avg_month_revenue"] == pytest.approx(
            grp.mean(), rel=1e-9, abs=0.02
        )
        assert r["seasonality_index"] == pytest.approx(
            grp.mean() / gavg, abs=2e-4
        )
    # indexes average ~1 when weighted by month coverage
    assert out["seasonality_index"].mean() == pytest.approx(1.0, abs=0.25)
