"""Semantic checks for the round-3d operators (Count-Min sketch, Bloom
membership, period-over-period, conversion latency, RAKE keywords,
embedding drift) — properties the oracle-parity sweep can't see.
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
# sketch_countmin_user_freq
# --------------------------------------------------------------------------


def test_countmin_never_underestimates(run, sf_dir):
    out = run("sketch_countmin_user_freq")
    assert len(out) == 10
    assert (out["cm_estimate"] >= out["true_count"]).all()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    true = ev.groupby("user_id").size()
    for r in out.itertuples():
        assert true.loc[r.user_id] == r.true_count


def test_countmin_top10_selection_deterministic(run, sf_dir):
    out = run("sketch_countmin_user_freq")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    counts = ev.groupby("user_id").size().reset_index(name="n")
    exp = counts.sort_values(["n", "user_id"], ascending=[False, True]).head(10)
    assert sorted(out["user_id"]) == sorted(exp["user_id"])


# --------------------------------------------------------------------------
# sketch_bloom_membership
# --------------------------------------------------------------------------


def test_bloom_no_false_negatives(run, sf_dir):
    out = run("sketch_bloom_membership").iloc[0]
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    members = set(cust.loc[cust.c_mktsegment == "BUILDING", "c_custkey"])
    n_member_orders = orders["o_custkey"].isin(members).sum()
    # a Bloom filter never drops a true member
    assert out["n_true_members"] == n_member_orders
    assert out["n_false_positives"] >= 0
    assert out["n_bloom_pass"] == out["n_true_members"] + out["n_false_positives"]
    # with 4096 bits the FP rate should stay way below the pass-through rate
    assert out["n_false_positives"] < 0.2 * len(orders)


# --------------------------------------------------------------------------
# ts_period_over_period
# --------------------------------------------------------------------------


def test_period_over_period_matches_pandas(run, sf_dir):
    out = run("ts_period_over_period").sort_values("month").reset_index(drop=True)
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    monthly = (
        orders.assign(month=orders["o_orderdate"].dt.to_period("M"))
        .groupby("month")["o_totalprice"]
        .agg(["sum", "size"])
        .sort_index()
    )
    rev = monthly["sum"].round(2)
    assert np.allclose(out["revenue"], rev.to_numpy())
    mom = (100.0 * (rev - rev.shift(1)) / rev.shift(1)).to_numpy()
    got = out["mom_pct"].to_numpy()
    mask = ~np.isnan(mom)
    assert np.allclose(got[mask], mom[mask], atol=2e-4)
    assert np.isnan(got[0])
    yoy = (100.0 * (rev - rev.shift(12)) / rev.shift(12)).to_numpy()
    gyoy = out["yoy_pct"].to_numpy()
    m2 = ~np.isnan(yoy)
    assert np.allclose(gyoy[m2], yoy[m2], atol=2e-4)


# --------------------------------------------------------------------------
# events_conversion_latency
# --------------------------------------------------------------------------


def test_conversion_latency_matches_pandas(run, sf_dir):
    out = run("events_conversion_latency").iloc[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    clicks = ev[ev.event_type == "click"].groupby("user_id")["ts"].min()
    lats = []
    for uid, cts in clicks.items():
        purch = ev[
            (ev.event_type == "purchase") & (ev.user_id == uid) & (ev.ts > cts)
        ]["ts"]
        if len(purch):
            lats.append((purch.min() - cts).total_seconds() / 60.0)
    lats = np.array(lats)
    assert out["n_converted"] == len(lats)
    for q, col in [(0.25, "p25_min"), (0.5, "p50_min"), (0.9, "p90_min")]:
        assert abs(out[col] - np.quantile(lats, q)) < 1e-2


# --------------------------------------------------------------------------
# text_keyword_rake_topk
# --------------------------------------------------------------------------


def test_rake_output_shape_and_score(run):
    out = run("text_keyword_rake_topk")
    # at most 3 keywords per doc, score == degree/freq, degree >= freq
    per_doc = out.groupby("doc_id").size()
    assert (per_doc <= 3).all()
    assert (out["degree"] >= out["freq"]).all()
    assert np.allclose(out["rake_score"], (out["degree"] / out["freq"]).round(6))


def test_rake_prefers_phrase_anchors(spark):
    # "machine learning pipeline" (3-word phrase) should outrank "cat"
    # (repeated 1-word phrases): degree/freq 3.0 vs 1.0
    from awsbeats_spark.registry import QUERIES
    import awsbeats_spark.operators.llm.text as textmod
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["machine learning pipeline from the cat and a cat or cat"],
        }
    )
    df = spark.createDataFrame(pdf)
    phrases = df.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), textmod._RAKE_STOP_RE)).alias("p"),
    )
    pw = phrases.select(
        "doc_id",
        F.filter(F.split(F.col("p"), r"\s+"), lambda x: x != "").alias("ws"),
    ).filter(F.size("ws") > 0)
    scored = (
        pw.select("doc_id", F.explode("ws").alias("w"), F.size("ws").alias("pl"))
        .groupBy("w")
        .agg((F.sum("pl") / F.count("*")).alias("score"))
        .toPandas()
        .set_index("w")["score"]
    )
    assert scored.loc["machine"] == 3.0
    assert scored.loc["cat"] == 1.0


# --------------------------------------------------------------------------
# embed_drift_centroid
# --------------------------------------------------------------------------


def test_drift_matches_numpy(run, sf_dir):
    out = run("embed_drift_centroid").sort_values("dim").reset_index(drop=True)
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    even = vecs[(emb["vec_id"] % 2 == 0).to_numpy()]
    odd = vecs[(emb["vec_id"] % 2 == 1).to_numpy()]
    assert len(out) == vecs.shape[1]
    assert np.allclose(out["mean_ref"], even.mean(axis=0).round(6), atol=2e-6)
    assert np.allclose(out["mean_cur"], odd.mean(axis=0).round(6), atol=2e-6)
    assert np.allclose(
        out["abs_shift"],
        np.abs(even.mean(axis=0) - odd.mean(axis=0)).round(6),
        atol=2e-6,
    )
    assert (out["n_ref"] == len(even)).all()
    assert (out["n_cur"] == len(odd)).all()
