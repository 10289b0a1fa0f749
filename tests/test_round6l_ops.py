"""Semantic checks for the round-6l batch (SPRT monitor, transition
reciprocity, sessions-per-user histogram)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_sprt_path_matches_numpy(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["d"] = ev["ts"].astype("datetime64[us]").dt.strftime("%Y-%m-%d")
    exp = (
        ev.groupby(["d", "user_id"])["event_type"]
        .apply(lambda s: (s == "purchase").any())
        .reset_index(name="conv")
    )
    p0 = exp["conv"].mean()
    arm = exp[
        exp["user_id"].apply(
            lambda u: hashlib.md5(str(u).encode()).hexdigest()[0] <= "7"
        )
    ]
    daily = arm.groupby("d")["conv"].agg(["size", "sum"]).sort_index()
    n_cum = daily["size"].cumsum()
    c_cum = daily["sum"].cumsum()
    out = run("events_ab_sequential_sprt").set_index("day").sort_index()
    assert list(out.index) == list(daily.index)
    for day in daily.index:
        r = out.loc[day]
        n, c = int(n_cum[day]), int(c_cum[day])
        assert r["n_exposures"] == n and r["n_conversions"] == c
        llr = c * math.log(1.25) + (n - c) * math.log(
            (1 - 1.25 * p0) / (1 - p0)
        )
        assert r["llr"] == pytest.approx(llr, abs=2e-4)
        exp_dec = (
            "accept_h1" if llr >= 2.772589
            else "accept_h0" if llr <= -1.558145
            else "continue"
        )
        assert r["decision"] == exp_dec
    # on null-effect assignment the test should lean toward H0 over time
    assert out.iloc[-1]["llr"] < out.iloc[0]["llr"] + 1


def test_reciprocity_matches_python(run, spark, sf_dir):
    trans = (
        SPECS["events_markov_transitions"].fn(spark, sf_dir).toPandas()
    )
    t = {
        (r.src_type, r.dst_type): int(r.n_trans)
        for r in trans.itertuples()
    }
    pairs = [(k, w) for k, w in t.items() if k[0] != k[1]]
    n_edges = len(pairs)
    n_recip = sum(1 for (a, b), _ in pairs if t.get((b, a), 0) > 0)
    tot = sum(w for _, w in pairs)
    wrec = sum(min(w, t.get((b, a), 0)) for (a, b), w in pairs)
    r = run("graph_transition_reciprocity").iloc[0]
    assert r["n_directed_edges"] == n_edges
    assert r["n_reciprocated"] == n_recip
    assert r["total_weight"] == tot
    assert r["weighted_reciprocity"] == pytest.approx(
        wrec / tot, abs=2e-6
    )


def test_sessions_hist_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["ts", "event_id"]
    )
    ev["s"] = (
        ev["ts"].astype("datetime64[us]").astype("int64") // 10**6
    )
    counts = Counter()
    for _, grp in ev.groupby("user_id"):
        ts = grp["s"].to_numpy()
        n_sess = 1 + sum(
            1 for i in range(1, len(ts)) if ts[i] - ts[i - 1] > 1800
        )
        counts[n_sess] += 1
    n_users = sum(counts.values())
    out = run("events_sessions_per_user_hist").set_index("n_sessions")
    assert set(out.index) == set(counts)
    for k, n in counts.items():
        r = out.loc[k]
        assert r["n_users"] == n
        assert r["share"] == pytest.approx(n / n_users, abs=2e-6)


def test_corpus_version_hash_reproducible(run, spark, sf_dir):
    """The hash must equal an independent recomputation over the
    dedup chain's survivors, and be stable across invocations."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    fp = docs["text"].apply(
        lambda t: hashlib.md5(t.encode()).hexdigest()
    )
    keeper = docs.assign(fp=fp).groupby("fp")["doc_id"].transform("min")
    exact_kept = docs[docs["doc_id"] == keeper]
    cc = SPECS["dedup_connected_components"].fn(spark, sf_dir).toPandas()
    dropped = set(cc.loc[cc["doc_id"] != cc["cluster_id"], "doc_id"])
    kept = exact_kept[~exact_kept["doc_id"].isin(dropped)]
    fps = sorted(
        hashlib.md5(t.encode()).hexdigest() for t in kept["text"]
    )
    expect = hashlib.md5("".join(fps).encode()).hexdigest()
    r1 = run("corpus_version_hash").iloc[0]
    assert r1["n_docs"] == len(kept)
    assert r1["n_bytes"] == sum(
        len(t.encode()) for t in kept["text"]
    )
    assert r1["corpus_version_hash"] == expect
    r2 = run("corpus_version_hash").iloc[0]
    assert r2["corpus_version_hash"] == r1["corpus_version_hash"]
