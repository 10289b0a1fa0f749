"""Semantic twins for the round-10 additions: each operator checked
against an independent pandas/pure-Python replay (the DuckDB oracle is
the driver's check; these pin the SEMANTICS against a second
formulation, per the round-3 test strategy)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import numpy as np
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def _docs(spark, sf_dir):
    from awsbeats_spark.catalog import tables

    return tables(spark, sf_dir).documents.toPandas()


def test_k_anonymity_matches_pandas_groupby(run, spark, sf_dir):
    """Every reported count/ratio must equal a direct pandas replay of
    the QI generalization (nation, segment, acctbal band) with the
    delinquency flag as the sensitive attribute."""
    from awsbeats_spark.catalog import tables
    from awsbeats_spark.operators.quality import _KANON_BAND, _KANON_K

    cust = tables(spark, sf_dir).customer.toPandas()
    cust["band"] = np.floor(cust["c_acctbal"] / _KANON_BAND).astype(int)
    cust["sens"] = np.where(cust["c_acctbal"] < 0, "delinquent", "current")
    g = cust.groupby(["c_nationkey", "c_mktsegment", "band"]).agg(
        grp_n=("c_custkey", "size"), l_div=("sens", "nunique")
    )
    row = run("dq_k_anonymity").iloc[0]
    assert row["n_rows"] == len(cust)
    assert row["n_groups"] == len(g)
    assert row["min_group_size"] == g["grp_n"].min()
    assert math.isclose(row["avg_group_size"], g["grp_n"].mean(), abs_tol=1e-6)
    below = g[g["grp_n"] < _KANON_K]
    assert row["groups_below_k"] == len(below)
    assert row["rows_below_k"] == below["grp_n"].sum()
    assert math.isclose(
        row["pct_rows_below_k"], below["grp_n"].sum() / len(cust), abs_tol=1e-6
    )
    l1 = g[g["l_div"] < 2]
    assert row["min_l_diversity"] == g["l_div"].min()
    assert row["groups_l1"] == len(l1)
    assert math.isclose(
        row["pct_rows_l1"], l1["grp_n"].sum() / len(cust), abs_tol=1e-6
    )


def test_bcubed_matches_per_item_bruteforce(run, spark, sf_dir):
    """The pair-free cell-identity aggregation must equal B-cubed's
    per-item definition: P = mean_i |C(i) ∩ L(i)| / |C(i)| and
    R = mean_i |C(i) ∩ L(i)| / |L(i)|, walked item by item."""
    docs = _docs(spark, sf_dir)
    cc = run("dedup_connected_components").set_index("doc_id")["cluster_id"]
    truth = {
        d: hashlib.md5(
            re.sub(r"\s+", " ", t.lower()).strip().encode()
        ).hexdigest()
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    cluster = {d: int(cc.get(d, d)) for d in docs["doc_id"]}
    cmem, tmem = defaultdict(set), defaultdict(set)
    for d in docs["doc_id"]:
        cmem[cluster[d]].add(d)
        tmem[truth[d]].add(d)
    p_terms, r_terms = [], []
    for d in docs["doc_id"]:
        inter = len(cmem[cluster[d]] & tmem[truth[d]])
        p_terms.append(inter / len(cmem[cluster[d]]))
        r_terms.append(inter / len(tmem[truth[d]]))
    p, r = np.mean(p_terms), np.mean(r_terms)
    row = run("eval_dedup_cluster_bcubed").iloc[0]
    assert row["n_docs"] == len(docs)
    assert row["n_clusters"] == len(cmem)
    assert row["n_classes"] == len(tmem)
    assert math.isclose(row["bcubed_precision"], p, abs_tol=1e-6)
    assert math.isclose(row["bcubed_recall"], r, abs_tol=1e-6)
    assert math.isclose(
        row["bcubed_f1"], 2 * p * r / (p + r), abs_tol=1e-6
    )
    # recall can only be perfect if no canonical class is split
    assert 0 < row["bcubed_precision"] <= 1
    assert 0 < row["bcubed_recall"] <= 1


def test_rho_excess_loss_matches_python_lms(run, spark, sf_dir):
    """h_ref / h_model / excess must equal a from-scratch Python build of
    the unigram MLE and interpolated Kneser-Ney bigram models, and the
    selected set must be exactly the top quarter by (excess, -doc_id)."""
    from awsbeats_spark.operators.llm.corpus import (
        _RHO_KN_D,
        _RHO_SELECT_DEN,
    )

    docs = _docs(spark, sf_dir)
    toks = {
        d: [w for w in re.split(r"\s+", t.lower()) if w]
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    ctf = Counter(w for ws in toks.values() for w in ws)
    coll = sum(ctf.values())
    pair = Counter(
        (ws[i], ws[i + 1])
        for ws in toks.values()
        for i in range(len(ws) - 1)
    )
    c1, fanout, n_hist = Counter(), Counter(), Counter()
    for (w1, w2), n in pair.items():
        c1[w1] += n
        fanout[w1] += 1
        n_hist[w2] += 1
    n_types = len(pair)

    def p_kn(w1, w2):
        return max(pair[(w1, w2)] - _RHO_KN_D, 0) / c1[w1] + (
            _RHO_KN_D * fanout[w1] / c1[w1]
        ) * (n_hist[w2] / n_types)

    expected = {}
    for d, ws in toks.items():
        if len(ws) < 2:
            continue
        h_ref = -sum(math.log(ctf[w] / coll) for w in ws) / len(ws)
        h_model = -sum(
            math.log(p_kn(ws[i], ws[i + 1])) for i in range(len(ws) - 1)
        ) / (len(ws) - 1)
        expected[d] = (len(ws), h_ref, h_model)

    got = run("corpus_rho_excess_loss").set_index("doc_id")
    assert set(got.index) == set(expected)
    for d, (n, h_ref, h_model) in expected.items():
        row = got.loc[d]
        assert row["n_tokens"] == n
        assert math.isclose(row["h_ref"], h_ref, abs_tol=1e-5)
        assert math.isclose(row["h_model"], h_model, abs_tol=1e-5)
        assert math.isclose(
            row["excess_loss"], h_ref - h_model, abs_tol=1e-5
        )
    order = sorted(
        expected,
        key=lambda d: (-round(expected[d][1] - expected[d][2], 6), d),
    )
    top = set(order[: len(order) // _RHO_SELECT_DEN])
    assert set(got[got["selected"]].index) == top


def test_spectral_centroid_matches_rfft_replay(run, spark, sf_dir):
    """Centroid/bandwidth/rolloff must equal an independent numpy rfft
    replay (a different DFT algorithm than the operator's cos/sin
    matrix product) over the same cycled PCM bytes."""
    from awsbeats_spark.operators.llm.multimodal import (
        _SPEC_FLOOR,
        _SPEC_K,
        _SPEC_N,
        _SPEC_ROLL,
        _cycle_bytes,
    )

    docs = _docs(spark, sf_dir)
    got = run("multimodal_audio_spectral_centroid").set_index("doc_id")
    audio = docs[docs["text"].str.encode("utf-8").str.len() % 3 == 1]
    assert len(got) == len(audio)
    checked_live = checked_null = 0
    for _, d in audio.iterrows():
        raw = d["text"].encode("utf-8")
        ns = 600 + len(raw) % 500
        pcm = _cycle_bytes(raw, ns)[:_SPEC_N]
        x = np.frombuffer(pcm, dtype=np.uint8).astype(float) - 128.0
        spec = np.fft.rfft(x, _SPEC_N)[1 : _SPEC_K + 1]
        pw = np.abs(spec) ** 2
        tp = pw.sum()
        row = got.loc[d["doc_id"]]
        if tp < _SPEC_FLOOR:
            assert row.isna().all()
            checked_null += 1
            continue
        k = np.arange(1, _SPEC_K + 1)
        c = (k * pw).sum() / tp
        bw = math.sqrt(max(((k - c) ** 2 * pw).sum() / tp, 0.0))
        roll = int(k[np.cumsum(pw) >= _SPEC_ROLL * tp][0])
        assert math.isclose(row["power_db"], 10 * math.log10(tp), abs_tol=1e-3)
        assert math.isclose(row["centroid_bin"], c, abs_tol=1e-3)
        assert math.isclose(row["bandwidth_bin"], bw, abs_tol=1e-3)
        assert row["rolloff_bin"] == roll
        checked_live += 1
    assert checked_live > 0  # the corpus must actually exercise the op
