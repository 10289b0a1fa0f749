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


def _write_events(tmp_path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from awsbeats_spark.catalog import TABLE_NAMES

    src = "/root/testdata/sf0.001"
    d = tmp_path / "fracsec"
    d.mkdir()
    for t in TABLE_NAMES:
        schema = pq.read_schema(f"{src}/{t}.parquet")
        if t != "events":
            pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    schema = pq.read_schema(f"{src}/events.parquet")
    table = pa.Table.from_pydict(
        {k: rows[k] for k in schema.names}
    ).cast(schema)
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


def test_session_gap_boundary_is_microsecond_exact(spark, tmp_path):
    """The sf0.1 full sweep caught a floor-vs-round epoch knife edge:
    a gap whose endpoints straddle a .5 s fraction flipped the
    >= threshold test between engines. Pin the fix with gaps engineered
    around the 1800 s candidate: exactly 1800.0 s (counts), 1799.8 s
    with straddling fractions (must NOT count — the old floored
    seconds said 1800), and 1800.2 s (counts)."""
    from awsbeats_spark.registry import load_all

    us = 10**6
    base = 1_000_000 * us
    rows = {
        # user 1: gap exactly 1800 s; user 2: 1799.8 s straddling .5
        # (frac .4 -> .2); user 3: 1800.2 s straddling (.4 -> .6)
        "event_id": [1, 2, 3, 4, 5, 6],
        "ts": [
            base + 400_000,
            base + 400_000 + 1800 * us,
            base + 400_000,
            base + 200_000 + 1800 * us,
            base + 400_000,
            base + 600_000 + 1800 * us,
        ],
        "user_id": [1, 1, 2, 2, 3, 3],
        "event_type": ["a"] * 6,
        "value": [1.0] * 6,
        "props": ["{}"] * 6,
    }
    d = _write_events(tmp_path, rows)
    got = (
        load_all()["events_session_gap_sensitivity"]
        .fn(spark, d)
        .toPandas()
        .set_index("gap_threshold_s")
    )
    # 3 users; at 1800 s the exact and the +0.2 s gaps are boundaries,
    # the -0.2 s gap is not: 3 users + 2 boundaries = 5 sessions
    assert got.loc[1800, "n_sessions"] == 5
    # at 900 s every gap is a boundary; at 3600 s none is
    assert got.loc[900, "n_sessions"] == 6
    assert got.loc[3600, "n_sessions"] == 3


def test_travel_gap_h_is_single_division_of_exact_micros(spark, tmp_path):
    """gap_h must equal round(micros / 3.6e9, 6) exactly — not the
    difference of two per-timestamp double casts, whose ~2^-21 s wobble
    flipped a 6-dp rounding knife edge at sf0.1."""
    from awsbeats_spark.functions.rounding import rnd as _  # noqa: F401
    from awsbeats_spark.registry import load_all

    us = 10**6
    base = 1_700_000_000 * us  # large epoch: double cast loses micros
    # craft a gap whose hours value sits ON a 6-dp half boundary:
    # 4.8868135 h = 17592528600000 us markers; and far-apart locations
    # so the hop speed exceeds the 900 km/h ceiling (flagged rows only)
    gap_us = int(round(4.8868135 * 3.6e9))
    rows = {
        "event_id": [1, 5001],  # far-apart ids -> far-apart grid points
        "ts": [base + 700_001, base + 700_001 + gap_us],
        "user_id": [42, 42],
        "event_type": ["a", "a"],
        "value": [1.0, 1.0],
        "props": ["{}", "{}"],
    }
    d = _write_events(tmp_path, rows)
    got = load_all()["geo_impossible_travel_flags"].fn(spark, d).toPandas()
    assert len(got) == 1  # the hop must actually clear the 900 km/h gate
    # bit-exact parity with DuckDB's identical single-division round —
    # the property the old two-double-casts formulation violated
    import duckdb

    ora = duckdb.sql(
        f"SELECT round({gap_us} / 3600000000.0, 6) AS g"
    ).fetchone()[0]
    assert float(got["gap_h"].iloc[0]) == ora
