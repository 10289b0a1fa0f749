"""Semantic twins for the round-9 additions: each operator checked
against an independent pandas/pure-Python replay (the DuckDB oracle is
the driver's check; these pin the SEMANTICS against a second
formulation, per the round-3 test strategy)."""

from __future__ import annotations

import math

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


def test_ewma_time_decay_matches_naive_recurrence(run, spark, sf_dir):
    """The closed-form prefix-sum must equal the naive O(n^2) definition
    s_i = sum_{j<=i} v_j * exp(-lambda * (t_i - t_j))."""
    from awsbeats_spark.catalog import tables
    from awsbeats_spark.operators.timeseries import _DECAY_PER_DAY

    ev = tables(spark, sf_dir).events.toPandas()
    ev["td"] = ev["ts"].astype("int64") / 1e9 / 86400.0
    got = run("ts_ewma_time_decay").set_index("event_id")["decayed_sum"]
    for uid, grp in ev.groupby("user_id"):
        g = grp.sort_values(["td", "event_id"])
        tds = g["td"].to_numpy()
        vals = g["value"].to_numpy()
        for i in range(len(g)):
            s = float(
                np.sum(
                    vals[: i + 1]
                    * np.exp(-_DECAY_PER_DAY * (tds[i] - tds[: i + 1]))
                )
            )
            eid = g["event_id"].iloc[i]
            assert math.isclose(got[eid], s, rel_tol=1e-6, abs_tol=1e-5), (
                uid,
                eid,
            )


def test_pack_attention_contamination_matches_bin_replay(run):
    """Pair counts must equal a direct per-bin enumeration of the
    next-fit layout: total = S(S+1)/2, cross = sum_{i<j} n_i n_j."""
    packed = run("udtf_seq_pack_nextfit")
    got = run("eval_pack_attention_contamination").set_index("source")
    for src, g in packed.groupby("source"):
        total = cross = n_bins = 0
        for _, b in g.groupby("bin_id"):
            ns = b["n_tokens"].to_list()
            S = sum(ns)
            total += S * (S + 1) // 2
            cross += sum(
                ns[i] * ns[j]
                for i in range(len(ns))
                for j in range(i + 1, len(ns))
            )
            n_bins += 1
        row = got.loc[src]
        assert row["n_bins"] == n_bins
        assert row["n_docs"] == len(g)
        assert row["total_pairs"] == total
        assert row["cross_pairs"] == cross
        assert math.isclose(
            row["contamination_rate"], cross / total, abs_tol=1e-6
        )


def test_calibration_ece_is_doc_weighted_gap_mean(run):
    """ECE must equal the doc-weighted mean of the per-bin gaps, bins
    must partition [0, 1], and every rate must be a valid probability."""
    df = run("eval_quality_calibration_ece")
    assert set(df["bin"]).issubset(set(range(10)))
    assert (df["label_rate"] >= 0).all() and (df["label_rate"] <= 1).all()
    assert (df["mean_score"] >= 0).all() and (df["mean_score"] <= 1).all()
    # mean_score sits inside its bin's score range (up to rounding)
    for _, r in df.iterrows():
        lo, hi = r["bin"] / 10, (r["bin"] + 1) / 10 if r["bin"] < 9 else 1.0
        assert lo - 1e-4 <= r["mean_score"] <= hi + 1e-4
    ece = (df["n_docs"] * df["gap"]).sum() / df["n_docs"].sum()
    assert (abs(df["ece"] - round(ece, 6)) <= 1e-6).all()
    assert df["ece"].nunique() == 1


def test_blocking_quality_matches_bruteforce(run, spark, sf_dir):
    """Completeness and reduction ratio must equal a pandas brute force
    over the identical md5 name sample."""
    import hashlib
    import itertools

    from awsbeats_spark.catalog import tables
    from awsbeats_spark.operators.joins import (
        _BLK_EDIT_MAX,
        _BLK_SAMPLE_BUDGET,
    )

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    parts = tables(spark, sf_dir).part.toPandas()
    names = sorted(
        set(parts["p_name"].unique()),
        key=lambda n: (hashlib.md5(n.encode()).hexdigest(), n),
    )[:_BLK_SAMPLE_BUDGET]
    possible = cands = true = found = 0
    for a, b in itertools.combinations(names, 2):
        possible += 1
        same = a.split(" ")[0] == b.split(" ")[0]
        is_true = lev(a, b) <= _BLK_EDIT_MAX
        cands += same
        true += is_true
        found += same and is_true
    row = run("eval_blocking_quality").iloc[0]
    assert row["n_names"] == len(names)
    assert row["n_possible_pairs"] == possible
    assert row["n_candidates"] == cands
    assert row["n_true_pairs"] == true
    assert row["n_true_found"] == found
    if true:
        assert math.isclose(row["pair_completeness"], found / true, abs_tol=1e-6)
    assert math.isclose(
        row["reduction_ratio"], 1 - cands / possible, abs_tol=1e-6
    )


def test_audio_clipping_matches_cycled_byte_replay(run, spark, sf_dir):
    """Clip stats must equal a direct replay of the synthesis contract
    (payload cycled to 600 + n % 500 samples) for every audio doc."""
    from awsbeats_spark.operators.llm.multimodal import _CLIP_DEV

    docs = _docs(spark, sf_dir)
    got = run("multimodal_audio_clipping_detect").set_index("doc_id")
    audio = docs[docs["text"].str.encode("utf-8").str.len() % 3 == 1]
    assert len(got) == len(audio)
    for _, d in audio.iterrows():
        raw = d["text"].encode("utf-8")
        ns = 600 + len(raw) % 500
        xs = [raw[i % len(raw)] for i in range(ns)]
        flags = [1 if abs(x - 128) >= _CLIP_DEV else 0 for x in xs]
        runs, cur = [], 0
        for f in flags + [0]:
            if f:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        row = got.loc[d["doc_id"]]
        assert row["n_samples"] == ns
        assert row["n_clipped"] == sum(flags)
        assert row["max_run"] == (max(runs) if runs else 0)
        assert row["n_clip_runs"] == len(runs)
        assert math.isclose(
            row["clip_rate"], sum(flags) / ns, abs_tol=1e-6
        )


def test_ewma_time_decay_long_span_stays_finite(spark, tmp_path):
    """The anchored-prefix closed form NaNs past ~700 lambda-days (the
    prefix underflows while the un-anchoring factor overflows); the
    block-reanchored form must stay finite and match the naive O(n^2)
    definition over a multi-year span."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from awsbeats_spark.catalog import TABLE_NAMES
    from awsbeats_spark.operators.timeseries import _DECAY_PER_DAY
    from awsbeats_spark.registry import load_all

    src = "/root/testdata/sf0.001"
    d = tmp_path / "longspan"
    d.mkdir()
    for t in TABLE_NAMES:
        schema = pq.read_schema(f"{src}/{t}.parquet")
        if t != "events":
            pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    # one user spanning 8+ years (3000 days), plus a short-span user;
    # integers are interpreted in the schema's own unit (microseconds)
    day_us = 86400 * 10**6
    rows = {
        "event_id": [1, 2, 3, 4, 10, 11],
        "ts": [0, 1 * day_us, 1500 * day_us, 3000 * day_us, 5 * day_us, 6 * day_us],
        "user_id": [7, 7, 7, 7, 8, 8],
        "event_type": ["a"] * 6,
        "value": [10.0, 20.0, 30.0, 40.0, 5.0, 6.0],
        "props": ["{}"] * 6,
    }
    schema = pq.read_schema(f"{src}/events.parquet")
    table = pa.Table.from_pydict(
        {k: rows[k] for k in schema.names}
    ).cast(schema)
    pq.write_table(table, str(d / "events.parquet"))

    got = (
        load_all()["ts_ewma_time_decay"]
        .fn(spark, str(d))
        .toPandas()
        .set_index("event_id")["decayed_sum"]
    )
    assert not got.isna().any(), "NaN leaked from the decay closed form"
    tds = {1: 0.0, 2: 1.0, 3: 1500.0, 4: 3000.0, 10: 5.0, 11: 6.0}
    vals = {1: 10.0, 2: 20.0, 3: 30.0, 4: 40.0, 10: 5.0, 11: 6.0}
    users = {1: 7, 2: 7, 3: 7, 4: 7, 10: 8, 11: 8}
    for eid in tds:
        truth = sum(
            vals[j] * math.exp(-_DECAY_PER_DAY * (tds[eid] - tds[j]))
            for j in tds
            if users[j] == users[eid] and tds[j] <= tds[eid]
        )
        assert math.isclose(got[eid], truth, rel_tol=1e-6, abs_tol=1e-6), eid


def test_dsir_ess_long_doc_stays_finite(spark, tmp_path):
    """logw scales with document length, so exp(logw) overflows for a
    long-enough document and unshifted ESS becomes inf/inf = NaN; the
    log-sum-exp shift must keep every statistic finite and in range."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from awsbeats_spark.catalog import TABLE_NAMES
    from awsbeats_spark.registry import load_all

    src = "/root/testdata/sf0.001"
    d = tmp_path / "longdoc"
    d.mkdir()
    for t in TABLE_NAMES:
        schema = pq.read_schema(f"{src}/{t}.parquet")
        if t != "documents":
            pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    # one 40k-token doc pushes |logw| far past exp's ~709.78 double
    # ceiling unless the per-group max shift is applied
    texts = [
        "zqx " * 40000,
        "common words here",
        "more ordinary english text",
    ]
    rows = {
        "doc_id": [1, 2, 3],
        "text": texts,
        "lang": ["en", "en", "en"],
        "source": ["web"] * 3,
        "n_chars": [len(t) for t in texts],
    }
    schema = pq.read_schema(f"{src}/documents.parquet")
    table = pa.Table.from_pydict(
        {k: rows[k] for k in schema.names}
    ).cast(schema)
    pq.write_table(table, str(d / "documents.parquet"))

    out = load_all()["corpus_dsir_ess"].fn(spark, str(d)).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    for col in ("ess", "ess_share", "max_w_share"):
        assert np.isfinite(r[col]), col
    assert 1.0 <= r["ess"] <= 3.0
    assert 0.0 < r["max_w_share"] <= 1.0


def test_variance_sqrt_clamp_on_constant_values(spark, tmp_path):
    """Constant-valued groups make E[x^2] - E[x]^2 land at -epsilon in
    floats; DuckDB then ERRORS on sqrt while Spark silently yields NaN.
    The greatest(0, .) clamp must make pop_std an exact 0 on BOTH
    engines for degenerate data."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from awsbeats_spark.catalog import TABLE_NAMES
    from awsbeats_spark.registry import load_all

    src = "/root/testdata/sf0.001"
    d = tmp_path / "constval"
    d.mkdir()
    for t in TABLE_NAMES:
        schema = pq.read_schema(f"{src}/{t}.parquet")
        if t != "events":
            pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    n = 37
    # a constant that is NOT exactly representable-squared-friendly
    rows = {
        "event_id": list(range(1, n + 1)),
        "ts": [i * 3600 * 10**6 for i in range(n)],
        "user_id": [1] * n,
        "event_type": ["a"] * n,
        "value": [0.1] * n,  # 0.1 is inexact in binary: cancellation bait
        "props": ["{}"] * n,
    }
    schema = pq.read_schema(f"{src}/events.parquet")
    table = pa.Table.from_pydict(
        {k: rows[k] for k in schema.names}
    ).cast(schema)
    pq.write_table(table, str(d / "events.parquet"))

    specs = load_all()
    out = specs["agg_higher_moments"].fn(spark, str(d)).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["pop_std"] == 0.0  # clamped, not NaN

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    # must not raise OutOfRangeException from sqrt(negative)
    odf = con.sql(specs["agg_higher_moments"].oracle).df()
    assert odf.iloc[0]["pop_std"] == 0.0
