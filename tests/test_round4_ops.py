"""Semantic checks for the round-4 operators (bit-packed Hamming ANN,
partial-aggregate shard merge, Theil–Sen robust trend) — independent
recomputation in numpy/pandas, not just oracle parity."""

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


def test_hamming_packed_matches_numpy_bitwise(run, sf_dir):
    out = run("sim_search_hamming_packed")
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.stack(emb["embedding"].values) >= 0  # (n, 64) sign bits
    ids = emb["vec_id"].values
    for qid in out["query_id"].unique():
        qbits = mat[ids == qid][0]
        ham = (mat != qbits).sum(axis=1)
        order = sorted(
            [(h, i) for h, i in zip(ham, ids) if i != qid]
        )[:10]
        got = out[out["query_id"] == qid].sort_values("rn")
        assert list(got["neighbor_id"]) == [i for _, i in order]
        assert list(got["hamming"]) == [h for h, _ in order]
    # output bound: exactly top-10 per query
    assert (out.groupby("query_id").size() == 10).all()


def test_hamming_correlates_with_cosine(run):
    """Sanity on the quantization itself: each query's top-10 Hamming
    neighbors should have meaningfully lower mean Hamming distance than
    the ~32 expected for random independent sign vectors."""
    out = run("sim_search_hamming_packed")
    assert out["hamming"].mean() < 30


def test_partial_merge_equals_direct_aggregation(run, sf_dir):
    out = run("agg_partial_merge_shards").set_index("l_returnflag")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    for flag, g in li.groupby("l_returnflag"):
        q = g["l_quantity"].astype(float)
        row = out.loc[flag]
        assert row["n"] == len(g)
        assert row["sum_qty"] == int(q.sum())
        assert row["min_qty"] == q.min()
        assert row["max_qty"] == q.max()
        assert row["mean_qty"] == pytest.approx(q.mean(), abs=1.01e-6)
        assert row["pop_std_qty"] == pytest.approx(
            q.std(ddof=0), abs=1e-4
        )
        # every shard contributed a partial state
        shards = (g["l_orderkey"] % 8).nunique()
        assert row["n_shards"] == shards


def test_theil_sen_matches_numpy_median_of_slopes(run, spark, sf_dir):
    out = run("ts_theil_sen_slope").iloc[0]
    from awsbeats_spark.catalog import tables
    from awsbeats_spark.operators.timeseries import _series_xy

    daily = (
        _series_xy(tables(spark, sf_dir).events, "day")
        .toPandas()
        .sort_values("x")
    )
    x, y = daily["x"].values.astype(float), daily["y"].values
    slopes = [
        (y[j] - y[i]) / (x[j] - x[i])
        for i in range(len(x))
        for j in range(i + 1, len(x))
    ]
    slope = float(np.median(slopes))
    intercept = float(np.median(y - slope * x))
    assert out["n_days"] == len(x)
    assert out["n_pairs"] == len(slopes)
    assert out["slope_per_day"] == pytest.approx(slope, abs=1.01e-6)
    assert out["intercept"] == pytest.approx(intercept, abs=1.01e-4)


def test_theil_sen_robust_to_outliers(spark, tmp_path_factory):
    """The estimator's defining property: a few wild outliers must not
    move the slope (OLS would swing). Synthetic events: value = 2*day
    + noise-free, with 3 massive spikes."""
    dst = tmp_path_factory.mktemp("sf_theil")
    ts = pd.date_range("2024-01-01", periods=30, freq="D")
    rows = []
    for i, t in enumerate(ts):
        v = 2.0 * i + 10
        if i in (5, 12, 20):
            v = 5000.0  # outlier days
        rows.append((i, t, i % 3, "click", v, "{}"))
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(str(dst / "events.parquet"), index=False)
    out = SPECS["ts_theil_sen_slope"].fn(spark, str(dst)).toPandas().iloc[0]
    # 27 of 30 days sit exactly on slope 2/day; Theil-Sen must find it
    assert out["slope_per_day"] == pytest.approx(2.0, abs=1e-6)


def test_quantile_merge_reports_honest_error(run, sf_dir):
    out = run("agg_quantile_merge_shards").set_index("l_returnflag")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    for flag, g in li.groupby("l_returnflag"):
        row = out.loc[flag]
        exact = g["l_quantity"].astype(float).median()
        assert row["exact_median"] == pytest.approx(exact, abs=1.01e-6)
        # the estimate is the count-weighted mean of shard medians
        sh = g.assign(shard=g["l_orderkey"] % 8).groupby("shard")["l_quantity"]
        est = (sh.median() * sh.size()).sum() / len(g)
        assert row["est_median"] == pytest.approx(est, abs=1.01e-6)
        assert row["abs_err"] == pytest.approx(
            abs(est - exact), abs=1.01e-6
        )


def test_dow_anova_matches_scipy_style_recompute(run, spark, sf_dir):
    out = run("ts_dow_anova").iloc[0]
    from awsbeats_spark.catalog import tables
    from awsbeats_spark.operators.timeseries import _series_xy

    daily = _series_xy(tables(spark, sf_dir).events, "day").toPandas()
    daily["dow"] = daily["x"] % 7
    mu = daily["y"].mean()
    groups = daily.groupby("dow")["y"]
    ssb = (groups.size() * (groups.mean() - mu) ** 2).sum()
    sst = ((daily["y"] - mu) ** 2).sum()
    k, n = groups.ngroups, len(daily)
    f = (ssb / (k - 1)) / ((sst - ssb) / (n - k))
    assert out["n_days"] == n and out["k_groups"] == k
    assert out["f_stat"] == pytest.approx(f, rel=1e-4)
    assert out["eta_squared"] == pytest.approx(ssb / sst, abs=1.01e-6)
    assert 0 <= out["eta_squared"] <= 1


def test_keyhash_sample_estimate_is_exact_within_sample(run, sf_dir):
    out = run("join_keyhash_sample_estimate").iloc[0]
    import hashlib

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    urgent = orders[orders["o_orderpriority"] == "1-URGENT"]
    j = urgent.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    # integer-cents grid, mirroring the operator's sf1-hardened sum
    # (floor(x*100+0.5) = the engine's half-up; pandas .round is half-even)
    rev = np.floor(j["l_extendedprice"] * (1 - j["l_discount"]) * 100 + 0.5).sum() / 100.0
    assert out["exact_rows"] == len(j)
    assert out["exact_revenue"] == pytest.approx(rev, abs=0.011)
    keep = j["o_orderkey"].map(
        lambda k: hashlib.md5(str(k).encode()).hexdigest()[0] in "0123"
    )
    assert out["est_rows"] == round(keep.sum() * 4)
    # unbiasedness sanity: estimate within 35% at this tiny SF
    assert out["rows_rel_err"] < 0.35 and out["revenue_rel_err"] < 0.35


def test_bucketed_noshuffle_plan_and_result(run, spark, sf_dir):
    from awsbeats_spark.plans.inspect import formatted_plan

    df = SPECS["join_bucketed_noshuffle"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    # the layout must delete the join-key shuffle on BOTH fact sides
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "SelectedBucketsCount" in plan
    out = df.toPandas().set_index("o_orderstatus")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    j = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    for status, g in j.groupby("o_orderstatus"):
        assert out.loc[status, "n_items"] == len(g)
        # integer-cents grid, mirroring the operator's sf1-hardened sum
        # (floor(x*100+0.5) = the engine's half-up; pandas .round is half-even)
        rev = np.floor(g["l_extendedprice"] * (1 - g["l_discount"]) * 100 + 0.5).sum() / 100.0
        assert out.loc[status, "revenue"] == pytest.approx(rev, abs=0.011)


def test_langid_confusion_recomputes_from_classifier(run):
    conf = run("eval_langid_confusion")
    pred = run("text_lang_id")
    cells = (
        pred.groupby(["labeled_lang", "predicted_lang"])
        .size()
        .reset_index(name="n")
    )
    assert len(conf) == len(cells)
    merged = conf.merge(
        cells,
        left_on=["gold", "predicted"],
        right_on=["labeled_lang", "predicted_lang"],
    )
    assert (merged["n_x"] == merged["n_y"]).all()
    # shares: each gold row's recall_share sums to 1; same per predicted
    assert conf.groupby("gold")["recall_share"].sum().apply(
        lambda s: abs(s - 1) < 1e-4
    ).all()
    assert conf.groupby("predicted")["precision_share"].sum().apply(
        lambda s: abs(s - 1) < 1e-4
    ).all()
    # total count conservation
    assert conf["n"].sum() == len(pred)


def test_retrieval_overlap_matches_formula(run):
    out = run("retrieval_overlap_at_k").set_index("query_id")
    bm = run("retrieval_bm25_topk")
    ql = run("retrieval_query_likelihood")
    for qid in out.index:
        b = bm[bm["query_id"] == qid][["doc_id", "rn"]]
        q = ql[ql["query_id"] == qid][["doc_id", "rn"]]
        inter = b.merge(q, on="doc_id", suffixes=("_a", "_b"))
        n = len(inter)
        assert out.loc[qid, "n_overlap"] == n
        assert out.loc[qid, "overlap_frac"] == pytest.approx(
            n / 15, abs=1.01e-6
        )
        if n > 1:
            ra = inter["rn_a"].rank(method="first")
            rb = inter["rn_b"].rank(method="first")
            rho = 1 - 6 * ((ra - rb) ** 2).sum() / (n * (n * n - 1))
            assert out.loc[qid, "spearman_rho"] == pytest.approx(
                rho, abs=1.01e-6
            )
            assert -1 <= out.loc[qid, "spearman_rho"] <= 1


def test_cascade_rerank_recall_and_order(run):
    out = run("sim_search_cascade_rerank")
    exact = run("sim_search_topk")
    # per query: recall_at_k equals the measured overlap with exact
    for qid in out["query_id"].unique():
        c = out[out["query_id"] == qid]
        e = exact[exact["query_id"] == qid]
        overlap = len(set(c["neighbor_id"]) & set(e["neighbor_id"]))
        assert c["recall_at_k"].iloc[0] == pytest.approx(
            overlap / 10, abs=1.01e-6
        )
        # cosine ordering within the cascade output
        assert (c.sort_values("rn")["cosine"].diff().dropna() <= 1e-9).all()
    # 64-bit sign quantization on 64-dim vectors should stay accurate
    assert out["recall_at_k"].mean() >= 0.5


def test_dedup_impact_conserves_totals(run, sf_dir):
    out = run("corpus_dedup_impact_report")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert out["docs_in"].sum() == len(docs)
    # removed docs = total - distinct contents (survivors keep 1 per hash)
    n_dupes = len(docs) - docs["text"].nunique()
    assert out["docs_removed"].sum() == n_dupes
    assert (out["docs_removed"] <= out["docs_in"]).all()
    assert ((out["doc_dup_rate"] >= 0) & (out["doc_dup_rate"] <= 1)).all()


def test_forecast_holdout_matches_numpy_ols(run, spark, sf_dir):
    out = run("ts_forecast_linear_holdout").iloc[0]
    from awsbeats_spark.catalog import tables
    from awsbeats_spark.operators.timeseries import _series_xy

    daily = (
        _series_xy(tables(spark, sf_dir).events, "day")
        .toPandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    n = len(daily)
    n_train = int(np.floor(n * 0.8))
    train, test = daily.iloc[:n_train], daily.iloc[n_train:]
    slope, icept = np.polyfit(train["x"], train["y"], 1)
    yhat = slope * test["x"] + icept
    rmse = float(np.sqrt(((test["y"] - yhat) ** 2).mean()))
    naive = train["y"].iloc[-1]
    rmse_nv = float(np.sqrt(((test["y"] - naive) ** 2).mean()))
    assert out["n_train"] == n_train and out["n_test"] == n - n_train
    assert out["slope_per_day"] == pytest.approx(slope, rel=1e-4)
    assert out["rmse_ols"] == pytest.approx(rmse, rel=1e-3)
    assert out["rmse_naive"] == pytest.approx(rmse_nv, rel=1e-3)


def test_quarantine_catches_real_truncation(run, sf_dir):
    out = run("multimodal_decode_quarantine")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n_corrupt = (
        docs["text"].str.encode("utf-8").str.len() % 17 == 0
    ).sum()
    q = out[out["decode_status"] == "quarantined"]
    assert len(q) == n_corrupt
    assert q["width"].isna().all() and q["n_frames"].isna().all()
    # the happy path is identical to plain decode
    ok = out[out["decode_status"] != "quarantined"]
    dec = run("multimodal_decode").set_index("doc_id")
    merged = ok.set_index("doc_id").join(dec, rsuffix="_d")
    assert (merged["width"] == merged["width_d"]).all()
    assert (merged["decode_status"] == merged["decode_status_d"]).all()


def test_decoder_rejects_truncated_containers():
    from awsbeats_spark.operators.llm.multimodal import (
        decode_media,
        synthesize_bmp,
        synthesize_wav,
        synthesize_y4m,
    )

    for synth in (synthesize_bmp, synthesize_wav, synthesize_y4m):
        whole = synth(b"some payload bytes here")
        assert decode_media(whole)  # intact parses
        with pytest.raises(ValueError):
            decode_media(whole[: len(whole) * 2 // 3])


def test_seasonal_zscore_matches_pandas(run, spark, sf_dir):
    out = run("ts_anomaly_seasonal_zscore")
    from awsbeats_spark.catalog import tables
    from awsbeats_spark.operators.timeseries import _series_xy

    hourly = _series_xy(tables(spark, sf_dir).events, "hour").toPandas()
    hourly["how"] = hourly["x"] % 168
    g = hourly.groupby("how")["y"]
    prof = pd.DataFrame(
        {"mu": g.mean(), "sigma": g.std(ddof=0)}
    ).reset_index()
    m = hourly.merge(prof, on="how")
    m = m[m["sigma"] > 0]
    m["z"] = (m["y"] - m["mu"]) / m["sigma"]
    expect = m[m["z"].abs() > 1.6]
    assert len(out) == len(expect)
    got = out.sort_values("x").reset_index(drop=True)
    want = expect.sort_values("x").reset_index(drop=True)
    assert (got["x"] == want["x"]).all()
    assert np.allclose(got["zscore"], want["z"].round(4), atol=1.01e-4)
    # every flagged hour is an extreme within its own slot
    assert (got["zscore"].abs() > 1.6).all()


def test_asof_tolerance_nulls_stale_matches(run):
    tol = run("join_asof_tolerance").set_index("purchase_id")
    plain = run("join_asof").set_index("purchase_id")
    assert set(tol.index) == set(plain.index)  # left-join keeps all rows
    # every kept match exists in the unbounded asof and is fresh
    kept = tol[tol["last_click_id"].notna()]
    assert (kept["staleness_s"] <= 3600).all()
    assert (
        kept["last_click_id"] == plain.loc[kept.index, "last_click_id"]
    ).all()
    # every nulled row is either unmatched in plain asof or stale there
    nulled = tol[tol["last_click_id"].isna()]
    assert len(nulled) > 0  # the tolerance actually bites on this data
    plain_matched_nulled = plain.loc[nulled.index, "last_click_id"].notna()
    assert plain_matched_nulled.any()  # some are nulled BY the tolerance


def test_trade_balance_is_zero_sum(run, sf_dir):
    out = run("q_nation_trade_balance")
    # every export is someone's import: global balance ~ 0 (exact modulo
    # the per-nation cent rounding)
    assert abs(out["trade_balance"].sum()) < 0.01 * len(out)
    assert np.allclose(
        out["trade_balance"], (out["exports"] - out["imports"]).round(2),
        atol=0.011,
    )


def test_csv_quoted_roundtrip_survives_hostile_text(spark, tmp_path_factory):
    """Text with embedded commas, quotes, AND newlines must round-trip
    byte-exactly through the quoted CSV path."""
    dst = tmp_path_factory.mktemp("sf_hostile")
    rows = [
        (0, 'plain text', "en", "web", 10),
        (1, 'has, commas, everywhere', "en", "web", 23),
        (2, 'she said "quote me" twice ""', "en", "web", 28),
        (3, 'line one\nline two\r\nline three', "en", "web", 29),
        (4, ',"\n mixed ,," hostile \n"', "en", "web", 24),
        (5, '', "en", "web", 0),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(dst / "documents.parquet"), index=False)
    out = (
        SPECS["codec_csv_quoted_roundtrip"]
        .fn(spark, str(dst))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for doc_id, text, *_ in rows:
        assert out.loc[doc_id, "text"] == text, f"doc {doc_id} corrupted"


def test_peak_concurrency_matches_pandas_sweep(run, sf_dir):
    out = run("events_peak_concurrency").set_index("day")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    pts = pd.concat(
        [
            pd.DataFrame({"t": ev["ts"], "d": 1}),
            pd.DataFrame({"t": ev["ts"] + pd.Timedelta(seconds=1800), "d": -1}),
        ]
    ).sort_values(["t", "d"])
    pts["live"] = pts["d"].cumsum()
    pts["day"] = pts["t"].dt.strftime("%Y-%m-%d")
    want = pts.groupby("day")["live"].max()
    assert len(out) == len(want)
    for day, peak in want.items():
        assert out.loc[day, "peak_concurrency"] == peak


def test_equi_depth_buckets_are_balanced_and_ordered(run, sf_dir):
    out = run("agg_histogram_equi_depth").sort_values("bucket")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    n = len(orders)
    assert out["n_rows"].sum() == n
    # ntile balance: sizes differ by at most 1
    assert out["n_rows"].max() - out["n_rows"].min() <= 1
    # boundaries are monotone: bucket i's hi <= bucket i+1's lo
    assert (out["hi"].values[:-1] <= out["lo"].values[1:] + 1e-9).all()
    assert out["lo"].iloc[0] == round(orders["o_totalprice"].min(), 2)
    assert out["hi"].iloc[-1] == round(orders["o_totalprice"].max(), 2)


def test_hampel_flags_injected_spike(spark, tmp_path_factory):
    """A constant series with one spike: the Hampel filter must flag the
    spike and nothing else (the global-MAD detector would too, but a
    LEVEL SHIFT plus spike fools it — also covered)."""
    dst = tmp_path_factory.mktemp("sf_hampel")
    ts = pd.date_range("2024-01-01", periods=60, freq="h")
    vals = [10.0 + (i % 3) * 0.1 for i in range(60)]  # wiggle, mad > 0
    vals[30] = 500.0  # the spike
    rows = [
        (i, t, 1, "click", v, "{}")
        for i, (t, v) in enumerate(zip(ts, vals))
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(str(dst / "events.parquet"), index=False)
    out = SPECS["window_outlier_hampel"].fn(spark, str(dst)).toPandas()
    assert 30 in set(out["event_id"])
    # only the spike and (possibly) its shadow rows while it sits in
    # trailing frames — never more than the frame width
    assert len(out) <= 7


def test_containment_catches_subset_jaccard_misses(spark, tmp_path_factory):
    """A short quote fully inside a long article: containment ~1 in the
    quote->article direction while Jaccard is small — the case the
    symmetric detectors are blind to."""
    dst = tmp_path_factory.mktemp("sf_containment")
    quote = "the marble statue wept quietly beneath the broken archway"
    filler = " ".join(f"filler{i} word{i} extra{i}" for i in range(80))
    rows = [
        (0, quote, "en", "web", len(quote)),
        (1, filler + " " + quote + " " + filler, "en", "web", 999),
        (2, "totally unrelated content about turnips and rain", "en", "web", 48),
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(dst / "documents.parquet"), index=False)
    out = (
        SPECS["dedup_containment_asymmetric"].fn(spark, str(dst)).toPandas()
    )
    fwd = out[(out["doc_a"] == 0) & (out["doc_b"] == 1)]
    assert len(fwd) == 1
    assert fwd["containment_a_in_b"].iloc[0] >= 0.9
    assert fwd["jaccard"].iloc[0] < 0.2  # Jaccard would have missed it
    # reverse direction (article in quote) must NOT clear the threshold
    assert len(out[(out["doc_a"] == 1) & (out["doc_b"] == 0)]) == 0


def test_bipartite_projection_bounded_and_correct(run, sf_dir):
    out = run("graph_bipartite_projection")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    edges = li[["l_suppkey", "l_partkey"]].drop_duplicates()
    m = edges.merge(edges, on="l_partkey")
    m = m[m["l_suppkey_x"] != m["l_suppkey_y"]]
    pairs = (
        m.groupby(["l_suppkey_x", "l_suppkey_y"]).size().reset_index(name="n")
    )
    # bounded output: top-5 per supp_a
    assert out.groupby("supp_a").size().max() <= 5
    # spot-check the strongest neighbor of a few suppliers
    for supp in out["supp_a"].unique()[:5]:
        got = out[out["supp_a"] == supp].sort_values("rk")
        want = pairs[pairs["l_suppkey_x"] == supp].sort_values(
            ["n", "l_suppkey_y"], ascending=[False, True]
        )
        assert got["shared_parts"].iloc[0] == want["n"].iloc[0]
        assert got["supp_b"].iloc[0] == want["l_suppkey_y"].iloc[0]


def test_skew_profile_matches_pandas(run, sf_dir):
    out = run("dq_join_key_skew_profile").iloc[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    sizes = li.groupby("l_orderkey").size()
    assert out["n_keys"] == len(sizes)
    assert out["n_rows"] == len(li)
    assert out["max_size"] == sizes.max()
    assert out["mean_size"] == pytest.approx(sizes.mean(), abs=1.01e-4)
    assert out["p50_size"] == sizes.quantile(0.5, interpolation="lower")
    assert out["skew_factor"] == pytest.approx(
        sizes.max() / sizes.mean(), abs=1.01e-4
    )


def test_gap_audit_ranges_are_exactly_the_missing_ids(run, sf_dir):
    import hashlib

    out = run("dq_sequence_gap_audit")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    received = sorted(
        i
        for i in ev["event_id"]
        if hashlib.md5(str(i).encode()).hexdigest()[0] in "0123"
    )
    rs = pd.Series(received)
    gaps = pd.DataFrame(
        {
            "gap_after": rs[:-1].values,
            "nxt": rs[1:].values,
        }
    )
    gaps = gaps[gaps["nxt"] - gaps["gap_after"] > 1]
    gaps["n_missing"] = gaps["nxt"] - gaps["gap_after"] - 1
    top = gaps.sort_values(
        ["n_missing", "gap_after"], ascending=[False, True]
    ).head(100)
    assert len(out) == min(100, len(gaps))
    got = out.sort_values(["n_missing", "missing_from"], ascending=[False, True])
    assert list(got["gap_after"]) == list(top["gap_after"])
    assert list(got["n_missing"]) == list(top["n_missing"])
    # every reported range is truly absent from the received stream
    rset = set(received)
    sample = got.head(5)
    for _, r in sample.iterrows():
        assert all(
            i not in rset
            for i in range(int(r["missing_from"]), int(r["missing_to"]) + 1)
        )
