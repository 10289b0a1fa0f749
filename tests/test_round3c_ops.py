"""Semantic checks for the round-3c operators (rolling/cross
correlation, moving median, IQR outliers, entropy, code detection,
bipartite Jaccard, n-gram novelty, cross-source dedup) — properties
the oracle-parity sweep can't see (parity proves Spark == DuckDB,
these prove both compute the thing the docstring claims).
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
# ts_rolling_corr
# --------------------------------------------------------------------------


def test_rolling_corr_matches_pandas(run, sf_dir):
    out = run("ts_rolling_corr")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["hour"] = ev["ts"].dt.floor("h")
    hourly = (
        ev.groupby(["event_type", "hour"])
        .agg(n_events=("event_id", "size"), avg_value=("value", "mean"))
        .reset_index()
    )
    hourly["avg_value"] = hourly["avg_value"].round(6)
    for et, g in hourly.groupby("event_type"):
        g = g.sort_values("hour")
        exp = (
            g["n_events"]
            .rolling(24, min_periods=1)
            .corr(g["avg_value"])
            .round(4)
        )
        got = (
            out[out["event_type"] == et]
            .sort_values("hour")["rolling_corr"]
            .to_numpy()
        )
        # NaN where the window is constant / size 1 on both sides
        exp_np = exp.to_numpy()
        # pandas emits +-inf for zero-variance windows; both engines emit NaN
        exp_np[~np.isfinite(exp_np)] = np.nan
        mask = ~np.isnan(exp_np)
        assert np.allclose(got[mask], exp_np[mask], atol=2e-4), et
    assert (out["n_window"] <= 24).all()


def test_rolling_corr_bounded(run):
    out = run("ts_rolling_corr")
    vals = out["rolling_corr"].dropna()
    assert ((vals >= -1.0001) & (vals <= 1.0001)).all()


# --------------------------------------------------------------------------
# ts_cross_correlation_lag
# --------------------------------------------------------------------------


def test_xcorr_lag0_is_plain_corr(run, sf_dir):
    out = run("ts_cross_correlation_lag").set_index("lag_hours")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["hour"] = ev["ts"].dt.floor("h")
    a = ev[ev.event_type == "click"].groupby("hour").size()
    b = ev[ev.event_type == "purchase"].groupby("hour").size()
    joined = pd.concat([a, b], axis=1, join="inner")
    exp = np.corrcoef(joined.iloc[:, 0], joined.iloc[:, 1])[0, 1]
    assert abs(out.loc[0, "xcorr"] - round(exp, 4)) < 2e-4
    assert out.loc[0, "n_pairs"] == len(joined)


def test_xcorr_all_lags_present(run):
    out = run("ts_cross_correlation_lag")
    assert sorted(out["lag_hours"]) == list(range(13))
    assert (out["n_pairs"] > 0).all()


# --------------------------------------------------------------------------
# window_moving_median
# --------------------------------------------------------------------------


def test_moving_median_matches_pandas(run, sf_dir):
    out = run("window_moving_median")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li = li.sort_values(["l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber"])
    exp = (
        li.groupby("l_suppkey")["l_extendedprice"]
        .rolling(5, min_periods=1)
        .median()
        .round(4)
        .reset_index(level=0, drop=True)
    )
    li["median_5"] = exp
    keys = ["l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber"]
    merged = out.merge(
        li[keys + ["median_5"]], on=keys, suffixes=("", "_exp")
    )
    assert len(merged) == len(out) == len(li)
    # half-up (engines) vs banker's (pandas) rounding can differ 1e-4
    assert np.allclose(merged["median_5"], merged["median_5_exp"], atol=1.01e-4)


# --------------------------------------------------------------------------
# dq_outlier_iqr
# --------------------------------------------------------------------------


def test_iqr_outliers_match_numpy(run, sf_dir):
    out = run("dq_outlier_iqr").set_index("event_type")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    for et, g in ev.groupby("event_type"):
        q1 = np.quantile(g["value"], 0.25)
        q3 = np.quantile(g["value"], 0.75)
        iqr = q3 - q1
        n_out = (
            (g["value"] < q1 - 1.5 * iqr) | (g["value"] > q3 + 1.5 * iqr)
        ).sum()
        assert abs(out.loc[et, "q1"] - round(q1, 4)) < 1e-3
        assert abs(out.loc[et, "q3"] - round(q3, 4)) < 1e-3
        assert out.loc[et, "n_outliers"] == n_out
        assert out.loc[et, "n_rows"] == len(g)


# --------------------------------------------------------------------------
# agg_entropy_by_group
# --------------------------------------------------------------------------


def test_entropy_matches_scipy_formula(run, sf_dir):
    out = run("agg_entropy_by_group").set_index("user_id")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    for uid, g in ev.groupby("user_id"):
        p = g["event_type"].value_counts(normalize=True).to_numpy()
        h = -(p * np.log(p)).sum()
        assert abs(out.loc[uid, "entropy_nats"] - round(h, 4)) < 2e-4
        assert out.loc[uid, "n_types"] == len(p)
    # uniform mix over k types bounds entropy at ln(k)
    assert (out["entropy_nats"] <= np.log(out["n_types"]) + 1e-6).all()


# --------------------------------------------------------------------------
# text_code_detect
# --------------------------------------------------------------------------


def test_code_detect_flags_symbol_heavy_text(spark):
    from awsbeats_spark.operators.llm.text import _CODE_THRESHOLD  # noqa

    texts = [
        "def f(x): return {x: [1, 2]};",  # code-ish
        "the quiet afternoon drifted on without any urgency at all",
    ]
    pdf = pd.DataFrame({"doc_id": [1, 2], "text": texts})
    df = spark.createDataFrame(pdf)
    import awsbeats_spark.operators.llm.text as textmod
    from pyspark.sql import functions as F

    n = F.greatest(F.length("text"), F.lit(1))
    n_sym = F.regexp_count("text", F.lit(textmod._CODE_SYM_RE))
    n_digit = F.regexp_count("text", F.lit(textmod._CODE_DIGIT_RE))
    n_camel = F.regexp_count("text", F.lit(textmod._CODE_CAMEL_RE))
    score = (3.0 * n_sym + 1.0 * n_digit + 2.0 * n_camel) / n
    got = (
        df.select("doc_id", (score > _CODE_THRESHOLD).cast("int").alias("is_code"))
        .toPandas()
        .set_index("doc_id")["is_code"]
    )
    assert got.loc[1] == 1
    assert got.loc[2] == 0


def test_code_detect_ratios_consistent(run):
    out = run("text_code_detect")
    assert ((out["sym_ratio"] >= 0) & (out["sym_ratio"] <= 1)).all()
    # is_code must equal thresholding the reported score
    from awsbeats_spark.operators.llm.text import _CODE_THRESHOLD

    exp = (out["code_score"] > _CODE_THRESHOLD).astype(int)
    # rounding of code_score can flip decisions exactly at the boundary;
    # allow only boundary rows to differ
    diff = out[exp != out["is_code"]]
    assert (abs(diff["code_score"] - _CODE_THRESHOLD) < 1e-4).all()


# --------------------------------------------------------------------------
# graph_type_overlap_jaccard
# --------------------------------------------------------------------------


def test_type_jaccard_matches_sets(run, sf_dir):
    out = run("graph_type_overlap_jaccard")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    sets = {et: set(g["user_id"]) for et, g in ev.groupby("event_type")}
    types = sorted(sets)
    expected = {}
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            inter = len(sets[ta] & sets[tb])
            if inter:
                expected[(ta, tb)] = round(
                    inter / len(sets[ta] | sets[tb]), 6
                )
    got = {
        (r.type_a, r.type_b): r.jaccard for r in out.itertuples()
    }
    assert got == expected


# --------------------------------------------------------------------------
# corpus_ngram_novelty
# --------------------------------------------------------------------------


def test_novelty_first_doc_is_fully_novel(run):
    out = run("corpus_ngram_novelty").set_index("doc_id")
    assert out.loc[out.index.min(), "novelty"] == 1.0
    assert ((out["novelty"] >= 0) & (out["novelty"] <= 1)).all()
    assert (out["n_novel"] <= out["n_shingles"]).all()


def test_novelty_total_novel_equals_distinct_shingles(run, sf_dir, spark):
    from awsbeats_spark.functions.textfns import shingles, words
    from awsbeats_spark.catalog import tables
    from pyspark.sql import functions as F

    out = run("corpus_ngram_novelty")
    docs = tables(spark, sf_dir).documents
    n_distinct = (
        docs.select(F.explode(F.array_distinct(shingles(words()))).alias("sh"))
        .select("sh")
        .distinct()
        .count()
    )
    # every distinct shingle is novel in exactly one doc
    assert out["n_novel"].sum() == n_distinct


# --------------------------------------------------------------------------
# dedup_cross_source_priority
# --------------------------------------------------------------------------


def test_cross_source_priority_survivor_rules(run):
    out = run("dedup_cross_source_priority")
    # exactly one kept row per hash group
    kept = out.groupby("text_hash")["is_kept"].sum()
    assert (kept == 1).all()
    # the kept row has the minimal (priority, doc_id) in its group
    out["prio"] = out["source"].str.extract(r"(\d+)$").astype(int)
    for _, g in out.groupby("text_hash"):
        k = g[g["is_kept"] == 1].iloc[0]
        best = g.sort_values(["prio", "doc_id"]).iloc[0]
        assert k["doc_id"] == best["doc_id"]
    # group stats consistent
    sizes = out.groupby("text_hash").size()
    assert (out["n_copies"] == out["text_hash"].map(sizes)).all()


def test_cross_source_priority_nonnumeric_sources_sort_last(spark):
    # sources without trailing digits (TRY_CAST -> NULL priority) must
    # lose to any numeric-priority copy, identically in both engines
    import pandas as pd
    import duckdb

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "source": ["curated", "src5", "src9"],
            "text": ["same text", "same text", "same text"],
            "lang": ["en"] * 3,
            "n_chars": [9] * 3,
        }
    )
    from awsbeats_spark.registry import QUERIES
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "documents.parquet"))
        out = (
            QUERIES["dedup_cross_source_priority"]
            .fn(spark, d)
            .toPandas()
            .set_index("doc_id")
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
        )
        odf = (
            con.sql(QUERIES["dedup_cross_source_priority"].oracle)
            .df()
            .set_index("doc_id")
        )
    # src5 (priority 5) wins; 'curated' (NULL priority) sorts last
    for frame in (out, odf):
        assert frame.loc[2, "is_kept"] == 1
        assert frame.loc[1, "is_kept"] == 0
        assert frame.loc[3, "is_kept"] == 0
        assert (frame["n_copies"] == 3).all()
