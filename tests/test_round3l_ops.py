"""Semantic checks for the round-3l operators (error-budget burn,
compression-ratio quality signal — the latter is rows-only, so these
tests ARE its correctness gate).
"""

from __future__ import annotations

import zlib

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


def test_burn_rate_matches_pandas(run, sf_dir):
    from awsbeats_spark.operators.timeseries import _SLO_ERROR_RATE

    out = run("events_error_budget_burn").sort_values("hour").reset_index(drop=True)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    hourly = (
        ev.assign(h=ev["ts"].dt.floor("h"), e=(ev["event_type"] == "error"))
        .groupby("h")
        .agg(n_total=("e", "size"), n_errors=("e", "sum"))
        .sort_index()
    )
    assert (out["n_total"].to_numpy() == hourly["n_total"].to_numpy()).all()
    burn1 = hourly["n_errors"] / hourly["n_total"] / _SLO_ERROR_RATE
    assert np.allclose(out["burn_1h"], burn1.round(4), atol=2e-4)
    r6e = hourly["n_errors"].rolling(6, min_periods=1).sum()
    r6t = hourly["n_total"].rolling(6, min_periods=1).sum()
    burn6 = (r6e / r6t / _SLO_ERROR_RATE).to_numpy()
    assert np.allclose(out["burn_6h"], np.round(burn6, 4), atol=2e-4)
    exp_alert = ((burn1.to_numpy() > 2) & (burn6 > 1)).astype(int)
    assert (out["page_alert"].to_numpy() == exp_alert).all()


def test_compression_ratio_matches_zlib(run, sf_dir):
    out = run("text_compression_ratio").set_index("doc_id")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sample = docs.head(50)
    for r in sample.itertuples():
        raw = str(r.text).encode("utf-8")
        exp = round(len(zlib.compress(raw, 6)) / len(raw), 6)
        assert out.loc[r.doc_id, "compression_ratio"] == exp
        assert out.loc[r.doc_id, "raw_bytes"] == len(raw)
    # flags consistent with thresholds
    assert (
        out["too_repetitive"] == (out["compression_ratio"] < 0.35).astype(int)
    ).all()
    assert (
        out["too_random"] == (out["compression_ratio"] > 0.95).astype(int)
    ).all()


def test_compression_ratio_detects_repetition(spark):
    from awsbeats_spark.registry import QUERIES
    import os
    import tempfile

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["spam " * 500, "x7#qL@9z" * 2 + "Kp!3mW&v"],
            "lang": ["en", "en"],
            "source": ["src0", "src1"],
            "n_chars": [2500, 24],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(os.path.join(d, "documents.parquet"))
        out = (
            QUERIES["text_compression_ratio"].fn(spark, d)
            .toPandas()
            .set_index("doc_id")
        )
    assert out.loc[1, "compression_ratio"] < out.loc[2, "compression_ratio"]
    assert out.loc[1, "too_repetitive"] == 1
