"""Semantic checks for the round-3i operators (CCNet sentence dedup,
daily volume anomaly).
"""

from __future__ import annotations

import re

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


def test_line_dedup_matches_pandas(run, sf_dir):
    out = run("corpus_line_dedup_ccnet").set_index("doc_id")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sents = []
    for r in docs.itertuples():
        for s in re.split(r"[.!?]+", str(r.text).lower()):
            s = s.strip()
            if s:
                sents.append((r.doc_id, s))
    df = pd.DataFrame(sents, columns=["doc_id", "sent"])
    freq = df["sent"].value_counts()
    df["dup"] = df["sent"].map(freq) > 1
    exp = df.groupby("doc_id").agg(
        n_sentences=("sent", "size"), n_dup=("dup", "sum")
    )
    assert len(out) == len(exp)
    for did, r in exp.iterrows():
        assert out.loc[did, "n_sentences"] == r["n_sentences"]
        assert out.loc[did, "n_dup_sentences"] == r["n_dup"]
        assert (
            abs(
                out.loc[did, "dup_ratio"]
                - round(r["n_dup"] / r["n_sentences"], 6)
            )
            < 1e-6
        )


def test_volume_anomaly_matches_pandas(run, sf_dir):
    out = run("dq_volume_anomaly_daily").sort_values("day").reset_index(drop=True)
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupby(ev["ts"].dt.normalize()).size().sort_index()
    assert (out["n_rows"].to_numpy() == daily.to_numpy()).all()
    vals = daily.to_numpy(dtype=float)
    for i in range(len(vals)):
        lo = max(0, i - 7)
        base = vals[lo:i]
        assert out.loc[i, "n_baseline_days"] == len(base)
        if len(base) >= 2 and base.std(ddof=1) > 0:
            z = (vals[i] - base.mean()) / base.std(ddof=1)
            assert abs(out.loc[i, "volume_z"] - round(z, 4)) < 2e-4
        if len(base) == 0:
            assert np.isnan(out.loc[i, "volume_z"])
