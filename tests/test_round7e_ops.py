"""Semantic twins for the round-7e additions: Brown-Forsythe against
scipy-free numpy statistics, and the cosine calibration histogram
against a hashlib+numpy recomputation."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from awsbeats_spark.operators.llm.similarity import (
    _CAL_N_BINS,
    _CAL_SAMPLE_FRAC,
)
from awsbeats_spark.operators.quality import _LEVENE_F95_INF
from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_levene_matches_numpy(run, spark, sf_dir):
    from awsbeats_spark.catalog import tables

    ev = tables(spark, sf_dir).events.toPandas()
    ev["cents"] = np.floor(ev.value * 100.0 + 0.5).astype("int64")
    groups = []
    for _, g in ev.groupby("event_type"):
        g = g.sort_values(["cents", "event_id"])
        med = g.cents.to_numpy()[(len(g) + 1) // 2 - 1]
        groups.append(np.abs(g.cents.to_numpy() - med))
    k = len(groups)
    n = sum(len(z) for z in groups)
    zbar = sum(z.sum() for z in groups) / n
    num = sum(len(z) * (z.mean() - zbar) ** 2 for z in groups)
    den = sum(((z - z.mean()) ** 2).sum() for z in groups)
    w = (n - k) / (k - 1) * num / den
    row = run("dq_levene_variance_homogeneity").iloc[0]
    assert row.k_groups == k
    assert row.n_total == n
    assert row.df1 == k - 1
    assert row.df2 == n - k
    assert abs(row.w_stat - w) < 1e-4
    assert row.crit_f_95 == _LEVENE_F95_INF[k - 1]
    assert row.significant_95 == (w > _LEVENE_F95_INF[k - 1])


def test_levene_crit_table_is_chi2_over_df():
    # spot-check the table against the chi2(df)/df identity
    assert abs(_LEVENE_F95_INF[1] - 3.8415) < 1e-4
    assert abs(_LEVENE_F95_INF[4] - 9.4877 / 4) < 1e-3


def test_cosine_histogram_matches_numpy(run, sf_dir):
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()

    def unif(vid):
        return int(hashlib.md5(str(vid).encode()).hexdigest()[:8], 16) / 2**32

    from awsbeats_spark.operators.llm.similarity import _CAL_TARGET_VECS

    frac = min(_CAL_SAMPLE_FRAC, _CAL_TARGET_VECS / len(emb))
    sel = emb[[unif(v) < frac for v in emb.vec_id]]
    vs = np.stack([np.asarray(v, dtype=np.float64) for v in sel.embedding])
    nrm = np.linalg.norm(vs, axis=1)
    cos = (vs @ vs.T) / np.outer(nrm, nrm)
    iu = np.triu_indices(len(vs), k=1)
    c = cos[iu]
    c6 = np.floor(c * 1e6 + 0.5) / 1e6
    bins = np.minimum(
        _CAL_N_BINS - 1, np.floor((c6 + 1.0) * (_CAL_N_BINS / 2.0)).astype(int)
    )
    got = run("embed_cosine_pair_histogram").set_index("bin")
    exp = {b: int((bins == b).sum()) for b in set(bins.tolist())}
    assert got.n_pairs.sum() == len(c)
    for b, cnt in exp.items():
        # numpy's blas dot vs the sequential fold can differ in the
        # last ulp; a 6-dp-rounded boundary cosine could shift one
        # pair — allow a 1-count slack per bin
        assert abs(int(got.loc[b].n_pairs) - cnt) <= 1
    assert abs(got.share.sum() - 1.0) < 1e-3
    # the synthetic embeddings are roughly isotropic: mass concentrates
    # near cos = 0, not in the extreme bins
    mid = got.loc[[b for b in got.index if 8 <= b <= 11]].n_pairs.sum()
    assert mid > got.n_pairs.sum() * 0.5
