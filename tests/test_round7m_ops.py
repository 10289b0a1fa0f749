"""Semantic twin for eval_ivf_nprobe_curve: numpy reimplementation of
the centroid assignment, probe ordering, and per-config recall, plus
consistency with the shipped-config recall eval."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from awsbeats_spark.operators.llm.similarity import (
    _NPROBE_MAX,
    CENTROID_ID_CAP,
    CENTROID_MOD,
    N_QUERIES,
    TOP_K,
)
from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_nprobe_curve_matches_numpy(run, sf_dir):
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    ids = emb.vec_id.to_numpy()
    vs = np.stack([np.asarray(v, dtype=np.float64) for v in emb.embedding])
    vs_n = vs / np.linalg.norm(vs, axis=1, keepdims=True)
    cent_mask = (ids % CENTROID_MOD == 0) & (ids < CENTROID_ID_CAP)
    cents = vs_n[cent_mask]
    cent_ids = ids[cent_mask]
    sims = vs_n @ cents.T
    # assignment: best centroid, centroid-id tiebreak (sort is stable)
    order = np.lexsort((cent_ids[np.newaxis, :].repeat(len(ids), 0), -sims), axis=1)
    assign = cent_ids[order[:, 0]]
    qmask = ids < N_QUERIES
    got = run("eval_ivf_nprobe_curve").set_index("n_probe")
    # exact truth: brute-force top-k per query (excluding self)
    full = vs_n @ vs_n.T
    truth = {}
    for qi in np.where(qmask)[0]:
        s = full[qi].copy()
        s[qi] = -np.inf
        top = np.lexsort((ids, -np.floor(s * 1e6 + 0.5) / 1e6))[:TOP_K]
        truth[ids[qi]] = set(ids[top])
    for p in range(1, _NPROBE_MAX + 1):
        hits = 0
        n_cand = 0
        for qi in np.where(qmask)[0]:
            probe_order = np.lexsort((cent_ids, -sims[qi]))
            probed = set(cent_ids[probe_order[:p]])
            cand = [
                j
                for j in range(len(ids))
                if assign[j] in probed and ids[j] != ids[qi]
            ]
            n_cand += len(cand)
            cos = np.floor(full[qi][cand] * 1e6 + 0.5) / 1e6
            order2 = np.lexsort((ids[cand], -cos))[:TOP_K]
            picked = {ids[cand][i] for i in order2}
            hits += len(picked & truth[ids[qi]])
        row = got.loc[p]
        assert row.n_candidates == n_cand
        assert row.n_hits == hits
        assert abs(row.recall_at_k - hits / (len(truth) * TOP_K)) < 1e-6
    # monotone: more probes never reduce candidates or recall
    assert got.sort_index().n_candidates.is_monotonic_increasing
    assert got.sort_index().recall_at_k.is_monotonic_increasing
