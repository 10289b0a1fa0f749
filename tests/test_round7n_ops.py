"""Semantic twins for the round-7n additions: the canary scan against
a pure-Python shingle search, and the session-gap sensitivity curve
against an actual sessionization at each threshold."""

from __future__ import annotations

import re

import pytest

from awsbeats_spark.operators.llm.corpus import _CANARIES
from awsbeats_spark.operators.streaming_batch import _GAP_CANDIDATES
from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def _shingles3(text):
    ws = [w for w in re.split(r"\s+", text.lower()) if w]
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


def test_canary_scan_matches_python(run, spark, sf_dir):
    from awsbeats_spark.catalog import tables

    docs = tables(spark, sf_dir).documents.toPandas()
    got = run("corpus_canary_scan").set_index("canary_id")
    assert len(got) == len(_CANARIES)  # zero-hit canaries still report
    for cid, phrase in enumerate(_CANARIES):
        hits = [
            row.doc_id
            for _, row in docs.iterrows()
            if phrase in _shingles3(row.text)
        ]
        row = got.loc[cid]
        assert row.phrase == phrase
        assert row.n_docs == len(hits)
        assert row.first_doc_id == (min(hits) if hits else -1)
    # the synthetic vocab must actually light up at least one canary,
    # otherwise the scan is untested in the positive direction
    assert got.n_docs.sum() > 0


def test_session_gap_curve_matches_real_sessionization(run, spark, sf_dir):
    from awsbeats_spark.catalog import tables

    ev = tables(spark, sf_dir).events.toPandas()
    ev["es"] = ev.ts.astype("int64") // 10**9
    got = run("events_session_gap_sensitivity").set_index("gap_threshold_s")
    n_users = ev.user_id.nunique()
    for g in _GAP_CANDIDATES:
        n_sessions = 0
        for _, grp in ev.groupby("user_id"):
            ts = grp.sort_values(["ts", "event_id"]).es.to_numpy()
            n_sessions += 1 + int(((ts[1:] - ts[:-1]) >= g).sum())
        row = got.loc[g]
        assert row.n_sessions == n_sessions
        assert abs(row.sessions_per_user - n_sessions / n_users) < 1e-3
    # monotone: a larger gap never creates more sessions
    ordered = got.sort_index().n_sessions.to_numpy()
    assert (ordered[1:] <= ordered[:-1]).all()
