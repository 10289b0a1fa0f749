"""Semantic twins for the round-8 additions: the NDJSON repairer
against a pure-Python replay of the corruption+repair cycle, and the
footer-drift audit against pandas per-day aggregates + interval
Jaccard."""

from __future__ import annotations

import json
import math

import pytest

from awsbeats_spark.operators.udtf import _NDJSON_W
from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def _events(spark, sf_dir):
    from awsbeats_spark.catalog import tables

    return tables(spark, sf_dir).events.toPandas()


def test_ndjson_repair_matches_python_replay(run, spark, sf_dir):
    ev = _events(spark, sf_dir)
    got = run("udtf_ndjson_repair")
    expected = {}
    for uid, grp in ev.sort_values("event_id").groupby("user_id"):
        recs = [
            '{"event_id":%d,"event_type":"%s","user_id":%d}'
            % (r.event_id, r.event_type, r.user_id)
            for r in grp.itertuples()
        ]
        # corruption: fixed-width lines; the stream's last record loses
        # its final line when it spans >= 2
        streams = []
        for i, rec in enumerate(recs):
            lines = [
                rec[j : j + _NDJSON_W] for j in range(0, len(rec), _NDJSON_W)
            ]
            if i == len(recs) - 1 and len(lines) >= 2:
                lines = lines[:-1]
            streams.append(lines)
        # repair: buffer until json parses; flush tail incomplete
        buf, nl, idx = "", 0, 0
        for lines in streams:
            for line in lines:
                buf += line
                nl += 1
                try:
                    json.loads(buf)
                except ValueError:
                    continue
                expected[(uid, idx)] = (buf, nl, True)
                buf, nl, idx = "", 0, idx + 1
        if buf:
            expected[(uid, idx)] = (buf, nl, False)
    assert len(got) == len(expected)
    for row in got.itertuples():
        rep, nl, comp = expected[(row.user_id, row.rec_idx)]
        assert row.repaired == rep
        assert row.n_lines == nl
        assert bool(row.complete) == comp
    # the truncation must actually fire: every stream ends incomplete
    # unless its final record fit one line
    n_incomplete = int((~got.complete).sum())
    assert n_incomplete > 0
    assert (
        got[~got.complete].repaired.str.len() % _NDJSON_W == 0
    ).all()  # incomplete tails are whole lines


def test_ndjson_repair_incomplete_is_strict_prefix(run, spark, sf_dir):
    got = run("udtf_ndjson_repair")
    bad = got[~got.complete]
    for row in bad.itertuples():
        # the partial record must still be unparseable JSON (the repair
        # did not invent a closing brace)
        with pytest.raises(ValueError):
            json.loads(row.repaired)
    # complete records all parse and carry their own ids
    ok = got[got.complete]
    for row in ok.head(200).itertuples():
        obj = json.loads(row.repaired)
        assert obj["user_id"] == row.user_id


def test_footer_drift_matches_pandas(run, spark, sf_dir):
    ev = _events(spark, sf_dir)
    got = run("profile_parquet_footer_drift").sort_values("day")
    day = ev.ts.dt.strftime("%Y-%m-%d")
    agg = (
        ev.assign(day=day)
        .groupby("day")["value"]
        .agg(["min", "max", "count"])
        .sort_index()
    )
    assert list(got.day) == list(agg.index)
    assert got.footer_min_matches.all()
    assert got.footer_max_matches.all()
    assert got.footer_rows_match.all()
    prev = None
    for row, (d, a) in zip(got.itertuples(), agg.iterrows()):
        assert row.data_min == a["min"]
        assert row.data_max == a["max"]
        assert row.n_rows == a["count"]
        if prev is None:
            assert row.range_overlap_prev is None or math.isnan(
                row.range_overlap_prev
            )
        else:
            union = max(a["max"], prev["max"]) - min(a["min"], prev["min"])
            inter = max(
                0.0, min(a["max"], prev["max"]) - max(a["min"], prev["min"])
            )
            exp = 1.0 if union == 0 else round(inter / union, 6)
            assert row.range_overlap_prev == pytest.approx(exp, abs=1e-9)
        prev = a
