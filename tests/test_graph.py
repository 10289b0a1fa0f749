"""Invariant tests for the graph operators (operators/graph.py)."""

from __future__ import annotations

from awsbeats_spark.registry import load_all

SPECS = load_all()


def test_markov_rows_are_a_stochastic_matrix(spark, sf_dir):
    rows = SPECS["events_markov_transitions"].fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every event except each user's first contributes one transition
    assert sum(r["n_trans"] for r in rows) == n_events - n_users
    by_src: dict[str, float] = {}
    for r in rows:
        assert 0.0 < r["prob"] <= 1.0
        by_src[r["src_type"]] = by_src.get(r["src_type"], 0.0) + r["prob"]
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-4, (src, total)


def test_pagerank_is_a_probability_vector(spark, sf_dir):
    rows = SPECS["graph_pagerank_transitions"].fn(spark, sf_dir).collect()
    types = {
        r["event_type"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type")
        .distinct()
        .collect()
    }
    assert {r["node"] for r in rows} == types
    assert all(r["pagerank"] > 0 for r in rows)
    assert abs(sum(r["pagerank"] for r in rows) - 1.0) < 1e-3


def test_path_topk_deterministic_and_bounded(spark, sf_dir):
    rows = SPECS["events_path_topk"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    counts = [r["n_paths"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert len(r["path"].split(">")) == 3
    # ties broken by path: equal counts must be in path order
    for a, b in zip(rows, rows[1:]):
        if a["n_paths"] == b["n_paths"]:
            assert a["path"] < b["path"]
