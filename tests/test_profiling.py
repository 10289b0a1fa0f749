"""Invariant tests for profiling / historization operators
(operators/profiling.py) and text normalization."""

from __future__ import annotations

from awsbeats_spark.registry import load_all

SPECS = load_all()


def test_profile_covers_every_lineitem_column(spark, sf_dir):
    rows = SPECS["profile_columns"].fn(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert {r["column_name"] for r in rows} == set(li.columns)
    n = li.count()
    for r in rows:
        assert 0 <= r["n_nulls"] <= n
        assert 1 <= r["n_distinct"] <= n
        try:
            assert float(r["min_repr"]) <= float(r["max_repr"])
        except ValueError:  # string / timestamp columns: lexicographic
            assert r["min_repr"] <= r["max_repr"]


def test_profile_distincts_match_direct_counts(spark, sf_dir):
    rows = {
        r["column_name"]: r
        for r in SPECS["profile_columns"].fn(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for c in ("l_returnflag", "l_linestatus", "l_linenumber"):
        assert rows[c]["n_distinct"] == li.select(c).distinct().count()


def test_scd2_intervals_partition_user_timeline(spark, sf_dir):
    rows = SPECS["scd2_history_intervals"].fn(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert sum(r["n_events"] for r in rows) == ev.count()
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    for rs in per_user.values():
        rs.sort(key=lambda r: r["valid_from"])
        # exactly one open (current) interval per user, and it is the last
        assert [r["is_current"] for r in rs] == [0] * (len(rs) - 1) + [1]
        for a, b in zip(rs, rs[1:]):
            # half-open, gapless, strictly ordered intervals
            assert a["valid_to"] == b["valid_from"]
            assert a["valid_from"] < a["valid_to"]
            # adjacent intervals always change type (maximal runs)
            assert a["event_type"] != b["event_type"]
        assert rs[-1]["valid_to"] is None


def test_text_normalize_idempotent_and_clean(spark, sf_dir):
    import re

    rows = SPECS["text_normalize"].fn(spark, sf_dir).collect()
    for r in rows:
        t = r["norm_text"]
        assert re.fullmatch(r"[a-z0-9]+( [a-z0-9]+)*", t) or t == ""
        assert r["n_words_norm"] == (len(t.split()) if t else 0)


def test_profile_approx_within_5pct_of_exact_and_no_expand(spark, sf_dir):
    load_all()
    from awsbeats_spark.registry import QUERIES

    exact = {
        r["column_name"]: r["n_distinct"]
        for r in QUERIES["profile_columns"].fn(spark, sf_dir).collect()
    }
    approx_df = QUERIES["profile_columns_approx"].fn(spark, sf_dir)
    rows = {r["column_name"]: r for r in approx_df.collect()}
    assert set(rows) == set(exact)
    for c, r in rows.items():
        # the sandwich: exact distinct count rides the row, the sketch
        # health is the verdict boolean
        assert r["n_distinct"] == exact[c], (c, r["n_distinct"], exact[c])
        assert r["approx_within_bound"] is True, c
    # the whole point of the approx twin: no Catalyst Expand anywhere —
    # including the exact audit side (stack unpivot + single distinct)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
