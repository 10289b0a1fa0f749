"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue", "n_lineitems"}


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 60
    assert set(oracles) <= set(qs)
    # every oracle is non-empty SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_approx_distinct_within_bounds(spark, sf_dir):
    """Sandwich output: exact counts are exact and the HLL++ estimate's
    5-sigma verdict holds on every (returnflag, linestatus) group."""
    qs = entrymod.queries()
    rows = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in qs["agg_approx_distinct"](spark, sf_dir).collect()
    }
    from awsbeats_spark.catalog import tables
    from pyspark.sql import functions as F

    exact = {
        (r["l_returnflag"], r["l_linestatus"]): r["n"]
        for r in tables(spark, sf_dir)
        .lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for key, row in rows.items():
        assert row["exact_orders"] == exact[key]
        assert row["within_bound"] is True


def test_freq_items_superset_of_true_heavy_hitters(spark, sf_dir):
    import __spark_entry__ as E

    from awsbeats_spark.catalog import tables

    qs = E.queries()
    items = {r["item"] for r in qs["agg_freq_items_approx"](spark, sf_dir).collect()}
    ev = tables(spark, sf_dir).events
    n = ev.count()
    counts = {
        r["event_type"]: r["count"]
        for r in ev.groupBy("event_type").count().collect()
    }
    heavy = {k for k, c in counts.items() if c / n > 0.05}
    assert heavy, "fixture should have heavy event types"
    assert heavy <= items  # freqItems may over-report, never under
