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
    rows = qs["agg_freq_items_approx"](spark, sf_dir).collect()
    items = {r["item"] for r in rows}
    od = tables(spark, sf_dir).orders
    n = od.count()
    counts = {
        r["o_orderpriority"]: r["count"]
        for r in od.groupBy("o_orderpriority").count().collect()
    }
    heavy = {k for k, c in counts.items() if c * 10 > n}
    assert heavy, "fixture should have heavy order priorities"
    # the operator's row set IS the exact heavy hitters; the sketch's
    # superset guarantee (may over-report, never under) is the
    # in_sketch verdict column
    assert items == heavy
    for r in rows:
        assert r["in_sketch"] is True
        assert r["exact_count"] == counts[r["item"]]
