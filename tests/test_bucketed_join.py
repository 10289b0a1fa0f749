"""Bucketed-layout tests: the property that matters at 100 TB is that a
join (and a groupBy) on the bucket key runs WITHOUT any Exchange — the
layout replaces the shuffle. Asserted directly on the physical plan."""

from __future__ import annotations

import pytest

from awsbeats_spark.catalog import tables
from awsbeats_spark.plans.inspect import formatted_plan
from awsbeats_spark.sinks.bucketed import read_table, write_bucketed

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir):
    t = tables(spark, sf_dir)
    write_bucketed(t.orders, "b_orders", "o_orderkey", buckets=8)
    write_bucketed(
        t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        buckets=8,
    )
    yield spark
    for tbl in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_bucketed_join_has_no_exchange(bucketed_pair, spark):
    o, l = read_table(spark, "b_orders"), read_table(spark, "b_lineitem")
    joined = o.join(l, "o_orderkey").groupBy("o_orderstatus").count()
    plan = formatted_plan(joined)
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "SelectedBucketsCount" in plan  # scans actually use the layout


def test_bucketed_groupby_has_no_exchange(bucketed_pair, spark):
    l = read_table(spark, "b_lineitem")
    agg = l.groupBy("o_orderkey").agg(F.sum("l_quantity").alias("qty"))
    plan = formatted_plan(agg)
    assert "Exchange" not in plan


def test_bucketed_join_matches_unbucketed(bucketed_pair, spark, sf_dir):
    t = tables(spark, sf_dir)
    o, l = read_table(spark, "b_orders"), read_table(spark, "b_lineitem")
    got = o.join(l, "o_orderkey").count()
    want = t.orders.join(
        t.lineitem, t.orders.o_orderkey == t.lineitem.l_orderkey
    ).count()
    assert got == want


def test_overwrite_cleanup_spares_unrelated_directory(spark, sf_dir):
    """Overwrite must not rmtree a same-named warehouse directory that
    this writer never produced (ADVICE r4: naming-convention deletion)."""
    import os

    t = tables(spark, sf_dir)
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    decoy = os.path.join(warehouse, "b_decoy")
    os.makedirs(decoy, exist_ok=True)
    marker = os.path.join(decoy, "precious.txt")
    with open(marker, "w") as f:
        f.write("not a table")
    try:
        spark.sql("DROP TABLE IF EXISTS b_decoy")
        with pytest.raises(Exception):
            # saveAsTable should fail on the occupied location; the
            # cleanup must NOT have deleted the non-table directory
            write_bucketed(t.nation, "b_decoy", "n_nationkey", buckets=2)
        assert os.path.exists(marker)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_decoy")
        import shutil

        shutil.rmtree(decoy, ignore_errors=True)


def test_overwrite_resolves_location_from_catalog(spark, sf_dir):
    """When the table IS registered, overwrite resolves its real location
    via DESCRIBE EXTENDED and clears it — round-tripping twice works."""
    t = tables(spark, sf_dir)
    try:
        write_bucketed(t.region, "b_region_rt", "r_regionkey", buckets=2)
        write_bucketed(t.region, "b_region_rt", "r_regionkey", buckets=2)
        assert read_table(spark, "b_region_rt").count() == t.region.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_region_rt")
