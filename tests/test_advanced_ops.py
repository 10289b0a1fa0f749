"""Semantic laws for the round-3 batch-2 operators: dynamic IN-pushdown
join, skyline, exact decimal aggregation, semantic-cluster dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.registry import load_all

SPECS = load_all()


def test_in_pushdown_reaches_parquet_scan(spark, sf_dir):
    df = SPECS["join_dynamic_in_pushdown"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # a 1-element key set optimizes In -> EqualTo; both are pushed scans
    assert (
        "PushedFilters: [In(l_partkey" in plan
        or "PushedFilters: [EqualTo(l_partkey" in plan
    ), plan[:2000]
    # and no join/exchange left anywhere — the semi join was collapsed
    # into the scan filter
    assert "Join" not in plan


def test_skyline_has_no_dominated_point(spark, sf_dir):
    sky = SPECS["part_skyline_pareto"].fn(spark, sf_dir).toPandas()
    part = tables(spark, sf_dir).part.select(
        "p_partkey", "p_retailprice", "p_size"
    ).toPandas()
    assert len(sky) >= 1
    for _, p in sky.iterrows():
        dom = part[
            (part.p_retailprice <= p.p_retailprice)
            & (part.p_size <= p.p_size)
            & (
                (part.p_retailprice < p.p_retailprice)
                | (part.p_size < p.p_size)
            )
        ]
        assert dom.empty, f"skyline point {p.p_partkey} is dominated"


def test_decimal_sum_partitioning_invariant(spark, sf_dir):
    # The decimal total must not depend on partition count / merge order.
    t = tables(spark, sf_dir)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    a = (
        t.lineitem.repartition(1)
        .agg(F.sum(price).alias("s"))
        .collect()[0]["s"]
    )
    b = (
        t.lineitem.repartition(17)
        .agg(F.sum(price).alias("s"))
        .collect()[0]["s"]
    )
    assert a == b


def test_semdedup_laws(spark, sf_dir):
    pdf = SPECS["dedup_semantic_cluster"].fn(spark, sf_dir).toPandas()
    # every vector assigned exactly once
    assert pdf.vec_id.is_unique
    # the top-ranked vector of each cluster can never be a duplicate
    top = pdf[pdf.crank == 1]
    assert not top.is_dup.any()
    # ranks are dense within each cluster
    for _, grp in pdf.groupby("cluster_id"):
        assert sorted(grp.crank) == list(range(1, len(grp) + 1))


def test_observe_metrics_match_direct_agg(spark, sf_dir):
    pdf = SPECS["observability_observe_inline"].fn(spark, sf_dir).toPandas()
    ev = tables(spark, sf_dir).events
    assert pdf.n_rows.iloc[0] == ev.count()
    assert 0 <= pdf.n_dropped.iloc[0] <= pdf.n_rows.iloc[0]
