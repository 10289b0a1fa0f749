"""Semantic laws for the round-3 batch-3 operators: seasonal
decomposition, lateness stats, weighted percentile, incremental dedup."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.registry import load_all

SPECS = load_all()


def test_seasonal_decompose_reconstructs_exactly(spark, sf_dir):
    pdf = SPECS["ts_seasonal_decompose"].fn(spark, sf_dir).toPandas()
    # additive identity: y = trend + seasonal + residual (to rounding)
    recon = pdf.trend_mean + pdf.seasonal_hod + pdf.residual
    assert np.allclose(recon, pdf.y, atol=1e-5)
    # seasonal components are mean-centered offsets: hour profile sums
    # near zero when every hour-of-day is populated
    assert abs(pdf.drop_duplicates("seasonal_hod").seasonal_hod.mean()) < 1.0


def test_lateness_stats_sane(spark, sf_dir):
    pdf = SPECS["events_lateness_stats"].fn(spark, sf_dir).toPandas()
    assert (pdf.n_late <= pdf.n_events).all()
    assert (pdf.max_late_s >= 0).all()
    assert (pdf.p95_late_s <= pdf.max_late_s + 1e-9).all()


def test_weighted_median_crossing_law(spark, sf_dir):
    pdf = SPECS["agg_weighted_percentile"].fn(spark, sf_dir).toPandas()
    li = (
        tables(spark, sf_dir)
        .lineitem.select("l_returnflag", "l_extendedprice", "l_quantity")
        .toPandas()
    )
    for _, row in pdf.iterrows():
        g = li[li.l_returnflag == row.l_returnflag]
        tot = g.l_quantity.sum()
        below = g[g.l_extendedprice < row.weighted_median_price].l_quantity.sum()
        at_or_below = g[
            g.l_extendedprice <= row.weighted_median_price
        ].l_quantity.sum()
        # the crossing price: strictly-below mass < 50% <= at-or-below mass
        assert below < 0.5 * tot <= at_or_below


def test_incremental_merge_partitions_batch(spark, sf_dir):
    pdf = SPECS["dedup_incremental_merge"].fn(spark, sf_dir).toPandas()
    # flags are mutually consistent: is_new excludes both dup kinds
    assert not (pdf.is_new & pdf.dup_of_corpus).any()
    assert not (pdf.is_new & pdf.dup_in_batch).any()
    # every batch doc is classified
    docs = tables(spark, sf_dir).documents
    n_batch = docs.filter(F.col("doc_id") >= 400).count()
    assert len(pdf) == n_batch
