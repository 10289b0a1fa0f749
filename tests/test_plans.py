"""Physical-plan regression tests: assert the scale-critical plan
properties (pushdown, pruning, broadcast choice, no-global-sort top-k)
instead of trusting that Catalyst keeps choosing them.

These are the checks the 100-TB design notes in each operator docstring
promise; if a refactor breaks one (a filter stops reaching the scan, a
dim join stops broadcasting), these fail before any benchmark notices.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from awsbeats_spark.plans import (
    has_broadcast_join,
    has_pushed_filters,
    plan_counts,
    read_schema_columns,
)
from awsbeats_spark.plans.inspect import executed_plan
from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(name):
        return SPECS[name].fn(spark, sf_dir)

    return run


def test_filter_predicate_pushed_to_scan(q):
    df = q("filter_predicate")
    assert has_pushed_filters(df, "l_quantity", "l_discount", "l_returnflag")


def test_scan_parquet_prunes_columns(q):
    schemas = read_schema_columns(q("scan_parquet"))
    assert schemas and set(schemas[0]) == {
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
    }


def test_flagship_broadcasts_dims_and_limits_shuffles(q):
    df = q("q_flagship_revenue_by_nation")
    counts = plan_counts(df)
    assert counts["broadcast_joins"] >= 2  # nation + region (+ AQE customer)
    # big-big joins + final agg: shuffle count stays bounded
    assert counts["exchanges"] <= 5


def test_join_broadcast_has_no_fact_side_shuffle(q):
    df = q("join_broadcast")
    counts = plan_counts(df)
    assert counts["broadcast_joins"] == 1
    # only the aggregation shuffles (partial -> final), never the join
    assert counts["sort_merge_joins"] == 0 and counts["shuffled_hash_joins"] == 0


def test_sort_limit_is_take_ordered_not_global_sort(q):
    counts = plan_counts(q("sort_limit"))
    assert counts["take_ordered"] == 1
    assert counts["exchanges"] == 0  # per-partition top-K + driver merge


def test_enrich_metadata_broadcasts_lookup(q):
    assert has_broadcast_join(q("enrich_metadata"))


def test_project_record_is_shuffle_free(q):
    counts = plan_counts(q("project_record"))
    assert counts["exchanges"] == 0


def test_window_topn_single_shuffle(q):
    counts = plan_counts(q("window_topn_rank"))
    assert counts["exchanges"] == 1  # one partitionBy shuffle, nothing else


def test_agg_partial_aggregation_present(q, spark, sf_dir):
    from awsbeats_spark.plans.inspect import executed_plan

    plan = executed_plan(q("agg_group_sum_avg"))
    # map-side combine before the exchange: partial then final
    assert "partial_" in plan.lower() or "HashAggregate" in plan
    assert plan.count("HashAggregate") >= 2


def test_codegen_covers_relational_operators(q, spark):
    # AQE wraps plans un-finalized until run; disable it for the static
    # codegen inspection (codegen itself is orthogonal to AQE)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ["filter_predicate", "scalar_math", "agg_group_sum_avg"]:
            counts = plan_counts(q(name))
            assert counts["codegen_spans"] >= 1, f"{name} has no WholeStageCodegen span"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_market_share_broadcasts_all_dims(q):
    # customer/nation/region all broadcast; only the fact join + agg shuffle
    counts = plan_counts(q("q_market_share"))
    assert counts["broadcast_joins"] >= 3
    assert counts["sort_merge_joins"] + counts["shuffled_hash_joins"] <= 1


def test_ship_priority_is_take_ordered(q):
    counts = plan_counts(q("q_ship_priority"))
    assert counts["take_ordered"] == 1  # top-10 never global-sorts


def test_salted_join_spreads_hot_keys(q):
    # the join key includes the salt: hash partitioning must carry both
    from awsbeats_spark.plans.inspect import executed_plan

    plan = executed_plan(q("join_skew_salted"))
    assert "salt" in plan


def test_mode_argmax_avoids_window_sort(q):
    from awsbeats_spark.plans.inspect import executed_plan

    plan = executed_plan(q("agg_mode_argmax"))
    assert "Window" not in plan  # two aggregations, no window sort
    assert plan.count("HashAggregate") >= 2


def test_ivf_assignment_aggregates_map_side(q):
    # cell assignment is max_by aggregation (partial combine), not a
    # row_number window over the vectors x centroids cross product
    from awsbeats_spark.plans.inspect import executed_plan

    plan = executed_plan(q("sim_search_ivf"))
    assert "max_by" in plan or "partial_max_by" in plan


def test_codec_roundtrips_are_shuffle_free(q):
    for name in ["codec_json_roundtrip", "codec_csv_roundtrip"]:
        counts = plan_counts(q(name))
        assert counts["exchanges"] == 0, f"{name} should be a pure projection"


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Bucketed tables co-locate join keys at WRITE time: both sides
    bucketed by the key into the same bucket count join WITHOUT any
    exchange — the pre-partitioning strategy that turns the biggest
    recurring shuffle at 100 TB into a free join. (SortMergeJoin reads
    bucketed data directly; only sorts remain.)"""
    from awsbeats_spark.catalog import tables as load_tables
    from awsbeats_spark.plans.inspect import executed_plan

    t = load_tables(spark, sf_dir)
    try:
        (
            t.orders.write.mode("overwrite")
            .option("path", str(tmp_path / "orders_b"))
            .bucketBy(4, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("orders_bucketed")
        )
        (
            t.lineitem.write.mode("overwrite")
            .option("path", str(tmp_path / "lineitem_b"))
            .bucketBy(4, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("lineitem_bucketed")
        )
        joined = spark.table("lineitem_bucketed").join(
            spark.table("orders_bucketed").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = executed_plan(joined)
        assert "Exchange hashpartitioning" not in plan, "bucketed join should not shuffle"
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_important_suppliers_reuses_exchange(q):
    """Q11 shape computes the per-supplier aggregate ONCE: the scalar
    total must come from a ReusedExchange of the same aggregate, not a
    second lineitem scan. Reuse only materializes in the FINAL AQE plan,
    so execute first and read the same QueryExecution."""
    df = q("q_important_suppliers")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_disjunctive_filter_pushes_or_conjuncts(q):
    """Q19 shape: Catalyst must extract the common single-side conjuncts
    of the cross-table OR and push them into BOTH scans."""
    from awsbeats_spark.plans.inspect import executed_plan

    plan = executed_plan(q("q_disjunctive_brand_filter"))
    assert "l_quantity" in plan.split("FileScan parquet [l_partkey")[1].split("]")[1][:400]
    assert "p_brand" in plan


def test_volume_shipping_broadcasts_dims(q):
    """Q7 shape: every dim join broadcast; only orderkey join + agg shuffle."""
    counts = plan_counts(q("q_volume_shipping"))
    assert counts["broadcast_joins"] >= 3
    assert counts["sort_merge_joins"] + counts["shuffled_hash_joins"] <= 1


def test_tfidf_scans_documents_once_for_tokens(q):
    """TF-IDF derives document frequency from a window over the tf
    aggregate, not a second explode of the corpus: exactly one scan of
    documents reads `text` (the other is the count-only scan for
    n_docs, pruned to zero columns)."""
    from awsbeats_spark.plans.inspect import read_schema_columns

    schemas = read_schema_columns(q("corpus_tfidf_topk"))
    with_text = [s for s in schemas if "text" in s]
    assert len(with_text) == 1


def test_decontaminate_broadcasts_eval_shingles(q):
    """The eval shingle set must broadcast (benchmark-sized); the train
    side must never SortMergeJoin on shingle text."""
    counts = plan_counts(q("corpus_decontaminate"))
    assert counts["broadcast_joins"] >= 1
    assert counts["sort_merge_joins"] == 0


def test_corpus_per_doc_stages_are_shuffle_free(q):
    """Chunking and PII scrubbing are pure projections — any Exchange in
    their plans is a scale regression."""
    for name in ("corpus_doc_chunk", "corpus_pii_scrub"):
        assert plan_counts(q(name))["exchanges"] == 0, name


def test_timeseries_ops_scans_are_pruned(q):
    """Every events scan in the time-series plans must be pruned to the
    columns the operator needs — a full-width scan of the fact table is
    a 100-TB regression."""
    from awsbeats_spark.plans.inspect import read_schema_columns

    allowed = {"ts", "event_type", "value", "user_id", "event_id"}
    for name in ("ts_gap_fill_ffill", "ts_ohlc_hourly", "events_retention_cohort"):
        for schema in read_schema_columns(q(name)):
            assert set(schema) <= allowed, (name, schema)
            assert "props" not in schema, name


def test_retention_cohort_no_sort_merge(q):
    counts = plan_counts(q("events_retention_cohort"))
    assert counts["sort_merge_joins"] == 0
    assert counts["broadcast_joins"] >= 1


def test_profile_columns_expand_stays_hash_aggregated(q):
    """String min/max buffers must not ride the 11x Expand stream — that
    demotes the whole distinct pass to SortAggregate (measured 3x
    slower). The Expand-side aggregates must all be HashAggregates."""
    from awsbeats_spark.plans.inspect import executed_plan

    plan = executed_plan(q("profile_columns"))
    assert "Expand" in plan
    expand_side = plan[: plan.index("Expand")]
    # everything above Expand in the main chain: allow SortAggregate only
    # in the tiny string-extrema branch (which has no Expand below it)
    for line in expand_side.splitlines():
        if "SortAggregate" in line and "first(mn_l_returnflag" in line:
            raise AssertionError("string extrema merged into expand pass")


def test_scd2_single_exchange_for_user_partitioning(q):
    """Change window, island agg and interval window all share the
    user_id partitioning — more than 2 exchanges means Catalyst lost
    the co-partitioning."""
    counts = plan_counts(q("scd2_history_intervals"))
    assert counts["exchanges"] <= 2, counts


def test_pagerank_iterations_never_rescan_events(q):
    """The ten PageRank update joins must run over the checkpointed
    |types|^2 edge matrix — an events FileScan inside the iteration
    plan means the fact table is re-read per iteration."""
    from awsbeats_spark.plans.inspect import executed_plan

    plan = executed_plan(q("graph_pagerank_transitions"))
    assert "events.parquet" not in plan
    assert plan.count("BroadcastHashJoin") >= 10


def test_latest_per_key_is_one_aggregate_no_window_sort(q):
    """CDC compaction must be a struct-max aggregate (map-side partials,
    one exchange), never a row_number window over the raw scan."""
    from awsbeats_spark.plans.inspect import executed_plan

    plan = executed_plan(q("dedup_latest_per_key"))
    assert "Window" not in plan
    assert plan_counts(q("dedup_latest_per_key"))["exchanges"] <= 1


def test_dup_span_two_level_agg_no_expand(q):
    df = q("corpus_dup_span_detect")
    counts = plan_counts(df)
    assert counts["take_ordered"] >= 1  # top-100 never global-sorts
    assert counts["exchanges"] <= 2  # (span, doc_id) then span; no Expand
    from awsbeats_spark.plans.inspect import executed_plan

    assert "Expand" not in executed_plan(df)


def test_mix_sample_is_pure_filter(q):
    counts = plan_counts(q("corpus_mix_sample"))
    assert counts["exchanges"] == 0  # narrow hash-predicate scan


def test_quantize_broadcasts_stats_not_vectors(q):
    counts = plan_counts(q("embed_quantize_sq8"))
    # vectors are never hash-shuffled: only the 64-row dim stats move
    assert counts["exchanges"] <= 2
    assert counts["nested_loop_joins"] >= 1  # 1-row stats broadcast


def test_repetition_gopher_bounded_exchanges(q):
    counts = plan_counts(q("text_repetition_gopher"))
    # (doc_id, bigram) partial agg, doc_id agg, doc_id join
    assert counts["exchanges"] <= 4


def test_runtime_bloom_filter_injects_on_selective_fact_join(spark, sf_dir):
    """At 100 TB a selective filter on one fact side should seed a
    runtime bloom filter that prunes the other fact side's scan before
    the shuffle (Spark 3.3+ runtime row-level filtering). Local sizes
    are below the production thresholds, so lower them here to prove
    the engine's plans are eligible when sizes warrant."""
    from awsbeats_spark.catalog import tables
    from awsbeats_spark.plans.inspect import executed_plan

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        # broadcast off: injection only targets shuffle joins (a
        # broadcast-able side never needs a bloom filter)
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t = tables(spark, sf_dir)
        sel = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
        df = (
            t.lineitem.join(sel, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        df.collect()
        assert "might_contain" in executed_plan(df)
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_join_strategy_fallbacks_smj_and_shuffled_hash(spark, sf_dir):
    """Large-large joins where neither side broadcasts must pick
    SortMergeJoin by default (spill-safe at any scale), and the
    shuffle_hash hint must switch to ShuffledHashJoin (no sort, wins
    when one side is modest and memory fits) — the two strategies that
    carry every non-broadcastable join at 100 TB."""
    from awsbeats_spark.catalog import tables as load_tables
    from awsbeats_spark.plans.inspect import plan_counts

    t = load_tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_quantity")
    od = t.orders.select("o_orderkey", "o_totalprice")
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        smj = li.join(od, li.l_orderkey == od.o_orderkey)
        counts = plan_counts(smj)
        assert counts["sort_merge_joins"] == 1 and counts["broadcast_joins"] == 0

        shj = li.join(od.hint("shuffle_hash"), li.l_orderkey == od.o_orderkey)
        counts = plan_counts(shj)
        assert counts["shuffled_hash_joins"] == 1 and counts["sort_merge_joins"] == 0
        # both must still agree with the broadcast plan's answer
        assert smj.count() == shj.count() == t.lineitem.count()
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_aqe_rebalances_skewed_join_at_runtime(spark):
    """AQE skew-join: with one hot key dominating the left side, the
    EXECUTED plan must show the sort-merge join marked `skew=true` —
    Spark split the hot partition at runtime. This is the zero-code
    alternative to manual salting (join_skew_salted) and the knob we
    rely on at 100 TB; the test pins that our session config
    (adaptive.skewJoin.enabled) actually fires."""
    hot = spark.range(200_000).selectExpr("0 AS k", "id AS payload")
    tail = spark.range(1000).selectExpr("(id + 1) AS k", "id AS payload")
    left = hot.union(tail)
    right = spark.range(1001).selectExpr("id AS k", "id AS r")

    conf = spark.conf
    saved = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        ),
        "spark.sql.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", None
        ),
    }
    try:
        # shrink thresholds so the test-sized hot partition counts as skewed
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = left.join(right, "k")
        # collect() runs THIS DataFrame's query execution, so the final
        # adaptive plan is inspectable afterwards (count() would plan anew)
        assert len(joined.collect()) == 201_000
        plan = executed_plan(joined)
        assert "skew=true" in plan, plan[:2000]
    finally:
        for key, val in saved.items():
            if val is None:
                conf.unset(key)
            else:
                conf.set(key, val)


def test_dq_constraint_violations_single_scan_no_joins(q):
    # every rule is a conditional sum in ONE aggregate pass: a single
    # lineitem scan, no hash-key shuffle, no joins
    df = q("dq_constraint_violations")
    counts = plan_counts(df)
    assert executed_plan(df).count("Scan parquet") == 1
    assert counts["exchanges"] == 0  # only the SinglePartition gather
    assert counts["sort_merge_joins"] == 0 and counts["shuffled_hash_joins"] == 0


def test_dq_referential_orphans_broadcasts_dims(q):
    counts = plan_counts(q("dq_referential_orphans"))
    # customer/nation(x2) edges broadcast; only lineitem->orders shuffles
    assert counts["broadcast_joins"] >= 3


def test_profile_columns_approx_has_no_expand(q):
    plan = executed_plan(q("profile_columns_approx"))
    assert "Expand" not in plan


def test_sim_search_range_no_corpus_shuffle(q):
    # broadcast(queries) x corpus scan compiles to a broadcast
    # nested-loop join (the scored filter runs per pair); the corpus
    # itself never shuffles
    counts = plan_counts(q("sim_search_range"))
    assert counts["nested_loop_joins"] == 1
    assert counts["exchanges"] == 0


def test_corpus_source_mix_single_scan(q):
    # the grand total is a window over the tiny per-source aggregate:
    # one documents scan feeds both levels, no join at all
    df = q("corpus_source_mix")
    assert executed_plan(df).count("Scan parquet") == 1


def test_attribution_single_user_shuffle(q):
    counts = plan_counts(q("events_attribution_last_touch"))
    # one shuffle for the user_id window + one for the tiny final group
    assert counts["exchanges"] <= 2


def test_scan_partition_pruned_has_partition_filters(q):
    plan = executed_plan(q("scan_partition_pruned"))
    # the date predicate must prune at the directory level, not as a
    # row-level data filter
    assert "PartitionFilters: [" in plan
    assert "2024-01-25" in plan.split("PartitionFilters", 1)[1][:200]


def test_join_null_safe_is_hash_join_not_nested_loop(q):
    # eqNullSafe must hash the null bucket like any key value: the plan
    # stays an equi hash join, never a nested loop
    counts = plan_counts(q("join_null_safe"))
    assert counts["nested_loop_joins"] == 0
    assert (
        counts["broadcast_joins"] + counts["shuffled_hash_joins"]
        + counts["sort_merge_joins"]
        >= 1
    )


def test_bitmap_distinct_two_level_aggregate(q):
    # position-bucket partials then bitmap merge: two aggregate levels,
    # no Expand (the count_distinct rewrite this key exists to avoid)
    plan = executed_plan(q("agg_bitmap_distinct"))
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 2


def test_bm25_broadcast_stats_no_cartesian(q):
    # query terms, df and stats join back as broadcasts; the only
    # non-broadcast join is the dl equi-join on doc_id. The cold plan
    # instantiates the tf subtree once per derived statistic (Catalyst
    # does not dedupe shared subtrees pre-execution) — the docstring
    # documents persisting the tf inverted index at production scale.
    df = q("retrieval_bm25_topk")
    plan = executed_plan(df)
    counts = plan_counts(df)
    assert counts["broadcast_joins"] >= 2
    assert counts["sort_merge_joins"] + counts["shuffled_hash_joins"] <= 1
    assert "CartesianProduct" not in plan


def test_semantic_cluster_assign_is_map_side_argmax(q):
    # centroid assignment must be the max-struct partial aggregate, not
    # a row_number window over the n-by-k cross product; pair check
    # joins on cent_id (hash/SMJ), never a cartesian
    df = q("dedup_semantic_cluster")
    plan = executed_plan(df)
    assert "partial_max(sc" in plan
    assert "CartesianProduct" not in plan


def test_skyline_single_table_exchange(q):
    # big-table work = one groupBy exchange; the distinct-price window
    # and the survivor join-back ride a broadcast
    df = q("part_skyline_pareto")
    counts = plan_counts(df)
    assert counts["broadcast_joins"] >= 1
    assert counts["exchanges"] <= 3


def test_weighted_percentile_one_sort_per_group_chain(q):
    # the running-weight window and the per-group total share the
    # l_returnflag partitioning; no extra table-wide exchanges
    df = q("agg_weighted_percentile")
    counts = plan_counts(df)
    assert counts["exchanges"] <= 2


def test_incremental_merge_joins_on_hash_not_text(q):
    # ledger join must be an equi-join on the md5 key
    df = q("dedup_incremental_merge")
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_seasonal_decompose_broadcasts_profiles(q):
    # 24-row seasonal profile and 1-row grand mean come back as
    # broadcasts over the hourly aggregate
    df = q("ts_seasonal_decompose")
    counts = plan_counts(df)
    assert counts["broadcast_joins"] + counts["nested_loop_joins"] >= 2
    # one table-sized exchange (the hourly aggregate); the others
    # (seasonal hod re-agg, grand mean, broadcast prep) move only the
    # already-aggregated hourly rows
    assert counts["exchanges"] <= 4


# --------------------------------------------------------------------------
# round-3b operators
# --------------------------------------------------------------------------


def test_geo_grid_join_broadcasts_expanded_small_side(q):
    counts = plan_counts(q("geo_grid_neighbor_join"))
    # supplier x 9-cell ring broadcasts; customer side never shuffles
    # for the join (only the final per-supplier agg exchanges)
    assert counts["broadcast_joins"] == 1
    assert counts["sort_merge_joins"] == 0 and counts["shuffled_hash_joins"] == 0
    assert counts["nested_loop_joins"] == 0  # candidate gen is equi-join


def test_geo_cell_density_is_takeordered(q):
    counts = plan_counts(q("geo_cell_density_topk"))
    assert counts["take_ordered"] == 1
    assert counts["exchanges"] == 1  # the single groupBy


def test_readability_is_shuffle_free(q):
    counts = plan_counts(q("text_readability_flesch"))
    assert counts["exchanges"] == 0
    assert counts["codegen_spans"] >= 1


def test_zipf_topk_avoids_global_sort(q):
    counts = plan_counts(q("text_zipf_slope"))
    # term-frequency agg exchanges; the top-200 must be TakeOrdered,
    # never a global sort of the vocabulary
    assert counts["take_ordered"] == 1


def test_psi_single_fact_scan_single_exchange(q):
    df = q("dq_distribution_drift_psi")
    counts = plan_counts(df)
    plan = executed_plan(df)
    assert plan.count("FileScan parquet") == 1  # one orders pass
    assert counts["exchanges"] <= 2  # bucket agg (+AQE coalesce variance)
    assert counts["broadcast_joins"] >= 1  # 10-row spine broadcast


def test_benford_single_fact_scan(q):
    df = q("dq_benford_first_digit")
    assert executed_plan(df).count("FileScan parquet") == 1
    assert plan_counts(df)["broadcast_joins"] >= 1


def test_acf_joins_on_reduced_series_not_fact(q):
    df = q("ts_acf_hourly")
    plan = executed_plan(df)
    counts = plan_counts(df)
    # events reduce to hours before any join; the lag join happens on
    # the tiny aggregate (broadcast or shuffled-on-aggregate, never SMJ
    # repartitioning the raw fact twice)
    assert plan.count("FileScan parquet") <= 2
    assert counts["nested_loop_joins"] <= 1  # the 12-row lag spine cross


def test_temperature_resample_single_scan(q):
    df = q("corpus_temperature_resample")
    assert executed_plan(df).count("FileScan parquet") == 1


def test_ks_reduces_to_bin_spine_before_windows(q):
    df = q("dq_ks_test_two_sample")
    assert executed_plan(df).count("FileScan parquet") == 1
    # the cumulative windows run over <=1000 bin rows, after one exchange
    assert plan_counts(df)["exchanges"] <= 2


def test_gini_single_shuffle_sort_agg(q):
    counts = plan_counts(q("agg_gini_by_priority"))
    # rank window and group agg share the o_orderpriority exchange
    assert counts["exchanges"] <= 2


def test_cusum_single_fact_scan(q):
    df = q("ts_changepoint_cusum")
    assert executed_plan(df).count("FileScan parquet") == 1
    assert plan_counts(df)["take_ordered"] == 1


def test_bpe_pairs_reduce_to_vocab_before_pair_agg(q):
    df = q("corpus_bpe_pair_stats")
    assert executed_plan(df).count("FileScan parquet") == 1
    assert plan_counts(df)["take_ordered"] == 1


def test_mann_kendall_pair_join_on_reduced_series(q):
    df = q("ts_trend_mann_kendall")
    counts = plan_counts(df)
    # the O(days^2) pair join must be a broadcast of the tiny daily
    # aggregate, never a shuffled join of raw events
    assert counts["sort_merge_joins"] == 0 and counts["shuffled_hash_joins"] == 0


def test_audio_energy_is_shuffle_free_mapinpandas(q):
    df = q("multimodal_audio_energy")
    plan = executed_plan(df)
    assert plan_counts(df)["exchanges"] == 0
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan


def test_drawdown_reduces_before_windows(q):
    df = q("ts_max_drawdown")
    assert executed_plan(df).count("FileScan parquet") == 1
    assert plan_counts(df)["take_ordered"] == 1


def test_ltv_watermark_broadcast_single_pass(q):
    df = q("events_ltv_decay")
    counts = plan_counts(df)
    assert counts["take_ordered"] == 1
    # the max-ts watermark joins back as a broadcast, never a shuffle
    assert counts["sort_merge_joins"] == 0 and counts["shuffled_hash_joins"] == 0


def test_weighted_sample_is_takeordered(q):
    counts = plan_counts(q("sample_weighted_es"))
    assert counts["take_ordered"] == 1
    assert counts["exchanges"] == 0  # scan -> per-partition heap, no shuffle


def test_percentile_bands_single_exchange(q):
    df = q("ts_percentile_bands_daily")
    assert executed_plan(df).count("FileScan parquet") == 1
    assert plan_counts(df)["exchanges"] <= 1


def test_pmi_single_explode_pass_no_self_join(q):
    df = q("text_pmi_collocations")
    plan = executed_plan(df)
    counts = plan_counts(df)
    assert plan.count("FileScan parquet") == 1
    assert counts["take_ordered"] == 1
    assert counts["sort_merge_joins"] == 0 and counts["shuffled_hash_joins"] == 0


def test_alert_episodes_single_fact_scan(q):
    df = q("events_alert_episodes")
    assert executed_plan(df).count("FileScan parquet") == 1


def test_kmv_single_distinct_pass(q):
    df = q("sketch_kmv_distinct")
    assert executed_plan(df).count("FileScan parquet") == 1


def test_assoc_rules_broadcast_marginals(q):
    counts = plan_counts(q("events_assoc_rules"))
    assert counts["take_ordered"] == 1
    assert counts["broadcast_joins"] >= 2  # singles x2 + basket count


def test_survival_windows_on_duration_aggregate(q):
    df = q("orders_survival_km")
    counts = plan_counts(df)
    # the orders-lineitem join shuffles once; windows run on |durations|
    assert counts["exchanges"] <= 4


def test_winsorized_broadcasts_bounds(q):
    assert has_broadcast_join(q("agg_winsorized_mean"))


# -------------------------------------------------------------------------
# round-4 operators
# -------------------------------------------------------------------------


def test_hamming_packed_broadcasts_queries_with_group_limit(q):
    """The corpus must NEVER shuffle: queries broadcast into a nested-
    loop join, and the top-k rank must push a WindowGroupLimit below
    the exchange (partial limit per map task)."""
    df = q("sim_search_hamming_packed")
    plan = executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("WindowGroupLimit") >= 2  # partial + final
    assert plan_counts(df)["exchanges"] <= 2


def test_cascade_rerank_no_corpus_shuffle_in_stage1(q):
    """Stage 1 (Hamming shortlist) must broadcast the query side; the
    exact-cosine stage joins vectors only for shortlist rows."""
    df = q("sim_search_cascade_rerank")
    plan = executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan


def test_partial_merge_is_two_level_hash_agg(q):
    """Both stages must be hash aggregates (no sort-based fallback) and
    stage 1 must have a partial (map-side) aggregation."""
    df = q("agg_partial_merge_shards")
    plan = executed_plan(df)
    assert plan.count("HashAggregate") >= 4  # partial+final x 2 levels
    assert "SortAggregate" not in plan


def test_theil_sen_pair_join_is_broadcast(q):
    """The O(days^2) pair join must broadcast the tiny daily aggregate,
    never shuffle raw events into a merge join."""
    df = q("ts_theil_sen_slope")
    counts = plan_counts(df)
    assert counts["sort_merge_joins"] == 0 and counts["shuffled_hash_joins"] == 0


def test_dow_anova_single_scan_reduced_series(q):
    df = q("ts_dow_anova")
    plan = executed_plan(df)
    # events scanned once per branch at most; totals broadcast
    assert plan_counts(df)["sort_merge_joins"] == 0
    assert "BroadcastExchange" in plan


def test_keyhash_sample_pushes_priority_filter(q):
    df = q("join_keyhash_sample_estimate")
    assert has_pushed_filters(df, "o_orderpriority")


def test_quarantine_decode_is_shuffle_free(q):
    df = q("multimodal_decode_quarantine")
    plan = executed_plan(df)
    assert plan_counts(df)["exchanges"] == 0
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan


def test_seasonal_zscore_broadcasts_profile(q):
    df = q("ts_anomaly_seasonal_zscore")
    assert has_broadcast_join(df)
    assert plan_counts(df)["sort_merge_joins"] == 0


def test_dedup_impact_single_scan_no_text_shuffle(q):
    """The rank partitions on the md5 hash — the text column must be
    projected away before the exchange (shuffle bytes = hash, not
    documents)."""
    df = q("corpus_dedup_impact_report")
    plan = executed_plan(df)
    ex = plan.split("Exchange hashpartitioning")[1] if "Exchange hashpartitioning" in plan else ""
    assert "text#" not in ex.split("+-")[0]


def test_project_record_parses_json_exactly_once(q):
    # round-11: the drop-on-missing-key filter rides the generator, so
    # get_json_object must appear ONCE in the physical plan — predicate
    # pushdown used to clone it below the scan (two parses per row)
    plan = executed_plan(q("project_record"))
    assert plan.count("get_json_object") == 1


def test_dedup_minhash_signature_aggregate_is_hash_based(q):
    # round-11: per-doc minima are LONGs (8-hex-chunk value order ==
    # string order), keeping the mutable-buffer HashAggregate; a string
    # min-buffer would silently fall back to SortAggregate and re-sort
    # the exploded corpus twice around the per-doc aggregate
    plan = executed_plan(q("dedup_minhash"))
    assert "SortAggregate" not in plan


def test_dedup_ngram_pair_agg_runs_above_pair_exchange(q):
    # round-12: candidate pairs are near-unique (sf1 replica: 138M
    # joined rows, 113M distinct pairs), so a partial aggregate in the
    # JOIN stage combines nothing while holding the task's whole pair
    # slice in memory (the measured default-session OOM). The plan must
    # keep the join stage streaming: the pair groupBy's HashAggregates
    # both sit ABOVE the REPARTITION_BY_COL pair exchange, none below.
    plan = executed_plan(q("dedup_ngram_jaccard"))
    pair_exchange = plan.index("hashpartitioning(doc_a")
    # both aggregate phases run after (= printed before) the pair
    # exchange in the formatted bottom-up tree: every HashAggregate
    # mention must precede the exchange's position in the dump
    agg_positions = [
        i for i in range(len(plan)) if plan.startswith("HashAggregate", i)
    ]
    assert agg_positions, "pair aggregate missing"
    assert all(p < pair_exchange for p in agg_positions), (
        "a HashAggregate landed below the pair exchange — the join-stage "
        "partial aggregate is back"
    )
