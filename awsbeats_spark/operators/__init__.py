"""Operator modules. Importing this package registers every operator
into ``awsbeats_spark.registry.QUERIES``.

Registration ORDER is part of the correctness strategy: the driver's
per-round pass walks ``queries()`` in registration order under a ~50-key
budget, so keys that most need a driver-green row must register first.
After importing every module (which registers keys in module order),
``_reorder()`` rebuilds the registry dict to the explicit rotation below.

Rotation plan (kept current each round):

* **Round 1** checked the first 50 keys of the then-order: aggregates /
  extended / graph / joins / pipeline — 43 hash-green + 3 rows-only.
* **Round 2** front-loaded llm.* / quality / udtf — 44 hash-green +
  2 rows-only; 4 red rows were DuckDB-HUGEINT oracle typing (fixed
  round 3 via CAST AS BIGINT, guarded by tests/test_oracle_types.py).
* **Round 3** (``_ROUND3_WINDOW``, exactly 50): the 8 fixed-but-red keys
  (partition_key_xid, join_asof_nearest, sink_kinesis_batched_retry,
  agg_percentile_approx + the 4 HUGEINT keys), then never-checked
  relational(15) / windows(8) / setops(3) / sqlfuncs(10) /
  json_parse_promote / streaming_batch(4) / join_null_safe.
* **Round 4** (``_ROUND4_BLOCK``, next 45): agg_bitmap_distinct,
  scale(18), profiling(3), timeseries(8), tpch_more(13),
  events_attribution_last_touch, events_pattern_match — after round 4
  every key has had at least one driver row.
* **Round 5+** (``_ROUND5_FRONT`` then module order): first the 14
  round-3-added keys (llm.retrieval, join_dynamic_in_pushdown,
  part_skyline_pareto, agg_decimal_exact_sum, dedup_semantic_cluster,
  agg_weighted_percentile, ts_seasonal_decompose, events_lateness_stats,
  dedup_incremental_merge, observability_observe_inline — never
  driver-checked), then the 25 round-3b keys (geo.py x2,
  text_readability_flesch, text_zipf_slope, dq_distribution_drift_psi,
  dq_benford_first_digit, dq_ks_test_two_sample, agg_gini_by_priority,
  ts_acf_hourly, ts_downsample_lttb, ts_changepoint_cusum,
  ts_trend_mann_kendall, corpus_temperature_resample,
  corpus_bpe_pair_stats, multimodal_audio_energy, ts_max_drawdown,
  events_ltv_decay, sample_weighted_es, ts_percentile_bands_daily,
  text_pmi_collocations, events_alert_episodes, sketch_kmv_distinct,
  events_assoc_rules, orders_survival_km, agg_winsorized_mean —
  they register after _ROUND5_FRONT in module order), then the 9
  round-3c keys (ts_rolling_corr, ts_cross_correlation_lag,
  window_moving_median, dq_outlier_iqr, agg_entropy_by_group,
  text_code_detect, graph_type_overlap_jaccard, corpus_ngram_novelty,
  dedup_cross_source_priority — also after _ROUND5_FRONT in module
  order), then the 6 round-3d keys (sketch_countmin_user_freq,
  sketch_bloom_membership, ts_period_over_period,
  events_conversion_latency, text_keyword_rake_topk,
  embed_drift_centroid), then the 4 round-3e keys
  (corpus_span_mask_t5, agg_hhi_concentration, eval_ann_recall_ivf,
  window_streak_longest), then the 3 round-3f keys
  (eval_pair_rouge_overlap, scalar_try_safe_math,
  window_share_of_total), then the 3 round-3g keys
  (events_bounce_rate, events_lifecycle_stages, events_dau_wau_mau),
  then the 2 round-3h keys (sql_recursive_cte, scalar_url_parse),
  then the 2 round-3i keys (corpus_line_dedup_ccnet,
  dq_volume_anomaly_daily), then the 4 round-3j keys
  (eval_minhash_vs_exact, events_activity_heatmap,
  events_new_vs_returning, scalar_bitmask_flags), then the 2
  round-3k keys (corpus_budget_allocate_lrm, orders_cohort_ltv_curve),
  then the 2 round-3l keys (events_error_budget_burn,
  text_compression_ratio — rows-only), then the 2 round-3m keys
  (multimodal_shard_balance_lpt, agg_higher_moments), then the 2
  round-3n keys (ts_burstiness_fano, dq_quarantine_rows), then the 2
  round-3o keys (corpus_sft_pair_synth, events_lorenz_deciles), then
  the 2 round-3p keys (corpus_vocab_growth_heaps,
  text_source_js_divergence), then the 2 round-3q keys
  (events_diff_in_diff, embed_cluster_purity), then the 2 round-3r
  keys (orders_interpurchase_gaps, corpus_bigram_entropy_rate), then
  the 2 round-3s keys (q_customer_migration_matrix,
  ts_seasonal_naive_error), then the 2 round-3t keys
  (text_word_burstiness, corpus_mix_kl_to_target), then re-check the
  round-1/2 greens on a rolling basis.
"""

from awsbeats_spark import registry
from awsbeats_spark.operators.llm import (  # noqa: F401
    corpus,
    dedup,
    multimodal,
    retrieval,
    similarity,
    text,
)
from awsbeats_spark.operators import (  # noqa: F401
    quality,
    udtf,
    relational,
    windows,
    setops,
    sqlfuncs,
    streaming_batch,
    scale,
    profiling,
    timeseries,
    tpch_more,
    aggregates,
    extended,
    graph,
    joins,
    pipeline,
    geo,
)

_ROUND3_WINDOW = [
    # 8 fixed-but-red from rounds 1-2 (need fresh driver evidence)
    "partition_key_xid",
    "join_asof_nearest",
    "sink_kinesis_batched_retry",
    "agg_percentile_approx",
    "corpus_filter_funnel",
    "dq_constraint_violations",
    "dq_duplicate_keys",
    "dq_freshness_watermark",
    # relational (never checked)
    "scan_parquet",
    "filter_predicate",
    "filter_regex",
    "project_record",
    "scalar_json",
    "scalar_string",
    "scalar_date",
    "scalar_math",
    "sort_limit",
    "q_flagship_revenue_by_nation",
    "scalar_hash",
    "sort_nulls_ordering",
    "scalar_array",
    "scan_partition_pruned",
    "scan_schema_evolution",
    # windows (never checked)
    "window_topn_rank",
    "window_lag_lead",
    "window_running_sum",
    "window_rank_dense",
    "window_moving_avg",
    "window_range_frame",
    "window_sessionize_gap",
    "window_sliding_distinct",
    # setops (never checked)
    "set_union",
    "set_intersect",
    "set_except",
    # sqlfuncs (never checked)
    "agg_conditional_bools",
    "agg_regression_by_group",
    "scalar_higher_order",
    "scalar_sequence_months",
    "lateral_posexplode",
    "scalar_array_setops",
    "cdc_apply_tombstones",
    "scalar_variant_json",
    "scalar_interval_math",
    "agg_string_concat_ordered",
    # stragglers (never checked)
    "json_parse_promote",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_watermark_dedup",
    "join_null_safe",
]

_ROUND4_BLOCK = [
    "agg_bitmap_distinct",
    "stream_stateful_totals",
    "agg_skew_salted",
    "join_skew_salted",
    "codec_json_roundtrip",
    "codec_csv_roundtrip",
    "q_market_share",
    "q_ship_priority",
    "agg_mode_argmax",
    "window_ntile_cume",
    "multimodal_feature_extract",
    "upsert_scd1",
    "lateral_explode_props",
    "q_small_qty_revenue",
    "q_returned_items",
    "sample_hash_deterministic",
    "events_funnel",
    "dedup_latest_per_key",
    "codec_orc_roundtrip",
    "profile_columns",
    "profile_columns_approx",
    "scd2_history_intervals",
    "ts_gap_fill_ffill",
    "ts_ohlc_hourly",
    "events_retention_cohort",
    "ts_anomaly_mad",
    "orders_open_backlog",
    "ts_ewma",
    "ts_interpolate_linear",
    "events_rfm_segmentation",
    "q_promo_revenue_ratio",
    "q_large_volume_customers",
    "q_customer_distribution",
    "q_volume_shipping",
    "q_product_profit_by_nation",
    "q_top_supplier",
    "q_important_suppliers",
    "q_rich_inactive_customers",
    "q_disjunctive_brand_filter",
    "q_shipmode_priority",
    "q_waiting_suppliers",
    "q_min_cost_supplier",
    "q_dominant_part_suppliers",
    "events_attribution_last_touch",
    "events_pattern_match",
]


_ROUND5_FRONT = [
    "retrieval_bm25_topk",
    "retrieval_query_likelihood",
    "retrieval_rrf_hybrid",
    "text_hashed_bow",
    "join_dynamic_in_pushdown",
    "part_skyline_pareto",
    "agg_decimal_exact_sum",
    "dedup_semantic_cluster",
    "agg_weighted_percentile",
    "ts_seasonal_decompose",
    "events_lateness_stats",
    "dedup_incremental_merge",
    "observability_observe_inline",
    "dedup_ngram_df_capped",
]


def _reorder() -> None:
    priority = _ROUND3_WINDOW + _ROUND4_BLOCK + _ROUND5_FRONT
    if len(set(priority)) != len(priority):
        dupes = sorted({n for n in priority if priority.count(n) > 1})
        raise ValueError(f"rotation lists overlap: {dupes}")
    missing = [n for n in priority if n not in registry.QUERIES]
    if missing:
        raise ValueError(f"rotation names not registered: {missing}")
    rest = [n for n in registry.QUERIES if n not in set(priority)]
    ordered = {n: registry.QUERIES[n] for n in priority + rest}
    registry.QUERIES.clear()
    registry.QUERIES.update(ordered)


_reorder()
