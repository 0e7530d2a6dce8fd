"""Query catalog — the engine's demonstrated SQL/operator surface.

Every entry here is one row of SURVEY.md §2's operator inventory, expressed
twice: a Spark implementation (DataFrame API or Spark SQL) and, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle string. The driver runs
both sides at sf=0.01 and hash-compares results — so every aggregate /
computed column is aliased identically on both sides, floats that can pick
up cross-engine accumulation-order noise are rounded/cast identically on
both sides, and every ORDER BY used under a LIMIT carries a unique
tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafusion_gpu_spark.aggregates import register_aggregates
from datafusion_gpu_spark.context import register_tables

QueryFn = Callable[[SparkSession, str], DataFrame]


def load(spark: SparkSession, sf_dir: str) -> SparkSession:
    """Register the star schema + custom aggregates for a query run."""
    register_tables(spark, sf_dir)
    register_aggregates(spark)
    return spark


def sql_query(statement: str) -> QueryFn:
    """Wrap a Spark SQL string as a (spark, sf_dir) -> DataFrame callable."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load(spark, sf_dir)
        return spark.sql(statement)

    return run


# Queries already green in a driver CORRECTNESS file (rounds 1-4). The driver
# gate checks at most 50 queries per round in registry order, so entries NOT in
# this set — the 23 remaining _LATE_FRESH names (round-4 additions that missed
# r4's pre-committed 50-slot budget) plus anything added in round 5 — are
# surfaced first until each query has a green driver row. 23 < 50, so round 5
# closes driver coverage over the whole catalog; the ~27 spare slots fall to
# round-5 additions appended to the END of _LATE_FRESH (never displacing a
# longer-waiting query), then to re-checks of already-green entries.
_DRIVER_CHECKED = frozenset({
    # -- green in CORRECTNESS_r04 (all 50 rows full green) --
    "events_multi_rollup", "multimodal_decode", "io_merge_upsert", "dedup_incremental",
    "curation_quantile_filter", "graph_pagerank", "sim_topk_ivf_kmeans_recall", "sim_mmr_rerank",
    "sim_quantize_int8", "text_lang_id", "text_tokens", "text_fingerprints",
    "text_pii_redact", "text_collocations", "text_winnowing", "text_repetition",
    "text_gopher_rules", "text_c4_rules", "text_contamination", "text_perplexity",
    "retrieval_bm25", "retrieval_tfidf", "text_chunks", "curation_mix_domains",
    "curation_shuffle", "curation_hash_split", "curation_dsir_resample", "curation_zorder_key",
    "curation_temperature_mix", "curation_weighted_sample", "curation_stratified_sample", "curation_pack_sequences",
    "agg_hll_sketch_union", "agg_cube", "agg_approx_error_bounded", "window_groups_frame_emulated",
    "window_exclude_current_emulated", "window_qualify_rewrite", "fn_alias_shims", "fn_null_semantics",
    "fn_udtf_split", "fn_url_pack", "fn_variant_json", "fn_edit_distance",
    "custom_sum_f32_sql_rewritten", "custom_sum_f32_unfused", "custom_sum_f32_global", "custom_sum_f32_scalable",
    "custom_sum_f32_dataframe_api", "events_scd2_history",
    # -- green in CORRECTNESS_r03 --
    "csv_scan_agg", "dedup_components", "dedup_embedding_cosine", "dedup_embedding_lsh",
    "dedup_exact", "dedup_lines", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_semantic", "dedup_simhash", "dedup_substring_spans", "events_anomalies",
    "events_asof", "events_gap_fill", "events_hopping", "events_interval_join",
    "events_salted_sum", "events_session_native", "events_sessionize", "events_tumbling",
    "events_winsorize", "io_compact_small_files", "io_copy_to_sql", "io_partitioned_parquet",
    "io_roundtrip_arrow", "io_roundtrip_csv", "io_roundtrip_json", "io_roundtrip_json_gzip",
    "io_roundtrip_orc", "io_schema_evolution", "multimodal_chunks", "multimodal_features",
    "pipeline_end_to_end", "retrieval_hard_negatives", "sim_bitext_margin", "sim_contrastive_triplets",
    "sim_knn_graph", "sim_topk_bruteforce", "sim_topk_ivf", "sim_topk_lsh",
    "sim_topk_pq", "sim_topk_vectorized", "source_python_datasource", "streaming_dedup_keys",
    "streaming_enriched_purchases", "streaming_session_counts", "streaming_tumbling_counts", "text_quality",
    "types_sum_parity",
    # -- green in CORRECTNESS_r01/r02 --
    "agg_approximate", "agg_bool_bit", "agg_collect_ordered", "agg_count_distinct",
    "agg_filter_clause", "agg_group_by_all", "agg_grouping_sets", "agg_median",
    "agg_min_max_by", "agg_rollup", "agg_statistical", "cte_recursive",
    "cte_values_join", "custom_sum_f32_grouped", "ddl_create_view", "distinct_on_latest_order",
    "explain_plan", "fn_array_pack", "fn_conditional", "fn_crypto_pack",
    "fn_date_bin", "fn_datetime_pack", "fn_json_extract", "fn_math_pack",
    "fn_regex_pack", "fn_string_pack", "fn_struct_map", "fn_unnest_wordcount",
    "join_anti_not_exists", "join_cross", "join_full_outer", "join_lateral_topk",
    "join_left_outer", "join_non_equi_band", "join_right_outer", "join_semi_api",
    "join_semi_exists", "join_sort_merge_hint", "pivot_orders", "set_except",
    "set_except_all", "set_intersect", "set_intersect_all", "set_union",
    "sort_limit_offset", "subquery_correlated", "subquery_in", "subquery_scalar",
    "table_function_range", "tpch_q10_returned_items", "tpch_q11_important_stock", "tpch_q12_priority_pivot",
    "tpch_q13_order_distribution", "tpch_q14_promo_share", "tpch_q15_top_supplier_view", "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_revenue", "tpch_q18_large_volume", "tpch_q19_disjunctive_pred", "tpch_q1_pricing_summary",
    "tpch_q20_excess_stock", "tpch_q21_waiting_supplier", "tpch_q22_inactive_customers", "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority", "tpch_q4_priority_exists", "tpch_q5_local_supplier", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share", "tpch_q9_profit_rollup", "unpivot_customer_metrics",
    "window_first_last_nth", "window_lag_lead", "window_percent_rank", "window_range_frame",
    "window_ranking", "window_rows_frame",
})


#: Rows-only entries (no oracle — weaker driver check) can wait a round.
_ROWS_ONLY = frozenset({"explain_plan", "agg_approximate"})

#: Gate entries with no driver CORRECTNESS row yet, in the order they wait:
#: round-4 additions that missed r4's 50-slot budget first, then round-5
#: additions appended at the END (so a new query can never displace a
#: longer-waiting one). Names promoted into _DRIVER_CHECKED are skipped by
#: the fresh filter, so a green row costs no edit here.
_LATE_FRESH = (
    "dedup_incremental_bloom",
    "text_heavy_hitters",
    "streaming_multi_rollup",
    "events_funnel",
    "events_retention",
    "streaming_stream_stream_join",
    "events_transitions",
    "events_top_paths",
    "sim_pca_contract",
    "multimodal_audio",
    "multimodal_frame_sample",
    "source_python_stream",
    "agg_bitmap_distinct",
    "agg_theta_setops",
    "agg_kll_quantiles",
    "pipeline_multimodal",
    "events_scd2_asof",
    "streaming_funnel",
    "io_snapshot_diff",
    "events_rfm",
    "events_ab_test",
    "fn_collation",
    "text_bpe_contract",
    "text_bpe_encode",
    # -- round-5 additions (append only) --
    "graph_triangle_count",
    "graph_degree_hist",
    "join_band_bucketed",
    "io_bucketed_join",
    "agg_mode_deterministic",
    "agg_regression",
    "multimodal_resize",
    "events_histogram",
    "events_anomaly_mad",
    "text_readability",
    "sim_random_projection",
    "text_bigram_lm",
    "streaming_histogram",
    "io_csv_quoted_multiline",
    "window_ignore_nulls",
    "sort_limit_with_ties",
    "agg_string_agg",
    "fn_bitwise_pack",
    "graph_common_neighbors",
    "graph_kcore",
    "agg_count_min_estimate",
    "dedup_url",
    "io_time_travel",
)

#: Core reference-surface families (SURVEY §2.1/§2.9) the driver has never
#: checked — ahead of the pipeline operators, which come ahead of variant
#: spellings whose siblings are already driver-green.
_CORE_PREFIXES = (
    "io_", "source_", "types_", "csv_", "events_", "streaming_",
    "multimodal_",
    "pipeline_",  # the end-to-end composition flagship
)
_PIPELINE_PREFIXES = ("dedup_", "sim_", "retrieval_", "text_", "curation_", "graph_")


def _gate_priority(name: str) -> int:
    if name in _LATE_FRESH:
        # after every pre-committed fresh tier; ordered within the tier
        return 4 + _LATE_FRESH.index(name)
    if name in _ROWS_ONLY:
        return 3
    if name.startswith(_CORE_PREFIXES):
        return 0
    if name.startswith(_PIPELINE_PREFIXES):
        return 1
    return 2


def _unchecked_first(registry: dict) -> dict:
    """Order so the driver's 50-query/round gate always lands on the
    entries with the least driver evidence: never-checked core surface,
    then never-checked pipeline operators, then never-checked variant
    spellings, then everything already green in a CORRECTNESS file.
    Sort is stable — registry (module) order breaks ties."""
    fresh = sorted(
        (k for k in registry if k not in _DRIVER_CHECKED), key=_gate_priority
    )
    seen = [k for k in registry if k in _DRIVER_CHECKED]
    return {k: registry[k] for k in (*fresh, *seen)}


def all_queries() -> dict[str, QueryFn]:
    registry: dict[str, QueryFn] = {}
    for mod in _modules():
        registry.update(mod.QUERIES)
    return _unchecked_first(registry)


def all_oracles() -> dict[str, str]:
    registry: dict[str, str] = {}
    for mod in _modules():
        registry.update(mod.ORACLES)
    return _unchecked_first(registry)


def _modules():
    from datafusion_gpu_spark.queries import (
        aggregates_q,
        custom_agg,
        io_q,
        pipeline,
        reference_tables,
        relational,
        scalar_fns,
        tpch,
        tpch_extra,
        tpch_full,
        windows,
    )

    return (
        tpch,
        tpch_extra,
        tpch_full,
        relational,
        aggregates_q,
        windows,
        scalar_fns,
        custom_agg,
        pipeline,
        reference_tables,
        io_q,
    )
