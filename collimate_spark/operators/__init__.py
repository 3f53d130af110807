"""Operator modules. Each module exposes

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLES: dict[str, str]`` — DuckDB-runnable SQL, same column names

``all_queries()`` / ``all_oracles()`` merge every module for the driver
entry point (``__spark_entry__.py``).

Registration order is load-bearing: the driver's CORRECTNESS gate checks
the FIRST 50 entries of the merged dict. ``DRIVER_PRIORITY`` pins which 50
land in that window — the training-data-pipeline operators (dedup /
similarity / textstats / multimodal / udx) first, then the most
informative one-per-operator relational / join / window / event queries.
Everything else (already driver-verified green in round 1) registers
after slot 50 and stays covered by tests/test_oracle_parity.py.

CACHE-LIFETIME CONTRACT (covers every caching operator — the dedup
family, market_basket_rules, encoding_advisor_lineitem, asof_join
carry frames, kcore/graph edge lists, gdpr/ppjoin gated key sets, and
any other operator caching ``.cache()``-style internally): operators
cache per-query scratch frames and deliberately do NOT unpersist them,
because the returned DataFrame's lineage still references the cached
frame — an eager unpersist would silently recompute it on collect.
Every such frame is registered via ``collimate_spark.scratch.scache``
(``df.transform(scache)``), so callers running MANY queries in one
session (the driver's verify loop, bench.py, notebooks) release them
between queries with ``collimate_spark.scratch.clear_scratch()`` — or
wrap each query in ``with scratch_caches():`` — WITHOUT touching their
own cached frames. ``spark.catalog.clearCache()`` remains a valid
blunt superset. bench.py calls ``clear_scratch()`` between queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The 50 queries the driver verifies, in order. Keep this list at exactly
# 50 entries; tests/test_registration.py enforces the invariant.
#
# Round-7 window (VERDICT r6 directive #1): with the never-driver-checked
# queue at ZERO after round 6, nothing forces rows-only entries into the
# window any more — so this round fields the first ALL-ORACLED window:
# every one of the 50 entries has a DuckDB oracle, targeting a clean
# 50x {rows_match, schema_match, hash_match} CORRECTNESS_r07 artifact.
# Composition, per the directive's weighting:
#   (a) the 45 oracled queries whose only driver green is r1/r2 vintage
#       (>=5 rounds old): the TPC-H one-shots, scalar/set-op/window
#       one-shots, core join shapes, and the r2 event pipelines;
#   (b) the judge-preferred oracled capstones (entity resolution,
#       curate_corpus, PIT join, PageRank);
#   (c) every query whose code changed this round:
#       countmin_word_frequencies (sketch tokenizer pinned to the ASCII
#       whitespace class, ADVICE r6) and the three scale-divergence
#       fixes the new sf0.1 mirror caught on its first run
#       (asof_join_nearest, time_weighted_average,
#       embedding_gram_matrix — see their in-window comments).
# Nine r2-vintage one-shots (join_cross/semi/anti, window_lag_lead,
# window_running_sum, sliding_window_agg, grouped_zscore,
# date_spine_fill, pivot_event_counts) didn't fit the 50 slots; they
# stay in ROTATION_CANDIDATES and in the sf0.001+sf0.01+sf0.1 parity
# mirrors.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- changed this round: re-verify ---
    "countmin_word_frequencies",
    # --- judge-preferred oracled capstones ---
    "entity_resolution_customers",
    "curate_corpus",
    "pit_join_scd2",
    "pagerank_copurchase",
    # --- r1/r2-vintage re-verifications: TPC-H one-shots ---
    "q1_pricing_summary",
    "q2_cheapest_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q10_returned_items",
    "q11_important_parts",
    "q12_shipmode_priority",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q22_idle_rich_customers",
    # --- r1-vintage: aggregation shapes ---
    "agg_argmax",
    "agg_cube",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_rollup",
    "agg_stats",
    "agg_percentile",
    # --- r1-vintage: scalar / set-op / sort one-shots ---
    "scalar_conditional",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_string_funcs",
    "set_ops",
    "sort_topk",
    "subquery_exists",
    "unpivot_lineitem",
    # --- r2-vintage: joins, events, windows ---
    "asof_join_events_orders",
    "range_join_events_orders",
    "join_left_outer",
    "join_full_outer",
    "join_theta_inequality",
    "json_extract_events",
    "pack_sequences",
    "decontaminate_ngram",
    "asof_join_nearest",  # gap_s integer-micros rounding (sf0.1 mirror find)
    "time_weighted_average",  # decimal-exact weighted sums (sf0.1 mirror find)
    "embedding_gram_matrix",  # -0.0 canonicalization (sf0.1 mirror find)
    "tumbling_window_agg",
    "window_range_frame",
    "window_rank_dense_ntile",
    "window_topk_per_group",
)

# Queries registered but outside the 50-slot window — the complement of
# DRIVER_PRIORITY over the full 217-query surface. Every entry here has
# been driver-checked green at least once (rounds 1-6; never-checked
# queue emptied in round 6) and stays covered by the parity suite at
# sf0.001 + sf0.01 (tests/test_oracle_parity.py) and the sf0.1 mirror
# (pytest -m sf01). tests/test_registration.py accepts a north-star
# query being here instead of in the window — but ONLY here, so the
# exemption is explicit and reviewed. One entry per line.
ROTATION_CANDIDATES: tuple[str, ...] = (
    "grouped_zscore",
    "date_spine_fill",
    "pivot_event_counts",
    "try_functions_safety",
    "map_hof_functions",
    "union_by_name_evolution",
    "collated_group_count",
    "xml_roundtrip_stats",
    "variant_props_stats",
    "kcore_membership",
    "ann_pq_topk",
    "kmeans_lloyd_clusters",
    "hll_sketch_partitioned",
    "multimodal_image_resize",
    "multimodal_frame_sample",
    "embedding_jl_projection",
    "approx_top_k_words",
    "hll_native_distinct",
    "approx_percentile_error",
    "hll_intersection_users",
    "market_basket_rules",
    "agg_percentile_disc",
    "heavy_hitters_words",
    "gdpr_erasure_audit",
    "multimodal_image_dhash_pairs",
    "multimodal_audio_fingerprint_pairs",
    "multimodal_video_scene_cuts",
    "dedup_minhash_lsh",
    "dedup_connected_components",
    "dedup_survivor_best_quality",
    "set_overlap_join_prefix",
    "ann_bruteforce_topk",
    "corpus_pipeline_funnel",
    "scd2_user_segments",
    "merge_upsert_orders",
    "ivm_incremental_agg",
    "attribution_multitouch",
    "kaplan_meier_retention",
    "fifo_allocation",
    "concurrent_sessions_timeline",
    "cusum_changepoints",
    "inverted_index_postings",
    "chunk_documents",
    "domain_mix_temperature",
    "psi_price_drift",
    "rfm_segmentation",
    "bm25_search",
    "cohort_retention",
    "agg_boolean_counting",
    "set_ops_all",
    "rollup_grouping_id",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    "yoy_revenue_growth",
    "window_distribution_ranks",
    "window_running_sum",
    "window_lag_lead",
    "join_semi",
    "join_anti",
    "join_cross",
    "fuzzy_name_match",
    "salted_join_hot_key",
    "asof_join_forward",
    "join_null_safe",
    "bloom_prefilter_join",
    "geo_radius_join_grid",
    "join_skew_diagnostics",
    "sliding_window_agg",
    "sessionization_gap",
    "funnel_conversion",
    "interpolate_missing_values",
    "hypertable_rollup",
    "ohlc_bars",
    "top_event_paths",
    "session_window_agg",
    "sliding_distinct_users",
    "conversion_time_quantiles",
    "session_window_dynamic_gap",
    "longest_daily_streak",
    "new_vs_returning_daily",
    "grouped_arrow_profile",
    "agg_mode_deterministic",
    "array_agg_sorted",
    "chi2_event_value",
    "corr_matrix_lineitem",
    "pandas_udf_scalar",
    "udtf_tokenize",
    "udtf_parse_props",
    "grouped_agg_gini",
    "listagg_supplier_names",
    "bitmap_distinct_counts",
    "map_functions",
    "array_functions",
    "agg_approx_distinct",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh_expr",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_containment",
    "block_dedup_stats",
    "ann_range_search",
    "embedding_cluster_cohesion",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_ivfpq_topk",
    "embedding_quantize_int8",
    "embedding_dim_stats",
    "text_quality_metrics",
    "lang_id_heuristic",
    "doc_fingerprint",
    "winnow_fingerprint_pairs",
    "text_length_histogram",
    "text_pii_scrub",
    "repetition_metrics",
    "stratified_sample_documents",
    "tfidf_top_terms",
    "quality_filter_pipeline",
    "lm_perplexity_score",
    "collocation_pmi",
    "zipf_slope",
    "char_entropy",
    "bpe_merge_candidates",
    "lang_id_confusion",
    "multimodal_metadata",
    "multimodal_features",
    "multimodal_image_features",
    "multimodal_audio_features",
    "multimodal_video_features",
    "shard_export_assignment",
    "weighted_sample_documents",
    "bottomk_sample_per_group",
    "train_val_test_split",
    "data_quality_report",
    "snapshot_diff",
    "k_anonymity_report",
    "table_profile_lineitem",
    "benford_first_digit",
    "referential_integrity_report",
    "order_total_reconciliation",
    "rolling_median_value",
    "ewma_value",
    "anomaly_zscore",
    "markov_transitions",
    "dow_seasonality",
    "acf_daily_events",
    "winsorize_stats",
    "skyline_suppliers",
    "zorder_cluster_stats",
    "partition_advisor_orders",
    "encoding_advisor_lineitem",
    "triangle_participation",
    "bfs_distances",
    "degree_assortativity",
    "regr_price_trend",
    "pareto_revenue_share",
    "quantile_sketch_value",
    "price_histogram",
    "ab_test_welch",
    "mad_outliers",
    "bootstrap_mean_ci",
    "mutual_information_value",
)

def _modules():
    from collimate_spark.operators import (
        relational,
        tpch_ext,
        windows,
        joins,
        events,
        grouped,
        udx,
        dedup,
        similarity,
        textstats,
        multimodal,
        curation,
        quality,
        timeseries,
        dataeng,
        graph,
        stats,
    )

    return (
        relational,
        tpch_ext,
        windows,
        joins,
        events,
        grouped,
        udx,
        dedup,
        similarity,
        textstats,
        multimodal,
        curation,
        quality,
        timeseries,
        dataeng,
        graph,
        stats,
    )


def _ordered(merged: dict) -> dict:
    missing = [n for n in DRIVER_PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"DRIVER_PRIORITY names not registered: {missing}")
    out = {n: merged[n] for n in DRIVER_PRIORITY}
    out.update({n: v for n, v in merged.items() if n not in out})
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return _ordered(merged)


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLES)
    # oracles are keyed lookups (order-insensitive), but keep the same
    # order as all_queries() for readability of driver artifacts
    out = {n: merged[n] for n in DRIVER_PRIORITY if n in merged}
    out.update({n: v for n, v in merged.items() if n not in out})
    return out
