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
# Round-8 window (VERDICT r7 directive #3): second consecutive all-oracled
# window, rotated to the queries whose last vanilla-driver contact is
# OLDEST — the r2-vintage one-shots that missed the r7 cut, the full
# r3-vintage dedup/text/curation/TPC-H wave, and the oldest r4 entries —
# plus rule (c), every query whose code changed this round:
#   dedup_containment (src-side prefix-filtered candidates, directive #1),
#   window_range_frame (two_level scale mode added behind a kwarg; the
#   registered single-level plan is equivalence-pinned to it), and
#   grouped_zscore_native (NEW, directive #6: the production JVM window
#   twin of the applyInPandas demo — never driver-checked), and
#   semdedup_prune (NEW mid-round: SemDeDup-style semantic pruning —
#   cluster-blocked cosine pairs → CC groups → keep the
#   lowest-centroid-cosine member; displaced bootstrap_mean_ci (r4) to
#   the rotation queue behind bpe_merge_candidates), and
#   dup_span_coverage (NEW mid-round: Lee et al. 2022 unaligned
#   repeated-substring coverage; displaced bloom_prefilter_join (r4),
#   also queued for r9).
# Every entry has a DuckDB oracle and a bench row (invariant pinned by
# tests/test_registration.py). bpe_merge_candidates (r4) was displaced by
# window_range_frame and stays first in line for r9.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- changed this round: re-verify ---
    "dedup_containment",
    "window_range_frame",
    "grouped_zscore_native",
    "semdedup_prune",
    "dup_span_coverage",
    # --- r2-vintage one-shots that missed the r7 cut ---
    "date_spine_fill",
    "grouped_zscore",
    "join_anti",
    "join_cross",
    "join_semi",
    "pivot_event_counts",
    "sliding_window_agg",
    "window_lag_lead",
    "window_running_sum",
    # --- r3-vintage wave: dedup/text/curation/TPC-H ---
    "array_agg_sorted",
    "array_functions",
    "data_quality_report",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_minhash_lsh_expr",
    "dedup_ngram_jaccard",
    "doc_fingerprint",
    "embedding_quantize_int8",
    "funnel_conversion",
    "fuzzy_name_match",
    "hypertable_rollup",
    "interpolate_missing_values",
    "lang_id_heuristic",
    "map_functions",
    "multimodal_metadata",
    "pandas_udf_scalar",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "quality_filter_pipeline",
    "repetition_metrics",
    "shard_export_assignment",
    "snapshot_diff",
    "stratified_sample_documents",
    "text_length_histogram",
    "text_pii_scrub",
    "text_quality_metrics",
    "tfidf_top_terms",
    "udtf_tokenize",
    # --- r4-vintage, oldest first-in ---
    "benford_first_digit",
    "bfs_distances",
)

# Queries registered but outside the 50-slot window — the complement of
# DRIVER_PRIORITY over the full 218-query surface. Every entry here has
# been driver-checked green at least once (rounds 1-7) and stays covered
# by the parity suite at sf0.001 + sf0.01 (tests/test_oracle_parity.py)
# and the sf0.1 mirror (pytest -m sf01). tests/test_registration.py
# accepts a north-star query being here instead of in the window — but
# ONLY here, so the exemption is explicit and reviewed. One entry per
# line.
ROTATION_CANDIDATES: tuple[str, ...] = (
    "bootstrap_mean_ci",
    "bloom_prefilter_join",
    "countmin_word_frequencies",
    "entity_resolution_customers",
    "curate_corpus",
    "pit_join_scd2",
    "pagerank_copurchase",
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
    "agg_argmax",
    "agg_cube",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_rollup",
    "agg_stats",
    "agg_percentile",
    "scalar_conditional",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_string_funcs",
    "set_ops",
    "sort_topk",
    "subquery_exists",
    "unpivot_lineitem",
    "asof_join_events_orders",
    "range_join_events_orders",
    "join_left_outer",
    "join_full_outer",
    "join_theta_inequality",
    "json_extract_events",
    "pack_sequences",
    "decontaminate_ngram",
    "asof_join_nearest",
    "time_weighted_average",
    "embedding_gram_matrix",
    "tumbling_window_agg",
    "window_rank_dense_ntile",
    "window_topk_per_group",
    "agg_boolean_counting",
    "set_ops_all",
    "union_by_name_evolution",
    "rollup_grouping_id",
    "yoy_revenue_growth",
    "window_distribution_ranks",
    "salted_join_hot_key",
    "asof_join_forward",
    "join_null_safe",
    "geo_radius_join_grid",
    "join_skew_diagnostics",
    "sessionization_gap",
    "cohort_retention",
    "ohlc_bars",
    "top_event_paths",
    "session_window_agg",
    "sliding_distinct_users",
    "variant_props_stats",
    "conversion_time_quantiles",
    "session_window_dynamic_gap",
    "attribution_multitouch",
    "longest_daily_streak",
    "concurrent_sessions_timeline",
    "new_vs_returning_daily",
    "grouped_arrow_profile",
    "agg_percentile_disc",
    "agg_mode_deterministic",
    "chi2_event_value",
    "corr_matrix_lineitem",
    "hll_intersection_users",
    "udtf_parse_props",
    "grouped_agg_gini",
    "xml_roundtrip_stats",
    "collated_group_count",
    "listagg_supplier_names",
    "approx_top_k_words",
    "try_functions_safety",
    "map_hof_functions",
    "bitmap_distinct_counts",
    "hll_native_distinct",
    "agg_approx_distinct",
    "hll_sketch_partitioned",
    "set_overlap_join_prefix",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_connected_components",
    "dedup_survivor_best_quality",
    "block_dedup_stats",
    "ann_bruteforce_topk",
    "ann_range_search",
    "embedding_jl_projection",
    "embedding_cluster_cohesion",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "kmeans_lloyd_clusters",
    "embedding_dim_stats",
    "winnow_fingerprint_pairs",
    "bm25_search",
    "lm_perplexity_score",
    "collocation_pmi",
    "zipf_slope",
    "char_entropy",
    "inverted_index_postings",
    "bpe_merge_candidates",
    "lang_id_confusion",
    "multimodal_features",
    "multimodal_image_features",
    "multimodal_audio_features",
    "multimodal_video_features",
    "multimodal_image_resize",
    "multimodal_frame_sample",
    "multimodal_image_dhash_pairs",
    "multimodal_audio_fingerprint_pairs",
    "multimodal_video_scene_cuts",
    "weighted_sample_documents",
    "chunk_documents",
    "domain_mix_temperature",
    "bottomk_sample_per_group",
    "train_val_test_split",
    "corpus_pipeline_funnel",
    "k_anonymity_report",
    "table_profile_lineitem",
    "psi_price_drift",
    "referential_integrity_report",
    "gdpr_erasure_audit",
    "order_total_reconciliation",
    "rolling_median_value",
    "ewma_value",
    "anomaly_zscore",
    "markov_transitions",
    "dow_seasonality",
    "acf_daily_events",
    "scd2_user_segments",
    "merge_upsert_orders",
    "winsorize_stats",
    "skyline_suppliers",
    "ivm_incremental_agg",
    "zorder_cluster_stats",
    "fifo_allocation",
    "partition_advisor_orders",
    "encoding_advisor_lineitem",
    "triangle_participation",
    "market_basket_rules",
    "kcore_membership",
    "degree_assortativity",
    "regr_price_trend",
    "rfm_segmentation",
    "pareto_revenue_share",
    "heavy_hitters_words",
    "cusum_changepoints",
    "quantile_sketch_value",
    "price_histogram",
    "kaplan_meier_retention",
    "ab_test_welch",
    "mad_outliers",
    "approx_percentile_error",
    "mutual_information_value",
    "ingest_typed_profile",
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
    from collimate_spark import ingest

    return (
        ingest,
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
