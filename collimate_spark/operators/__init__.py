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
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The 50 queries the driver verifies, in order. Keep this list at exactly
# 50 entries; tests/test_registration.py enforces the invariant.
DRIVER_PRIORITY: tuple[str, ...] = (
    # dedup (8; survivor-quality new in r3)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_expr",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_connected_components",
    "dedup_survivor_best_quality",
    # similarity (3)
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    # text analysis (6)
    "text_quality_metrics",
    "lang_id_heuristic",
    "doc_fingerprint",
    "winnow_fingerprint_pairs",
    "text_length_histogram",
    "text_pii_scrub",
    # curation (1; pack_sequences + decontaminate_ngram rotated out —
    # both hash-green r2)
    "curate_corpus",
    # multimodal (4; audio is new in r3 — first driver check this round)
    "multimodal_metadata",
    "multimodal_features",
    "multimodal_image_features",
    "multimodal_audio_features",
    # UDF / UDTF / map+array / sketches (5)
    "pandas_udf_scalar",
    "udtf_tokenize",
    "map_functions",
    "array_functions",
    "agg_approx_distinct",
    # Round-3 rotation: the 16 queries below had never had a driver
    # CORRECTNESS row in rounds 1-2 (VERDICT r2 "What's missing" #2); they
    # replace 16 queries hash-green in BOTH r1 and r2 (join_* six,
    # windows five, q1/q3, tumbling/sliding/pivot), which register past
    # slot 50 and stay covered by tests/test_oracle_parity.py.
    # quality + curation + events extensions (5)
    "data_quality_report",
    "snapshot_diff",
    "funnel_conversion",
    "interpolate_missing_values",
    "fuzzy_name_match",
    # textstats extensions (3)
    "repetition_metrics",
    "stratified_sample_documents",
    "tfidf_top_terms",
    # similarity + agg extensions (2)
    "embedding_quantize_int8",
    "array_agg_sorted",
    # TPC-H never-checked (6)
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q20_excess_shippers",
    # events (sessionization has never been green — its fix lands this
    # round; date_spine_fill rotated out, double-green r1+r2)
    "sessionization_gap",
    # new in round 3 — first driver check (replacing q12/json/asof/range/
    # grouped_zscore/agg_percentile, all with >=1 green driver row in
    # r1-r2; after this round every registered query has had one)
    "q21_waiting_suppliers",
    "cohort_retention",
    "hypertable_rollup",
    "bm25_search",
    "shard_export_assignment",
    "quality_filter_pipeline",
)

# Round-4 rotation candidates: registered late in round 3, never
# driver-checked (all green in tests/test_oracle_parity.py at sf0.001 AND
# sf0.01). Swap these into the window next round, rotating out queries
# green in 2+ driver rounds. tests/test_registration.py accepts a
# north-star query being here instead of in the window — but ONLY here,
# so the exemption is explicit and reviewed.
#
# There are now MORE candidates than one 50-slot window absorbs; round-4
# priority order: (1) capstones + novel algorithm families first
# (entity_resolution_customers, pit_join_scd2, set_overlap_join_prefix,
# ann_ivfpq_topk, heavy_hitters_words, cusum_changepoints, bfs_distances,
# inverted_index_postings, chunk_documents, domain_mix_temperature,
# psi_price_drift, rfm_segmentation, regr_price_trend, grouped_agg_gini,
# udtf_parse_props, grouped_arrow_profile, sliding_distinct_users,
# join_null_safe, set_ops_all, quantile_sketch_value, price_histogram,
# k_anonymity_report, table_profile_lineitem, benford_first_digit,
# pareto_revenue_share, multimodal_video_features) plus the post-closing
# continuation waves (bloom_prefilter_join, geo_radius_join_grid,
# join_skew_diagnostics, kaplan_meier_retention, bootstrap_mean_ci,
# corpus_pipeline_funnel, attribution_multitouch, zorder_cluster_stats,
# fifo_allocation, train_val_test_split, bpe_merge_candidates,
# lang_id_confusion, gdpr_erasure_audit, concurrent_sessions_timeline),
# then (2) the older r3 second-wave block; anything still unrotated after
# round 4 queues for round 5 — every entry stays covered by the
# sf0.001+sf0.01 parity suite meanwhile.
ROTATION_CANDIDATES: tuple[str, ...] = (
    "salted_join_hot_key",
    "asof_join_forward",
    "lm_perplexity_score",
    "embedding_cluster_cohesion",
    "ohlc_bars",
    "time_weighted_average",
    "rolling_median_value",
    "ewma_value",
    "anomaly_zscore",
    "markov_transitions",
    "scd2_user_segments",
    "merge_upsert_orders",
    "winsorize_stats",
    "skyline_suppliers",
    "ivm_incremental_agg",
    "triangle_participation",
    "pagerank_copurchase",
    "collocation_pmi",
    "zipf_slope",
    "char_entropy",
    "weighted_sample_documents",
    "chi2_event_value",
    "embedding_gram_matrix",
    "kmeans_lloyd_clusters",  # rows-only
    "hll_sketch_partitioned",  # rows-only
    "top_event_paths",
    "market_basket_rules",
    "corr_matrix_lineitem",
    "embedding_dim_stats",
    "session_window_agg",
    "yoy_revenue_growth",
    "regr_price_trend",
    "rfm_segmentation",
    "pareto_revenue_share",
    "heavy_hitters_words",
    "cusum_changepoints",
    "chunk_documents",
    "domain_mix_temperature",
    "ann_pq_topk",  # rows-only
    "multimodal_video_features",  # rows-only
    "inverted_index_postings",
    "pit_join_scd2",
    "join_null_safe",
    "quantile_sketch_value",  # rows-only
    "udtf_parse_props",
    "set_overlap_join_prefix",
    "bfs_distances",
    "price_histogram",
    "k_anonymity_report",
    "entity_resolution_customers",
    "multimodal_image_resize",  # rows-only
    "multimodal_frame_sample",  # rows-only
    "grouped_agg_gini",
    "sliding_distinct_users",
    "ann_ivfpq_topk",  # rows-only
    "ann_range_search",
    "grouped_arrow_profile",
    "table_profile_lineitem",
    "benford_first_digit",
    "embedding_jl_projection",  # rows-only
    "set_ops_all",
    "psi_price_drift",
    "countmin_word_frequencies",  # rows-only
    "union_by_name_evolution",
    "variant_props_stats",
    "xml_roundtrip_stats",
    "collated_group_count",
    "listagg_supplier_names",
    "approx_top_k_words",  # rows-only
    "try_functions_safety",
    "map_hof_functions",
    "conversion_time_quantiles",
    "bitmap_distinct_counts",
    "hll_native_distinct",  # rows-only
    "session_window_dynamic_gap",
    "rollup_grouping_id",
    "agg_percentile_disc",
    "agg_mode_deterministic",
    "asof_join_nearest",
    # ninth wave (post-closing continuation)
    "kaplan_meier_retention",
    "ab_test_welch",
    "mad_outliers",
    "bloom_prefilter_join",
    "geo_radius_join_grid",
    "referential_integrity_report",
    "attribution_multitouch",
    "bottomk_sample_per_group",
    "zorder_cluster_stats",
    "fifo_allocation",
    "gdpr_erasure_audit",
    "dow_seasonality",
    "acf_daily_events",
    "train_val_test_split",
    "join_skew_diagnostics",
    "bpe_merge_candidates",
    "longest_daily_streak",
    "approx_percentile_error",  # rows-only
    "lang_id_confusion",
    "corpus_pipeline_funnel",
    "bootstrap_mean_ci",
    "concurrent_sessions_timeline",
    "new_vs_returning_daily",
    "mutual_information_value",
    "dedup_containment",
    "block_dedup_stats",
    "hll_intersection_users",  # rows-only
    "order_total_reconciliation",
    "partition_advisor_orders",
    "encoding_advisor_lineitem",
    "multimodal_image_dhash_pairs",  # rows-only
    "multimodal_audio_fingerprint_pairs",  # rows-only
    "multimodal_video_scene_cuts",  # rows-only
    "kcore_membership",  # rows-only
    "degree_assortativity",
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
