"""Registry contract: ``all_queries()`` enumerates the
CERTIFICATION_MANIFEST first (the documented public iteration
order), every manifest name carries a full oracle, and every SURVEY
§2 capability group holds a certified row — in the manifest prefix
or in the union ledger of prior externally-certified rounds
(COVERAGE.md). The r1/r2 gap was whole capabilities (similarity,
text, multimodal, UDF) that had never been certified at all.
"""

from __future__ import annotations

from galaxy_spark.registry import (
    CERTIFICATION_MANIFEST,
    all_oracles,
    all_queries,
)

#: capability -> names that can represent it (every §2.2 row + the
#: §2.1 CDC chain)
CAPABILITY_REPRESENTATIVES = {
    "cdc": ["cdc_change_summary", "cdc_projection_update"],
    "ddl_evolution": ["cdc_ddl_evolution"],
    "scan_agg": ["q1_pricing_summary"],
    "sort_limit": ["q3_shipping_priority"],
    "join_inner_broadcast": ["join_revenue_by_nation"],
    "join_anti": ["join_anti_customers_without_orders"],
    "join_semi": ["join_semi_active_suppliers"],
    "join_full": ["join_full_outer_nation_balance"],
    "join_asof": ["join_asof_latest_order"],
    "join_range": ["join_range_followup_events"],
    "agg_rollup": ["agg_rollup_region_nation"],
    "agg_pivot": ["agg_pivot_status_by_priority"],
    "agg_decimal": ["agg_decimal_exact_revenue"],
    "agg_approx": ["agg_approx_distinct"],
    "window": ["window_topk_customers_per_nation",
               "window_running_revenue"],
    "setops": ["setops_part_brands"],
    "scalar_fns": ["scalar_functions_showcase"],
    "events_json": ["events_json_extract"],
    "streaming_windows": ["events_tumbling_window",
                          "events_sessionization"],
    "dedup_exact": ["dedup_exact_documents"],
    "dedup_jaccard": ["dedup_ngram_jaccard"],
    "dedup_minhash": ["dedup_minhash_lsh"],
    "dedup_simhash": ["dedup_simhash"],
    "dedup_embedding": ["dedup_embedding_cosine",
                        "dedup_embedding_cosine_lsh"],
    "text_stats": ["text_stats_documents"],
    "text_quality": ["text_quality_scores"],
    "text_langid": ["text_language_id"],
    "text_fingerprint": ["text_fingerprint"],
    "text_bpe": ["text_token_bpe"],
    "text_vocab": ["text_vocabulary_topk"],
    "text_tfidf": ["text_tfidf_top_term"],
    "similarity_exact": ["similarity_cosine_topk",
                         "similarity_cosine_topk_gemm"],
    "similarity_lsh": ["similarity_lsh_topk"],
    "similarity_ivf": ["similarity_ivf_topk"],
    "udf_surface": ["udf_grouped_token_totals"],
    "pipeline": ["pipeline_llm_preprocess"],
    "sampling": ["sample_stratified_documents"],
    "dedup_clustering": ["dedup_cluster_canonical"],
    "quality_rules": ["quality_gopher_rules"],
    "quality_lm": ["quality_unigram_logprob"],
    "packing": ["pack_sequences_greedy"],
    "corpus_stats": ["tokens_histogram_pow2"],
    "global_shuffle": ["shuffle_global_deterministic"],
    "mixture_balancing": ["mixture_resample_balanced"],
    "embedding_clustering": ["embeddings_kmeans_clusters"],
    "dedup_semantic": ["dedup_semantic_clusters"],
    "quality_repetition": ["quality_repetition_ratio"],
    "curation_pipeline": ["pipeline_curation_end2end"],
    "multimodal": ["multimodal_inventory", "multimodal_image_features",
                   "multimodal_audio_features", "multimodal_frame_sample",
                   "multimodal_resize_pipeline"],
}

MANIFEST_LEN = 50

#: rotated out of the manifest prefix in r4 after holding external
#: certification rows in prior rounds with their code untouched
#: (all seven additions below were in the r3 manifest, checked
#: 50/50 green) — the union ledger (COVERAGE.md) records those
#: rows; their oracles still run every round via
#: tests/test_oracle.py
UNION_CERTIFIED_ROTATED_OUT = {
    "agg_rollup_region_nation",
    "window_running_revenue",
    "cdc_projection_insert",
    "cdc_projection_delete",
    "join_anti_customers_without_orders",
    "join_semi_active_suppliers",
    "agg_pivot_status_by_priority",
    "text_language_id",
    "text_fingerprint",
    "setops_part_brands",
    "cdc_filter_include_exclude",
    "events_tumbling_window",
    "agg_approx_distinct",
}


def test_prefix_is_exactly_the_manifest():
    names = list(all_queries())
    assert len(CERTIFICATION_MANIFEST) == MANIFEST_LEN
    assert len(set(CERTIFICATION_MANIFEST)) == MANIFEST_LEN, "duplicates"
    assert names[:MANIFEST_LEN] == list(CERTIFICATION_MANIFEST)
    # oracles iterate in the same order (the driver zips the dicts)
    assert list(all_oracles())[:MANIFEST_LEN] == list(CERTIFICATION_MANIFEST)


def test_every_manifest_query_has_full_oracle():
    oracles = all_oracles()
    missing = [n for n in CERTIFICATION_MANIFEST if n not in oracles]
    assert not missing, f"manifest queries without oracles: {missing}"


def test_every_capability_certified_in_manifest_or_union():
    certified = set(CERTIFICATION_MANIFEST) | UNION_CERTIFIED_ROTATED_OUT
    uncovered = {cap: reps
                 for cap, reps in CAPABILITY_REPRESENTATIVES.items()
                 if not certified & set(reps)}
    assert not uncovered, f"capabilities with no certified row: {uncovered}"


def test_r4_rotation_landed():
    """The two never-certified exact tiers sit in the manifest
    prefix; the rotated-out (triple-certified) rows stay registered
    with full oracles past it."""
    names = list(all_queries())
    prefix, rest = set(names[:MANIFEST_LEN]), set(names[MANIFEST_LEN:])
    assert {"similarity_cosine_topk", "dedup_embedding_cosine"} <= prefix
    assert UNION_CERTIFIED_ROTATED_OUT <= rest
    oracles = all_oracles()
    assert all(n in oracles for n in rest), \
        [n for n in rest if n not in oracles]
