import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Long end-to-end / composition / property tests (≥ ~6 s in the
# r7 duration profile; regenerate with `pytest --durations=0`).
# They are deselected by the default `-m "not slow"` addopts so the
# per-round driver verification stays inside its time budget
# (VERDICT r6 next #8); run EVERYTHING with
#   python -m pytest tests/ -m "slow or not slow"
# Every feature these cover end-to-end is also exercised per-round by
# tools/gate_check.py (the DuckDB-oracle correctness gates), so the
# default path trades redundant minutes, not coverage.
SLOW_TESTS = {
    "test_compact_merge_folds_routed_tombstones",
    "test_routed_streaming_deltas_org_scoped",
    "test_filter_facets_deletes_match_oracle",
    "test_build_many_kill_resume_converges",
    "test_triple_composition_routed_multifield_streaming",
    "test_compact_merge_routed_generations",
    "test_nightly_rotate_two_full_cycles",
    "test_build_many_rank_identical_to_solo",
    "test_build_many_routed_and_multifield",
    "test_compact_merge_routed_segment_table_never_collected",
    "test_combined_search_join_org_scoped",
    "test_build_many_job_count_independent_of_index_count",
    "test_combined_phrase_org_and_match_docids",
    "test_combined_match_docids_org",
    "test_multifield_streaming_deltas_field_scoped",
    "test_nightly_rotate_routed_generation",
    "test_compact_merge_folds_tombstones",
    "test_compact_merge_random_corpora_property",
    "test_compact_merge_document_identical_to_rebuild",
    "test_compact_merge_refuses_mixed_and_mismatched",
    "test_search_join_phrase_matches_phrase_topk",
    "test_pages_org_scoped",
    "test_murmur2_batch_tagging_throughput",
    "test_compact_merge_multifield_generations",
    "test_search_join_after_cols_pages",
    "test_org_ranges_contiguous_and_equal_to_set_path",
    "test_min_should_match",
    "test_ann_append_matches_scan_over_union",
    "test_legacy_routed_stats_span_derived",
    "test_partial_then_resume_equals_clean_build",
    "test_combined_search_join_matches_topk",
    "test_search_join_phrase_org_scoped",
    "test_combined_search_join_phrase",
    "test_combined_pages_with_deletes",
    "test_search_join_matches_topk",
    "test_or_wand_after_multiterm_parity",
    "test_all_surfaces_match_oracle_on_random_corpus",
    "test_min_should_match_batch_surfaces",
    "test_topk_many_matches_individual_topk",
    "test_search_join_org_scoped",
    "test_build_many_rerun_overwrites_and_cleans_staging",
    "test_lsh_buckets_high_dim_matches_numpy",
    "test_combined_local_twins",
    "test_pages_reconstruct_full_ranking",
    "test_combined_phrase_topk_matches_monolithic",
    "test_build_many_hetero_job_count_invariant",
    "test_simhash_plan_no_fanout_join",
    "test_cli_build_many_routed_and_resume_flags",
    "test_strip_first_occurrence_survives",
    "test_crash_between_data_write_and_manifest_commit",
    "test_ann_ivf_recall",
    "test_combined_must_not_with_tombstones",
    # second tier (the >= ~5 s band of the r7 default-path profile)
    "test_topk_rank_identical_to_oracle",
    "test_ann_ivf_matches_scan_path",
    "test_and_block_pruned_equals_exact",
    "test_org_ranges_guard_refuses_non_contiguous_layout",
    "test_build_many_zero_token_index_stays_readable",
    "test_band_sigs_match_per_band_packing",
    "test_search_join_multifield",
    "test_nightly_rotate_merge_fold",
    "test_wand_equals_exact_at_various_k",
    "test_build_many_empty_index_is_readable",
    "test_compact_drops_tombstones",
    "test_routed_build_and_org_scoped_search",
    "test_embedding_dup_pairs_lsh_high_dim",
    "test_match_docids_org_scoped",
    "test_lsh_candidates_verified_by_jaccard",
    "test_combined_search_distributed_matches_local",
    "test_combined_equals_monolithic_and_tombstones",
}


def pytest_collection_modifyitems(config, items):
    for it in items:
        base = it.name.split("[", 1)[0]
        if base in SLOW_TESTS:
            it.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    from sparkfts.session import get_spark
    s = get_spark(master="local[4]", app="sparkfts-tests",
                  shuffle_partitions=8)
    yield s
    s.stop()
