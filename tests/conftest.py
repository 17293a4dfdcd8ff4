import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")

#: Tests marked ``slow`` and excluded from the default run
#: (pytest.ini ``addopts = -m "not slow"``): the ≥ ~10 s soak /
#: lifecycle / property-sequence tail measured by a full
#: ``--durations`` run (r14; 638 tests, 36:37 total, of which these
#: ~17.5 min). Centralized HERE by base nodeid (parametrized
#: variants inherit) so the split lives in one place. The FULL suite
#: remains the release gate: ``python -m pytest tests/ -q -m ""``.
_SLOW_TESTS = {
    "tests/test_auto_compact.py::test_compaction_invisible_to_table_stream_and_replay_safe",
    "tests/test_auto_compact.py::test_delta_mor_churn_takes_full_optimize",
    "tests/test_auto_compact.py::test_delta_sink_compacts_trickle_once_past_threshold",
    "tests/test_auto_compact.py::test_iceberg_sink_compacts_trickle",
    "tests/test_auto_compact.py::test_ivm_refresh_compacts_target",
    "tests/test_cdf_stream.py::test_cdf_stream_default_serves_snapshot_then_changes",
    "tests/test_cdf_stream.py::test_cdf_stream_equals_batch_cdc_cow_and_mor",
    "tests/test_cdf_stream.py::test_cdf_stream_exactly_once_restart_and_throttle",
    "tests/test_cdf_stream.py::test_cdf_stream_iceberg_default_snapshot_then_changes",
    "tests/test_cdf_stream.py::test_cdf_stream_iceberg_equals_batch_cdc",
    "tests/test_cdf_stream.py::test_cdf_stream_schema_evolution_mid_stream",
    "tests/test_cdf_stream.py::test_cdf_stream_skips_compaction",
    "tests/test_cdf_stream.py::test_continuous_ivm_over_cdf_stream",
    "tests/test_cdf_stream.py::test_maintain_continuously_one_call",
    "tests/test_cdf_stream.py::test_store_stream_changes_live_feed",
    "tests/test_change_data.py::test_cdf_stream_large_merge_end_to_end_matches_batch",
    "tests/test_change_data.py::test_iceberg_stream_change_files_end_to_end",
    "tests/test_corpus_ops.py::test_bloom_decontaminate_matches_exact_and_fp_direction",
    "tests/test_corpus_ops.py::test_sample_exact_k_rescue_path",
    "tests/test_corpus_ops.py::test_weighted_reservoir_exact_k_and_bias",
    "tests/test_incremental_agg.py::test_approx_distinct_matches_direct_for_any_op_sequence",
    "tests/test_incremental_agg.py::test_count_distinct_maintenance",
    "tests/test_incremental_agg.py::test_count_distinct_matches_direct_for_any_op_sequence",
    "tests/test_incremental_agg.py::test_ivm_matches_direct_for_any_op_sequence",
    "tests/test_incremental_agg.py::test_minmax_hybrid_maintenance",
    "tests/test_incremental_windowed.py::test_windowed_ivm_matches_direct_for_any_op_sequence",
    "tests/test_incremental_windowed.py::test_windowed_maintain_continuously_e2e",
    "tests/test_mor_properties.py::test_iceberg_mor_equals_cow_and_cdc_reconstructs",
    "tests/test_mor_properties.py::test_mor_equals_cow_and_cdc_reconstructs",
    "tests/test_operators.py::test_ivf_topk",
    "tests/test_properties.py::test_bucketed_asof_matches_plain_property",
    "tests/test_rolling_ivm.py::test_rolling_ivm_matches_direct_for_any_op_sequence",
    "tests/test_rolling_ivm.py::test_rolling_ivm_mixed_ops",
    "tests/test_rolling_ivm.py::test_rolling_maintain_continuously_e2e",
    "tests/test_round10_fixes.py::test_throttled_snapshot_bootstrap_continuous_ivm",
    "tests/test_round11_fixes.py::test_delta_mid_split_checkpoint_restart_exactly_once",
    "tests/test_round11_fixes.py::test_iceberg_mid_split_checkpoint_restart_exactly_once",
    "tests/test_round11_fixes.py::test_iceberg_oversized_append_snapshot_splits",
    "tests/test_round12_fixes.py::test_iceberg_stream_ivm_random_op_soak",
    "tests/test_round12_fixes.py::test_plain_ivm_checkpoint_reset_fails_loudly",
    "tests/test_round12_fixes.py::test_plain_ivm_iceberg_mid_split_checkpoint_restart",
    "tests/test_round12_fixes.py::test_plain_ivm_maintain_continuously_iceberg_e2e",
    "tests/test_round12_fixes.py::test_rolling_checkpoint_reset_does_not_stall",
    "tests/test_round12_fixes.py::test_rolling_maintain_continuously_iceberg_e2e",
    "tests/test_round12_fixes.py::test_rolling_mid_split_checkpoint_restart_exactly_once",
    "tests/test_round12_fixes.py::test_windowed_maintain_continuously_iceberg_e2e",
    "tests/test_round8_fixes.py::test_maybe_optimize_policy",
    "tests/test_round9_fixes.py::test_default_start_serves_snapshot_despite_history",
    "tests/test_vector_index_deletes.py::test_index_maintain_continuously_from_cdf_stream",
    "tests/test_vector_index_deletes.py::test_ivf_apply_changes_and_recall_after_deletes",
    "tests/test_vector_index_deletes.py::test_ivfpq_delete_and_recall",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("[", 1)[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    from aligned_spark.session import get_spark

    s = get_spark(app_name="aligned_spark_tests")
    yield s


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
