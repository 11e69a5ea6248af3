"""Test config: run everything on a fake 8-device CPU mesh (SURVEY.md §4.4).

The sandbox presets JAX_PLATFORMS=axon (tunneled TPU) and a sitecustomize that
imports jax before any test code runs, so env vars alone cannot retarget the
backend — jax.config.update can, as long as no backend has initialized yet.
Compiles over the axon tunnel take minutes; tests must stay on host CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# adaptive-shape hints must not leak between test runs (or in from bench
# runs): tests exercise exact capacity/overflow behaviors
os.environ["SLAMEM_ADAPTIVE_DISK"] = "0"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# SURVEY.md §5 race-detection analogue: the engine is integer-only, so any
# NaN appearing anywhere is a logic bug — make it fail loudly in CI.
jax.config.update("jax_debug_nans", True)

import pytest  # noqa: E402

# Quick test lane (VERDICT r4 weak #7): the tests below each take >5 s on
# the fake 8-device CPU mesh — subprocess CLIs, mesh pipelines, adversarial
# soak-adjacent parity runs. `pytest -m "not slow"` is the <3-min quick
# lane; the full (default) lane remains the merge gate. Centralized here so
# the list is maintained in one place against `--durations` output.
_SLOW_TESTS = {
    "test_joined_request_cache_repeats_and_strand_change",
    "test_span_prefilter_deep_minlen_oracle_exact",
    "test_parity_exact_length_threshold",
    "test_two_process_multihost_cli",
    "test_two_process_multihost_cli_sharded",
    "test_cli_shard_flag",
    "test_elig_buffer_overflow_falls_back_exact",
    "test_two_word_full_pipeline_oracle_parity",
    "test_parity_match_at_edges",
    "test_mode_filter_containment_adversarial",
    "test_multifasta_mum_mam_joined_dispatch",
    "test_parity_multifasta_and_revcomp_codes",
    "test_parity_low_complexity",
    "test_parity_mutated_pair",
    "test_lcp_matches_naive",
    "test_sharded_direct_table_top_bucket_pads",
    "test_split_expansion_equivalence_and_overflow",
    "test_mode_filter_sparse_path_used",
    "test_scan_equals_seed",
    "test_parity_with_n_runs",
    "test_sharded_two_word_seeds_parity",
    "test_parity_on_mesh",
    "test_virtual_slabs_class_spanning_many_slabs",
    "test_virtual_slabs_modes_and_deep_minlen",
    "test_cli_slabs_flag",
    "test_build_index_packed_text_upload_exact",
    "test_virtual_slabs_equal_replicated",
    "test_scan_chunked_equals_monolithic",
    "test_parity_sharded",
    "test_graft_entry_dryrun",
    "test_virtual_hints_persist_and_correct",
    "test_parity_multiround",
    "test_virtual_slabs_more_slabs_than_rows_edge",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
