"""Test env: force an 8-device virtual CPU mesh so multi-chip sharding paths
compile and execute without TPU hardware.

Note: this image's ``sitecustomize`` registers a remote-TPU (axon) PJRT
backend at interpreter startup and pins ``JAX_PLATFORMS=axon``, so plain env
vars in conftest are too late — we must override via ``jax.config`` before the
first backend use. Unit tests on the tunneled TPU are ~100x slower than local
CPU and only see one device.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

# Persistent XLA compile cache for the suite: pytest runs in one process,
# but every test builds fresh jitted closures, so the in-process jit cache
# never hits across tests — the disk cache keys on HLO and dedupes the
# MANY identical tiny-shape train/eval/decode compiles both within a run
# and across runs (this single-core image spends most of the suite's wall
# time in XLA CPU compiles). Override path with MTT_TEST_XLA_CACHE="" to
# disable (e.g. when diagnosing a suspected stale-cache miscompile).
_cache = os.environ.get(
    "MTT_TEST_XLA_CACHE",
    os.path.expanduser("~/.cache/masters_thesis_tpu/xla_tests"))
if _cache:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# ---- fast/slow tiering -------------------------------------------------
# Tests measured >=15s on the virtual-CPU mesh (dominated by end-to-end
# run_training compiles and full-resolution backbone graph builds) are
# auto-marked `slow`, centrally, from this list. Default `pytest` runs
# everything; `pytest -m "not slow"` is the <5 min tier that still covers
# all core numerics (model/cell/attention/decode/loss/optimizer parity,
# sharding rules, data layer, eval suite).
_SLOW_TESTS = {
    "test_batch_stats_update",
    "test_bf16_config_runs_and_keeps_fp32_masters",
    "test_captioner_from_run_dir",
    "test_captioner_from_ms2_run_routes_one_encoder",
    "test_split_checkpoint_restores_into_subject_mode",
    "test_captioner_serves_rbg_trained_run",
    "test_cli_features_subcommand",
    "test_cli_metrics_smoke",
    "test_cli_train_other_families",
    "test_cli_train_smoke",
    "test_cli_train_processes_distributed",
    "test_cli_eval_resume_decodes_without_retraining",
    "test_cli_tune_smoke",
    "test_different_seed_differs",
    "test_dryrun_multichip_4",
    "test_dryrun_multichip_8",
    "test_dryrun_reexec_when_backend_locked",
    "test_mesh_training_product_path_matches_unsharded",
    "test_multiprocess_training_matches_single_process",
    "test_multiprocess_training_resume_continues",
    "test_multiprocess_training_4x2_topology",
    "test_multiprocess_training_uneven_hosts",
    "test_efficientnet_b0_block_structure",
    "test_efficientnet_b3_pooled_width",
    "test_export_greedy_matches_live_decode",
    "test_export_beam_matches_live_decode",
    "test_export_chunks_requests_past_batch_size",
    "test_export_rejects_wrong_width",
    "test_export_rejects_unknown_decoder",
    "test_load_rejects_future_version",
    "test_http_serves_from_exported_artifact",
    "test_export_ms2_freezes_one_subject_encoder",
    "test_export_subject_rejected_for_single_encoder_runs",
    "test_serve_cli_rejects_contradictory_decoder",
    "test_exported_empty_input_returns_empty_ids",
    "test_resume_keeps_persisted_glove_table",
    "test_sessions_to_artifact_full_journey",
    "test_from_run_dir_restores_showtell_run",
    "test_from_run_dir_restores_img_patch_run",
    "test_export_showtell_run",
    "test_export_pre_bakes_transform_chain",
    "test_analyze_skips_attention_artifacts_for_attention_free_run",
    "test_pca_preprocess_writes_reduced_pack_and_trains",
    "test_vc_preprocess_writes_masked_pack_and_trains",
    "test_features_pack_trains_img_nic",
    "test_guse_precompute_output_trains_guse_nic",
    "test_glove_frozen_trains_and_serves",
    "test_glove_trainable_run_decodes",
    "test_learned_init_state_trains_and_decodes",
    "test_grad_stats_and_analyze_artifacts",
    "test_groups_to_remove_applied",
    "test_inception_v3_full_resolution_shapes",
    "test_modelsummary_written",
    "test_ms2_nic_sharded_train_step_over_mesh",
    "test_ms2_nic_trains_and_modes_share_params",
    "test_real_data_build_and_train",
    "test_two_subject_ms2_real_data",
    "test_two_subject_ms_nic_shared_encoder",
    "test_resnet50_structure_and_shapes",
    "test_resume_from_checkpoint",
    "test_run_eval_beam_writes_nonzero_attention",
    "test_run_training_activates_scanned_mode",
    "test_sam_step_runs",
    "test_same_seed_same_everything",
    "test_scanned_steps_match_sequential_gathered",
    "test_scanned_steps_sam_matches_per_step",
    "test_train_step_reduces_loss",
    "test_trainer_runs_and_logs",
    "test_training_preview_renders_stimulus_images",
    "test_trainer_with_scanned_steps",
    "test_warm_start_by_name_merge",
    "test_analyze_vertex_attention",
    "test_sharded_scanned_steps_match_unsharded",
    "test_profile_trace_capture",
    "test_prng_impl_knob",
    "test_sigterm_preemption_saves_checkpoint",
    "test_vgg16_graph_matches_keras",
    "test_inception_v3_graph_matches_keras",
    "test_efficientnet_b0_graph_matches_keras",
    "test_scanned_steps_match_over_packed_store",
    "test_cli_queue_worker_smoke",
    "test_scanned_steps_pregathered_store_parity",
    "test_glove_table_and_glove_nic",
    "test_fused_whole_decode_matches_xla",
    "test_fused_whole_decode_ragged_regions",
    "test_fused_whole_decode_learned_init_state",
    "test_fused_whole_decode_frozen_glove_table",
    "test_fused_whole_decode_gru_families",
    "test_fused_seq_matches_scan_forward_and_grads",
    "test_fused_seq_grad_wrt_inputs_matches",
    "test_fused_train_step_matches_production_no_dropout",
    "test_fused_train_step_dropout_deterministic_and_active",
    "test_learned_init_state_changes_initial_logits",
    "test_headtohead_vs_reference_source",
    "test_headtohead_ms2",
    "test_headtohead_img",
    "test_headtohead_cnn_rnn",
    "test_headtohead_showtell",
    "test_headtohead_thinkandtell",
    "test_headtohead_beam",
    "test_ms_nic_source_is_dead_code",
    "test_multiprocess_drive_matches_single_process",
    "test_midshape_sharded_steps_padded_vocab_pregathered_store",
    "test_caption_metrics_callback_logs_curve",
    "test_structured_synthetic_dataset",
    "test_beam_matches_shrinking_frontier_oracle",
    "test_flagship_census_shards_model_params",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


# ---- shared trained runs (slow-tier dedup) -------------------------------
# Many slow tests need "some 1-epoch smoke run of family X" purely as a
# READ-ONLY artifact (serve/export/eval restore). Each file re-training its
# own identical run was the slow tier's dominant cost (VERDICT r2 #8); this
# session-scoped factory memoises one run per unique config. Rules for
# users: treat the run dir as immutable (eval artifacts appended by run_eval
# are fine — restores only read model/ + config + tokenizer/layout); any
# test that mutates global jax config (prng_impl) or resumes/retrains must
# train its own run.

@pytest.fixture(scope="session")
def shared_run(tmp_path_factory):
    from masters_thesis_tpu.config import Config
    from masters_thesis_tpu.experiment import run_training

    cache: dict = {}

    def factory(smoke_keys: int = 12, epochs: int = 1, **overrides):
        import json

        key = json.dumps(
            {"smoke_keys": smoke_keys, "epochs": epochs, **overrides},
            sort_keys=True)
        if key not in cache:
            base = dict(run="shared", model="lc_nic", epochs=epochs,
                        batch_size=4, max_length=6, top_k=40, units=16,
                        attn_units=8, group_size=4, embedding_text=8)
            base.update(overrides)
            tmp = tmp_path_factory.mktemp("shared_run")
            cfg = Config(log=str(tmp), **base)
            cache[key] = run_training(cfg, epochs=epochs,
                                      smoke_keys=smoke_keys) + (cfg,)
        return cache[key]

    return factory
