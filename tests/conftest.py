"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh BEFORE jax import — the
TPU-native equivalent of the reference's "multi-node testing without a
cluster" strategy (SURVEY §4): every sharding/collective test runs against 8
fake devices on one host.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The deployment's sitecustomize imports jax at interpreter start (before this
# file runs), so the env var alone is too late — force the platform through
# the live config as well.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA-executable cache (suite-cost control, VERDICT r3 Weak #7):
# the suite is compile-dominated (full-model builds, pjit steps on the
# 8-device mesh), and the cache is keyed by HLO hash + topology, so repeat
# runs skip every compile whose program didn't change. Measured on this
# 1-CPU host: full suite 56:36 cold → see COMPONENTS.md for the warm number.
# Safe across code changes (different HLO → different key); delete
# `.jax_cache_tests/` to force a cold run. Disable with REFINING_CLIP_TEST_NO_CACHE=1.
# TEST_CACHE_* are the single source of truth — subprocess-spawning tests
# (test_multihost) hand workers the same cache via these constants.
TEST_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_tests"
)
TEST_CACHE_MIN_COMPILE_SECS = 1.0
if os.environ.get("REFINING_CLIP_TEST_NO_CACHE", "") in ("", "0"):
    os.makedirs(TEST_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", TEST_CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", TEST_CACHE_MIN_COMPILE_SECS)

import pathlib
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


# ---------------------------------------------------------------------------
# Suite profiles (VERDICT r2 Weak #5): marks are assigned centrally by module
# so they cannot drift from the files. Fast local green signal:
#
#     pytest -m "not slow" -q        (~3 min on this 1-CPU host)
#
# CI and pre-release runs take everything (the CI job has 90 min).
# ---------------------------------------------------------------------------

_SLOW_MODULES = {
    # full-CLI end-to-end runs (compile + train real epochs)
    "test_train_e2e", "test_dino_workflow_e2e", "test_remote_sync",
    "test_eval_suite", "test_baseline_configs", "test_dress_rehearsal",
    # many-step torch-vs-jax overlays
    "test_training_dynamics_parity",
    # AOT-compiled engine buckets + quantization sweeps
    "test_inference",
    # two-process jax.distributed bring-up (slow interpreter spawns)
    "test_multihost",
    # converter roundtrips over every tower family
    "test_convert_dispatch", "test_hf_hub_export", "test_convert_external",
    # multi-step train-step compiles (BN stats, ZeRO, 8-device mesh, accum)
    "test_bn_train_step", "test_train_step", "test_step_distributed_semantics",
    "test_grad_parity",
    # full-model tower builds (one XLA compile each on this 1-CPU host)
    "test_convnext", "test_swin", "test_vitamin", "test_fastvit",
    "test_eva", "test_eva02", "test_resnet", "test_coca", "test_siglip_tower",
    "test_tower_fixtures",
}
# individually compile-heavy tests inside otherwise-fast modules (each is a
# full-model XLA build or an 8-device shard_map compile on this 1-CPU host);
# measured >=15 s apiece — together they doubled the "not slow" wall time
_SLOW_TESTS = {
    "test_load_checkpoint_strict_requires_bn_stats",   # ModifiedResNet build, 148 s
    "test_vitb32_shapes",                              # full ViT-B-32 fwd, 60 s
    "test_dino_loss_under_shard_map",                  # 8-dev weighted-CE grid, 35 s
    "test_create_model_and_transforms_smoke",          # ViT-B-32 factory build
    "test_siglip_ring_matches_single_device",          # 8-dev ring compiles (x2)
    "test_gap_vit_tower_builds",                       # timm-style GAP ViT build
    "test_reference_hf_text_checkpoint_parity",        # torch HF roundtrip
    "test_profiler_tiny",                              # XLA cost-analysis compile
    "test_remat_policy_matches_full_remat_grads",      # 4 tiny-model grad compiles
    "test_adam_mu_dtype_bf16_halves_moment_and_tracks_fp32",  # 2 step compiles
    "test_adafactor_sharded_step_matches_replicated",  # 2x2 sharded compiles, 120 s
    "test_cli_save_on_preemption",                     # full main() + 20 s timer
    # 50/30-step production-step overlays vs torch (one jit compile + loops)
    "test_fifty_step_production_step_param_group_overlay",
    "test_fifty_step_production_overlay_with_grad_clip",
    # ~7 min of pure tracing over every registry config (fast canary subset
    # stays in the fast profile as test_registry_config_abstract_init_fast)
    "test_every_registry_config_abstract_inits",
}
_DIST_MODULES = {
    "test_step_distributed_semantics", "test_multihost", "test_mesh_specs",
}
# individual torch-oracle tests inside otherwise torch-free modules
_TORCH_TESTS = {
    "test_convert_weights_to_lp_cast_set_matches_reference",
}
_TORCH_MODULES = {
    "test_model_parity", "test_grad_parity", "test_losses",
    "test_training_dynamics_parity", "test_metrics_ref_parity",
    "test_optim_group_parity", "test_zero_shot_parity",
    "test_scheduler_parity", "test_tokenizer", "test_dinov2",
    "test_hf_text_tower", "test_siglip_tower", "test_swin",
    "test_convert_dispatch", "test_convert_external", "test_dino_workflow_e2e",
    "test_m2m100", "test_dress_rehearsal",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        base_name = item.name.split("[", 1)[0]
        if mod in _SLOW_MODULES or base_name in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        if mod in _DIST_MODULES:
            item.add_marker(pytest.mark.dist)
        if mod in _TORCH_MODULES or base_name in _TORCH_TESTS:
            item.add_marker(pytest.mark.torch)
