"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths compile and run without TPU hardware.

Test tiers (VERDICT r3 #9): heavy modules — torch/transformers golden
parity, kernel interpret-mode parity, scheduler soaks, training — are
auto-marked `slow`. The default edit-test loop runs the fast tier:

    python -m pytest tests/ -m "not slow" -q     (~2-3 min)

CI and round-end validation run the full matrix (no -m filter)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and overrides
# jax_platforms at interpreter boot; override it back after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# XLA:CPU's batched f32 matmul takes a fast low-precision path by default,
# which breaks golden-parity tolerances; tests want exact f32.
jax.config.update("jax_default_matmul_precision", "highest")

# Modules auto-marked `slow` (measured >60 s each on the 1-vCPU image):
# torch/transformers golden oracles, Pallas interpret-mode parity,
# scheduler soaks, training, end-to-end pipeline/server drives.
_SLOW_MODULES = {
    "test_golden_lm",
    "test_llama_oracle",
    "test_mimi",
    "test_codec",
    "test_continuous",
    "test_train",
    "test_checkpoint",
    "test_slow_step",
    "test_fast_frame",
    "test_prefill_flash",
    "test_decode_unroll",
    "test_quant",
    "test_streaming",
    "test_overlap",
    "test_pipeline_dualar",
    "test_server",
    "test_dynamic_sampling",
    "test_parallel",
    "test_engine",
    "test_aot",
    "test_cli",
    "test_api",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy tier (golden parity, soaks, kernels); "
        "deselect with -m 'not slow' for the fast edit-test loop"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
