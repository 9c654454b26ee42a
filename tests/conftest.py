"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths compile and run without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and overrides
# jax_platforms at interpreter boot; override it back after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# XLA:CPU's batched f32 matmul takes a fast low-precision path by default,
# which breaks golden-parity tolerances; tests want exact f32.
jax.config.update("jax_default_matmul_precision", "highest")
