"""Checkpoint and tensor IO: safetensors/.pth -> JAX pytrees, npy helpers."""

from fish_speech_tpu.io.checkpoint import (  # noqa: F401
    load_lm_params,
    load_firefly_params,
    load_raw_checkpoint,
)
