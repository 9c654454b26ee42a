"""Interleaved rotary position embeddings.

Matches the reference's `precompute_freqs_cis` + candle `rope_i`
(reference: fish_speech_core/lib/lm/dual_ar.rs:168-186, 239-249):
pairs are adjacent lanes (x[2i], x[2i+1]), tables are built for the full
`max_seq_len` once and sliced by position.
"""

from __future__ import annotations

import jax.numpy as jnp


def precompute_freqs_cis(
    head_dim: int, max_seq_len: int, rope_base: float, dtype=jnp.float32
):
    """Returns (cos, sin), each (max_seq_len, head_dim // 2).

    Frequencies are 1 / rope_base^(2i/head_dim), computed in f32 like the
    reference (dual_ar.rs:173-182).
    """
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    theta = 1.0 / (rope_base**exponents)  # (head_dim/2,)
    positions = jnp.arange(max_seq_len, dtype=jnp.float32)
    angles = positions[:, None] * theta[None, :]  # (S, head_dim/2)
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope_interleaved(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Rotate interleaved pairs.

    x: (..., S, head_dim); cos/sin: (S, head_dim/2) — broadcast over leading dims.
    out[2i]   = x[2i] cos - x[2i+1] sin
    out[2i+1] = x[2i] sin + x[2i+1] cos
    """
    shape = x.shape
    half = shape[-1] // 2
    xr = x.reshape(shape[:-1] + (half, 2))
    x0 = xr[..., 0]
    x1 = xr[..., 1]
    # cos/sin broadcast: (S, half) against (..., S, half)
    o0 = x0 * cos - x1 * sin
    o1 = x0 * sin + x1 * cos
    out = jnp.stack([o0, o1], axis=-1).reshape(shape)
    return out.astype(x.dtype)
