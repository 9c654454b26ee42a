"""Grouped-query attention, TPU-native.

The reference materializes repeated KV heads with a CUDA gather kernel
(reference: candle-gqa-kernels/src/unary.cu, lm/ops/repeat_kv.rs) and
concatenates the KV cache every step (reference: dual_ar.rs:316-324).
On TPU neither is needed: the repeat is free inside a grouped einsum
(XLA broadcasts over the q-heads-per-kv axis), and the cache is a
pre-allocated static buffer updated with `lax.dynamic_update_slice`
so decode never reallocates or recompiles.

Layouts:
  q: (B, H, Sq, hd)
  k, v: (B, KV, Skv, hd)
  mask: additive bias broadcastable to (B, H_or_1, Sq, Skv) — 0 keep, -inf drop.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

NEG_INF = -1e9  # finite "minus infinity": avoids NaNs on fully-masked rows


def gqa_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
) -> jnp.ndarray:
    """Returns (B, H, Sq, hd). Softmax in f32, matmuls prefer f32 accumulation."""
    b, h, sq, hd = q.shape
    kv = k.shape[1]
    group = h // kv

    qg = q.reshape(b, kv, group, sq, hd)
    # scores: (B, KV, G, Sq, Skv)
    scores = jnp.einsum(
        "bkgqh,bksh->bkgqs", qg, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if mask is not None:
        # mask: (B or 1, 1, Sq, Skv) -> (B or 1, 1, 1, Sq, Skv), broadcasts
        # over both the KV-head and group axes.
        scores = scores + mask[:, :, None, :, :].astype(scores.dtype)
    weights = jnp.exp(
        scores - jnp.max(scores, axis=-1, keepdims=True)
    )
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bkgqs,bksh->bkgqh",
        weights.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, h, sq, hd).astype(q.dtype)


def causal_mask(
    seq_len: int, kv_len: int, window: int, q_offset: int = 0
) -> jnp.ndarray:
    """Additive causal + sliding-window mask, shape (1, 1, seq_len, kv_len).

    Query i (at absolute position q_offset + i) may attend to absolute kv
    position j iff j <= pos_i and pos_i - j < window. This reproduces the
    reference's `get_mask_abs` with context = max_seq_len
    (reference: dual_ar.rs:702-712), expressed as an additive bias.
    """
    q_pos = q_offset + jnp.arange(seq_len)[:, None]
    k_pos = jnp.arange(kv_len)[None, :]
    allowed = (k_pos <= q_pos) & (q_pos - k_pos < window)
    bias = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)
    return bias[None, None, :, :]


def decode_mask(kv_len: int, cache_length) -> jnp.ndarray:
    """Additive mask for single-token decode over a static cache buffer.

    Valid positions are [0, cache_length) in the pre-allocated buffer; the
    new token's K/V has just been written at cache_length - 1.
    Shape (1, 1, 1, kv_len); `cache_length` may be a traced scalar.
    """
    k_pos = jnp.arange(kv_len)[None, None, None, :]
    return jnp.where(k_pos < cache_length, 0.0, NEG_INF).astype(jnp.float32)
