"""Normalization layers (functional).

RMSNorm matches candle_nn::RmsNorm semantics (upcast to f32, no bias);
layer_norm matches candle_nn::LayerNorm (weight + bias over the last axis).
Used by the DualAR blocks (reference: dual_ar.rs:418-419) and the codec's
ConvNeXt blocks (reference: codec/convnext.rs:76-80,129-154).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float
) -> jnp.ndarray:
    """LayerNorm over the last axis, computed in f32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) / jnp.sqrt(var + eps)
    out = normed * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def layer_norm_channels_first(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float
) -> jnp.ndarray:
    """LayerNorm over axis 1 of (B, C, T) tensors
    (reference: codec/convnext.rs:129-154)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    normed = (xf - mean) / jnp.sqrt(var + eps)
    out = normed * weight.astype(jnp.float32)[None, :, None] + bias.astype(
        jnp.float32
    )[None, :, None]
    return out.astype(x.dtype)
