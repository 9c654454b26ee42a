"""Downsampling FSQ quantizer: strided-conv downsample stack, grouped
residual FSQ, mirrored transposed-conv upsample stack.

Counterpart of reference: fish_speech_core/lib/codec/quantizer.rs.
`encode` emits the (B, groups*quantizers, T) integer grid that becomes the
LM's codebook rows; `decode` inverts it back to features for the HiFiGAN
head. The reference stores upsample weights under reversed indices and
applies upsample.0 first (quantizer.rs:69-132); we replicate that order.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from fish_speech_tpu.config import DownsampleFSQConfig, FishVersion
from fish_speech_tpu.models.codec import grfsq
from fish_speech_tpu.models.codec.conv import fish_conv1d, fish_conv_transpose1d
from fish_speech_tpu.models.codec.convnext import convnext_block, init_convnext_block


def quantizer_encode(
    z: jnp.ndarray, p: Dict, cfg: DownsampleFSQConfig, version: FishVersion
) -> jnp.ndarray:
    """(B, dim, T) features -> (B, G*Q, T') integer codes
    (reference: quantizer.rs:104-124)."""
    for i, factor in enumerate(cfg.downsample_factor):
        layer = p["downsample"][i]
        z = fish_conv1d(z, layer["conv"], stride=factor, version=version)
        z = convnext_block(z, layer["block"], version=version)
    zt = z.transpose(0, 2, 1)  # (B, T', dim)
    _, indices = grfsq.grouped_forward(zt, p["rvqs"], cfg)  # (G, B, T', Q)
    g, b, t, q = indices.shape
    # einops 'g b l r -> b (g r) l'
    return indices.transpose(1, 0, 3, 2).reshape(b, g * q, t)


def quantizer_decode(
    indices: jnp.ndarray, p: Dict, cfg: DownsampleFSQConfig, version: FishVersion
) -> jnp.ndarray:
    """(B, G*Q, T') codes -> (B, dim, T) features
    (reference: quantizer.rs:135-146)."""
    b, gq, t = indices.shape
    g, q = cfg.n_groups, cfg.n_codebooks
    # einops 'b (g r) l -> g b l r'
    grouped = indices.reshape(b, g, q, t).transpose(1, 0, 3, 2)
    z = grfsq.grouped_decode(grouped, p["rvqs"], cfg)  # (B, T', dim)
    # FSQ lattice math runs f32 for exactness; enter the conv stack in
    # the parameter dtype (bf16 codec is a supported mode, vocoder.rs:44-48)
    z = z.transpose(0, 2, 1).astype(p["upsample"][0]["conv"]["w"].dtype)
    # Upsample: the reference builds the list reversed and iterates it
    # reversed again (quantizer.rs:69-94,126-132), so checkpoint index
    # order IS application order; stage i uses stride downsample_factor[i].
    for i, layer in enumerate(p["upsample"]):
        factor = cfg.downsample_factor[i]
        z = fish_conv_transpose1d(z, layer["conv"], stride=factor, version=version)
        z = convnext_block(z, layer["block"], version=version)
    return z


def init_quantizer_params(
    rng: jax.Array, cfg: DownsampleFSQConfig, dtype=jnp.float32
) -> Dict:
    dims = cfg.all_dims
    down: List[Dict] = []
    up: List[Dict] = []
    for i, factor in enumerate(cfg.downsample_factor):
        kd = jax.random.fold_in(rng, 10 + i)
        down.append(
            {
                "conv": {
                    "w": jax.random.normal(kd, (dims[i + 1], dims[i], factor), dtype)
                    * 0.02,
                    "b": jnp.zeros((dims[i + 1],), dtype),
                },
                "block": init_convnext_block(
                    jax.random.fold_in(kd, 1), dims[i + 1], 7, dtype
                ),
            }
        )
    # upsample list in checkpoint-index == application order; stage i has
    # conv (I=dims[i+1], O=dims[i], K=downsample_factor[i])
    n = len(cfg.downsample_factor)
    for i in range(n):
        ku = jax.random.fold_in(rng, 20 + i)
        up.append(
            {
                "conv": {
                    # conv-transpose torch layout (I, O, K)
                    "w": jax.random.normal(
                        ku,
                        (dims[i + 1], dims[i], cfg.downsample_factor[i]),
                        dtype,
                    )
                    * 0.02,
                    "b": jnp.zeros((dims[i],), dtype),
                },
                "block": init_convnext_block(
                    jax.random.fold_in(ku, 1), dims[i], 7, dtype
                ),
            }
        )
    return {
        "downsample": down,
        "upsample": up,
        "rvqs": grfsq.init_group_params(jax.random.fold_in(rng, 30), cfg, dtype),
    }
