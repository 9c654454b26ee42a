"""ConvNeXt blocks and encoder for the Firefly codec.

Counterpart of reference: fish_speech_core/lib/codec/convnext.rs.
Upstream torch uses exact (erf) GELU; the reference's candle `.gelu()` is
the tanh approximation — we follow upstream exact GELU (difference is
~1e-3 at worst and the reference's own e2e tolerance absorbs it).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from fish_speech_tpu.config import BackboneConfig, FishVersion
from fish_speech_tpu.models.codec.conv import conv1d, fish_conv1d
from fish_speech_tpu.ops.norms import layer_norm, layer_norm_channels_first


def convnext_block(
    x: jnp.ndarray,
    p: Dict,
    *,
    version: FishVersion,
    kernel_size: int = 7,
    dilation: int = 1,
) -> jnp.ndarray:
    """(B, C, T) -> (B, C, T) (reference: convnext.rs:109-127)."""
    dim = x.shape[1]
    pad_1_2 = round(dilation * (kernel_size - 1) / 2)
    h = fish_conv1d(
        x,
        p["dwconv"],
        dilation=dilation,
        groups=dim,
        version=version,
        pad_1_2=pad_1_2,
    )
    h = h.transpose(0, 2, 1)  # (B, T, C)
    h = layer_norm(h, p["norm"]["w"], p["norm"]["b"], 1e-6)
    h = h @ p["pwconv1"]["w"] + p["pwconv1"]["b"]
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
    h = h @ p["pwconv2"]["w"] + p["pwconv2"]["b"]
    if p.get("gamma") is not None:
        h = p["gamma"] * h
    return x + h.transpose(0, 2, 1)


def convnext_encoder(
    x: jnp.ndarray, p: Dict, cfg: BackboneConfig, version: FishVersion
) -> jnp.ndarray:
    """(B, input_channels, T) -> (B, dims[-1], T)
    (reference: convnext.rs:180-335)."""
    # Stem: FishConvNet + channels-first LayerNorm + blocks
    pad_1_2 = cfg.kernel_size // 2
    h = fish_conv1d(x, p["stem"]["conv"], version=version, pad_1_2=pad_1_2)
    h = layer_norm_channels_first(
        h, p["stem"]["norm"]["w"], p["stem"]["norm"]["b"], 1e-6
    )
    for bp in p["stem"]["blocks"]:
        h = convnext_block(h, bp, version=version, kernel_size=cfg.kernel_size)

    # Mid stages: norm + 1x1 conv + blocks
    for mid in p["mid"]:
        h = layer_norm_channels_first(h, mid["norm"]["w"], mid["norm"]["b"], 1e-6)
        h = conv1d(h, mid["conv"]["w"], mid["conv"]["b"])
        for bp in mid["blocks"]:
            h = convnext_block(h, bp, version=version, kernel_size=cfg.kernel_size)

    return layer_norm_channels_first(
        h, p["final_norm"]["w"], p["final_norm"]["b"], 1e-6
    )


# -- init (tests / benchmarks) ---------------------------------------------


def _conv_init(rng, o, i, k, dtype):
    return {
        "w": jax.random.normal(rng, (o, i, k), dtype) * 0.02,
        "b": jnp.zeros((o,), dtype),
    }


def init_convnext_block(rng, dim: int, kernel_size: int, dtype=jnp.float32) -> Dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "dwconv": {
            "w": jax.random.normal(k1, (dim, 1, kernel_size), dtype) * 0.02,
            "b": jnp.zeros((dim,), dtype),
        },
        "norm": {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "pwconv1": {
            "w": jax.random.normal(k2, (dim, dim * 4), dtype) * 0.02,
            "b": jnp.zeros((dim * 4,), dtype),
        },
        "pwconv2": {
            "w": jax.random.normal(k3, (dim * 4, dim), dtype) * 0.02,
            "b": jnp.zeros((dim,), dtype),
        },
        "gamma": jnp.full((dim,), 1e-6, dtype),
    }


def init_convnext_encoder(rng, cfg: BackboneConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(rng, 16)
    stem_blocks = [
        init_convnext_block(jax.random.fold_in(keys[1], j), cfg.dims[0], cfg.kernel_size, dtype)
        for j in range(cfg.depths[0])
    ]
    mids: List[Dict] = []
    for idx in range(1, len(cfg.depths)):
        mids.append(
            {
                "norm": {
                    "w": jnp.ones((cfg.dims[idx - 1],), dtype),
                    "b": jnp.zeros((cfg.dims[idx - 1],), dtype),
                },
                "conv": _conv_init(
                    jax.random.fold_in(keys[2], idx), cfg.dims[idx], cfg.dims[idx - 1], 1, dtype
                ),
                "blocks": [
                    init_convnext_block(
                        jax.random.fold_in(keys[3], idx * 100 + j),
                        cfg.dims[idx],
                        cfg.kernel_size,
                        dtype,
                    )
                    for j in range(cfg.depths[idx])
                ],
            }
        )
    return {
        "stem": {
            "conv": _conv_init(keys[0], cfg.dims[0], cfg.input_channels, cfg.kernel_size, dtype),
            "norm": {
                "w": jnp.ones((cfg.dims[0],), dtype),
                "b": jnp.zeros((cfg.dims[0],), dtype),
            },
            "blocks": stem_blocks,
        },
        "mid": mids,
        "final_norm": {
            "w": jnp.ones((cfg.dims[-1],), dtype),
            "b": jnp.zeros((cfg.dims[-1],), dtype),
        },
    }
