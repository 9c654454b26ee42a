"""HiFiGAN-style generator head.

Counterpart of reference: fish_speech_core/lib/codec/hifi_gan.rs.
conv_pre -> 5x [silu -> transposed-conv upsample -> ParallelBlock of 3
dilated ResBlock1s averaged] -> silu -> conv_post -> tanh. Total upsample
8*8*2*2*2 = 512 = one mel hop of audio per input frame.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from fish_speech_tpu.config import FishVersion, HiFiGANConfig
from fish_speech_tpu.models.codec.conv import fish_conv1d, fish_conv_transpose1d


def _get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def _resblock1(
    x: jnp.ndarray,
    p: Dict,
    kernel_size: int,
    dilations,
    version: FishVersion,
) -> jnp.ndarray:
    """(reference: hifi_gan.rs:12-86). For 1.2, convs2 runs dilation 1
    with symmetric padding; 1.4+ runs the same dilation as convs1 with
    causal padding (hifi_gan.rs:47-67)."""
    for i, d in enumerate(dilations):
        xt = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
        xt = fish_conv1d(
            xt,
            p["convs1"][i],
            dilation=d,
            version=version,
            pad_1_2=_get_padding(kernel_size, d),
        )
        xt = jax.nn.silu(xt.astype(jnp.float32)).astype(xt.dtype)
        d2 = 1 if version == FishVersion.V1_2 else d
        xt = fish_conv1d(
            xt,
            p["convs2"][i],
            dilation=d2,
            version=version,
            pad_1_2=_get_padding(kernel_size, 1),
        )
        x = x + xt
    return x


def hifigan_forward(
    x: jnp.ndarray, p: Dict, cfg: HiFiGANConfig, version: FishVersion
) -> jnp.ndarray:
    """(B, num_mels, T) -> (B, 1, T * hop) PCM in [-1, 1]
    (reference: hifi_gan.rs:207-217)."""
    h = fish_conv1d(
        x,
        p["conv_pre"],
        version=version,
        pad_1_2=_get_padding(cfg.pre_conv_kernel_size),
    )
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
        h = fish_conv_transpose1d(
            h,
            p["ups"][i],
            stride=u,
            version=version,
            pad_1_2=(k - u) // 2,
        )
        # ParallelBlock: mean of the 3 ResBlock1s (hifi_gan.rs:113-118)
        acc = None
        for j, (rk, rd) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            out = _resblock1(h, p["resblocks"][i][j], rk, rd, version)
            acc = out if acc is None else acc + out
        h = acc / len(cfg.resblock_kernel_sizes)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    h = fish_conv1d(
        h,
        p["conv_post"],
        version=version,
        pad_1_2=_get_padding(cfg.post_conv_kernel_size),
    )
    return jnp.tanh(h.astype(jnp.float32)).astype(h.dtype)


def init_hifigan_params(
    rng: jax.Array, cfg: HiFiGANConfig, dtype=jnp.float32
) -> Dict:
    def conv(key, o, i, k):
        return {
            "w": jax.random.normal(key, (o, i, k), dtype) * 0.02,
            "b": jnp.zeros((o,), dtype),
        }

    keys = jax.random.split(rng, 4)
    ch0 = cfg.upsample_initial_channel
    ups: List[Dict] = []
    resblocks: List[List[Dict]] = []
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ci, co = ch0 // (2**i), ch0 // (2 ** (i + 1))
        ku = jax.random.fold_in(keys[1], i)
        # conv-transpose torch layout (I, O, K)
        ups.append(
            {
                "w": jax.random.normal(ku, (ci, co, k), dtype) * 0.02,
                "b": jnp.zeros((co,), dtype),
            }
        )
        blocks = []
        for j, rk in enumerate(cfg.resblock_kernel_sizes):
            kb = jax.random.fold_in(ku, 100 + j)
            n_d = len(cfg.resblock_dilation_sizes[j])
            blocks.append(
                {
                    "convs1": [
                        conv(jax.random.fold_in(kb, t), co, co, rk) for t in range(n_d)
                    ],
                    "convs2": [
                        conv(jax.random.fold_in(kb, 10 + t), co, co, rk)
                        for t in range(n_d)
                    ],
                }
            )
        resblocks.append(blocks)
    ch_final = ch0 // (2 ** len(cfg.upsample_rates))
    return {
        "conv_pre": conv(keys[0], ch0, cfg.num_mels, cfg.pre_conv_kernel_size),
        "ups": ups,
        "resblocks": resblocks,
        "conv_post": conv(keys[2], 1, ch_final, cfg.post_conv_kernel_size),
    }
