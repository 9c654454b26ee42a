"""Carried-state streaming decode for the Firefly codec (Fish 1.4+).

The whole Fish 1.4+ decode path is causal — FishConvNet left-pads,
FishTransConvNet right-trims (reference: codec/utils/mod.rs:53-62,
110-122) — so a chunked decode with per-conv carried state produces
EXACTLY the batch `firefly_decode` output for the growing prefix, with no
left-context recompute (FireflyCodec.decode_tail re-decodes ~2x the new
frames in context; this path decodes each frame once). The reference has
no streaming vocoder at all: it vocodes whole text chunks
(handlers/speech.rs:94-110); its only streaming codec is the Mimi wrapper
(mimi.rs:52-88), whose session API this mirrors.

Fish 1.2 is NOT streamable: its convs use symmetric padding
(mod.rs:63-68), which is non-causal — `stream_state_init` rejects it.

State layout (a jit-compatible pytree of zero-init conv tails):
  {"quantizer": [per upsample stage: {"up": trans-conv tail,
                                      "block": dwconv tail}],
   "head": {"pre": tail, "stages": [{"up": tail,
            "resblocks": [[ (s1, s2) per dilation ] per kernel]}],
            "post": tail}}
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from fish_speech_tpu.config import FireflyConfig, FishVersion
from fish_speech_tpu.models.codec import grfsq
from fish_speech_tpu.models.codec.stream_conv import (
    conv_state,
    conv_transpose_state,
    stream_conv1d,
    stream_conv_transpose1d,
)
from fish_speech_tpu.ops.norms import layer_norm


def _silu32(x: jnp.ndarray) -> jnp.ndarray:
    # the batch path computes activations in f32 and casts back
    # (hifigan.py); mirror exactly so stream == batch bit-for-bit per op
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


def _stream_convnext_block(
    x: jnp.ndarray, p: Dict, state: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming twin of convnext_block (dilation 1; kernel size implied
    by the dwconv weight): only the depthwise conv is time-coupled, the
    LayerNorm/MLP tail is per-position."""
    dim = x.shape[1]
    h, new_state = stream_conv1d(
        x, p["dwconv"]["w"], p["dwconv"]["b"], state, groups=dim
    )
    h = h.transpose(0, 2, 1)
    h = layer_norm(h, p["norm"]["w"], p["norm"]["b"], 1e-6)
    h = h @ p["pwconv1"]["w"] + p["pwconv1"]["b"]
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
    h = h @ p["pwconv2"]["w"] + p["pwconv2"]["b"]
    if p.get("gamma") is not None:
        h = p["gamma"] * h
    return x + h.transpose(0, 2, 1), new_state


def _stream_resblock1(
    x: jnp.ndarray, p: Dict, dilations, states
) -> Tuple[jnp.ndarray, list]:
    """Streaming ResBlock1 (reference: hifi_gan.rs:12-86), 1.4+ semantics:
    convs2 runs the same dilation as convs1 (hifigan.py::_resblock1)."""
    new_states = []
    for i, d in enumerate(dilations):
        xt = _silu32(x)
        xt, s1 = stream_conv1d(
            xt, p["convs1"][i]["w"], p["convs1"][i]["b"], states[i][0],
            dilation=d,
        )
        xt = _silu32(xt)
        xt, s2 = stream_conv1d(
            xt, p["convs2"][i]["w"], p["convs2"][i]["b"], states[i][1],
            dilation=d,
        )
        x = x + xt
        new_states.append((s1, s2))
    return x, new_states


def stream_state_init(params: Dict, cfg: FireflyConfig, batch: int = 1):
    """Zero-initialized carried state for `firefly_decode_step`."""
    if cfg.version == FishVersion.V1_2:
        raise ValueError(
            "Fish 1.2 convs use symmetric (non-causal) padding "
            "(codec/utils/mod.rs:63-68) — streaming decode requires 1.4+"
        )

    def _cs(w, *, stride=1, dilation=1, groups=1):
        c_in = w.shape[1] * groups
        return conv_state(
            batch, c_in, w.shape[-1], stride=stride, dilation=dilation,
            dtype=w.dtype,
        )

    q_states = []
    for i, layer in enumerate(params["quantizer"]["upsample"]):
        w = layer["conv"]["w"]  # (I, O, K) trans-conv; K == stride
        factor = cfg.quantizer.downsample_factor[i]
        dw = layer["block"]["dwconv"]["w"]  # depthwise (dim, 1, k)
        q_states.append(
            {
                "up": conv_transpose_state(
                    batch, w.shape[1], w.shape[-1], stride=factor, dtype=w.dtype
                ),
                "block": _cs(dw, groups=dw.shape[0]),
            }
        )

    head = params["head"]
    hcfg = cfg.head
    stages = []
    for i, (u, k) in enumerate(
        zip(hcfg.upsample_rates, hcfg.upsample_kernel_sizes)
    ):
        uw = head["ups"][i]["w"]  # (I, O, K)
        resblocks = []
        for j, rd in enumerate(hcfg.resblock_dilation_sizes):
            p = head["resblocks"][i][j]
            resblocks.append(
                [
                    (
                        _cs(p["convs1"][t]["w"], dilation=d),
                        _cs(p["convs2"][t]["w"], dilation=d),
                    )
                    for t, d in enumerate(rd)
                ]
            )
        stages.append(
            {
                "up": conv_transpose_state(
                    batch, uw.shape[1], uw.shape[-1], stride=u, dtype=uw.dtype
                ),
                "resblocks": resblocks,
            }
        )
    return {
        "quantizer": q_states,
        "head": {
            "pre": _cs(head["conv_pre"]["w"]),
            "stages": stages,
            "post": _cs(head["conv_post"]["w"]),
        },
    }


def firefly_decode_step(
    indices: jnp.ndarray, params: Dict, cfg: FireflyConfig, state
) -> Tuple[jnp.ndarray, Dict]:
    """Streaming twin of firefly_decode: (B, num_codebooks, t) codes ->
    ((B, 1, t * ds * hop) PCM, new_state). Feeding chunks of any sizes
    yields exactly the prefix-concatenation of the batch decode
    (golden-tested in tests/test_codec.py)."""
    b, gq, t = indices.shape
    qcfg = cfg.quantizer
    g, q = qcfg.n_groups, qcfg.n_codebooks
    grouped = indices.reshape(b, g, q, t).transpose(1, 0, 3, 2)
    z = grfsq.grouped_decode(grouped, params["quantizer"]["rvqs"], qcfg)
    z = z.transpose(0, 2, 1).astype(
        params["quantizer"]["upsample"][0]["conv"]["w"].dtype
    )

    new_q = []
    for i, layer in enumerate(params["quantizer"]["upsample"]):
        factor = qcfg.downsample_factor[i]
        z, s_up = stream_conv_transpose1d(
            z, layer["conv"]["w"], layer["conv"]["b"], state["quantizer"][i]["up"],
            stride=factor,
        )
        z, s_blk = _stream_convnext_block(
            z, layer["block"], state["quantizer"][i]["block"]
        )
        new_q.append({"up": s_up, "block": s_blk})

    head = params["head"]
    hcfg = cfg.head
    hstate = state["head"]
    h, s_pre = stream_conv1d(
        z, head["conv_pre"]["w"], head["conv_pre"]["b"], hstate["pre"]
    )
    new_stages = []
    for i, u in enumerate(hcfg.upsample_rates):
        h = _silu32(h)
        h, s_up = stream_conv_transpose1d(
            h, head["ups"][i]["w"], head["ups"][i]["b"],
            hstate["stages"][i]["up"], stride=u,
        )
        acc = None
        new_rb = []
        for j, rd in enumerate(hcfg.resblock_dilation_sizes):
            out, s_rb = _stream_resblock1(
                h, head["resblocks"][i][j], rd,
                hstate["stages"][i]["resblocks"][j],
            )
            acc = out if acc is None else acc + out
            new_rb.append(s_rb)
        h = acc / len(hcfg.resblock_kernel_sizes)
        new_stages.append({"up": s_up, "resblocks": new_rb})
    h = _silu32(h)
    h, s_post = stream_conv1d(
        h, head["conv_post"]["w"], head["conv_post"]["b"], hstate["post"]
    )
    audio = jnp.tanh(h.astype(jnp.float32)).astype(h.dtype)
    return audio, {
        "quantizer": new_q,
        "head": {"pre": s_pre, "stages": new_stages, "post": s_post},
    }
