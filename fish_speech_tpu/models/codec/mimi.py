"""Mimi neural audio codec (Kyutai) — TPU-native JAX implementation.

Behavioral counterpart of the reference's optional Mimi codec for
generic-DualAR / smoltts checkpoints (reference: server/lib/audio/
mimi.rs:17-88 wrapping the moshi crate; enabled by `WhichCodec::Mimi`,
config.rs:24-40). Architecture (validated against
`transformers.MimiModel` to ~1e-4 on random weights — see
tests/test_mimi.py):

  encode: audio 24 kHz -> SEANet conv encoder -> causal transformer
          (RoPE, sliding window, layer scale) -> stride-2 downsample
          -> split residual VQ (1 semantic + N acoustic codebooks)
  decode: codes -> split-RVQ dequantize -> stride-2 transposed upsample
          -> causal transformer -> SEANet conv decoder -> audio

Everything here is statically shaped and jit-friendly: the Mimi padding
arithmetic (causal left pad + "extra" right pad to an ideal length)
depends only on shapes, so it is computed at trace time.

Weights load from a `transformers`-format Mimi state dict
(model.safetensors of kyutai/mimi) via `convert_mimi_state_dict`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.models.codec.stream_conv import (
    StreamSessionBase,
    conv_state as _conv_state,
    conv_transpose_raw,
    stream_conv1d as _stream_conv1d,
    stream_conv_transpose1d as _stream_conv_transpose1d,
)


@dataclasses.dataclass(frozen=True)
class MimiConfig:
    """Subset of transformers MimiConfig the codec math needs; defaults
    match kyutai/mimi (and the moshi crate the reference links)."""

    sampling_rate: int = 24000
    frame_rate: float = 12.5
    audio_channels: int = 1
    hidden_size: int = 512
    num_filters: int = 64
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    num_residual_layers: int = 1
    upsampling_ratios: Tuple[int, ...] = (8, 6, 5, 4)
    compress: int = 2
    trim_right_ratio: float = 1.0
    # transformer
    num_hidden_layers: int = 8
    num_attention_heads: int = 8
    num_key_value_heads: int = 8
    head_dim: int = 64
    intermediate_size: int = 2048
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    sliding_window: int = 250
    layer_scale_initial_scale: float = 0.01
    # quantizer
    num_quantizers: int = 32
    codebook_size: int = 2048
    codebook_dim: int = 256
    vector_quantization_hidden_dimension: int = 256
    num_semantic_quantizers: int = 1
    upsample_groups: int = 512

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.upsampling_ratios))

    @property
    def encodec_frame_rate(self) -> float:
        return self.sampling_rate / self.hop_length

    @property
    def has_resample(self) -> bool:
        return self.frame_rate != self.encodec_frame_rate


# --------------------------------------------------------------------------
# Causal conv primitives (Mimi/Encodec padding semantics)
# --------------------------------------------------------------------------


def _extra_pad(length: int, k_eff: int, stride: int) -> int:
    """Right padding to reach the 'ideal length' (EncodecConv1d rule)."""
    pad_total = k_eff - stride
    n_frames = (length - k_eff + pad_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + k_eff - pad_total
    return ideal - length


def mimi_conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """Causal Conv1d: left-pad k_eff - stride, right-pad to ideal length.

    x: (B, C_in, T); w: (C_out, C_in/groups, K) torch layout.
    """
    k_eff = (w.shape[-1] - 1) * dilation + 1
    pad_left = k_eff - stride
    pad_right = _extra_pad(x.shape[-1], k_eff, stride)
    if pad_left or pad_right:
        if pad_mode == "replicate":
            left = jnp.repeat(x[..., :1], pad_left, axis=-1) if pad_left else None
            right = (
                jnp.repeat(x[..., -1:], pad_right, axis=-1) if pad_right else None
            )
            parts = [p for p in (left, x, right) if p is not None]
            x = jnp.concatenate(parts, axis=-1)
        else:
            x = jnp.pad(x, ((0, 0), (0, 0), (pad_left, pad_right)))
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b[None, :, None]
    return out


def mimi_conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray],
    stride: int,
    groups: int = 1,
    trim_right_ratio: float = 1.0,
) -> jnp.ndarray:
    """Causal ConvTranspose1d: full transposed conv, then trim
    ceil((K - stride) * trim_right_ratio) from the right and the rest
    from the left. w: (C_in, C_out/groups, K) torch layout.
    """
    k = w.shape[-1]
    out = conv_transpose_raw(x, w, stride=stride, groups=groups)
    if b is not None:
        out = out + b[None, :, None]
    pad_total = k - stride
    pad_right = math.ceil(pad_total * trim_right_ratio)
    pad_left = pad_total - pad_right
    end = out.shape[-1] - pad_right
    return out[..., pad_left:end]


# --------------------------------------------------------------------------
# SEANet encoder / decoder
# --------------------------------------------------------------------------


def _resnet_block(x, p, dilation: int, cfg: MimiConfig):
    """ELU -> conv(k=residual_kernel_size, dil) -> ELU -> conv(k=1) + skip."""
    h = jax.nn.elu(x)
    h = mimi_conv1d(h, p["block.1.w"], p["block.1.b"], dilation=dilation)
    h = jax.nn.elu(h)
    h = mimi_conv1d(h, p["block.3.w"], p["block.3.b"])
    return x + h


def seanet_encode(x: jnp.ndarray, params: Dict, cfg: MimiConfig) -> jnp.ndarray:
    """(B, 1, T) audio -> (B, hidden, T/hop) latents."""
    layers = params["layers"]
    x = mimi_conv1d(x, layers[0]["w"], layers[0]["b"])
    i = 1
    for ratio in reversed(cfg.upsampling_ratios):
        for j in range(cfg.num_residual_layers):
            x = _resnet_block(x, layers[i], cfg.dilation_growth_rate**j, cfg)
            i += 1
        x = jax.nn.elu(x)  # the ELU between blocks is stateless
        x = mimi_conv1d(x, layers[i]["w"], layers[i]["b"], stride=ratio)
        i += 1
    x = jax.nn.elu(x)
    x = mimi_conv1d(x, layers[i]["w"], layers[i]["b"])
    return x


def seanet_decode(x: jnp.ndarray, params: Dict, cfg: MimiConfig) -> jnp.ndarray:
    """(B, hidden, F) latents -> (B, 1, F*hop) audio."""
    layers = params["layers"]
    x = mimi_conv1d(x, layers[0]["w"], layers[0]["b"])
    i = 1
    for ratio in cfg.upsampling_ratios:
        x = jax.nn.elu(x)
        x = mimi_conv_transpose1d(
            x,
            layers[i]["w"],
            layers[i]["b"],
            stride=ratio,
            trim_right_ratio=cfg.trim_right_ratio,
        )
        i += 1
        for j in range(cfg.num_residual_layers):
            x = _resnet_block(x, layers[i], cfg.dilation_growth_rate**j, cfg)
            i += 1
    x = jax.nn.elu(x)
    x = mimi_conv1d(x, layers[i]["w"], layers[i]["b"])
    return x


# --------------------------------------------------------------------------
# Streaming decode (reference: server/lib/audio/mimi.rs:52-88
# decode_step/reset_state). Every op in the decode path is causal, so a
# chunked decode with carried state equals the batch decode exactly:
#   * causal convs carry their left-context samples,
#   * transposed convs carry a bias-free overlap-add tail,
#   * the transformer carries a sliding-window KV ring cache.
# --------------------------------------------------------------------------


def _stream_resnet_block(x, p, dilation: int, state):
    h = jax.nn.elu(x)
    h, s1 = _stream_conv1d(
        h, p["block.1.w"], p["block.1.b"], state[0], dilation=dilation
    )
    h = jax.nn.elu(h)
    h, s2 = _stream_conv1d(h, p["block.3.w"], p["block.3.b"], state[1])
    return x + h, (s1, s2)


def seanet_decode_stream_init(params: Dict, cfg: MimiConfig, batch: int):
    """Zero-initialized carried state for seanet_decode, in layer order."""
    layers = params["layers"]
    states = [_conv_state(batch, layers[0]["w"].shape[1], layers[0]["w"].shape[-1])]
    i = 1
    for ratio in cfg.upsampling_ratios:
        w = layers[i]["w"]  # transpose: (C_in, C_out, K)
        states.append(jnp.zeros((batch, w.shape[1], w.shape[-1] - ratio)))
        i += 1
        for j in range(cfg.num_residual_layers):
            lp = layers[i]
            d = cfg.dilation_growth_rate**j
            states.append(
                (
                    _conv_state(
                        batch, lp["block.1.w"].shape[1], lp["block.1.w"].shape[-1],
                        dilation=d,
                    ),
                    _conv_state(batch, lp["block.3.w"].shape[1], 1),
                )
            )
            i += 1
    states.append(
        _conv_state(batch, layers[i]["w"].shape[1], layers[i]["w"].shape[-1])
    )
    return states


def seanet_decode_stream(x, params: Dict, cfg: MimiConfig, states):
    """Streaming twin of seanet_decode: same layer walk, carried state."""
    layers = params["layers"]
    new_states = []
    x, s = _stream_conv1d(x, layers[0]["w"], layers[0]["b"], states[0])
    new_states.append(s)
    i, si = 1, 1
    for ratio in cfg.upsampling_ratios:
        x = jax.nn.elu(x)
        x, s = _stream_conv_transpose1d(
            x, layers[i]["w"], layers[i]["b"], states[si], stride=ratio
        )
        new_states.append(s)
        i += 1
        si += 1
        for j in range(cfg.num_residual_layers):
            x, s = _stream_resnet_block(
                x, layers[i], cfg.dilation_growth_rate**j, states[si]
            )
            new_states.append(s)
            i += 1
            si += 1
    x = jax.nn.elu(x)
    x, s = _stream_conv1d(x, layers[i]["w"], layers[i]["b"], states[si])
    new_states.append(s)
    return x, new_states


def transformer_stream_init(cfg: MimiConfig, batch: int, max_step: int = 64):
    """Sliding-window KV ring cache. The ring is oversized by `max_step`
    slots: with exactly W slots, a chunk of t>1 positions would overwrite
    entries still inside the window of the chunk's EARLIER queries (slot
    p%W is reused by p+W, and p+W's write lands before query p+W-t+1 has
    attended to p). W+max_step slots guarantee an entry is only recycled
    once every in-chunk query has moved past its window."""
    w, kvh, hd = cfg.sliding_window, cfg.num_key_value_heads, cfg.head_dim
    ring = w + max_step
    layers = [
        {
            "k": jnp.zeros((batch, kvh, ring, hd)),
            "v": jnp.zeros((batch, kvh, ring, hd)),
        }
        for _ in range(cfg.num_hidden_layers)
    ]
    return {
        "layers": layers,
        "slot_pos": jnp.full((ring,), -1, jnp.int32),  # abs position per slot
        "pos": jnp.zeros((), jnp.int32),  # next absolute position
    }


def mimi_transformer_step(x, params: Dict, cfg: MimiConfig, cache):
    """(B, t, D) new positions against the ring cache; t must be <= the
    ring's max_step oversize (see transformer_stream_init)."""
    b, t, d = x.shape
    h, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    w = cfg.sliding_window
    ring = cache["slot_pos"].shape[0]
    pos0 = cache["pos"]
    q_abs = pos0 + jnp.arange(t)  # (t,)
    slots = q_abs % ring

    inv = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    )
    freqs = q_abs.astype(jnp.float32)[:, None] * inv[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    cos, sin = jnp.cos(emb)[None, None], jnp.sin(emb)[None, None]

    slot_pos = cache["slot_pos"].at[slots].set(q_abs)
    # causal + sliding window over ring slots, shared across layers
    valid = (
        (slot_pos[None, :] >= 0)
        & (slot_pos[None, :] <= q_abs[:, None])
        & (q_abs[:, None] - slot_pos[None, :] < w)
    )
    mask = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)[None, None]

    scale = 1.0 / math.sqrt(hd)
    new_layers = []
    for lp, lcache in zip(params["layers"], cache["layers"]):
        hin = _layer_norm(x, lp["ln1.w"], lp["ln1.b"], cfg.norm_eps)
        q = (hin @ lp["q.w"].T).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = (hin @ lp["k.w"].T).reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
        v = (hin @ lp["v.w"].T).reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
        q = _rope_rotate_half(q, cos, sin)
        k = _rope_rotate_half(k, cos, sin)  # rotated keys cached (absolute RoPE)
        kc = lcache["k"].at[:, :, slots, :].set(k)
        vc = lcache["v"].at[:, :, slots, :].set(v)
        new_layers.append({"k": kc, "v": vc})
        ku, vu = kc, vc
        if kvh != h:
            ku = jnp.repeat(ku, h // kvh, axis=1)
            vu = jnp.repeat(vu, h // kvh, axis=1)
        scores = (
            jnp.einsum("bhqd,bhkd->bhqk", q, ku, preferred_element_type=jnp.float32)
            * scale
            + mask
        )
        attn = jax.nn.softmax(scores, axis=-1).astype(vu.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, vu)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, h * hd) @ lp["o.w"].T
        x = x + o * lp["ls_attn"][None, None, :]

        hin = _layer_norm(x, lp["ln2.w"], lp["ln2.b"], cfg.norm_eps)
        mlp = jax.nn.gelu(hin @ lp["fc1.w"].T, approximate=False) @ lp["fc2.w"].T
        x = x + mlp * lp["ls_mlp"][None, None, :]
    return x, {
        "layers": new_layers,
        "slot_pos": slot_pos,
        "pos": pos0 + t,
    }


def mimi_decode_stream_init(
    params: Dict, cfg: MimiConfig, batch: int = 1, max_step: int = 64
):
    """max_step: largest number of TRANSFORMER positions (2x code frames
    when has_resample) a single decode_step call may feed."""
    state = {
        "transformer": transformer_stream_init(cfg, batch, max_step),
        "seanet": seanet_decode_stream_init(params["decoder"], cfg, batch),
    }
    if cfg.has_resample:
        w = params["upsample"]["w"]  # (C_in, C_out/groups, K), groups=C_in
        state["upsample"] = jnp.zeros(
            (batch, cfg.upsample_groups * w.shape[1], w.shape[-1] - 2)
        )
    return state


def mimi_decode_step(codes: jnp.ndarray, params: Dict, cfg: MimiConfig, state):
    """Streaming twin of mimi_decode: (B, K, t) codes -> (B, 1, t*hop*?) PCM
    plus carried state. Feeding chunks of any size yields exactly the
    prefix-concatenation of the batch decode."""
    emb = split_rvq_decode(codes, params["quantizer"], cfg)
    new_state = dict(state)
    if cfg.has_resample:
        emb, up = _stream_conv_transpose1d(
            emb,
            params["upsample"]["w"],
            None,
            state["upsample"],
            stride=2,
            groups=cfg.upsample_groups,
        )
        new_state["upsample"] = up
    emb, tcache = mimi_transformer_step(
        emb.transpose(0, 2, 1), params["decoder_transformer"], cfg,
        state["transformer"],
    )
    new_state["transformer"] = tcache
    audio, sstate = seanet_decode_stream(
        emb.transpose(0, 2, 1), params["decoder"], cfg, state["seanet"]
    )
    new_state["seanet"] = sstate
    return audio, new_state


# --------------------------------------------------------------------------
# Transformer (causal, RoPE rotate-half, sliding window, layer scale)
# --------------------------------------------------------------------------


def _rope_rotate_half(q, cos, sin):
    half = q.shape[-1] // 2
    q1, q2 = q[..., :half], q[..., half:]
    rotated = jnp.concatenate([-q2, q1], axis=-1)
    return q * cos + rotated * sin


def mimi_transformer(x: jnp.ndarray, params: Dict, cfg: MimiConfig) -> jnp.ndarray:
    """(B, T, D) -> (B, T, D). Causal with a sliding attention window."""
    b, t, d = x.shape
    h, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    pos = jnp.arange(t, dtype=jnp.float32)
    inv = 1.0 / (
        cfg.rope_theta
        ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    )
    freqs = pos[:, None] * inv[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    cos, sin = jnp.cos(emb)[None, None], jnp.sin(emb)[None, None]

    q_pos = jnp.arange(t)[:, None]
    k_pos = jnp.arange(t)[None, :]
    allowed = (k_pos <= q_pos) & (q_pos - k_pos < cfg.sliding_window)
    mask = jnp.where(allowed, 0.0, -1e9).astype(jnp.float32)[None, None]

    scale = 1.0 / math.sqrt(hd)
    for lp in params["layers"]:
        hin = _layer_norm(x, lp["ln1.w"], lp["ln1.b"], cfg.norm_eps)
        q = (hin @ lp["q.w"].T).reshape(b, t, h, hd).transpose(0, 2, 1, 3)
        k = (hin @ lp["k.w"].T).reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
        v = (hin @ lp["v.w"].T).reshape(b, t, kvh, hd).transpose(0, 2, 1, 3)
        q = _rope_rotate_half(q, cos, sin)
        k = _rope_rotate_half(k, cos, sin)
        if kvh != h:
            k = jnp.repeat(k, h // kvh, axis=1)
            v = jnp.repeat(v, h // kvh, axis=1)
        scores = (
            jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
            * scale
            + mask
        )
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, h * hd) @ lp["o.w"].T
        x = x + o * lp["ls_attn"][None, None, :]

        hin = _layer_norm(x, lp["ln2.w"], lp["ln2.b"], cfg.norm_eps)
        mlp = jax.nn.gelu(hin @ lp["fc1.w"].T, approximate=False) @ lp["fc2.w"].T
        x = x + mlp * lp["ls_mlp"][None, None, :]
    return x


def _layer_norm(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


# --------------------------------------------------------------------------
# Split residual vector quantizer
# --------------------------------------------------------------------------


def _rvq_encode(emb: jnp.ndarray, q: Dict, n: int) -> jnp.ndarray:
    """emb (B, D_hid, T) -> codes (n, B, T) by residual nearest-centroid."""
    if q.get("in_proj") is not None:
        emb = jnp.einsum("oc,bct->bot", q["in_proj"], emb)
    residual = emb.transpose(0, 2, 1)  # (B, T, D)
    codes = []
    for i in range(n):
        cb = q["codebooks"][i]  # (K, D)
        d = (
            jnp.sum(residual**2, -1, keepdims=True)
            - 2.0 * residual @ cb.T
            + jnp.sum(cb**2, -1)[None, None, :]
        )
        idx = jnp.argmin(d, axis=-1)
        codes.append(idx)
        residual = residual - cb[idx]
    return jnp.stack(codes)  # (n, B, T)


def _rvq_decode(codes: jnp.ndarray, q: Dict) -> jnp.ndarray:
    """codes (B, n, T) -> (B, D_hidden, T)."""
    out = 0.0
    for i in range(codes.shape[1]):
        cb = q["codebooks"][i]
        out = out + cb[codes[:, i]]  # (B, T, D)
    out = out.transpose(0, 2, 1)  # (B, D, T)
    if q.get("out_proj") is not None:
        out = jnp.einsum("oc,bct->bot", q["out_proj"], out)
    return out


def split_rvq_encode(emb, params, cfg: MimiConfig, num_quantizers=None):
    n = num_quantizers or cfg.num_quantizers
    ns = cfg.num_semantic_quantizers
    sem = _rvq_encode(emb, params["semantic"], ns)
    if n > ns:
        ac = _rvq_encode(emb, params["acoustic"], n - ns)
        return jnp.concatenate([sem, ac], axis=0).transpose(1, 0, 2)
    return sem.transpose(1, 0, 2)  # (B, K, T)


def split_rvq_decode(codes, params, cfg: MimiConfig):
    ns = cfg.num_semantic_quantizers
    out = _rvq_decode(codes[:, :ns], params["semantic"])
    if codes.shape[1] > ns:
        out = out + _rvq_decode(codes[:, ns:], params["acoustic"])
    return out


# --------------------------------------------------------------------------
# Full model
# --------------------------------------------------------------------------


def mimi_encode(
    audio: jnp.ndarray, params: Dict, cfg: MimiConfig, num_quantizers=None
) -> jnp.ndarray:
    """(B, 1, T) 24 kHz audio -> (B, K, frames) int codes at frame_rate."""
    emb = seanet_encode(audio, params["encoder"], cfg)
    emb = mimi_transformer(
        emb.transpose(0, 2, 1), params["encoder_transformer"], cfg
    ).transpose(0, 2, 1)
    if cfg.has_resample:
        emb = mimi_conv1d(
            emb,
            params["downsample"]["w"],
            None,
            stride=2,
            pad_mode="replicate",
        )
    return split_rvq_encode(emb, params["quantizer"], cfg, num_quantizers)


def mimi_decode(codes: jnp.ndarray, params: Dict, cfg: MimiConfig) -> jnp.ndarray:
    """(B, K, frames) int codes -> (B, 1, T) 24 kHz audio."""
    emb = split_rvq_decode(codes, params["quantizer"], cfg)
    if cfg.has_resample:
        emb = mimi_conv_transpose1d(
            emb,
            params["upsample"]["w"],
            None,
            stride=2,
            groups=cfg.upsample_groups,
            trim_right_ratio=cfg.trim_right_ratio,
        )
    emb = mimi_transformer(
        emb.transpose(0, 2, 1), params["decoder_transformer"], cfg
    ).transpose(0, 2, 1)
    return seanet_decode(emb, params["decoder"], cfg)


# --------------------------------------------------------------------------
# Weight conversion from transformers MimiModel state dict
# --------------------------------------------------------------------------


def _conv_entry(sd, prefix, dtype) -> Dict:
    w = np.asarray(sd[f"{prefix}.conv.weight"], dtype)
    b = (
        np.asarray(sd[f"{prefix}.conv.bias"], dtype)
        if f"{prefix}.conv.bias" in sd
        else None
    )
    return {"w": jnp.asarray(w), "b": None if b is None else jnp.asarray(b)}


def _seanet_layers(sd, prefix, n_layers, dtype) -> List[Dict]:
    out = []
    for i in range(n_layers):
        base = f"{prefix}.layers.{i}"
        if f"{base}.conv.weight" in sd:
            out.append(_conv_entry(sd, base, dtype))
        elif f"{base}.block.1.conv.weight" in sd:
            blk = _conv_entry(sd, f"{base}.block.1", dtype)
            blk2 = _conv_entry(sd, f"{base}.block.3", dtype)
            out.append(
                {
                    "block.1.w": blk["w"],
                    "block.1.b": blk["b"],
                    "block.3.w": blk2["w"],
                    "block.3.b": blk2["b"],
                }
            )
        # plain ELU layers carry no weights and are implicit in the JAX model
    return [o for o in out]


def _transformer_params(sd, prefix, cfg: MimiConfig, dtype) -> Dict:
    layers = []
    for i in range(cfg.num_hidden_layers):
        b = f"{prefix}.layers.{i}"
        layers.append(
            {
                "q.w": jnp.asarray(np.asarray(sd[f"{b}.self_attn.q_proj.weight"], dtype)),
                "k.w": jnp.asarray(np.asarray(sd[f"{b}.self_attn.k_proj.weight"], dtype)),
                "v.w": jnp.asarray(np.asarray(sd[f"{b}.self_attn.v_proj.weight"], dtype)),
                "o.w": jnp.asarray(np.asarray(sd[f"{b}.self_attn.o_proj.weight"], dtype)),
                "fc1.w": jnp.asarray(np.asarray(sd[f"{b}.mlp.fc1.weight"], dtype)),
                "fc2.w": jnp.asarray(np.asarray(sd[f"{b}.mlp.fc2.weight"], dtype)),
                "ln1.w": jnp.asarray(np.asarray(sd[f"{b}.input_layernorm.weight"], dtype)),
                "ln1.b": jnp.asarray(np.asarray(sd[f"{b}.input_layernorm.bias"], dtype)),
                "ln2.w": jnp.asarray(np.asarray(sd[f"{b}.post_attention_layernorm.weight"], dtype)),
                "ln2.b": jnp.asarray(np.asarray(sd[f"{b}.post_attention_layernorm.bias"], dtype)),
                "ls_attn": jnp.asarray(np.asarray(sd[f"{b}.self_attn_layer_scale.scale"], dtype)),
                "ls_mlp": jnp.asarray(np.asarray(sd[f"{b}.mlp_layer_scale.scale"], dtype)),
            }
        )
    return {"layers": layers}


def _rvq_params(sd, prefix, n, dtype, eps=1e-5) -> Dict:
    codebooks = []
    for i in range(n):
        b = f"{prefix}.layers.{i}.codebook"
        embed_sum = np.asarray(sd[f"{b}.embed_sum"], np.float64)
        usage = np.asarray(sd[f"{b}.cluster_usage"], np.float64)
        embed = embed_sum / np.clip(usage, eps, None)[:, None]
        codebooks.append(jnp.asarray(embed.astype(dtype)))
    out = {"codebooks": codebooks, "in_proj": None, "out_proj": None}
    if f"{prefix}.input_proj.weight" in sd:
        out["in_proj"] = jnp.asarray(
            np.asarray(sd[f"{prefix}.input_proj.weight"], dtype)[:, :, 0]
        )
        out["out_proj"] = jnp.asarray(
            np.asarray(sd[f"{prefix}.output_proj.weight"], dtype)[:, :, 0]
        )
    return out


def convert_mimi_state_dict(sd: Dict, cfg: MimiConfig, dtype=np.float32) -> Dict:
    """transformers MimiModel state_dict (numpy/torch tensors) -> JAX pytree."""
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}
    n_enc = 1 + len(cfg.upsampling_ratios) * (cfg.num_residual_layers + 2) + 2
    params = {
        "encoder": {"layers": _seanet_layers(sd, "encoder", n_enc, dtype)},
        "decoder": {"layers": _seanet_layers(sd, "decoder", n_enc, dtype)},
        "encoder_transformer": _transformer_params(
            sd, "encoder_transformer", cfg, dtype
        ),
        "decoder_transformer": _transformer_params(
            sd, "decoder_transformer", cfg, dtype
        ),
        "quantizer": {
            "semantic": _rvq_params(
                sd,
                "quantizer.semantic_residual_vector_quantizer",
                cfg.num_semantic_quantizers,
                dtype,
            ),
            "acoustic": _rvq_params(
                sd,
                "quantizer.acoustic_residual_vector_quantizer",
                cfg.num_quantizers - cfg.num_semantic_quantizers,
                dtype,
            ),
        },
    }
    if "downsample.conv.weight" in sd:
        params["downsample"] = {
            "w": jnp.asarray(np.asarray(sd["downsample.conv.weight"], dtype))
        }
        params["upsample"] = {
            "w": jnp.asarray(np.asarray(sd["upsample.conv.weight"], dtype))
        }
    return params


def load_mimi_params(path, cfg: MimiConfig, dtype=np.float32) -> Dict:
    """Load Mimi weights from a transformers-format safetensors file
    (e.g. kyutai/mimi model.safetensors). The reference instead pulls the
    moshi-MLX export (load.rs:176-186); that naming scheme is not
    supported here — re-export via transformers if needed.
    """
    from safetensors import safe_open

    sd = {}
    with safe_open(str(path), framework="np") as f:
        for k in f.keys():
            sd[k] = f.get_tensor(k)
    if "encoder.layers.0.conv.weight" not in sd:
        raise ValueError(
            f"{path} does not look like a transformers-format Mimi "
            "checkpoint (expected encoder.layers.N.conv.weight names)"
        )
    return convert_mimi_state_dict(sd, cfg, dtype)


class MimiCodec:
    """Facade with the FireflyCodec interface (encode/decode/sample_rate),
    usable as the pipeline codec for DualAR checkpoints
    (reference: server/lib/audio/codec.rs Codec::Mimi)."""

    DECODE_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)

    def __init__(
        self,
        params: Dict,
        cfg: MimiConfig,
        num_quantizers: Optional[int] = None,
        *,
        buckets: Tuple[int, ...] = DECODE_BUCKETS,
    ) -> None:
        self.params = params
        self.cfg = dataclasses.replace(cfg)  # keep a copy
        self.sample_rate = cfg.sampling_rate
        self.num_quantizers = num_quantizers or cfg.num_quantizers
        self.buckets = buckets
        self._decode_jit = jax.jit(
            lambda p, c: mimi_decode(c, p, self.cfg)
        )
        self._encode_jit = jax.jit(
            lambda p, a: mimi_encode(a, p, self.cfg, self.num_quantizers)
        )
        self._step_jit: Dict = {}
        self._stream_init_cache: Dict = {}

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return n  # beyond the largest bucket: compile exact size

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """(K, T) or (B, K, T) codes -> (B, T*spf) PCM. The code axis is
        padded to a bucket so arbitrary chunk lengths reuse compilations;
        every op in the Mimi decode path is causal, so the padded tail
        cannot affect the first T frames' samples and trimming is exact
        (the same property the streaming decode_step relies on)."""
        codes = np.asarray(codes)
        if codes.ndim == 2:
            codes = codes[None]
        b, k, t = codes.shape
        tb = self._bucket(t)
        padded = np.zeros((b, k, tb), np.int32)
        padded[:, :, :t] = codes
        audio = np.asarray(
            self._decode_jit(self.params, jnp.asarray(padded))
        )[:, 0, :]
        if tb == t:
            return audio
        spf = audio.shape[-1] // tb
        return audio[:, : t * spf]

    def encode(self, audio: np.ndarray) -> np.ndarray:
        audio = np.atleast_2d(np.asarray(audio, np.float32))[:, None, :]
        return np.asarray(self._encode_jit(self.params, jnp.asarray(audio)))

    # -- streaming (reference: server/lib/audio/mimi.rs:52-88) -------------

    @property
    def can_stream(self) -> bool:
        """Every op in the Mimi decode path is causal; streaming via
        start_stream is always available."""
        return True

    @property
    def samples_per_frame(self) -> int:
        """Output PCM samples per code frame (generic codec interface —
        FireflyCodec has the same property): 1920 at 24 kHz / 12.5 Hz."""
        return int(round(self.sample_rate / self.cfg.frame_rate))

    def start_stream(
        self, batch: int = 1, max_step_frames: int = 32
    ) -> "MimiStreamSession":
        """Open a streaming decode session: feed code frames incrementally,
        receive the exact same PCM the batch decode would produce for the
        growing prefix. Counterpart of the reference's `decode_step` with
        carried state; dropping the session is `reset_state`
        (mimi.rs:52-88, reset after batch decode at codec.rs:41-43)."""
        return MimiStreamSession(self, batch, max_step_frames)

    def decode_step(self, codes: np.ndarray, state):
        """One streaming step: codes (K, t) or (B, K, t) -> (pcm (B, t*spf),
        new_state). Use start_stream() for chunk-size bucketing and the
        frames_per_step bound; state comes from mimi_decode_stream_init."""
        audio, state = self.decode_step_async(codes, state)
        return np.asarray(audio), state

    def decode_step_async(self, codes: np.ndarray, state):
        """decode_step without the device->host sync: returns DEVICE PCM
        (B, t*spf) so a session can dispatch several pieces and fetch
        them in one round trip (StreamSessionBase.feed)."""
        codes = np.asarray(codes)
        if codes.ndim == 2:
            codes = codes[None]
        t = codes.shape[-1]
        # Ring-cache safety bound: the KV ring has sliding_window + max_step
        # slots (transformer_stream_init); feeding more transformer positions
        # than the max_step oversize in ONE call would recycle slots still
        # inside earlier in-chunk queries' windows -> silently wrong audio.
        # (StreamSessionBase.feed subdivides; direct callers must not exceed.)
        tsteps = t * (2 if self.cfg.has_resample else 1)
        ring = int(state["transformer"]["slot_pos"].shape[0])
        max_step = ring - self.cfg.sliding_window
        if tsteps > max_step:
            raise ValueError(
                f"decode_step fed {t} code frames = {tsteps} transformer "
                f"positions, but this stream state supports at most "
                f"{max_step} per call (ring {ring} - window "
                f"{self.cfg.sliding_window}); re-init the stream state with "
                f"a larger max_step or feed smaller chunks"
            )
        key = ("step", codes.shape)
        if key not in self._step_jit:
            self._step_jit[key] = jax.jit(
                lambda p, c, s: mimi_decode_step(c, p, self.cfg, s)
            )
        audio, state = self._step_jit[key](
            self.params, jnp.asarray(codes, jnp.int32), state
        )
        return audio[:, 0, :], state


class MimiStreamSession(StreamSessionBase):
    """Stateful incremental Mimi decoder over one audio stream (session
    mechanics in stream_conv.StreamSessionBase): feed(codes (K, t))
    returns the PCM for exactly those t frames; the concatenation over
    calls equals MimiCodec.decode of the full code sequence
    (golden-tested in tests/test_mimi.py)."""

    def _tsteps(self) -> int:
        return self.max_step * (2 if self.codec.cfg.has_resample else 1)

    def _template(self):
        # the zero init state is immutable (feed threads NEW state through
        # decode_step), so one template per (batch, tsteps) is shared by
        # every session. Built under ONE jit: eager per-leaf zeros would
        # compile+dispatch one tiny device program per leaf, which a cold
        # 1-vCPU host pays as tens of seconds of serialized compiles and
        # remote executions through the axon tunnel (docs/TPU_NOTES.md #14;
        # measured on the Firefly session, same mechanics). The init reads
        # params only for shapes/dtypes, so no weights become constants.
        cache = self.codec._stream_init_cache
        key = (self.batch, self._tsteps())
        if key not in cache:
            cache[key] = jax.jit(
                lambda: mimi_decode_stream_init(
                    self.codec.params, self.codec.cfg, self.batch,
                    max_step=self._tsteps(),
                )
            )()
        return cache[key]
