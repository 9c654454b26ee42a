"""Teacher-forced DualAR training loss.

The reference framework is inference-only (SURVEY §2.6: no training,
no distributed support), so this subsystem has no Rust counterpart to
cite — it exists because a TPU-native framework that serves DualAR
checkpoints should also be able to produce them (finetune on new
voices/data). The factorization mirrors generation exactly
(models/dual_ar.py):

* slow stack: full-sequence causal forward over the frame axis; the
  logits at position t predict the SEMANTIC token of frame t+1 — the
  same next-frame convention the decode loop uses (slow_decode_step's
  hidden at position p feeds the fast stack that emits the frame
  appended at p+1).
* fast stack: for every position t, a C-step causal forward over the
  CODEBOOK axis, teacher-forced with frame t+1's ground-truth codebook
  tokens: inputs [hidden_t, femb(cb_0), ..., femb(cb_{C-2})], targets
  [cb_0, ..., cb_{C-1}]. RoPE is indexed by codebook position and the
  incremental no-mask history of fast_step is exactly a causal mask
  here (each step only ever saw its predecessors).

Losses are masked: slow CE over real (non-pad) next positions, fast CE
only where the target frame is an audio frame (its semantic token lies
in the semantic range — codebook rows of text frames are zeros by
construction, training on them would teach the fast stack to emit
zeros after text).

Everything is shape-static and scan/vmap-based — one compiled program
for any batch; jax.checkpoint on the slow layer body keeps the
full-sequence activations from blowing HBM at train time.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fish_speech_tpu.config import DualARConfig, TokenConfig
from fish_speech_tpu.models.dual_ar import (
    _project_qkv,
    _rope_slice,
    embed_tokens,
)
from fish_speech_tpu.ops.attention import NEG_INF, gqa_attention
from fish_speech_tpu.ops.norms import rms_norm
from fish_speech_tpu.ops.quant import matmul as _mm
from fish_speech_tpu.ops.rope import apply_rope_interleaved


def _layer_train(x, lp, cos, sin, mask, cfg: DualARConfig):
    """One transformer layer, no KV cache (training never decodes)."""
    b, s, d = x.shape
    h = rms_norm(x, lp["attention_norm"], cfg.norm_eps)
    q, k, v = _project_qkv(h, lp, cfg)
    q = apply_rope_interleaved(q, cos, sin)
    k = apply_rope_interleaved(k, cos, sin)
    scale = 1.0 / (cfg.head_dim**0.5)
    attn = gqa_attention(q, k, v, mask, scale)
    x = x + _mm(attn.transpose(0, 2, 1, 3).reshape(b, s, d), lp["wo"])
    h2 = rms_norm(x, lp["ffn_norm"], cfg.norm_eps)
    gate = jax.nn.silu(_mm(h2, lp["w1"]).astype(jnp.float32)).astype(x.dtype)
    return x + _mm(gate * _mm(h2, lp["w3"]), lp["w2"])


def slow_forward_full(
    params,
    cfg: DualARConfig,
    token_cfg: TokenConfig,
    tokens: jnp.ndarray,   # (B, C+1, S) int32
    seq_lens: jnp.ndarray,  # (B,) int32 real lengths
    remat: bool = True,
) -> jnp.ndarray:
    """Pre-norm hidden states at EVERY position: (B, S, D).

    Same embedding/mask semantics as slow_prefill (models/dual_ar.py)
    minus the cache plumbing: causal x sliding-window(max_seq_len) x
    right-pad key masking.
    """
    b, _, s = tokens.shape
    x = embed_tokens(params, cfg, token_cfg, tokens)  # (B, S, D)
    cos, sin = _rope_slice(cfg, s, 0)

    q_pos = jnp.arange(s)[:, None]
    k_pos = jnp.arange(s)[None, :]
    causal = (k_pos <= q_pos) & (q_pos - k_pos < cfg.max_seq_len)
    k_valid = k_pos < seq_lens[:, None]  # (B, S)
    allowed = causal[None, :, :] & k_valid[:, None, :]
    mask = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)[:, None, :, :]

    layer = _layer_train
    if remat:
        layer = jax.checkpoint(
            _layer_train, static_argnums=(5,), prevent_cse=False
        )

    def body(carry_x, lp):
        return layer(carry_x, lp, cos, sin, mask, cfg), None

    x, _ = jax.lax.scan(body, x, params["slow"])
    return x


def fast_forward_teacher(
    params,
    cfg: DualARConfig,
    hidden: jnp.ndarray,     # (N, D) slow hidden rows (pre-norm residual)
    codebooks: jnp.ndarray,  # (N, C) int32 ground-truth target codebooks
) -> jnp.ndarray:
    """Teacher-forced fast-stack logits: (N, C, cb_size) f32.

    Position i of the C-length fast sequence consumes femb(cb_{i-1})
    (position 0 consumes the slow hidden) and predicts cb_i — the exact
    incremental schedule of fast_step/fast_embed, vectorized over N and
    run as one causal forward. Layers are scanned here (training is
    throughput-shaped; the decode-path unrolling argument —
    fast_step's docstring — is about tiny per-step matvecs)."""
    n, c = codebooks.shape
    d = cfg.dim

    # Inputs: [hidden, femb(cb_0) ... femb(cb_{C-2})] along the codebook axis.
    cb_in = codebooks[:, : c - 1]  # (N, C-1)
    if cfg.depthwise_wte:
        cb_in = cb_in + jnp.arange(c - 1, dtype=cb_in.dtype)[None, :] * cfg.codebook_size
    emb = jnp.take(params["fast_embeddings"], cb_in, axis=0)  # (N, C-1, D)
    x = jnp.concatenate([hidden[:, None, :].astype(emb.dtype), emb], axis=1)

    cos, sin = _rope_slice(cfg, c, 0)
    q_pos = jnp.arange(c)[:, None]
    k_pos = jnp.arange(c)[None, :]
    mask = jnp.where(k_pos <= q_pos, 0.0, NEG_INF).astype(jnp.float32)[
        None, None, :, :
    ]

    def body(carry_x, lp):
        return _layer_train(carry_x, lp, cos, sin, mask, cfg), None

    x, _ = jax.lax.scan(body, x, params["fast"])

    fast_out = rms_norm(x, params["fast_norm"], cfg.norm_eps)  # (N, C, D)
    w = params["fast_output"]  # (D, fast_output_size)
    logits = (fast_out @ w).astype(jnp.float32)  # (N, C, W)
    if cfg.depthwise_output:
        # step i scores against head columns [i*cb : (i+1)*cb] — gather
        # the per-step block (fast_step slices the same window).
        logits = logits.reshape(n, c, cfg.num_codebooks, cfg.codebook_size)
        logits = jnp.take_along_axis(
            logits,
            jnp.arange(c)[None, :, None, None],
            axis=2,
        )[:, :, 0, :]
    return logits


def _masked_ce(logits: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray):
    """Mean cross-entropy over mask=True positions; returns (loss, n, acc)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(mask), 1)
    loss = jnp.sum(jnp.where(mask, nll, 0.0)) / n
    acc = jnp.sum(jnp.where(mask, jnp.argmax(logits, -1) == targets, False)) / n
    return loss, jnp.sum(mask), acc


def dual_ar_loss(
    params,
    cfg: DualARConfig,
    token_cfg: TokenConfig,
    batch: Dict[str, jnp.ndarray],
    fast_weight: float = 1.0,
    remat: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """batch: {"tokens": (B, C+1, S) int32, "seq_lens": (B,) int32}.

    Returns (total loss, metrics). Slow CE predicts next-position
    semantic tokens; fast CE predicts next-position codebook rows at
    audio positions, teacher-forced.
    """
    tokens = batch["tokens"]
    seq_lens = batch["seq_lens"]
    b, cp1, s = tokens.shape
    c = cp1 - 1

    hidden = slow_forward_full(
        params, cfg, token_cfg, tokens, seq_lens, remat=remat
    )  # (B, S, D)

    # ---- slow head: position t predicts semantic token at t+1
    slow_out = rms_norm(hidden, params["norm"], cfg.norm_eps)
    slow_logits = (slow_out[:, :-1, :] @ params["output"]).astype(jnp.float32)
    sem_targets = tokens[:, 0, 1:]  # (B, S-1)
    valid_next = (jnp.arange(1, s)[None, :] < seq_lens[:, None])  # (B, S-1)
    slow_loss, slow_n, slow_acc = _masked_ce(
        slow_logits, sem_targets, valid_next
    )

    # ---- fast head: hidden_t predicts frame t+1's codebooks (audio only)
    sem_next = sem_targets
    if token_cfg.semantic_end_id is not None:
        is_audio = (sem_next >= token_cfg.semantic_start_id) & (
            sem_next <= token_cfg.semantic_end_id
        )
    else:
        is_audio = sem_next == token_cfg.semantic_start_id
    fast_mask = is_audio & valid_next  # (B, S-1)

    cb_targets = tokens[:, 1:, 1:].transpose(0, 2, 1)  # (B, S-1, C)
    n = b * (s - 1)
    fast_logits = fast_forward_teacher(
        params,
        cfg,
        hidden[:, :-1, :].reshape(n, cfg.dim),
        cb_targets.reshape(n, c),
    ).reshape(b, s - 1, c, -1)
    fast_loss, fast_n, fast_acc = _masked_ce(
        fast_logits, cb_targets, fast_mask[..., None] & jnp.ones((1, 1, c), bool)
    )

    total = slow_loss + fast_weight * fast_loss
    metrics = {
        "loss": total,
        "slow_loss": slow_loss,
        "fast_loss": fast_loss,
        "slow_acc": slow_acc,
        "fast_acc": fast_acc,
        "slow_tokens": slow_n,
        "fast_tokens": fast_n,
    }
    return total, metrics
