"""One DualAR frame: constrained semantic sampling + the fast codebook loop.

This is the body of the hot decode loop. Counterpart of the reference's
`SingleBatchGenerator::next` (reference: lm/generate/single_batch.rs:74-215)
but fully on-device: the reference syncs to the host once per slow step and
once per codebook to sample; here the whole frame — slow logits, constrained
semantic draw, 4-layer fast transformer per codebook, repetition penalty,
nucleus sampling — is a single traced computation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fish_speech_tpu.config import DualARConfig, TokenConfig, WhichLM
from fish_speech_tpu.models.dual_ar import (
    DualARParams,
    fast_embed,
    fast_hist_init,
    fast_step,
)
from fish_speech_tpu.ops.sampling import (
    RepPenWindow,
    RowSampling,
    SamplingArgs,
    legacy_pad_eos_sample,
    legacy_pad_eos_sample_rows,
    sample_top_k_top_p,
    sample_top_k_top_p_dynamic,
)


def semantic_head_columns(
    lm: WhichLM, token_cfg: TokenConfig, cfg: DualARConfig
) -> "np.ndarray":
    """LM-head column indices that constrained semantic sampling can ever
    read. The engine gathers the (dim, V) output weight down to these
    columns ONCE, so the per-frame head matmul reads ~1 MB instead of the
    full ~200 MB head (the reference computes full logits and slices after
    the fact — generate/utils.rs:6-33; on TPU the slice moves into the
    weight, which is free).

    Layouts: Fish <=1.4 -> [pad, im_end] (2-way head,
    single_batch.rs:103-124); 1.5 / DualAR -> [im_end] ++ semantic range
    (single_batch.rs:126-140)."""
    import numpy as np

    if lm in (WhichLM.FISH_1_2, WhichLM.FISH_1_4):
        return np.array([token_cfg.pad_id, token_cfg.im_end_id], np.int32)
    return np.concatenate(
        [
            np.array([token_cfg.im_end_id], np.int32),
            token_cfg.semantic_start_id
            + np.arange(cfg.codebook_size, dtype=np.int32),
        ]
    )


def sample_semantic(
    logits: jnp.ndarray,
    lm: WhichLM,
    token_cfg: TokenConfig,
    cfg: DualARConfig,
    sampling: SamplingArgs,
    rng: jax.Array,
    samp: "RowSampling" = None,
    dyn_top_k_cap: int = 256,
) -> jnp.ndarray:
    """Constrained (audio-only) semantic-token draw over WINDOWED logits.

    logits: (B, W) f32 where W == len(semantic_head_columns(...)) — the
    head is pre-gathered to the audio-legal columns. Returns vocab ids.

    * Fish 1.5 / DualAR: top-k/top-p over [im_end] ++ semantic range and
      rescale the sampled index back to vocab space
      (reference: generate/utils.rs:6-56, single_batch.rs:126-140).
    * Fish 1.2 / 1.4: the slow head only ever chooses PAD vs <|im_end|>
      (reference: single_batch.rs:103-124).
    """
    if lm in (WhichLM.FISH_1_2, WhichLM.FISH_1_4):
        if samp is not None:  # dynamic engines: rng is (B, 2) row keys
            return legacy_pad_eos_sample_rows(
                logits[:, 0], logits[:, 1], token_cfg.pad_id,
                token_cfg.im_end_id, rng,
            )
        return legacy_pad_eos_sample(
            logits[:, 0], logits[:, 1], token_cfg.pad_id, token_cfg.im_end_id, rng
        )

    if samp is not None:
        # k_max is a STATIC cap on the dynamic top_k (requests clamp to
        # it): lax.top_k at k_max == the full head width is a complete
        # per-row sort, measured at ~30% of the 16-way serving decode
        # step (p50 RTF 0.163 -> see BASELINE.md r4). With the serving
        # default top_p=0.8 active, ranks beyond 256 carry no
        # practically reachable mass.
        tok = sample_top_k_top_p_dynamic(
            logits, rng, temp=samp.temp, top_p=samp.top_p,
            top_k=samp.top_k,
            k_max=min(dyn_top_k_cap, logits.shape[-1]),
        )
    else:
        tok = sample_top_k_top_p(
            logits, rng, temp=sampling.temp, top_p=sampling.top_p, top_k=sampling.top_k
        )
    return jnp.where(
        tok == 0, token_cfg.im_end_id, token_cfg.semantic_start_id + tok - 1
    ).astype(jnp.int32)


class FrameResult(NamedTuple):
    tokens: jnp.ndarray  # (B, C+1) int32 — semantic + codebook rows
    is_eos: jnp.ndarray  # (B,) bool
    rep_pen: RepPenWindow


def generate_frame(
    params: DualARParams,
    cfg: DualARConfig,
    token_cfg: TokenConfig,
    lm: WhichLM,
    sampling: SamplingArgs,
    logits: jnp.ndarray,
    hidden: jnp.ndarray,
    rep_pen: RepPenWindow,
    prev_tokens,  # (B, C+1) int32 or None on the prefill frame
    rng: jax.Array,
    *,
    samp: "RowSampling" = None,
    use_fused_fast: bool = False,
    fused_interpret: bool = False,
    dyn_top_k_cap: int = 256,
) -> FrameResult:
    """Sample the semantic token, then run the fast transformer over the
    codebook axis to fill the remaining rows of the frame.

    samp: per-row DEVICE sampling params (dynamic engines); `rng` is then
    (B, 2) per-row key chains instead of one key, and `sampling` is
    ignored for math (one compiled program serves any config). Static
    engines pass samp=None and compile `sampling` in.

    dyn_top_k_cap: static ceiling on the dynamic per-row top_k (requests
    asking for more — or 0 = "all" — clamp to it). Bounds the
    lax.top_k width: at k_max == vocab the dynamic sampler is a full
    per-row sort, which measured ~30% of the 16-way serving decode step.

    The fast KV cache is created fresh every frame — the reference clears
    it per frame too (single_batch.rs:146); at num_codebooks entries it
    lives entirely in registers/VMEM once jitted.
    """
    b = logits.shape[0]
    if samp is not None:
        # one split per row: C+1 subkeys (semantic + each codebook step)
        ks = jax.vmap(
            lambda k: jax.random.split(k, cfg.num_codebooks + 1)
        )(rng)  # (B, C+1, 2)
        sem_rng = ks[:, 0]
    else:
        rng, sem_rng = jax.random.split(rng)
    semantic = sample_semantic(
        logits, lm, token_cfg, cfg, sampling, sem_rng, samp=samp,
        dyn_top_k_cap=dyn_top_k_cap,
    )
    is_eos = semantic == token_cfg.im_end_id

    # Repetition-penalty window update: push the previous frame's codebook
    # tokens, one slot per frame (reference: single_batch.rs:162-167 calls
    # apply(prev_frame_token) which pushes then divides). The prefill frame
    # has no previous tokens, so nothing is pushed.
    if samp is not None:
        # dynamic: the penalty value is a device operand; rows with 1.0
        # divide by 1.0 (push cost is a few lanes — always on)
        rep_pen_enabled = not cfg.depthwise_wte
    else:
        rep_pen_enabled = (
            not cfg.depthwise_wte and sampling.repetition_penalty != 1.0
        )
    if prev_tokens is not None and rep_pen_enabled:
        rep_pen = rep_pen.push(prev_tokens[:, 1:])

    if use_fused_fast and samp is not None:
        # Batched dynamic variant: B rows share ONE VMEM weight fetch per
        # frame (the XLA loop re-reads the fast stack per codebook step —
        # 8x/frame), per-request sampling params ride in as SMEM
        # operands. Gumbel draws are made OUTSIDE with the exact keys and
        # shapes sample_top_k_top_p_dynamic uses, so both paths sample
        # identically (token-parity: tests/test_fast_frame.py).
        from fish_speech_tpu.ops.fast_frame_pallas import (
            fused_fast_frame_batched,
        )

        k_dyn = min(dyn_top_k_cap, cfg.codebook_size)
        keys_flat = ks[:, 1:].reshape(b * cfg.num_codebooks, 2)
        gum = jax.vmap(
            lambda kk: jax.random.gumbel(kk, (k_dyn,), dtype=jnp.float32)
        )(keys_flat).reshape(b, cfg.num_codebooks, k_dyn)
        toks = fused_fast_frame_batched(
            params,
            cfg,
            samp,
            hidden,
            rep_pen.tokens,
            gum,
            is_eos,
            rep_enabled=rep_pen_enabled,
            interpret=fused_interpret,
        )  # (B, C)
        frame = jnp.concatenate([semantic[:, None], toks], axis=1)
        return FrameResult(tokens=frame, is_eos=is_eos, rep_pen=rep_pen)

    if use_fused_fast:
        # Whole-frame Pallas kernel: all codebook steps (fast layers,
        # rep-pen, top-k/top-p gumbel draw, next-step embedding) in one
        # kernel whose weights are fetched into VMEM once per frame
        # (ops/fast_frame_pallas.py; token-exact vs the XLA loop below).
        # The gumbel noise is drawn OUTSIDE with the same rng splits and
        # shapes the XLA sampler uses, so both paths sample identically.
        from fish_speech_tpu.ops.fast_frame_pallas import fused_fast_frame

        cb_rngs = jax.random.split(rng, cfg.num_codebooks)
        k_eff = min(sampling.top_k, cfg.codebook_size)
        gum = jnp.stack(
            [
                jax.random.gumbel(cb_rngs[cb], (1, k_eff), dtype=jnp.float32)[0]
                for cb in range(cfg.num_codebooks)
            ]
        )  # (C, k_eff)
        toks = fused_fast_frame(
            params,
            cfg,
            sampling,
            hidden,
            rep_pen.tokens[0],
            gum,
            is_eos,
            rep_enabled=rep_pen_enabled,
            interpret=fused_interpret,
        )  # (C,)
        frame = jnp.concatenate([semantic[:, None], toks[None, :]], axis=1)
        return FrameResult(tokens=frame, is_eos=is_eos, rep_pen=rep_pen)

    # The per-frame codebook loop is UNROLLED in Python: with <= 8 steps of
    # a 4-layer model every shape and index is static, the fast "cache" is
    # a concat-grown history (no pre-allocated buffer, no dynamic-index
    # updates), and no mask is needed. A lax.scan version of this loop
    # (traced codebook index into RoPE/cache/mask) compiles ~10x slower on
    # the TPU toolchain and runs no faster; the unrolled form is both the
    # simplest and the fastest here.
    if samp is None:
        cb_rngs = jax.random.split(rng, cfg.num_codebooks)
    hist = fast_hist_init(cfg, b, hidden.dtype)
    x = hidden[:, None, :]
    toks = []
    for cb in range(cfg.num_codebooks):
        cb_logits, hist = fast_step(params, cfg, x, hist, cb)
        if rep_pen_enabled:
            row = RepPenWindow(tokens=rep_pen.tokens[:, cb], ptr=rep_pen.ptr)
            if samp is not None:
                cb_logits = row.penalize_rows(cb_logits, samp.rep_pen)
            else:
                cb_logits = row.penalize(
                    cb_logits, sampling.repetition_penalty
                )
        if samp is not None:
            tok = sample_top_k_top_p_dynamic(
                cb_logits, ks[:, cb + 1], temp=samp.temp,
                top_p=samp.top_p, top_k=samp.top_k,
                k_max=min(dyn_top_k_cap, cfg.codebook_size),
            )
        else:
            tok = sample_top_k_top_p(
                cb_logits,
                cb_rngs[cb],
                temp=sampling.temp,
                top_p=sampling.top_p,
                top_k=sampling.top_k,
            )
        # EOS frames emit zero codebooks (reference: single_batch.rs:152-155)
        tok = jnp.where(is_eos, 0, tok)
        x = fast_embed(params, cfg, tok, cb)
        toks.append(tok)

    frame = jnp.concatenate(
        [semantic[:, None], jnp.stack(toks, axis=1)], axis=1
    )  # (B, C+1)
    return FrameResult(tokens=frame, is_eos=is_eos, rep_pen=rep_pen)
