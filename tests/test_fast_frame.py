"""Fused whole-frame fast-stack Pallas kernel: token parity vs the XLA
codebook loop (ops/fast_frame_pallas.py, interpret mode on CPU).

The kernel replaces generate/frame.py's unrolled fast loop — fast
transformer, repetition penalty, top-k/top-p gumbel sampling, next-step
embedding — for batch-1 decode. Every test here asserts EXACT token
equality: the kernel reproduces the XLA sampler's math rank-for-rank and
consumes the same gumbel draws (same rng splits), so any drift is a bug.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import DualARConfig, TokenConfig, WhichLM
from fish_speech_tpu.generate import frame as framemod
from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.models.dual_ar import init_dual_ar_params
from fish_speech_tpu.ops.fast_frame_pallas import (
    fused_fast_frame,
    fused_fast_frame_supported,
)
from fish_speech_tpu.ops.sampling import RepPenWindow, SamplingArgs

CFG = DualARConfig(
    vocab_size=256,
    n_layer=2,
    n_fast_layer=2,
    n_head=4,
    dim=64,
    intermediate_size=128,
    n_local_heads=2,
    head_dim=16,
    rope_base=10000.0,
    norm_eps=1e-6,
    max_seq_len=64,
    codebook_size=32,
    num_codebooks=4,
)
TOK = TokenConfig(im_end_id=9, pad_id=5, semantic_start_id=10, semantic_end_id=41)


def _setup(cfg, seed=0):
    params = dict(init_dual_ar_params(jax.random.PRNGKey(seed), cfg, dtype=jnp.float32))
    cols = framemod.semantic_head_columns(WhichLM.FISH_1_5, TOK, cfg)
    params["output"] = jnp.take(params["output"], jnp.asarray(cols), axis=1)
    return params


def _frame_pair(params, cfg, sampling, seed):
    """Run generate_frame via XLA and via the fused kernel with identical
    inputs/rng; return both token frames."""
    logits = jax.random.normal(
        jax.random.PRNGKey(seed + 100), (1, params["output"].shape[1])
    ) * 2.0
    hidden = jax.random.normal(jax.random.PRNGKey(seed + 200), (1, cfg.dim)).astype(
        jnp.float32
    )
    rp = RepPenWindow.init((1, cfg.num_codebooks), 16)
    prev = jnp.asarray(
        np.random.default_rng(seed).integers(0, cfg.codebook_size, (1, cfg.num_codebooks + 1)),
        jnp.int32,
    )
    rng = jax.random.PRNGKey(seed)
    ref = framemod.generate_frame(
        params, cfg, TOK, WhichLM.FISH_1_5, sampling, logits, hidden, rp, prev, rng
    )
    got = framemod.generate_frame(
        params, cfg, TOK, WhichLM.FISH_1_5, sampling, logits, hidden, rp, prev, rng,
        use_fused_fast=True, fused_interpret=True,
    )
    return np.asarray(ref.tokens), np.asarray(got.tokens), ref, got


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_frame_matches_xla(seed):
    params = _setup(CFG)
    sampling = SamplingArgs(temp=0.7, top_p=0.8, top_k=16, repetition_penalty=1.3)
    ref, got, r, g = _frame_pair(params, CFG, sampling, seed)
    np.testing.assert_array_equal(ref, got)
    assert bool(np.asarray(r.is_eos)[0]) == bool(np.asarray(g.is_eos)[0])
    np.testing.assert_array_equal(np.asarray(r.rep_pen.tokens), np.asarray(g.rep_pen.tokens))


@pytest.mark.parametrize("batch", [2, 4, 8])
def test_fused_frame_batched_dynamic_matches_xla(batch):
    """Batched dynamic-sampling kernel (r4): per-row temp/top_p/top_k/
    rep-pen as device operands, per-row key chains — token-exact vs the
    XLA dynamic path for mixed row configs incl. an argmax row and an
    EOS row. batch=8 exercises the multi-row-block grid (two blocks of
    _row_block(8)=4, the VMEM-bounded path the B=16 serving shape uses)."""
    from fish_speech_tpu.ops.sampling import RowSampling

    params = _setup(CFG)
    rng_np = np.random.default_rng(batch)
    logits = jnp.asarray(
        rng_np.normal(size=(batch, params["output"].shape[1])) * 2.0,
        jnp.float32,
    )
    # row 0 -> im_end (EOS); others -> semantic range
    logits = logits.at[0, :].set(-30.0).at[0, 0].set(30.0)
    if batch > 2:
        logits = logits.at[2, 0].set(-100.0)
    hidden = jnp.asarray(
        rng_np.normal(size=(batch, CFG.dim)), jnp.float32
    )
    rp = RepPenWindow(
        tokens=jnp.asarray(
            rng_np.integers(-1, CFG.codebook_size,
                            (batch, CFG.num_codebooks, 12)),
            jnp.int32,
        ),
        ptr=jnp.zeros((), jnp.int32),
    )
    prev = jnp.asarray(
        rng_np.integers(0, CFG.codebook_size, (batch, CFG.num_codebooks + 1)),
        jnp.int32,
    )
    samp = RowSampling(
        temp=jnp.asarray(([0.7, 0.0, 1.2, 0.5] * 2)[:batch]),
        top_p=jnp.asarray(([0.8, 1.0, 0.6, 0.95] * 2)[:batch]),
        top_k=jnp.asarray(([16, 0, 4, 32] * 2)[:batch], jnp.int32),
        rep_pen=jnp.asarray(([1.3, 1.0, 1.5, 1.1] * 2)[:batch]),
    )
    keys = jnp.stack([jax.random.PRNGKey(100 + i) for i in range(batch)])
    ref = framemod.generate_frame(
        params, CFG, TOK, WhichLM.FISH_1_5, SamplingArgs(), logits, hidden,
        rp, prev, keys, samp=samp,
    )
    got = framemod.generate_frame(
        params, CFG, TOK, WhichLM.FISH_1_5, SamplingArgs(), logits, hidden,
        rp, prev, keys, samp=samp,
        use_fused_fast=True, fused_interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(ref.is_eos), np.asarray(got.is_eos))
    assert bool(np.asarray(ref.is_eos)[0])  # the spiked row really is EOS
    np.testing.assert_array_equal(
        np.asarray(ref.rep_pen.tokens), np.asarray(got.rep_pen.tokens)
    )


def test_engine_batched_dynamic_fused_matches_xla():
    """Engine-level: a dynamic batch-4 engine with fast_frame_impl='fused'
    reproduces the XLA engine's decode chunks exactly."""
    params = init_dual_ar_params(jax.random.PRNGKey(2), CFG, dtype=jnp.float32)
    sampling = SamplingArgs(temp=0.8, top_p=0.9, top_k=8, repetition_penalty=1.2)
    rng = np.random.default_rng(5)
    prompts = [
        np.concatenate(
            [
                rng.integers(TOK.semantic_start_id, TOK.semantic_end_id, size=(1, 6)),
                np.zeros((CFG.num_codebooks, 6), np.int64),
            ],
            axis=0,
        )
        for _ in range(4)
    ]

    def run(impl):
        engine = LMEngine(
            params, CFG, TOK, WhichLM.FISH_1_5,
            batch_size=4, cache_len=64, max_frames=6,
            dtype=jnp.float32, prompt_buckets=(16,),
            fast_frame_impl=impl, dynamic_sampling=True,
        )
        state = engine.init_state(seed=7)
        for r, p in enumerate(prompts):
            state, _, _ = engine.prefill_row(
                state, p, sampling, r, seed=100 + r
            )
        state, out, valid, steps = engine.decode_chunk(state, sampling, 4)
        return np.asarray(out), np.asarray(valid)

    ref_out, ref_valid = run("xla")
    got_out, got_valid = run("fused")
    np.testing.assert_array_equal(ref_valid, got_valid)
    np.testing.assert_array_equal(ref_out, got_out)


def test_fused_frame_argmax():
    params = _setup(CFG)
    sampling = SamplingArgs(temp=0.0, top_p=1.0, top_k=32, repetition_penalty=1.0)
    ref, got, _, _ = _frame_pair(params, CFG, sampling, 3)
    np.testing.assert_array_equal(ref, got)


def test_fused_frame_no_rep_pen():
    params = _setup(CFG)
    sampling = SamplingArgs(temp=0.9, top_p=1.0, top_k=8, repetition_penalty=1.0)
    ref, got, _, _ = _frame_pair(params, CFG, sampling, 4)
    np.testing.assert_array_equal(ref, got)


def test_fused_frame_eos_emits_zero_codebooks():
    """EOS frames emit zero codebook rows (single_batch.rs:152-155) in
    both paths."""
    params = _setup(CFG)
    sampling = SamplingArgs(temp=0.7, top_p=0.8, top_k=16, repetition_penalty=1.3)
    # Force the semantic draw to im_end by spiking its (column-0) logit.
    logits = jnp.full((1, params["output"].shape[1]), -30.0).at[0, 0].set(30.0)
    hidden = jax.random.normal(jax.random.PRNGKey(5), (1, CFG.dim)).astype(jnp.float32)
    rp = RepPenWindow.init((1, CFG.num_codebooks), 16)
    prev = jnp.zeros((1, CFG.num_codebooks + 1), jnp.int32)
    rng = jax.random.PRNGKey(6)
    got = framemod.generate_frame(
        params, CFG, TOK, WhichLM.FISH_1_5, sampling, logits, hidden, rp, prev, rng,
        use_fused_fast=True, fused_interpret=True,
    )
    assert bool(np.asarray(got.is_eos)[0])
    np.testing.assert_array_equal(np.asarray(got.tokens)[0, 1:], 0)


def test_fused_frame_depthwise():
    """depthwise_wte/depthwise_output models (per-codebook embedding and
    head slices): the kernel's per-step block windows must match the XLA
    path's slicing."""
    import dataclasses
    cfg = dataclasses.replace(CFG, depthwise_wte=True, depthwise_output=True)
    params = _setup(cfg)
    sampling = SamplingArgs(temp=0.7, top_p=0.8, top_k=16, repetition_penalty=1.3)
    ref, got, _, _ = _frame_pair(params, cfg, sampling, 7)
    np.testing.assert_array_equal(ref, got)


def test_engine_fused_matches_xla():
    """Engine-level: prefill + decode steps with fast_frame_impl='fused'
    produce the same frames as 'xla' (the decode path swaps in the fused
    kernel; the prefill frame stays XLA — parity makes mixing safe)."""
    params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    sampling = SamplingArgs(temp=0.7, top_p=0.8, top_k=16, repetition_penalty=1.3)
    rng = np.random.default_rng(11)
    prompt = np.concatenate(
        [
            rng.integers(TOK.semantic_start_id, TOK.semantic_end_id, size=(1, 8)),
            np.zeros((CFG.num_codebooks, 8), np.int64),
        ],
        axis=0,
    )

    def run(impl):
        engine = LMEngine(
            params, CFG, TOK, WhichLM.FISH_1_5,
            batch_size=1, cache_len=64, max_frames=6,
            dtype=jnp.float32, prompt_buckets=(16,),
            fast_frame_impl=impl,
        )
        state = engine.init_state(seed=13)
        state, frame, _ = engine.prefill(state, prompt[None], sampling)
        frames = [np.asarray(frame)]
        step = engine._get_step(sampling)
        for _ in range(4):
            state, f = step(state)
            frames.append(np.asarray(f))
        return frames

    for a, b in zip(run("xla"), run("fused")):
        np.testing.assert_array_equal(a, b)


def test_fused_frame_int8():
    """int8-quantized fast stack through the fused kernel matches the XLA
    int8 codebook loop (ops/quant.py::matmul) token-for-token — the
    kernel's per-channel rescale must mirror the dequant-at-operand-read
    lowering, including the silu(scaled-product) ordering."""
    from fish_speech_tpu.ops.quant import quantize_lm_params

    params = _setup(CFG, seed=8)
    qparams = quantize_lm_params(params)
    sampling = SamplingArgs(temp=0.7, top_p=0.8, top_k=16, repetition_penalty=1.3)
    ref, got, r, g = _frame_pair(qparams, CFG, sampling, 8)
    np.testing.assert_array_equal(ref, got)
    assert fused_fast_frame_supported(CFG, qparams, 1)


def test_gating():
    params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    assert fused_fast_frame_supported(CFG, params, 1)
    assert not fused_fast_frame_supported(CFG, params, 2)
    # batched engines must refuse a forced fused impl
    with pytest.raises(ValueError):
        LMEngine(
            params, CFG, TOK, WhichLM.FISH_1_5,
            batch_size=2, dtype=jnp.float32, fast_frame_impl="fused",
        )
    # auto never turns it on off-TPU (CPU test env)
    engine = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5, batch_size=1, dtype=jnp.float32
    )
    assert not engine.use_fused_fast
