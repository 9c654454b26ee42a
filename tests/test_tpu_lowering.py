"""Cross-platform TPU lowering checks for every Pallas kernel.

`jax.jit(fn).trace(...).lower(lowering_platforms=("tpu",))` runs the
Pallas->Mosaic lowering rules on the CPU host and serializes the kernel
into a `tpu_custom_call` — no TPU needed. This catches the class of
kernel bugs that interpret-mode tests can't (unsupported ops in the TPU
lowering rules, bad block/grid specs, scalar-prefetch plumbing) at CI
time instead of on the first hardware run. It does NOT cover the Mosaic
backend itself (vector layout assignment, VMEM allocation), which runs
inside the XLA:TPU compiler — `bench.py --verify` on a real chip remains
the final gate (docs/TPU_NOTES.md #18).

Reference counterpart: the CUDA kernel's build is compile-checked by
cargo on every build (candle-gqa-kernels/build.rs); this is the TPU
equivalent of that standing compile gate.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import DualARConfig, TokenConfig, WhichLM
from fish_speech_tpu.generate import frame as framemod
from fish_speech_tpu.generate.frame import RepPenWindow, semantic_head_columns
from fish_speech_tpu.models.dual_ar import embed_tokens, init_dual_ar_params
from fish_speech_tpu.ops.quant import quantize_lm_params
from fish_speech_tpu.ops.sampling import SamplingArgs

CFG = DualARConfig(
    vocab_size=256,
    n_layer=3,
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


TOK128 = TokenConfig(
    im_end_id=9, pad_id=5, semantic_start_id=10, semantic_end_id=137
)


def _lower_tpu(fn, *args):
    lowered = jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))
    text = lowered.as_text()
    assert "tpu_custom_call" in text, "kernel did not lower to a Mosaic call"
    return text


def _setup(cfg, quantize=False, tok=TOK):
    params = dict(init_dual_ar_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32))
    cols = semantic_head_columns(WhichLM.FISH_1_5, tok, cfg)
    params["output"] = jnp.take(params["output"], jnp.asarray(cols), axis=1)
    if quantize:
        params = quantize_lm_params(params)
    return params


def test_flash_prefill_lowers_for_tpu():
    # Fish-1.5-shaped operands: the exact block shapes the serving
    # engine hands the kernel (hd 64, 2 KV heads, bucketed extents).
    from fish_speech_tpu.ops.prefill_pallas import flash_prefill_attention

    b, h, kv, hd, s_pad, e = 2, 16, 2, 64, 256, 1024
    q = jnp.zeros((b, h, s_pad, hd), jnp.bfloat16)
    k = jnp.zeros((b, kv, e, hd), jnp.bfloat16)
    v = jnp.zeros((b, kv, e, hd), jnp.bfloat16)

    def fn(q, k, v, off, lens):
        return flash_prefill_attention(q, k, v, off, lens, window=4096)

    _lower_tpu(fn, q, k, v, jnp.int32(0), jnp.full((b,), s_pad, jnp.int32))


def test_decode_attention_lowers_for_tpu():
    from fish_speech_tpu.ops.attention_pallas import fused_decode_attention

    b, h, kv, hd, lay, s = 2, 4, 2, 16, 3, 64
    q = jnp.zeros((b, h, hd), jnp.float32)
    kn = jnp.zeros((b, kv, hd), jnp.float32)
    ck = jnp.zeros((lay, b, kv, s, hd), jnp.float32)

    def fn(q, kn, vn, pos, ck, cv, layer):
        return fused_decode_attention(q, kn, vn, pos, ck, cv, layer)

    _lower_tpu(
        fn, q, kn, kn, jnp.zeros((b,), jnp.int32), ck, ck, jnp.int32(1)
    )


@pytest.mark.parametrize("quantize", [False, True], ids=["f32", "int8"])
def test_fused_slow_step_lowers_for_tpu(quantize):
    from fish_speech_tpu.ops.slow_step_pallas import fused_slow_step

    params = _setup(CFG, quantize)
    tokens = jnp.zeros((1, CFG.num_codebooks + 1), jnp.int32)
    x0 = embed_tokens(params, CFG, TOK, tokens[:, :, None])[:, 0, :]
    ck = jnp.zeros(
        (CFG.n_layer, 1, CFG.n_local_heads, 32, CFG.head_dim), jnp.float32
    )

    def fn(x0, pos, ck, cv):
        return fused_slow_step(params, CFG, x0, pos, ck, cv)

    _lower_tpu(fn, x0, jnp.zeros((1,), jnp.int32), ck, ck)


@pytest.mark.parametrize("quantize", [False, True], ids=["f32", "int8"])
def test_fused_slow_step_batched_lowers_for_tpu(quantize):
    """Batched (r4) slow-step kernel: per-row positions + B-row cache
    windows must pass the Mosaic lowering rules."""
    from fish_speech_tpu.ops.slow_step_pallas import fused_slow_step

    b = 8
    params = _setup(CFG, quantize)
    tokens = jnp.zeros((b, CFG.num_codebooks + 1), jnp.int32)
    x0 = embed_tokens(params, CFG, TOK, tokens[:, :, None])[:, 0, :]
    ck = jnp.zeros(
        (CFG.n_layer, b, CFG.n_local_heads, 32, CFG.head_dim), jnp.float32
    )

    def fn(x0, pos, ck, cv):
        return fused_slow_step(params, CFG, x0, pos, ck, cv)

    _lower_tpu(fn, x0, jnp.arange(b, dtype=jnp.int32), ck, ck)


@pytest.mark.parametrize("quantize", [False, True], ids=["f32", "int8"])
def test_fused_fast_frame_batched_lowers_for_tpu(quantize):
    """Batched dynamic-sampling fast-frame kernel (r4): SMEM per-row
    sampling operands + B-row scratch must pass the Mosaic lowering."""
    from fish_speech_tpu.ops.sampling import RowSampling

    b = 8
    params = _setup(CFG, quantize)
    logits = jnp.zeros((b, params["output"].shape[1]), jnp.float32)
    hidden = jnp.zeros((b, CFG.dim), jnp.float32)
    rp = RepPenWindow.init((b, CFG.num_codebooks), 12)
    prev = jnp.zeros((b, CFG.num_codebooks + 1), jnp.int32)
    samp = RowSampling.broadcast(
        SamplingArgs(temp=0.7, top_p=0.8, top_k=16, repetition_penalty=1.3),
        b,
    )
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(b)])

    def fn(logits, hidden, rp, prev, keys, samp):
        out = framemod.generate_frame(
            params, CFG, TOK, WhichLM.FISH_1_5, SamplingArgs(), logits,
            hidden, rp, prev, keys, samp=samp,
            use_fused_fast=True, fused_interpret=False,
        )
        return out.tokens

    text = _lower_tpu(fn, logits, hidden, rp, prev, keys, samp)
    assert text.count("tpu_custom_call") >= 1


@pytest.mark.parametrize("quantize", [False, True], ids=["f32", "int8"])
@pytest.mark.parametrize("depthwise", [False, True], ids=["std", "depthwise"])
def test_fused_fast_frame_lowers_for_tpu(quantize, depthwise):
    # depthwise_output walks the head in cb_size-lane blocks, so Mosaic
    # needs cb_size % 128 == 0 (true of real Mimi DualAR checkpoints).
    cfg = (
        dataclasses.replace(
            CFG, depthwise_wte=True, depthwise_output=True, codebook_size=128
        )
        if depthwise
        else CFG
    )
    tok = TOK128 if depthwise else TOK
    params = _setup(cfg, quantize, tok)
    sampling = SamplingArgs(temp=0.7, top_p=0.8, top_k=16, repetition_penalty=1.3)
    logits = jnp.zeros((1, params["output"].shape[1]), jnp.float32)
    hidden = jnp.zeros((1, cfg.dim), jnp.float32)
    rp = RepPenWindow.init((1, cfg.num_codebooks), 16)
    prev = jnp.zeros((1, cfg.num_codebooks + 1), jnp.int32)

    def fn(logits, hidden, rp, prev, rng):
        out = framemod.generate_frame(
            params, cfg, tok, WhichLM.FISH_1_5, sampling, logits, hidden,
            rp, prev, rng, use_fused_fast=True, fused_interpret=False,
        )
        return out.tokens

    text = _lower_tpu(
        fn, logits, hidden, rp, prev, jax.random.PRNGKey(0)
    )
    assert text.count("tpu_custom_call") >= 1


def test_fast_frame_gate_rejects_unlowerable_depthwise():
    """cb_size not a multiple of 128 with depthwise_output cannot lower
    for TPU (128-lane block divisibility); the eligibility gate must
    route such models to the XLA path instead of a compile error."""
    from fish_speech_tpu.ops.fast_frame_pallas import fused_fast_frame_supported

    cfg = dataclasses.replace(CFG, depthwise_wte=True, depthwise_output=True)
    params = _setup(cfg)
    assert not fused_fast_frame_supported(cfg, params, 1)
    ok = dataclasses.replace(cfg, codebook_size=128)
    assert fused_fast_frame_supported(ok, _setup(ok, tok=TOK128), 1)


def test_sharded_decode_attention_lowers_for_tpu():
    """The shard_mapped dp-axis wrapper must also lower for TPU (it is
    the multi-chip serving decode path; VERDICT r2 flagged the silent
    XLA fallback this wrapper removed)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from fish_speech_tpu.ops.attention_pallas import (
        fused_decode_attention_sharded,
    )
    from fish_speech_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(2, tp=1)
    b, h, kv, hd, lay, s = 2, 4, 2, 16, 3, 64
    q = jnp.zeros((b, h, hd), jnp.float32)
    kn = jnp.zeros((b, kv, hd), jnp.float32)
    ck = jnp.zeros((lay, b, kv, s, hd), jnp.float32)

    def fn(q, kn, vn, pos, ck, cv, layer):
        return fused_decode_attention_sharded(
            q, kn, vn, pos, ck, cv, layer, mesh=mesh
        )

    with mesh:
        _lower_tpu(
            fn, q, kn, kn, jnp.zeros((b,), jnp.int32), ck, ck, jnp.int32(1)
        )
