"""Fused whole-step slow-stack Pallas kernel: parity vs the XLA
slow_decode_step (ops/slow_step_pallas.py, interpret mode on CPU).

The kernel runs all n_layer slow layers + in-place KV update + masked
GQA attention + final norm + gathered LM head in one kernel. Logits
agree with the XLA lowering to reduction-order rounding (~2 ulp in
f32); the tests therefore assert tight allclose at the kernel level and
EXACT token equality at the engine level (the sampled streams must
match — reduction-order wobble at a sampling tie would be a seed
lottery, and these fixed seeds are checked in).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import DualARConfig, TokenConfig, WhichLM
from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.generate.frame import semantic_head_columns
from fish_speech_tpu.models.dual_ar import (
    KVCache,
    embed_tokens,
    init_dual_ar_params,
    slow_decode_step,
)
from fish_speech_tpu.ops.sampling import SamplingArgs
from fish_speech_tpu.ops.slow_step_pallas import (
    fused_slow_step,
    fused_slow_step_supported,
)

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


def _setup(lm=WhichLM.FISH_1_5, seed=0):
    params = dict(init_dual_ar_params(jax.random.PRNGKey(seed), CFG, dtype=jnp.float32))
    cols = semantic_head_columns(lm, TOK, CFG)
    params["output"] = jnp.take(params["output"], jnp.asarray(cols), axis=1)
    return params


@pytest.mark.parametrize("pos_val", [0, 5, 31])
def test_fused_slow_step_matches_xla(pos_val):
    params = _setup()
    rng = np.random.default_rng(pos_val)
    ck = jnp.asarray(rng.normal(size=(CFG.n_layer, 1, CFG.n_local_heads, 32, CFG.head_dim)) * 0.1, jnp.float32)
    cv = jnp.asarray(rng.normal(size=ck.shape) * 0.1, jnp.float32)
    cache = KVCache(k=ck, v=cv)
    tokens = jnp.asarray(rng.integers(0, 40, (1, CFG.num_codebooks + 1)), jnp.int32)
    pos = jnp.asarray([pos_val], jnp.int32)

    ref_logits, ref_hidden, ref_cache = slow_decode_step(
        params, CFG, TOK, tokens, cache, pos
    )
    x0 = embed_tokens(params, CFG, TOK, tokens[:, :, None])[:, 0, :]
    got_logits, got_hidden, ck2, cv2 = fused_slow_step(
        params, CFG, x0, pos, cache.k, cache.v, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(got_logits), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref_hidden), np.asarray(got_hidden), atol=1e-5, rtol=1e-5
    )
    # the cache row at `pos` must hold the new K/V; all other rows must
    # be untouched (bitwise)
    np.testing.assert_allclose(
        np.asarray(ref_cache.k), np.asarray(ck2), atol=1e-6, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ref_cache.v), np.asarray(cv2), atol=1e-6, rtol=1e-6
    )
    mask = np.arange(32) != pos_val
    np.testing.assert_array_equal(
        np.asarray(cache.k)[:, :, :, mask], np.asarray(ck2)[:, :, :, mask]
    )


def test_fused_slow_step_legacy_two_way_head():
    """Fish 1.2/1.4 gather the slow head down to [pad, im_end] — a (D, 2)
    head whose lane dim is far from the 128 tile; the kernel must accept
    the full-array block."""
    params = _setup(lm=WhichLM.FISH_1_2)
    assert params["output"].shape[1] == 2
    rng = np.random.default_rng(7)
    cache = KVCache.init(CFG.n_layer, 1, CFG.n_local_heads, 32, CFG.head_dim, jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 40, (1, CFG.num_codebooks + 1)), jnp.int32)
    pos = jnp.asarray([0], jnp.int32)
    ref_logits, _, _ = slow_decode_step(params, CFG, TOK, tokens, cache, pos)
    x0 = embed_tokens(params, CFG, TOK, tokens[:, :, None])[:, 0, :]
    got_logits, _, _, _ = fused_slow_step(
        params, CFG, x0, pos, cache.k, cache.v, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(got_logits), atol=1e-5, rtol=1e-5
    )


def test_engine_fused_slow_matches_xla():
    """Engine-level: prefill + decode steps with slow_impl='fused'
    produce the same token frames as 'xla'."""
    params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    sampling = SamplingArgs(temp=0.7, top_p=0.8, top_k=16, repetition_penalty=1.3)
    rng = np.random.default_rng(3)
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
            slow_impl=impl,
        )
        state = engine.init_state(seed=5)
        state, frame, _ = engine.prefill(state, prompt[None], sampling)
        frames = [np.asarray(frame)]
        step = engine._get_step(sampling)
        for _ in range(4):
            state, f = step(state)
            frames.append(np.asarray(f))
        return frames

    for a, b in zip(run("xla"), run("fused")):
        np.testing.assert_array_equal(a, b)


def test_engine_both_kernels_match_xla():
    """slow_impl='fused' + fast_frame_impl='fused' together (the full
    TPU batch-1 decode configuration) still match the all-XLA engine."""
    params = init_dual_ar_params(jax.random.PRNGKey(1), CFG, dtype=jnp.float32)
    sampling = SamplingArgs(temp=0.7, top_p=0.8, top_k=16, repetition_penalty=1.3)
    rng = np.random.default_rng(4)
    prompt = np.concatenate(
        [
            rng.integers(TOK.semantic_start_id, TOK.semantic_end_id, size=(1, 8)),
            np.zeros((CFG.num_codebooks, 8), np.int64),
        ],
        axis=0,
    )

    def run(slow, fast):
        engine = LMEngine(
            params, CFG, TOK, WhichLM.FISH_1_5,
            batch_size=1, cache_len=64, max_frames=6,
            dtype=jnp.float32, prompt_buckets=(16,),
            slow_impl=slow, fast_frame_impl=fast,
        )
        state = engine.init_state(seed=11)
        state, frame, _ = engine.prefill(state, prompt[None], sampling)
        frames = [np.asarray(frame)]
        step = engine._get_step(sampling)
        for _ in range(4):
            state, f = step(state)
            frames.append(np.asarray(f))
        return frames

    for a, b in zip(run("xla", "xla"), run("fused", "fused")):
        np.testing.assert_array_equal(a, b)


def test_gating():
    params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    assert fused_slow_step_supported(CFG, params, 1)
    # batched decode is supported within the VMEM/compute bounds (r4)...
    assert fused_slow_step_supported(CFG, params, 16, cache_len=512)
    # ...but not past them (expansion compute / cache windows blow up)
    assert not fused_slow_step_supported(CFG, params, 32, cache_len=4096)
    with pytest.raises(ValueError):
        LMEngine(
            params, CFG, TOK, WhichLM.FISH_1_5,
            batch_size=32, cache_len=4096,
            dtype=jnp.float32, slow_impl="fused",
        )
    engine = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5, batch_size=1, dtype=jnp.float32
    )
    assert not engine.use_fused_slow  # auto stays off off-TPU


@pytest.mark.parametrize("batch", [2, 4])
def test_fused_slow_step_batched_matches_xla(batch):
    """B>1 (the continuous batcher's decode rows): per-row positions,
    per-row caches — logits/hidden/cache updates must match the XLA
    batched slow_decode_step row for row."""
    params = _setup()
    rng = np.random.default_rng(batch)
    ck = jnp.asarray(
        rng.normal(
            size=(CFG.n_layer, batch, CFG.n_local_heads, 32, CFG.head_dim)
        ) * 0.1,
        jnp.float32,
    )
    cv = jnp.asarray(rng.normal(size=ck.shape) * 0.1, jnp.float32)
    cache = KVCache(k=ck, v=cv)
    tokens = jnp.asarray(
        rng.integers(0, 40, (batch, CFG.num_codebooks + 1)), jnp.int32
    )
    pos_np = rng.choice(31, size=batch, replace=False).astype(np.int32)
    pos = jnp.asarray(pos_np)

    ref_logits, ref_hidden, ref_cache = slow_decode_step(
        params, CFG, TOK, tokens, cache, pos
    )
    x0 = embed_tokens(params, CFG, TOK, tokens[:, :, None])[:, 0, :]
    got_logits, got_hidden, ck2, cv2 = fused_slow_step(
        params, CFG, x0, pos, cache.k, cache.v, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(got_logits), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref_hidden), np.asarray(got_hidden), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref_cache.k), np.asarray(ck2), atol=1e-6, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ref_cache.v), np.asarray(cv2), atol=1e-6, rtol=1e-6
    )
    # untouched positions bitwise-identical per row
    for b in range(batch):
        mask = np.arange(32) != pos_np[b]
        np.testing.assert_array_equal(
            np.asarray(cache.k)[:, b, :, mask],
            np.asarray(ck2)[:, b, :, mask],
        )


def test_fused_slow_step_int8():
    """int8-quantized slow stack through the fused kernel matches the
    XLA int8 path (ops/quant.py::matmul) — the kernel's per-channel
    rescale must mirror the dequant-at-operand-read lowering."""
    from fish_speech_tpu.ops.quant import quantize_lm_params

    params = _setup(seed=2)
    qparams = quantize_lm_params(params)
    rng = np.random.default_rng(9)
    cache = KVCache.init(CFG.n_layer, 1, CFG.n_local_heads, 32, CFG.head_dim, jnp.float32)
    tokens = jnp.asarray(rng.integers(0, 40, (1, CFG.num_codebooks + 1)), jnp.int32)
    pos = jnp.asarray([3], jnp.int32)
    ref_logits, ref_hidden, ref_cache = slow_decode_step(
        qparams, CFG, TOK, tokens, cache, pos
    )
    x0 = embed_tokens(qparams, CFG, TOK, tokens[:, :, None])[:, 0, :]
    got_logits, got_hidden, ck2, cv2 = fused_slow_step(
        qparams, CFG, x0, pos, cache.k, cache.v, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(got_logits), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ref_cache.k), np.asarray(ck2), atol=1e-5, rtol=1e-5
    )
    assert fused_slow_step_supported(CFG, qparams, 1)
