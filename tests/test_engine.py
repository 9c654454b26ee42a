"""Tests for the generation engine: termination, determinism, cache reuse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import DualARConfig, TokenConfig, WhichLM
from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.models.dual_ar import init_dual_ar_params
from fish_speech_tpu.ops.sampling import SamplingArgs

CFG = DualARConfig(
    vocab_size=64,
    n_layer=2,
    n_fast_layer=2,
    n_head=4,
    dim=32,
    intermediate_size=64,
    n_local_heads=2,
    head_dim=8,
    rope_base=10000.0,
    norm_eps=1e-6,
    max_seq_len=64,
    codebook_size=8,
    num_codebooks=2,
)
TOK = TokenConfig(im_end_id=9, pad_id=5, semantic_start_id=10, semantic_end_id=17)


@pytest.fixture(scope="module")
def engine():
    params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    return LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        cache_len=64, max_frames=16, dtype=jnp.float32,
        prompt_buckets=(16, 32),
    )


def make_prompt(seq):
    r = np.random.default_rng(0)
    sem = r.integers(18, 30, size=(1, seq))  # text tokens outside semantic range
    cbs = np.zeros((CFG.num_codebooks, seq), dtype=np.int64)
    return np.concatenate([sem, cbs], axis=0)


class TestGenerate:
    def test_generates_frames_and_respects_budget(self, engine):
        res, _ = engine.generate(
            make_prompt(7), max_new_tokens=6,
            sampling=SamplingArgs(temp=0.0), seed=0,
        )
        assert 1 <= res.frames <= 6
        assert res.tokens.shape[0] == CFG.num_codebooks
        assert res.semantic.shape == (res.frames,)
        # semantic tokens are inside the constrained range or im_end
        assert np.all(
            (res.semantic == TOK.im_end_id)
            | ((res.semantic >= TOK.im_end_id) & (res.semantic <= TOK.semantic_end_id))
        )
        # codebook tokens are valid codebook indices
        assert res.tokens.min() >= 0 and res.tokens.max() < CFG.codebook_size

    def test_argmax_deterministic(self, engine):
        r1, _ = engine.generate(
            make_prompt(7), max_new_tokens=5, sampling=SamplingArgs(temp=0.0), seed=1
        )
        r2, _ = engine.generate(
            make_prompt(7), max_new_tokens=5, sampling=SamplingArgs(temp=0.0), seed=2
        )
        np.testing.assert_array_equal(r1.tokens, r2.tokens)
        np.testing.assert_array_equal(r1.semantic, r2.semantic)

    def test_seeded_sampling_reproducible(self, engine):
        s = SamplingArgs(temp=0.9, top_p=0.9, top_k=8, repetition_penalty=1.1)
        r1, _ = engine.generate(make_prompt(7), max_new_tokens=5, sampling=s, seed=42)
        r2, _ = engine.generate(make_prompt(7), max_new_tokens=5, sampling=s, seed=42)
        np.testing.assert_array_equal(r1.tokens, r2.tokens)

    def test_conditioning_cache_reuse(self, engine):
        """Chunk 2 prefilled at the conditioning offset must produce the
        same first frame as prefilling [cond; chunk2] from scratch
        (the kv-cache prefix-retention path, reference: speech.rs:40)."""
        s = SamplingArgs(temp=0.0)
        cond = make_prompt(5)
        chunk2 = make_prompt(4) + 1

        state = engine.init_state(seed=3)
        _, state = engine.generate(
            np.concatenate([cond, chunk2], axis=1), max_new_tokens=3,
            sampling=s, state=state,
        )

        state2 = engine.init_state(seed=3)
        res_a, state2 = engine.generate(
            cond, max_new_tokens=3, sampling=s, state=state2
        )
        state2 = engine.rewind(state2, cond.shape[1])
        res_b, _ = engine.generate(
            chunk2, max_new_tokens=3, sampling=s,
            state=state2, conditioning_offset=cond.shape[1],
        )
        # the scratch run and the resumed run see identical context for
        # chunk2's first frame
        ref, _ = engine.generate(
            np.concatenate([cond, chunk2], axis=1), max_new_tokens=3, sampling=s
        )
        np.testing.assert_array_equal(res_b.semantic[0], ref.semantic[0])

    def test_legacy_lm_emits_pad_or_eos(self):
        params = init_dual_ar_params(jax.random.PRNGKey(1), CFG, dtype=jnp.float32)
        tok = TokenConfig(im_end_id=9, pad_id=5, semantic_start_id=5, semantic_end_id=None)
        eng = LMEngine(
            params, CFG, tok, WhichLM.FISH_1_4,
            cache_len=64, max_frames=8, dtype=jnp.float32, prompt_buckets=(16,),
        )
        res, _ = eng.generate(
            make_prompt(6), max_new_tokens=8,
            sampling=SamplingArgs(temp=0.7), seed=7,
        )
        assert np.all((res.semantic == 5) | (res.semantic == 9))


class TestGenerateBatch:
    def test_ragged_batch_rows_match_single(self):
        """Batch rows with different prompt lengths must produce exactly
        what a batch-1 run of each prompt produces (argmax): right-padded
        rows + per-row positions make padding semantically invisible."""
        params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        s = SamplingArgs(temp=0.0)
        prompts = [make_prompt(7), make_prompt(4) + 1, make_prompt(9)]

        beng = LMEngine(
            params, CFG, TOK, WhichLM.FISH_1_5,
            batch_size=3, cache_len=64, max_frames=6,
            dtype=jnp.float32, prompt_buckets=(16,),
        )
        batch_results = beng.generate_batch(
            prompts, max_new_tokens=5, sampling=s, seed=0
        )

        seng = LMEngine(
            params, CFG, TOK, WhichLM.FISH_1_5,
            cache_len=64, max_frames=6, dtype=jnp.float32, prompt_buckets=(16,),
        )
        for prompt, br in zip(prompts, batch_results):
            sr, _ = seng.generate(prompt, max_new_tokens=5, sampling=s, seed=0)
            np.testing.assert_array_equal(br.semantic, sr.semantic)
            np.testing.assert_array_equal(br.tokens, sr.tokens)

    def test_batch_results_have_row_shapes(self):
        params = init_dual_ar_params(jax.random.PRNGKey(2), CFG, dtype=jnp.float32)
        beng = LMEngine(
            params, CFG, TOK, WhichLM.FISH_1_5,
            batch_size=2, cache_len=64, max_frames=4,
            dtype=jnp.float32, prompt_buckets=(16,),
        )
        results = beng.generate_batch(
            [make_prompt(5), make_prompt(8)],
            max_new_tokens=4,
            sampling=SamplingArgs(temp=0.8, top_k=8),
            seed=11,
        )
        assert len(results) == 2
        for r in results:
            assert r.tokens.shape[0] == CFG.num_codebooks
            assert r.frames == r.tokens.shape[1] == r.semantic.shape[0]


def test_collect_hidden_states(engine):
    res, _ = engine.generate(
        make_prompt(6), max_new_tokens=5,
        sampling=SamplingArgs(temp=0.0), seed=0, collect_hidden=True,
    )
    assert res.hidden is not None
    assert res.hidden.shape == (res.frames, CFG.dim)
    assert res.hidden.dtype == np.float32
    assert np.isfinite(res.hidden).all()
    assert np.abs(res.hidden).max() > 0


class TestNoRetracing:
    """The bucket design's core promise: arbitrary request shapes reuse a
    bounded set of compilations (SURVEY §7 hard-part #1). A fresh trace
    per request would be a multi-second stall on the TPU toolchain, so
    this guards the property directly via the jit cache sizes."""

    def test_same_bucket_prompts_share_one_compilation(self):
        params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        eng = LMEngine(
            params, CFG, TOK, WhichLM.FISH_1_5,
            cache_len=64, max_frames=16, dtype=jnp.float32,
            prompt_buckets=(16, 32),
        )
        s = SamplingArgs(temp=0.0)
        for seq in (5, 9, 12, 16):  # all land in the 16-bucket
            eng.generate(make_prompt(seq), max_new_tokens=3, sampling=s, seed=0)

        assert len(eng._prefill_jit) == 1
        (prefill_fn,) = eng._prefill_jit.values()
        assert prefill_fn._cache_size() == 1
        # one decode-loop variant, one trace, regardless of max_new_tokens
        eng.generate(make_prompt(8), max_new_tokens=5, sampling=s, seed=0)
        assert all(f._cache_size() == 1 for f in eng._decode_jit.values())
        assert len(eng._decode_jit) == 1

        # a longer prompt crosses into the 32-bucket: exactly one new
        # prefill program, decode untouched
        eng.generate(make_prompt(20), max_new_tokens=3, sampling=s, seed=0)
        assert len(eng._prefill_jit) == 2
        assert all(f._cache_size() == 1 for f in eng._prefill_jit.values())
        assert len(eng._decode_jit) == 1

    def test_conditioning_rewind_does_not_retrace(self):
        """Chunked generation with prefix reuse (LMEngine.rewind) must stay
        inside the compiled set — the serving loop does this per chunk."""
        params = init_dual_ar_params(jax.random.PRNGKey(1), CFG, dtype=jnp.float32)
        eng = LMEngine(
            params, CFG, TOK, WhichLM.FISH_1_5,
            cache_len=64, max_frames=8, dtype=jnp.float32,
            prompt_buckets=(16, 32),
        )
        s = SamplingArgs(temp=0.0)
        state = eng.init_state(seed=3)
        _, state = eng.generate(
            make_prompt(10), max_new_tokens=3, sampling=s, state=state
        )
        # chunked continuation: same chunk shape at the same conditioning
        # offset must compile at most one offset variant, then reuse it
        for i in range(3):
            state = eng.rewind(state, 10)
            _, state = eng.generate(
                make_prompt(12) + 1, max_new_tokens=3, sampling=s,
                state=state, conditioning_offset=10,
            )
            if i == 0:
                snapshot = {
                    k: f._cache_size() for k, f in eng._prefill_jit.items()
                }
        after = {k: f._cache_size() for k, f in eng._prefill_jit.items()}
        assert snapshot == after, "chunk repeats retraced the prefill"
        assert all(f._cache_size() == 1 for f in eng._decode_jit.values())
