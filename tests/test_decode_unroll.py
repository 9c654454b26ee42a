"""Decode-loop body unroll: reported frames must be IDENTICAL to the
single-step loop for any max_steps (engine.py::_get_decode_loop).

The unrolled loop folds N frames into one `lax.while_loop` iteration to
reclaim the deploy platform's fixed per-iteration cost (TPU_NOTES #11).
Tail sub-steps past max_steps still execute (the trip count must stay
data-independent inside jit) but mask their out/valid writes — these
tests pin that masking for every boundary case: even/odd horizons,
EOS inside an unrolled group, multi-chunk carried state, batch rows
finishing at different times, and collect_hidden.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import DualARConfig, TokenConfig, WhichLM
from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.models.dual_ar import init_dual_ar_params
from fish_speech_tpu.ops.sampling import SamplingArgs

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
TOK = TokenConfig(
    im_end_id=9, pad_id=5, semantic_start_id=10, semantic_end_id=41
)
PARAMS = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
SAMPLING = SamplingArgs(temp=0.7, top_p=0.8, top_k=16, repetition_penalty=1.3)


def _engine(unroll, batch=1, max_frames=24):
    return LMEngine(
        PARAMS, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=batch, cache_len=64, max_frames=max_frames,
        dtype=jnp.float32, prompt_buckets=(16,), decode_unroll=unroll,
    )


def _prompt(seed, n=8):
    rng = np.random.default_rng(seed)
    return np.concatenate(
        [
            rng.integers(
                TOK.semantic_start_id, TOK.semantic_end_id, size=(1, n)
            ),
            np.zeros((CFG.num_codebooks, n), np.int64),
        ],
        axis=0,
    )


@pytest.mark.parametrize("max_new", [3, 4, 5, 8, 9])
def test_generate_matches_single_step(max_new):
    """generate() reports the same tokens/flags for unroll 4 and 1, for
    step counts off and on the unroll boundary."""

    def run(unroll):
        res, _state = _engine(unroll).generate(
            _prompt(3), max_new_tokens=max_new, sampling=SAMPLING, seed=7
        )
        return res

    a, b = run(1), run(4)
    np.testing.assert_array_equal(a.semantic, b.semantic)
    np.testing.assert_array_equal(a.tokens, b.tokens)
    assert a.frames == b.frames
    assert a.hit_max == b.hit_max


def test_decode_chunk_carried_state():
    """Repeated decode_chunk on a carried state (the batcher/streaming
    shape): identical frames per chunk and identical carry when the
    horizon is a multiple of the unroll."""

    def run(unroll):
        eng = _engine(unroll)
        state = eng.init_state(seed=5)
        state, frame, _ = eng.prefill(state, _prompt(9)[None], SAMPLING)
        outs = [np.asarray(frame)]
        for _ in range(3):
            state, out, valid, steps = eng.decode_chunk(state, SAMPLING, 4)
            out, valid = np.asarray(out), np.asarray(valid)
            # compare the REPORTED stream: valid flags and the frames at
            # valid rows (invalid rows differ by design: the single-step
            # loop exits at EOS and leaves buffer zeros, the unrolled
            # loop pads its group with EOS frames; `steps` likewise may
            # group-round past an EOS — callers consume via `valid`)
            outs.append(valid)
            outs.append(out * valid[:, :, None])
        outs.append(np.asarray(state.pos))
        outs.append(np.asarray(state.prev))
        outs.append(np.asarray(state.done))
        return outs

    for a, b in zip(run(1), run(4)):
        np.testing.assert_array_equal(a, b)


def test_already_done_state():
    """Seeding the loop from a state with done already true: the loop
    must exit immediately and report no valid frames."""
    eng = _engine(4)
    state = eng.init_state(seed=1)
    state, _, _ = eng.prefill(state, _prompt(2)[None], SAMPLING)
    state = state._replace(done=jnp.ones((1,), bool))
    state, out, valid, steps = eng.decode_chunk(state, SAMPLING, 8)
    assert int(steps) == 0 or not np.asarray(valid)[: int(steps)].any()


def test_eos_mid_group_matches_single_step():
    """An EOS sampled at a NON-boundary sub-step (step % unroll != 0):
    reported tokens/frames/hit_max must still match unroll=1 — this is
    exactly where the group's remaining padding sub-steps and the
    done-flag handling could diverge. The seed is found by searching the
    unroll=1 engine for a generation whose natural EOS lands mid-group
    and strictly inside the budget."""
    eng1 = _engine(1)
    max_new = 17  # budget 16, a multiple of 4: EOS is the only early exit
    hit = None
    for seed in range(60):
        res, _ = eng1.generate(
            _prompt(seed), max_new_tokens=max_new, sampling=SAMPLING,
            seed=seed,
        )
        s_eos = res.frames - 1  # EOS step index when it fired early
        if not res.hit_max and 0 < s_eos < max_new - 1 and s_eos % 4:
            hit = (seed, res)
            break
    assert hit is not None, "no mid-group EOS found in 60 seeds"
    seed, a = hit
    b, _ = _engine(4).generate(
        _prompt(seed), max_new_tokens=max_new, sampling=SAMPLING, seed=seed
    )
    np.testing.assert_array_equal(a.semantic, b.semantic)
    np.testing.assert_array_equal(a.tokens, b.tokens)
    assert a.frames == b.frames
    assert a.hit_max == b.hit_max


def test_batch_rows_finish_staggered():
    """Batch-2: force row 1 done before a chunk; its lanes must stay
    invalid while row 0 keeps producing the same frames as unroll=1."""

    def run(unroll):
        eng = _engine(unroll, batch=2)
        state = eng.init_state(seed=4)
        prompts = np.stack([_prompt(1), _prompt(2)], axis=0)
        state, frame, _ = eng.prefill(state, prompts, SAMPLING)
        state = state._replace(done=jnp.asarray([False, True]))
        state, out, valid, steps = eng.decode_chunk(state, SAMPLING, 8)
        return np.asarray(out), np.asarray(valid), int(steps)

    (o1, v1, s1), (o4, v4, s4) = run(1), run(4)
    # `steps` may group-round past an EOS (callers consume via `valid`)
    assert s1 <= s4 <= s1 + 3
    np.testing.assert_array_equal(v1, v4)
    assert not v4[:, 1].any()
    # row 0's reported frames agree wherever valid
    np.testing.assert_array_equal(
        o1[v1[:, 0], 0], o4[v4[:, 0], 0]
    )


def test_int8_engine_matches_single_step():
    """quantize_int8 engines (the bench --int8 --unroll combo) must be
    unroll-invariant too — the int8 matmul path flows through the same
    _decode_body, but pin the combination."""

    def run(unroll):
        eng = LMEngine(
            PARAMS, CFG, TOK, WhichLM.FISH_1_5,
            batch_size=1, cache_len=64, max_frames=24,
            dtype=jnp.float32, prompt_buckets=(16,),
            decode_unroll=unroll, quantize_int8=True,
        )
        res, _ = eng.generate(
            _prompt(3), max_new_tokens=8, sampling=SAMPLING, seed=7
        )
        return res

    a, b = run(1), run(4)
    np.testing.assert_array_equal(a.semantic, b.semantic)
    np.testing.assert_array_equal(a.tokens, b.tokens)


def test_collect_hidden_matches():
    def run(unroll):
        res, _ = _engine(unroll).generate(
            _prompt(6), max_new_tokens=6, sampling=SAMPLING, seed=3,
            collect_hidden=True,
        )
        return res

    a, b = run(1), run(4)
    np.testing.assert_array_equal(a.tokens, b.tokens)
    np.testing.assert_allclose(a.hidden, b.hidden, rtol=0, atol=0)


def test_indivisible_horizon_rejected():
    """decode_chunk enforces horizon % decode_unroll == 0: a violating
    horizon would let the unrolled loop's discarded tail advance the
    carried state past the reported frames — silently dropped audio in a
    repeated-chunk stream — so it must fail fast instead."""
    eng = _engine(4)
    state = eng.init_state(seed=5)
    state, _, _ = eng.prefill(state, _prompt(9)[None], SAMPLING)
    with pytest.raises(AssertionError, match="multiple of"):
        eng.decode_chunk(state, SAMPLING, 6)
    # divisible horizons pass
    eng.decode_chunk(state, SAMPLING, 8)
