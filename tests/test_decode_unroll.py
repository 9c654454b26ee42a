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
            outs.append(np.asarray(out))
            outs.append(np.asarray(valid))
            outs.append(np.asarray(steps))
        outs.append(np.asarray(state.pos))
        outs.append(np.asarray(state.prev))
        outs.append(np.asarray(state.done))
        return outs

    for a, b in zip(run(1), run(4)):
        np.testing.assert_array_equal(a, b)


def test_eos_inside_group():
    """A row whose done flag is set mid-generation: the unrolled group's
    remaining sub-steps emit nothing visible. Seed the loop from a state
    with done already true — the loop must exit immediately and report
    steps=0 with no valid frames (cond short-circuits before any group)."""
    eng = _engine(4)
    state = eng.init_state(seed=1)
    state, _, _ = eng.prefill(state, _prompt(2)[None], SAMPLING)
    state = state._replace(done=jnp.ones((1,), bool))
    state, out, valid, steps = eng.decode_chunk(state, SAMPLING, 8)
    assert int(steps) == 0 or not np.asarray(valid)[: int(steps)].any()


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
    assert s1 == s4
    np.testing.assert_array_equal(v1, v4)
    assert not v4[:, 1].any()
    # row 0's reported frames agree wherever valid
    np.testing.assert_array_equal(
        o1[v1[:, 0], 0], o4[v4[:, 0], 0]
    )


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


def test_odd_horizon_overshoot_is_invisible():
    """decode_chunk with a horizon NOT divisible by the unroll: reported
    out/valid/steps still match unroll=1 exactly (the carry may sit ahead
    — documented — but nothing visible differs in one chunk)."""

    def run(unroll):
        eng = _engine(unroll)
        state = eng.init_state(seed=5)
        state, _, _ = eng.prefill(state, _prompt(9)[None], SAMPLING)
        state, out, valid, steps = eng.decode_chunk(state, SAMPLING, 6)
        return np.asarray(out), np.asarray(valid), int(steps)

    (o1, v1, s1), (o4, v4, s4) = run(1), run(4)
    assert s1 == s4 == 6
    np.testing.assert_array_equal(v1, v4)
    np.testing.assert_array_equal(o1[:6], o4[:6])
