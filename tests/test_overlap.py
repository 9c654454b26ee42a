"""Overlapped blocking generation (generate/overlap.py): the pipelined
LM-decode + streaming-vocode driver must reproduce the serial path
(engine.generate then codec.decode) exactly — same tokens, same PCM —
for full-budget, EOS-terminated, and immediate-EOS generations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import WhichLM
from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.generate.overlap import generate_vocode_overlapped
from fish_speech_tpu.models.codec.firefly import (
    FireflyCodec,
    init_firefly_params,
)
from fish_speech_tpu.models.dual_ar import init_dual_ar_params
from fish_speech_tpu.ops.sampling import SamplingArgs
from tests.test_server import CODEC_CFG, LM_CFG, NUM_CODEBOOKS, TOK


def _engine(
    im_end_bias: float, max_frames: int = 24, dynamic_sampling: bool = False
) -> LMEngine:
    params = init_dual_ar_params(jax.random.PRNGKey(0), LM_CFG, dtype=jnp.float32)
    params["output"] = params["output"].at[:, TOK.im_end_id].multiply(
        im_end_bias
    )
    return LMEngine(
        params, LM_CFG, TOK, WhichLM.FISH_1_5,
        cache_len=128, max_frames=max_frames, dtype=jnp.float32,
        prompt_buckets=(16, 32), dynamic_sampling=dynamic_sampling,
    )


@pytest.fixture(scope="module")
def codec():
    params = init_firefly_params(jax.random.PRNGKey(1), CODEC_CFG)
    return FireflyCodec(params, CODEC_CFG, buckets=(8, 16, 32))


def _prompt(seq=9):
    r = np.random.default_rng(0)
    sem = r.integers(TOK.semantic_end_id + 1, LM_CFG.vocab_size, size=(1, seq))
    return np.concatenate(
        [sem, np.zeros((NUM_CODEBOOKS, seq), np.int64)], axis=0
    )


def _serial(engine, codec, prompt, sampling, seed, max_new):
    res, _ = engine.generate(
        prompt, max_new_tokens=max_new, sampling=sampling, seed=seed
    )
    pcm = codec.decode(res.tokens)[0]
    return res, pcm


@pytest.mark.parametrize("chunk", [4, 8])
def test_overlap_matches_serial_full_budget(codec, chunk):
    """im_end suppressed: generation runs the full budget across several
    chunks including a budget-truncated final one."""
    engine = _engine(im_end_bias=0.0, max_frames=24)
    s = SamplingArgs(temp=0.0)
    ref, ref_pcm = _serial(engine, codec, _prompt(), s, seed=7, max_new=22)
    pcm, res, _ = generate_vocode_overlapped(
        engine, codec, _prompt(), sampling=s, max_new_tokens=22, seed=7,
        chunk=chunk,
    )
    np.testing.assert_array_equal(ref.tokens, res.tokens)
    np.testing.assert_array_equal(ref.semantic, res.semantic)
    assert res.frames == ref.frames and res.hit_max == ref.hit_max
    assert pcm.shape == ref_pcm.shape
    np.testing.assert_allclose(pcm, ref_pcm, atol=2e-3, rtol=1e-2)


def test_overlap_matches_serial_eos(codec):
    """im_end amplified: EOS lands mid-chunk; the speculative chunk is
    discarded and the stream still matches the serial path."""
    engine = _engine(im_end_bias=50.0, max_frames=24)
    s = SamplingArgs(temp=0.0)
    ref, ref_pcm = _serial(engine, codec, _prompt(), s, seed=3, max_new=20)
    pcm, res, _ = generate_vocode_overlapped(
        engine, codec, _prompt(), sampling=s, max_new_tokens=20, seed=3,
        chunk=4,
    )
    np.testing.assert_array_equal(ref.tokens, res.tokens)
    assert res.frames == ref.frames and res.hit_max == ref.hit_max
    np.testing.assert_allclose(pcm, ref_pcm, atol=2e-3, rtol=1e-2)


def test_overlap_installs_sampling_on_dynamic_engine(codec):
    """Dynamic engines read sampling from GenState.samp at run time; the
    overlap driver must install the caller's args there (as
    engine.generate does) — otherwise a rep-pen/temp request silently
    decodes with SamplingArgs() defaults (ADVICE r4 medium)."""
    engine = _engine(im_end_bias=0.0, max_frames=24, dynamic_sampling=True)
    # strong rep-pen changes the greedy stream vs the default 1.0: if
    # samp is not installed the two runs below would be identical
    s_ref = SamplingArgs(temp=0.0, repetition_penalty=1.0)
    s_pen = SamplingArgs(temp=0.0, repetition_penalty=1.8)
    ref, _ = engine.generate(
        _prompt(), max_new_tokens=16, sampling=s_ref, seed=11
    )
    pen, _ = engine.generate(
        _prompt(), max_new_tokens=16, sampling=s_pen, seed=11
    )
    assert not np.array_equal(ref.tokens, pen.tokens), (
        "rep-pen must alter this stream for the check to be meaningful"
    )
    _, res, _ = generate_vocode_overlapped(
        engine, codec, _prompt(), sampling=s_pen, max_new_tokens=16,
        seed=11, chunk=4,
    )
    np.testing.assert_array_equal(pen.tokens, res.tokens)


def test_overlap_budget_zero(codec):
    """max_new_tokens=1: only the prefill frame exists; no decode chunk
    is ever dispatched and the single frame is still vocoded."""
    engine = _engine(im_end_bias=0.0, max_frames=24)
    s = SamplingArgs(temp=0.0)
    pcm, res, _ = generate_vocode_overlapped(
        engine, codec, _prompt(), sampling=s, max_new_tokens=1, seed=5,
        chunk=4,
    )
    assert res.frames == 1
    spf = (
        CODEC_CFG.quantizer.total_downsample
        * CODEC_CFG.spec_transform.hop_length
    )
    assert pcm.shape == (spf,)
    ref_pcm = codec.decode(res.tokens)[0]
    np.testing.assert_allclose(pcm, ref_pcm, atol=2e-3, rtol=1e-2)
