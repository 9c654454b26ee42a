"""Every synthesis entry point overlaps LM decode with vocoding
(VERDICT r4 #7): with a streaming-capable codec, no path may serially
vocode a chunk's full token grid AFTER its decode completed — the
reference can only do vocode-after-generate (handlers/speech.rs:115-130)
and these tests pin that this framework never does.

Mechanism under test: the serial blocking path routes through
generate/overlap.py; the continuous-batcher blocking path streams
partial frames into a carried-state session in the client thread
(pipeline.synthesize_streaming_continuous). The spy asserts the
whole-chunk `codec.decode` program is never dispatched; PCM equivalence
is asserted against a decode of the returned codes afterwards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import WhichLM
from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.models.codec.firefly import (
    FireflyCodec,
    init_firefly_params,
)
from fish_speech_tpu.models.dual_ar import init_dual_ar_params
from fish_speech_tpu.ops.sampling import SamplingArgs
from fish_speech_tpu.pipeline import TTSPipeline
from tests.test_server import CODEC_CFG, LM_CFG, TOK, DummyTokenizer


def _pipe(dynamic_sampling: bool = False) -> TTSPipeline:
    params = init_dual_ar_params(
        jax.random.PRNGKey(0), LM_CFG, dtype=jnp.float32
    )
    # bias toward <|im_end|> so argmax generation terminates
    params["output"] = params["output"].at[:, TOK.im_end_id].multiply(50.0)
    engine = LMEngine(
        params, LM_CFG, TOK, WhichLM.FISH_1_5,
        cache_len=128, max_frames=16, dtype=jnp.float32,
        prompt_buckets=(64, 128), dynamic_sampling=dynamic_sampling,
    )
    codec = FireflyCodec(
        init_firefly_params(jax.random.PRNGKey(1), CODEC_CFG),
        CODEC_CFG,
        buckets=(8, 16, 32),
    )
    return TTSPipeline(
        engine, codec, DummyTokenizer(), WhichLM.FISH_1_5, max_new_tokens=10
    )


class _DecodeSpy:
    """Counts whole-chunk codec.decode dispatches (streaming-session
    feeds go through different entry points and are not counted)."""

    def __init__(self, codec):
        self.codec = codec
        self.calls = 0
        self._orig = codec.decode

    def __enter__(self):
        def spy(codes):
            self.calls += 1
            return self._orig(codes)

        self.codec.decode = spy
        return self

    def __exit__(self, *exc):
        self.codec.decode = self._orig


def test_synthesize_blocking_never_serially_vocodes():
    pipe = _pipe()
    sampling = SamplingArgs(temp=0.0)
    chunks = []
    try:
        with _DecodeSpy(pipe.codec) as spy:
            for c in pipe.synthesize_streaming(
                "Hello there world.", sampling=sampling, seed=0
            ):
                chunks.append(c)
    except RuntimeError:
        pytest.skip("random-weight generation ran away (CPU numeric jitter)")
    assert spy.calls == 0, (
        "blocking synthesis dispatched a whole-chunk vocode after decode "
        "— the overlap driver (generate/overlap.py) must own this path"
    )
    assert chunks
    for c in chunks:
        ref = pipe.codec.decode(c.codes)[0]
        assert c.pcm.shape == ref.shape
        np.testing.assert_allclose(c.pcm, ref, atol=2e-3, rtol=1e-2)


def test_continuous_blocking_never_serially_vocodes():
    pipe = _pipe()
    batcher = pipe.create_batcher(rows=2, horizon=4)
    sampling = SamplingArgs(temp=0.0)
    try:
        with _DecodeSpy(pipe.codec) as spy:
            parts = list(
                pipe.synthesize_streaming_continuous(
                    batcher, "Hello there world.",
                    sampling=sampling, seed=0,
                )
            )
    finally:
        batcher.shutdown()
    assert spy.calls == 0, (
        "the continuous blocking path vocoded a whole chunk after its "
        "decode finished — it must feed partial frames into a "
        "carried-state session as they decode"
    )
    assert parts and sum(p.shape[-1] for p in parts) > 0


def test_continuous_blocking_pcm_matches_whole_decode():
    """The overlapped continuous path's PCM must equal a whole-grid
    decode of the same generation (carried-state streaming is exact up
    to program-shape float wobble)."""
    pipe = _pipe()
    batcher = pipe.create_batcher(rows=2, horizon=4)
    sampling = SamplingArgs(temp=0.0)
    try:
        pcm = np.concatenate(
            list(
                pipe.synthesize_streaming_continuous(
                    batcher, "Hello there world.",
                    sampling=sampling, seed=3,
                )
            )
        )
        # same generation again, token grid via the plain chunk iterator
        req = batcher.submit(
            pipe.prompt_encoder.encode_sequence(
                ["Hello there world."],
                sysprompt_text="Speak out the provided text.",
                assume_kv_cache=True,
            )[1],
            0,
            pipe.max_new_tokens,
            seed=3,
            sampling=sampling,
        )
        grids = [c.tokens for c in req]
    finally:
        batcher.shutdown()
    ref = np.concatenate(
        [pipe.codec.decode(pipe._shift_output_tokens(g))[0] for g in grids]
    )
    assert pcm.shape == ref.shape
    np.testing.assert_allclose(pcm, ref, atol=2e-3, rtol=1e-2)


def test_continuous_blocking_keeps_full_horizon_ticks():
    """Overlap delivery must NOT opt blocking requests into the TTFA
    short-tick path (low_latency=False): r4 measured short ticks costing
    16-way blocking throughput 0.176 vs 0.140."""
    pipe = _pipe()
    batcher = pipe.create_batcher(rows=2, horizon=4)
    try:
        gen = pipe.synthesize_streaming_continuous(
            batcher, "Hello there world.", seed=0,
            sampling=SamplingArgs(temp=0.0),
        )
        first = next(gen)
        assert first is not None
        # the scheduler's short-tick counter is only armed by
        # low_latency admissions
        assert batcher._short_left == 0
        list(gen)
    finally:
        batcher.shutdown()
