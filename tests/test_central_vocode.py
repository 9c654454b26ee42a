"""Central batched vocoding (generate/continuous._CentralVocoder):
deliver_pcm requests receive PCM from ONE B-row carried-state vocode
program per scheduler tick, and each request's concatenated PCM must
equal the codec's whole-sequence decode of its own token grid exactly —
across staggered admissions (lane resets), chunk boundaries (fresh
session per chunk), ragged drains, and row reuse — to within the int16
wire quantization (PCM crosses the device link as int16, the
reference's own output bit depth, wav.rs:27-58: absolute error bound
0.5/32767 ~= 1.5e-5, tested at atol 5e-5 on top of the f32
stream-vs-batch tolerance).

The reference has no counterpart: it vocodes whole text chunks after
generation, one request at a time (handlers/speech.rs:115-130)."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import (
    BackboneConfig,
    DownsampleFSQConfig,
    FireflyConfig,
    HiFiGANConfig,
    SpecTransformConfig,
    WhichLM,
)
from fish_speech_tpu.generate.continuous import (
    ContinuousBatcher,
    _ChunkResult,
    _PartialPCM,
)
from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.models.codec.firefly import FireflyCodec, init_firefly_params
from fish_speech_tpu.models.dual_ar import init_dual_ar_params
from fish_speech_tpu.ops.sampling import SamplingArgs
from tests.test_engine import CFG, TOK, make_prompt

# 2 semantic codebooks to match the LM test config (CFG.num_codebooks)
TINY2 = FireflyConfig(
    spec_transform=SpecTransformConfig(
        sample_rate=44100, n_mels=20, n_fft=256, hop_length=64, win_length=256
    ),
    backbone=BackboneConfig(
        input_channels=20, depths=(1, 1), dims=(16, 32), kernel_size=7
    ),
    head=HiFiGANConfig(
        hop_length=64,
        upsample_rates=(8, 8),
        upsample_kernel_sizes=(16, 16),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        num_mels=32,
        upsample_initial_channel=32,
        pre_conv_kernel_size=7,
        post_conv_kernel_size=7,
    ),
    quantizer=DownsampleFSQConfig(
        input_dim=32, n_groups=2, n_codebooks=1, levels=(8, 5, 5, 5),
        downsample_factor=(2,),
    ),
)


@pytest.fixture(scope="module")
def codec():
    params = init_firefly_params(jax.random.PRNGKey(1), TINY2)
    return FireflyCodec(params, TINY2, buckets=(16, 32))


@pytest.fixture(scope="module")
def batcher(codec):
    params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    engine = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=3, cache_len=64, max_frames=16,
        dtype=jnp.float32, prompt_buckets=(16,),
    )
    b = ContinuousBatcher(
        engine, SamplingArgs(temp=0.8, top_k=8), horizon=4,
        codec=codec, shift_fn=lambda c: c,
    )
    yield b
    b.shutdown()


def _run_pcm_request(batcher, prompts, max_new, cond_len=0, seed=None):
    """Collect per-chunk (pcm, tokens) through deliver_pcm events."""
    req = batcher.submit(
        prompts, cond_len=cond_len, max_new=max_new,
        deliver_pcm=True, seed=seed,
    )
    chunks = []
    pcm_parts = []
    pcm_frames = 0
    for ev in req.iter_events():
        if isinstance(ev, _PartialPCM):
            assert ev.pcm.dtype == np.float32
            assert ev.pcm.shape[-1] == ev.frames * 128  # spf = 2 * 64
            pcm_parts.append(ev.pcm)
            pcm_frames += ev.frames
        elif isinstance(ev, _ChunkResult):
            pcm = (
                np.concatenate(pcm_parts)
                if pcm_parts
                else np.zeros((0,), np.float32)
            )
            chunks.append((pcm, ev.tokens, pcm_frames))
            pcm_parts, pcm_frames = [], 0
    return chunks


def test_pcm_equals_batch_decode(batcher, codec):
    batcher.warmup()
    chunks = _run_pcm_request(batcher, [make_prompt(6)], max_new=10, seed=3)
    assert len(chunks) == 1
    pcm, tokens, frames = chunks[0]
    assert frames == tokens.shape[1] >= 1
    ref = codec.decode(tokens)[0]
    np.testing.assert_allclose(pcm, ref, atol=5e-5)


def test_pcm_events_precede_final(batcher):
    req = batcher.submit(
        [make_prompt(5)], cond_len=0, max_new=8, deliver_pcm=True, seed=0
    )
    kinds = [type(ev).__name__ for ev in req.iter_events()]
    assert kinds[-1] == "_ChunkResult"
    assert "_PartialPCM" in kinds


def test_multi_chunk_fresh_session_per_chunk(batcher, codec):
    """Each text chunk's PCM equals a FRESH whole-decode of that chunk's
    tokens (per-chunk vocoder state reset, matching the per-request
    session semantics in pipeline.synthesize_streaming_continuous)."""
    prompts = [make_prompt(8), make_prompt(5) + 1]
    chunks = _run_pcm_request(batcher, prompts, max_new=6, cond_len=3, seed=7)
    assert len(chunks) == 2
    for pcm, tokens, frames in chunks:
        assert frames == tokens.shape[1]
        ref = codec.decode(tokens)[0]
        np.testing.assert_allclose(pcm, ref, atol=5e-5)


def test_concurrent_staggered_lanes(batcher, codec):
    """5 requests through 3 rows with different lengths: lane resets on
    row reuse, ragged drains, and per-lane stream isolation — every
    request's PCM must equal its own tokens' whole decode."""
    results = {}

    def worker(i):
        results[i] = _run_pcm_request(
            batcher, [make_prompt(4 + i % 3)], max_new=5 + i % 4, seed=i
        )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == list(range(5))
    for i, chunks in results.items():
        assert len(chunks) == 1
        pcm, tokens, frames = chunks[0]
        assert frames == tokens.shape[1] >= 1
        ref = codec.decode(tokens)[0]
        np.testing.assert_allclose(pcm, ref, atol=5e-5, err_msg=f"req {i}")


def test_mixed_pcm_and_token_delivery(batcher, codec):
    """deliver_pcm and plain token-streaming requests coexist: the
    central vocoder only touches PCM lanes."""
    out = {}

    def pcm_worker():
        out["pcm"] = _run_pcm_request(
            batcher, [make_prompt(6)], max_new=6, seed=11
        )

    def tok_worker():
        req = batcher.submit(
            [make_prompt(4)], cond_len=0, max_new=6, stream=True, seed=12
        )
        out["tok"] = [c for c in req]

    ts = [threading.Thread(target=pcm_worker), threading.Thread(target=tok_worker)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    pcm, tokens, frames = out["pcm"][0]
    np.testing.assert_allclose(pcm, codec.decode(tokens)[0], atol=5e-5)
    assert out["tok"][0].tokens.shape[1] >= 1


def test_deliver_pcm_requires_codec():
    params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    engine = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=2, cache_len=64, max_frames=8,
        dtype=jnp.float32, prompt_buckets=(16,),
    )
    b = ContinuousBatcher(engine, SamplingArgs(temp=0.0), horizon=4)
    try:
        with pytest.raises(ValueError, match="deliver_pcm"):
            b.submit([make_prompt(4)], cond_len=0, max_new=4, deliver_pcm=True)
    finally:
        b.shutdown()
