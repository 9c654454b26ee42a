"""End-to-end generic-DualAR (smoltts) pipeline: depthwise DualAR LM +
Mimi codec, through the same TTSPipeline paths the server uses.

Covers the Codec::Mimi dispatch (reference: server/lib/audio/codec.rs,
load.rs:176-186), the no-token-shift path (uses_explicit_semantic_ids),
rep-pen disabled under depthwise_wte (single_batch.rs:162-167), and the
low-latency streaming path's carried-state Mimi decode
(MimiCodec.start_stream == mimi.rs decode_step)."""

import numpy as np
import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fish_speech_tpu.config import DualARConfig, TokenConfig, WhichLM  # noqa: E402
from fish_speech_tpu.generate.engine import LMEngine  # noqa: E402
from fish_speech_tpu.models.codec.mimi import MimiCodec  # noqa: E402
from fish_speech_tpu.models.dual_ar import init_dual_ar_params  # noqa: E402
from fish_speech_tpu.ops.sampling import SamplingArgs  # noqa: E402
from fish_speech_tpu.pipeline import TTSPipeline  # noqa: E402
from tests.test_mimi import models as mimi_models  # noqa: E402,F401
from tests.test_server import DummyTokenizer  # noqa: E402

NUM_CODEBOOKS = 4

LM_CFG = DualARConfig(
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
    max_seq_len=256,
    codebook_size=32,  # == tiny Mimi codebook_size
    num_codebooks=NUM_CODEBOOKS,
    depthwise_wte=True,  # smoltts-style per-codebook embeddings/heads
    depthwise_output=True,
)
TOK = TokenConfig(im_end_id=6, pad_id=5, semantic_start_id=16, semantic_end_id=47)


@pytest.fixture(scope="module")
def pipeline(mimi_models):  # noqa: F811
    _, mimi_cfg, mimi_params = mimi_models
    codec = MimiCodec(mimi_params, mimi_cfg, num_quantizers=NUM_CODEBOOKS)
    params = init_dual_ar_params(jax.random.PRNGKey(0), LM_CFG, dtype=jnp.float32)
    # bias toward <|im_end|> so argmax generation terminates quickly
    params["output"] = params["output"].at[:, TOK.im_end_id].multiply(20.0)
    engine = LMEngine(
        params, LM_CFG, TOK, WhichLM.DUAL_AR,
        cache_len=128, max_frames=16, dtype=jnp.float32,
        prompt_buckets=(64, 128),
    )
    return TTSPipeline(
        engine, codec, DummyTokenizer(), WhichLM.DUAL_AR, max_new_tokens=10
    )


def test_dualar_blocking_synthesis(pipeline):
    pcm = pipeline.synthesize(
        "Hello world.", sampling=SamplingArgs(temp=0.0), seed=0
    )
    assert pcm.ndim == 1 and pcm.shape[0] > 0
    # frames * hop * resample-upsample samples per frame
    spf = pipeline.codec.cfg.hop_length * 2
    assert pcm.shape[0] % spf == 0


def test_dualar_lowlatency_stream_matches_blocking(pipeline):
    """The frame-chunked streaming path must reproduce the blocking audio
    exactly: the LM is deterministic at temp=0 and the Mimi stream session
    is step-vs-batch exact."""
    sampling = SamplingArgs(temp=0.0)
    blocking = pipeline.synthesize("Hello world.", sampling=sampling, seed=0)
    pipeline_sampling = pipeline.default_sampling
    pipeline.default_sampling = sampling
    try:
        parts = list(
            pipeline.synthesize_streaming_lowlatency(
                "Hello world.", frame_chunk=2, seed=0
            )
        )
    finally:
        pipeline.default_sampling = pipeline_sampling
    streamed = np.concatenate(parts)
    assert streamed.shape == blocking.shape
    np.testing.assert_allclose(streamed, blocking, rtol=1e-4, atol=1e-4)


def test_dualar_no_token_shift(pipeline):
    """DualAR codes pass through unshifted (the -1 shift is a Fish <=1.4
    quirk, handlers/speech.rs:63-68)."""
    codes = np.array([[0, 5, 31]] * NUM_CODEBOOKS, np.int32)
    np.testing.assert_array_equal(pipeline._shift_output_tokens(codes), codes)
