"""Continuous cross-request batching: admission, chunk transitions,
row reuse, and concurrent submission."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import WhichLM
from fish_speech_tpu.generate.continuous import ContinuousBatcher
from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.models.dual_ar import init_dual_ar_params
from fish_speech_tpu.ops.sampling import SamplingArgs
from tests.test_engine import CFG, TOK, make_prompt


@pytest.fixture(scope="module")
def batcher():
    params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    engine = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=3, cache_len=64, max_frames=16,
        dtype=jnp.float32, prompt_buckets=(16,),
    )
    b = ContinuousBatcher(engine, SamplingArgs(temp=0.8, top_k=8), horizon=4)
    yield b
    b.shutdown()


def _collect(req):
    return [c for c in req]


def test_single_request_roundtrip(batcher):
    req = batcher.submit([make_prompt(6)], cond_len=0, max_new=6)
    chunks = _collect(req)
    assert len(chunks) == 1
    c = chunks[0]
    assert c.tokens.shape[0] == CFG.num_codebooks
    assert 1 <= c.tokens.shape[1] <= 6
    assert c.semantic.shape[0] == c.tokens.shape[1]
    assert np.all(
        (c.semantic == TOK.im_end_id)
        | ((c.semantic >= TOK.semantic_start_id) & (c.semantic <= TOK.semantic_end_id))
    )


def test_multi_chunk_request_keeps_row(batcher):
    prompts = [make_prompt(8), make_prompt(5) + 1]
    req = batcher.submit(prompts, cond_len=3, max_new=5)
    chunks = _collect(req)
    assert len(chunks) == 2
    for c in chunks:
        assert c.tokens.shape[1] >= 1


def test_concurrent_requests_overflow_rows(batcher):
    """5 requests through 3 rows: queueing + row recycling."""
    results = {}

    def worker(i):
        req = batcher.submit([make_prompt(4 + i % 3)], cond_len=0, max_new=5)
        results[i] = _collect(req)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 5
    for i, chunks in results.items():
        assert len(chunks) == 1
        assert chunks[0].tokens.shape[0] == CFG.num_codebooks
        assert chunks[0].tokens.shape[1] >= 1


def test_batcher_matches_serial_argmax():
    """With temp=0 (argmax ignores the shared RNG), a request through the
    batcher must produce exactly what the serial engine produces."""
    params = init_dual_ar_params(jax.random.PRNGKey(5), CFG, dtype=jnp.float32)
    sampling = SamplingArgs(temp=0.0)
    prompt = make_prompt(7)

    serial = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        cache_len=64, max_frames=8, dtype=jnp.float32, prompt_buckets=(16,),
    )
    ref, _ = serial.generate(prompt, max_new_tokens=6, sampling=sampling, seed=0)

    beng = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=2, cache_len=64, max_frames=8,
        dtype=jnp.float32, prompt_buckets=(16,),
    )
    b = ContinuousBatcher(beng, sampling, horizon=3)
    try:
        req = b.submit([prompt], cond_len=0, max_new=6)
        chunks = [c for c in req]
    finally:
        b.shutdown()
    assert len(chunks) == 1
    np.testing.assert_array_equal(chunks[0].semantic, ref.semantic)
    np.testing.assert_array_equal(chunks[0].tokens, ref.tokens)
