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


def test_warmup_then_serve(batcher):
    """warmup() compiles per-bucket prefill (including the conditioned
    offset>0 variants) + the decode chunk through the real scheduler and
    leaves the batcher fully serviceable."""
    batcher.warmup(conditioning_lens=(0, 5))
    req = batcher.submit([make_prompt(5)], cond_len=0, max_new=4)
    chunks = _collect(req)
    assert len(chunks) == 1 and chunks[0].tokens.shape[1] >= 1


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


def test_pipelined_speculation_no_frame_leakage():
    """Stress the pipelined scheduler's epoch tagging: tiny horizon + tight
    budgets force rows to budget-finish while a speculative decode chunk is
    already in flight, then be re-admitted for their next text chunk. Any
    stale speculative frame leaking into the wrong chunk breaks exact
    equality with the serial engine at temp=0."""
    params = init_dual_ar_params(jax.random.PRNGKey(9), CFG, dtype=jnp.float32)
    sampling = SamplingArgs(temp=0.0)
    reqs = [
        # (prompts, cond_len, max_new): multi-chunk with differing budgets
        ([make_prompt(6), make_prompt(4) + 1], 2, 4),
        ([make_prompt(5), make_prompt(6) + 2, make_prompt(3) + 3], 3, 3),
        ([make_prompt(7)], 0, 5),
    ]

    # serial references (per-request state, conditioning rewind like
    # pipeline._generate_codes_chunked)
    serial = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        cache_len=64, max_frames=8, dtype=jnp.float32, prompt_buckets=(16,),
    )
    expected = []
    for prompts, cond_len, max_new in reqs:
        state = serial.init_state(0)
        outs = []
        cl = 0
        for i, p in enumerate(prompts):
            offset = cl if i > 0 else 0
            res, state = serial.generate(
                p, max_new_tokens=max_new, sampling=sampling,
                state=state, conditioning_offset=offset,
            )
            if i == 0:
                cl = cond_len
            state = serial.rewind(state, cl)
            outs.append((res.semantic, res.tokens))
        expected.append(outs)

    beng = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=2, cache_len=64, max_frames=8,
        dtype=jnp.float32, prompt_buckets=(16,),
    )
    # horizon 2 < budgets: every chunk spans several ticks, so finishes
    # routinely race an in-flight speculative chunk
    b = ContinuousBatcher(beng, sampling, horizon=2)
    try:
        results = {}

        def worker(i):
            prompts, cond_len, max_new = reqs[i]
            results[i] = [c for c in b.submit(prompts, cond_len, max_new)]

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(len(reqs))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
    finally:
        b.shutdown()

    for i, (prompts, _, _) in enumerate(reqs):
        assert len(results[i]) == len(prompts)
        for j, chunk in enumerate(results[i]):
            exp_sem, exp_tok = expected[i][j]
            np.testing.assert_array_equal(
                chunk.semantic, exp_sem,
                err_msg=f"request {i} chunk {j} semantic row diverged",
            )
            np.testing.assert_array_equal(chunk.tokens, exp_tok)


def test_randomized_soak_invariants(batcher):
    """Randomized load through the shared batcher: many requests with
    ragged prompt lengths, chunk counts, and budgets, submitted from
    concurrent threads at temp>0. Checks the scheduler's structural
    invariants (every request completes, one result per chunk, lengths
    within budget, tokens in the legal vocab ranges) — the complement of
    the exact-token tests, aimed at races/leaks under churn."""
    rng = np.random.default_rng(11)
    reqs = []
    for i in range(9):
        n_chunks = int(rng.integers(1, 4))
        prompts = [make_prompt(int(rng.integers(3, 12))) for _ in range(n_chunks)]
        cond_len = int(rng.integers(0, 3)) if n_chunks > 1 else 0
        max_new = int(rng.integers(2, 8))
        reqs.append((prompts, cond_len, max_new))

    results = {}

    def worker(i):
        prompts, cond_len, max_new = reqs[i]
        results[i] = [c for c in batcher.submit(prompts, cond_len, max_new)]

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(len(reqs))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == len(reqs)
    for i, (prompts, _, max_new) in enumerate(reqs):
        chunks = results[i]
        assert len(chunks) == len(prompts), f"request {i} lost chunks"
        for c in chunks:
            t = c.tokens.shape[1]
            assert 1 <= t <= max_new, (i, t, max_new)
            assert c.semantic.shape == (t,)
            assert np.all(
                (c.semantic == TOK.im_end_id)
                | (
                    (c.semantic >= TOK.semantic_start_id)
                    & (c.semantic <= TOK.semantic_end_id)
                )
            )
            assert np.all((c.tokens >= 0) & (c.tokens < CFG.codebook_size))


def test_scheduler_death_propagates_to_waiters():
    """If the decode program raises, every waiting request gets the error
    instead of hanging (failure-detection parity: the reference surfaces
    model errors as HTTP 500 via anyhow, handlers/error.rs:17-32)."""
    params = init_dual_ar_params(jax.random.PRNGKey(2), CFG, dtype=jnp.float32)
    engine = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=2, cache_len=64, max_frames=16,
        dtype=jnp.float32, prompt_buckets=(16,),
    )
    boom = RuntimeError("injected decode failure")

    def bad_decode_chunk(*a, **k):
        raise boom

    engine.decode_chunk = bad_decode_chunk
    b = ContinuousBatcher(engine, SamplingArgs(temp=0.8, top_k=8), horizon=4)
    try:
        req1 = b.submit([make_prompt(6)], cond_len=0, max_new=6)
        req2 = b.submit([make_prompt(5)], cond_len=0, max_new=6)
        for req in (req1, req2):
            with pytest.raises(RuntimeError, match="injected decode failure"):
                _collect(req)
    finally:
        b.shutdown()


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


def test_batcher_with_unrolled_decode_matches_serial():
    """The serving path with decode_unroll=4 (the planned TPU default):
    batcher chunks through the unrolled loop must equal the serial
    unroll=1 engine token-for-token, including admission (admit_horizon)
    and multi-chunk re-admission — the carried batcher state crosses
    unrolled-group boundaries every tick."""
    params = init_dual_ar_params(jax.random.PRNGKey(5), CFG, dtype=jnp.float32)
    sampling = SamplingArgs(temp=0.0)
    prompts = [make_prompt(7), make_prompt(8)]

    serial = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        cache_len=64, max_frames=16, dtype=jnp.float32, prompt_buckets=(16,),
    )
    refs = [
        serial.generate(p, max_new_tokens=12, sampling=sampling, seed=0)[0]
        for p in prompts
    ]

    beng = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=2, cache_len=64, max_frames=16,
        dtype=jnp.float32, prompt_buckets=(16,), decode_unroll=4,
    )
    b = ContinuousBatcher(beng, sampling, horizon=8, admit_horizon=4)
    try:
        reqs = [b.submit([p], cond_len=0, max_new=12) for p in prompts]
        outs = [[c for c in r] for r in reqs]
    finally:
        b.shutdown()
    for ref, chunks in zip(refs, outs):
        assert len(chunks) == 1
        np.testing.assert_array_equal(chunks[0].semantic, ref.semantic)
        np.testing.assert_array_equal(chunks[0].tokens, ref.tokens)


def test_admit_horizon_rounds_up_to_decode_unroll():
    """The DEFAULT admit_horizon (3) is not divisible by unroll 2/4;
    the ctor must round it up or the admission tick's decode_chunk
    asserts (ADVICE r4). Unroll-1 engines keep it exactly."""
    params = init_dual_ar_params(jax.random.PRNGKey(5), CFG, dtype=jnp.float32)
    sampling = SamplingArgs(temp=0.0)
    for unroll, expect in ((1, 3), (2, 4), (4, 4)):
        eng = LMEngine(
            params, CFG, TOK, WhichLM.FISH_1_5,
            batch_size=1, cache_len=64, max_frames=16,
            dtype=jnp.float32, prompt_buckets=(16,), decode_unroll=unroll,
        )
        b = ContinuousBatcher(eng, sampling, horizon=8)  # default admit=3
        try:
            assert b.admit_horizon == expect, (unroll, b.admit_horizon)
            # the rounded admission tick must actually run (stream=True
            # triggers the short-tick path that uses admit_horizon)
            req = b.submit(
                [make_prompt(7)], cond_len=0, max_new=6, stream=True
            )
            assert len([c for c in req]) == 1
        finally:
            b.shutdown()


def test_shutdown_releases_waiting_clients():
    """Clean shutdown must unblock clients still waiting for chunks
    (both in-flight rows and never-admitted queued requests) instead of
    leaving them parked on results.get() forever."""
    params = init_dual_ar_params(jax.random.PRNGKey(2), CFG, dtype=jnp.float32)
    engine = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=1, cache_len=64, max_frames=16,
        dtype=jnp.float32, prompt_buckets=(16,),
    )
    b = ContinuousBatcher(engine, SamplingArgs(temp=0.8, top_k=8), horizon=4)
    # one request per row plus overflow so at least one stays queued
    reqs = [
        b.submit([make_prompt(5)] * 4, cond_len=0, max_new=8)
        for _ in range(3)
    ]
    b.shutdown()

    outcomes = []

    def consume(req):
        try:
            list(req)
            outcomes.append("done")
        except RuntimeError:
            outcomes.append("released")

    threads = [threading.Thread(target=consume, args=(r,)) for r in reqs]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not any(t.is_alive() for t in threads), "client blocked forever"
    assert len(outcomes) == 3
    assert "released" in outcomes  # at least the queued ones were released


def test_stream_events_match_chunk_results(batcher):
    """stream=True: per-chunk concatenation of _PartialFrames must equal
    the final _ChunkResult's token grid, with the chunk boundary event
    arriving after its partials."""
    from fish_speech_tpu.generate.continuous import _ChunkResult, _PartialFrames

    req = batcher.submit(
        [make_prompt(5), make_prompt(6) + 1], cond_len=0, max_new=6,
        stream=True,
    )
    per_chunk_partials = [[]]
    chunk_results = []
    for ev in req.iter_events():
        if isinstance(ev, _PartialFrames):
            assert ev.frames.ndim == 2 and ev.frames.shape[1] >= 1
            per_chunk_partials[-1].append(ev.frames)
        else:
            assert isinstance(ev, _ChunkResult)
            chunk_results.append(ev)
            per_chunk_partials.append([])
    assert len(chunk_results) == 2
    for parts, chunk in zip(per_chunk_partials, chunk_results):
        stacked = np.concatenate(parts, axis=1)
        np.testing.assert_array_equal(stacked[1:], chunk.tokens)
        np.testing.assert_array_equal(stacked[0], chunk.semantic)


def test_stream_request_plain_iteration_skips_partials(batcher):
    """Iterating a stream=True request with the chunk-level contract must
    still yield exactly the _ChunkResults."""
    req = batcher.submit([make_prompt(4)], cond_len=0, max_new=5, stream=True)
    chunks = [c for c in req]
    assert len(chunks) == 1
    assert chunks[0].tokens.shape[0] == CFG.num_codebooks


def test_submit_after_shutdown_releases_client():
    """A submit that lands after shutdown's final queue drain must still
    release the client (submit-side sentinel), not hang its iterator."""
    params = init_dual_ar_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)
    engine = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=1, cache_len=64, max_frames=8,
        dtype=jnp.float32, prompt_buckets=(16,),
    )
    b = ContinuousBatcher(engine, SamplingArgs(temp=0.8, top_k=8), horizon=4)
    b.shutdown()
    req = b.submit([make_prompt(4)], cond_len=0, max_new=4)
    with pytest.raises(RuntimeError, match="shut down"):
        list(req)


def test_randomized_soak_streaming_mixed(batcher):
    """Soak with a MIX of stream and non-stream requests from concurrent
    threads: streaming consumers verify per-chunk partial-concat ==
    chunk result under churn (epoch-discard of speculative frames must
    never leak a stale partial); non-stream requests keep their contract."""
    from fish_speech_tpu.generate.continuous import _ChunkResult, _PartialFrames

    rng = np.random.default_rng(23)
    reqs = []
    for i in range(8):
        n_chunks = int(rng.integers(1, 4))
        prompts = [make_prompt(int(rng.integers(3, 12))) for _ in range(n_chunks)]
        cond_len = int(rng.integers(0, 3)) if n_chunks > 1 else 0
        max_new = int(rng.integers(2, 8))
        reqs.append((prompts, cond_len, max_new, i % 2 == 0))

    failures = {}
    done = {}

    def worker(i):
        prompts, cond_len, max_new, stream = reqs[i]
        try:
            req = batcher.submit(prompts, cond_len, max_new, stream=stream)
            if not stream:
                done[i] = len([c for c in req])
                return
            partials = [[]]
            n_chunks = 0
            for ev in req.iter_events():
                if isinstance(ev, _PartialFrames):
                    partials[-1].append(ev.frames)
                else:
                    assert isinstance(ev, _ChunkResult)
                    stacked = np.concatenate(partials[-1], axis=1)
                    np.testing.assert_array_equal(stacked[1:], ev.tokens)
                    np.testing.assert_array_equal(stacked[0], ev.semantic)
                    partials.append([])
                    n_chunks += 1
            done[i] = n_chunks
        except Exception as e:  # noqa: BLE001 — surface in main thread
            failures[i] = e

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(len(reqs))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not failures, failures
    for i, (prompts, _, _, _) in enumerate(reqs):
        assert done.get(i) == len(prompts), f"request {i} incomplete"


def test_burst_prefill_rows_matches_sequential():
    """engine.prefill_rows (one program admitting k contiguous rows) must
    leave the same state/frames as k sequential prefill_row calls at
    temp=0 (the burst-admission fast path in ContinuousBatcher._admit)."""
    params = init_dual_ar_params(jax.random.PRNGKey(5), CFG, dtype=jnp.float32)
    engine = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=4, cache_len=64, max_frames=8,
        dtype=jnp.float32, prompt_buckets=(16,),
    )
    s = SamplingArgs(temp=0.0)
    prompts = [make_prompt(4 + i) for i in range(3)]

    st_a = engine.init_state(seed=0)
    st_a, frames_a, eos_a = engine.prefill_rows(st_a, prompts, s, row0=1)
    frames_a = np.asarray(frames_a)

    st_b = engine.init_state(seed=0)
    frames_b = []
    for i, p in enumerate(prompts):
        st_b, f, _ = engine.prefill_row(st_b, p, s, row=1 + i)
        frames_b.append(np.asarray(f))
    frames_b = np.stack(frames_b)

    np.testing.assert_array_equal(frames_a, frames_b)
    np.testing.assert_array_equal(np.asarray(st_a.pos), np.asarray(st_b.pos))
    np.testing.assert_array_equal(np.asarray(st_a.prev), np.asarray(st_b.prev))
    np.testing.assert_array_equal(np.asarray(st_a.done), np.asarray(st_b.done))
    np.testing.assert_allclose(
        np.asarray(st_a.cache.k), np.asarray(st_b.cache.k), atol=1e-5
    )


def test_short_ticks_gated_to_streaming_admissions():
    """Fresh STREAMING admissions run admit_horizon-frame ticks for
    1 + admit_cooldown ticks (low cold-burst TTFA: the client's first
    vocode programs land behind short decode chunks); blocking requests
    never trigger short ticks — they only see their final chunk result,
    so short chunks would tax throughput for nothing (BASELINE.md
    cold-burst decomposition)."""
    import time as _time

    from fish_speech_tpu.generate.continuous import _PartialFrames

    params = init_dual_ar_params(jax.random.PRNGKey(7), CFG, dtype=jnp.float32)
    engine = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=2, cache_len=64, max_frames=16,
        dtype=jnp.float32, prompt_buckets=(16,),
    )
    horizons = []
    orig = engine.decode_chunk

    def recording(state, sampling, horizon, **kw):
        horizons.append(horizon)
        return orig(state, sampling, horizon, **kw)

    engine.decode_chunk = recording
    b = ContinuousBatcher(engine, SamplingArgs(temp=0.8, top_k=8), horizon=8)
    assert b.admit_horizon == 3 and b.admit_cooldown == 2  # defaults
    try:
        # blocking request: every tick (incl. the admission tick and the
        # speculative pipeline tick) runs the full horizon
        for _ in b.submit([make_prompt(5)], cond_len=0, max_new=12):
            pass
        _time.sleep(0.3)  # let the speculative trailing tick record
        assert horizons and all(h == b.horizon for h in horizons)

        horizons.clear()
        req = b.submit(
            [make_prompt(5)], cond_len=0, max_new=12, stream=True
        )
        partials = [
            e for e in req.iter_events() if isinstance(e, _PartialFrames)
        ]
        _time.sleep(0.3)
        # first audio event = admission frame + the short admit tick
        assert partials
        assert partials[0].frames.shape[1] <= 1 + b.admit_horizon
        # the admission tick and the cooldown ticks are short; later
        # ticks (if the request lived that long) are full-horizon
        n_short = 1 + b.admit_cooldown
        assert all(h == b.admit_horizon for h in horizons[:n_short])
        assert all(h == b.horizon for h in horizons[n_short:])
    finally:
        b.shutdown()
