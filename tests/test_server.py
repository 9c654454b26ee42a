"""In-process server smoke tests with a tiny random-weight pipeline
(the automated analogue of the reference's benchmark.rs server harness)."""

import asyncio
import io
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from fish_speech_tpu.config import (
    BackboneConfig,
    DownsampleFSQConfig,
    DualARConfig,
    FireflyConfig,
    FishVersion,
    HiFiGANConfig,
    SpecTransformConfig,
    TokenConfig,
    WhichLM,
)
from fish_speech_tpu.audio.wav import pcm_to_wav_bytes
from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.models.codec.firefly import FireflyCodec, init_firefly_params
from fish_speech_tpu.models.dual_ar import init_dual_ar_params
from fish_speech_tpu.pipeline import TTSPipeline
from fish_speech_tpu.server.app import AppState, create_app

NUM_CODEBOOKS = 2

LM_CFG = DualARConfig(
    vocab_size=200,
    n_layer=2,
    n_fast_layer=2,
    n_head=4,
    dim=32,
    intermediate_size=64,
    n_local_heads=2,
    head_dim=8,
    rope_base=10000.0,
    norm_eps=1e-6,
    max_seq_len=128,
    codebook_size=8,
    num_codebooks=NUM_CODEBOOKS,
)
TOK = TokenConfig(im_end_id=109, pad_id=5, semantic_start_id=110, semantic_end_id=117)

CODEC_CFG = FireflyConfig(
    spec_transform=SpecTransformConfig(
        sample_rate=44100, n_mels=20, n_fft=256, hop_length=64, win_length=256
    ),
    backbone=BackboneConfig(input_channels=20, depths=(1, 1), dims=(16, 32), kernel_size=7),
    head=HiFiGANConfig(
        hop_length=64, upsample_rates=(8, 8), upsample_kernel_sizes=(16, 16),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        num_mels=32, upsample_initial_channel=32,
        pre_conv_kernel_size=7, post_conv_kernel_size=7,
    ),
    quantizer=DownsampleFSQConfig(
        input_dim=32, n_groups=NUM_CODEBOOKS, n_codebooks=1,
        levels=(8, 5, 5, 5), downsample_factor=(2,),
    ),
    version=FishVersion.V1_5,
)


class DummyTokenizer:
    """Minimal tokenizers.Tokenizer lookalike: whitespace word-hash ids,
    special tokens mapped to fixed ids."""

    SPECIALS = {
        "<|im_start|>": 1,
        "<|im_end|>": 109,
        "<|semantic|>": 5,
        "<|voice|>": 99,
        "<|semantic:0|>": 110,
    }

    class _Enc:
        def __init__(self, ids):
            self.ids = ids

    def token_to_id(self, tok):
        return self.SPECIALS.get(tok)

    def encode(self, text, add_special_tokens=True):
        ids = []
        i = 0
        while i < len(text):
            matched = False
            for sp, sid in self.SPECIALS.items():
                if text.startswith(sp, i):
                    ids.append(sid)
                    i += len(sp)
                    matched = True
                    break
            if not matched:
                j = i
                while j < len(text) and not text.startswith("<|", j):
                    j += 1
                for word in text[i:j].split():
                    ids.append(10 + (hash(word) % 80))
                i = j
        return self._Enc(ids)


@pytest.fixture(scope="module")
def pipeline():
    params = init_dual_ar_params(jax.random.PRNGKey(0), LM_CFG, dtype=jnp.float32)
    engine = LMEngine(
        params, LM_CFG, TOK, WhichLM.FISH_1_5,
        cache_len=128, max_frames=8, dtype=jnp.float32, prompt_buckets=(64, 128),
    )
    codec_params = init_firefly_params(jax.random.PRNGKey(1), CODEC_CFG)
    codec = FireflyCodec(codec_params, CODEC_CFG, buckets=(8, 16))
    return TTSPipeline(
        engine, codec, DummyTokenizer(), WhichLM.FISH_1_5, max_new_tokens=8
    )


@pytest.fixture()
def state(pipeline):
    voice = pipeline.prompt_encoder.encode_conditioning_prompt(
        "hi", np.zeros((NUM_CODEBOOKS, 3), np.int32)
    )
    return AppState(pipeline, {"default": voice}, voice)


async def _run(state, fn):
    import aiohttp

    app = create_app(state)
    server = TestServer(app)
    # generous timeout: first-call jit compiles share one CPU core in CI
    client = TestClient(server, timeout=aiohttp.ClientTimeout(total=1800))
    await client.start_server()
    try:
        return await fn(client)
    finally:
        await client.close()


def _sync(coro):
    return asyncio.run(coro)




async def _read_stream_or_skip(resp):
    """Read a chunked opus stream; a connection terminated mid-stream is
    the server's runaway-abort path (headers already sent, so no 500 is
    possible) — skip like _post_ok does for blocking routes."""
    import aiohttp

    try:
        return await resp.read()
    except aiohttp.ClientError:
        pytest.skip("random-weight generation ran away mid-stream")


async def _post_ok(client, url, payload):
    """POST, skipping the test on the rare legitimate runaway-500 that a
    random-weight model can produce (CPU numeric jitter makes this
    nondeterministic across runs)."""
    resp = await client.post(url, json=payload)
    if resp.status == 500 and "ran away" in (await resp.text()):
        pytest.skip("random-weight generation ran away")
    return resp


def test_voices_route(state):
    async def fn(client):
        resp = await client.get("/v1/voices")
        assert resp.status == 200
        return await resp.json()

    data = _sync(_run(state, fn))
    assert data == {"voices": ["default"]}


def test_cors_preflight_and_response_headers(state):
    """Permissive CORS parity with the reference's CorsLayer::permissive()
    (server/src/main.rs:61-75): a browser preflight OPTIONS succeeds and
    actual responses carry Access-Control-Allow-Origin."""

    async def fn(client):
        pre = await client.options(
            "/v1/audio/speech",
            headers={
                "Origin": "http://example.com",
                "Access-Control-Request-Method": "POST",
                "Access-Control-Request-Headers": "content-type",
            },
        )
        assert pre.status in (200, 204)
        assert pre.headers["Access-Control-Allow-Origin"] == "*"
        assert "POST" in pre.headers["Access-Control-Allow-Methods"] or (
            pre.headers["Access-Control-Allow-Methods"] == "*"
        )
        allow_headers = pre.headers["Access-Control-Allow-Headers"].lower()
        assert allow_headers in ("*", "content-type")

        actual = await client.get(
            "/v1/voices", headers={"Origin": "http://example.com"}
        )
        assert actual.status == 200
        assert actual.headers["Access-Control-Allow-Origin"] == "*"

        # error responses must carry CORS too, or the browser hides them
        err = await client.post(
            "/v1/audio/speech",
            json={"voice": "nope", "input": "x"},
            headers={"Origin": "http://example.com"},
        )
        assert err.headers["Access-Control-Allow-Origin"] == "*"

    _sync(_run(state, fn))


def test_speech_route_wav(state):
    async def fn(client):
        resp = await _post_ok(
            client,
            "/v1/audio/speech",
            {"model": "fish", "voice": "default", "input": "Hello world.", "seed": 1},
        )
        assert resp.status == 200, await resp.text()
        assert resp.content_type == "audio/wav"
        return await resp.read()

    wav = _sync(_run(state, fn))
    assert wav[:4] == b"RIFF"
    from fish_speech_tpu.audio.wav import read_wav

    pcm, sr = read_wav(wav)
    assert sr == 44100
    assert pcm.shape[0] > 0


def test_speech_route_unconditioned(state):
    async def fn(client):
        resp = await _post_ok(
            client,
            "/v1/audio/speech",
            {"model": "fish", "voice": "unconditioned", "input": "Hi.", "seed": 1},
        )
        assert resp.status == 200, await resp.text()
        return await resp.read()

    wav = _sync(_run(state, fn))
    assert wav[:4] == b"RIFF"


def test_encoding_route_registers_voice(state):
    audio = (np.random.default_rng(0).normal(size=6400) * 0.1).astype(np.float32)
    wav_bytes = pcm_to_wav_bytes(audio, 44100)

    async def fn(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("file", wav_bytes, filename="ref.wav", content_type="audio/wav")
        resp = await client.post(
            "/v1/audio/encoding?id=cloned&prompt=hello", data=form
        )
        assert resp.status == 200, await resp.text()
        assert resp.content_type == "application/x-npy"
        body = await resp.read()
        resp2 = await client.get("/v1/voices")
        return body, await resp2.json()

    body, voices = _sync(_run(state, fn))
    codes = np.load(io.BytesIO(body))
    assert codes.shape[0] == NUM_CODEBOOKS
    assert "cloned" in voices["voices"]


def test_healthz_and_metrics_routes(state):
    """Observability superset: the reference has no metrics endpoint or
    request log at all (SURVEY §5). /healthz reports readiness; /metrics
    renders Prometheus counters that reflect traffic."""

    async def fn(client):
        h = await client.get("/healthz")
        assert h.status == 200
        info = await h.json()
        assert info["status"] == "ok" and info["voices"] == 1

        resp = await _post_ok(
            client,
            "/v1/audio/speech",
            {"voice": "default", "input": "Hello world.", "seed": 1},
        )
        assert resp.status == 200
        await resp.read()

        m = await client.get("/metrics")
        assert m.status == 200
        text = await m.text()
        assert (
            'fish_requests_total{route="/v1/audio/speech",status="200"} 1'
            in text
        )
        assert 'fish_requests_total{route="/healthz",status="200"} 1' in text
        assert "fish_audio_seconds_total" in text
        # the speech request synthesized real audio
        audio_s = float(
            [l for l in text.splitlines()
             if l.startswith("fish_audio_seconds_total")][0].split()[-1]
        )
        assert audio_s > 0.0
        assert "fish_requests_in_flight 1" in text  # the /metrics call itself

    _sync(_run(state, fn))


def test_encoding_route_accepts_flac(state):
    """FLAC upload to /v1/audio/encoding (symphonia-default container
    coverage, reference pcm_decode.rs:26-89) decodes through the native
    FLAC decoder and returns codes."""
    from fish_speech_tpu.audio.decode import native_available
    from tests.flac_writer import write_flac

    if not native_available():
        pytest.skip("native decoder not built")
    audio = (np.random.default_rng(0).normal(size=6400) * 0.1).astype(np.float32)
    flac_bytes = write_flac(
        np.round(audio * 32767).astype(np.int32), 44100, subframe="fixed"
    )

    async def fn(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field(
            "file", flac_bytes, filename="ref.flac", content_type="audio/flac"
        )
        resp = await client.post("/v1/audio/encoding", data=form)
        assert resp.status == 200, await resp.text()
        return await resp.read()

    body = _sync(_run(state, fn))
    codes = np.load(io.BytesIO(body))
    assert codes.shape[0] == NUM_CODEBOOKS
    assert codes.shape[-1] > 0


def test_encoding_route_persists_voice(state, tmp_path):
    """--persist-voices superset: a runtime-registered voice is written
    back to the voices dir (npy + index.json) and reloads through the
    startup registry — the reference requires copying the returned .npy
    by hand (README 'Persisting cloned voices')."""
    from fish_speech_tpu.server.voices import load_speaker_prompts

    vdir = tmp_path / "voices"
    state.persist_voice_dir = vdir
    audio = (np.random.default_rng(1).normal(size=6400) * 0.1).astype(np.float32)
    wav_bytes = pcm_to_wav_bytes(audio, 44100)

    async def fn(client):
        import aiohttp

        form = aiohttp.FormData()
        form.add_field("file", wav_bytes, filename="r.wav", content_type="audio/wav")
        resp = await client.post(
            "/v1/audio/encoding?id=persisted&prompt=my voice", data=form
        )
        assert resp.status == 200, await resp.text()
        return await resp.read()

    body = _sync(_run(state, fn))
    codes = np.load(io.BytesIO(body))
    saved = np.load(vdir / "persisted.npy")
    np.testing.assert_array_equal(saved, codes)
    idx = json.loads((vdir / "index.json").read_text())
    assert idx["speakers"]["persisted"] == "my voice"

    # the persisted dir round-trips through the startup loader (needs a
    # default speaker; reuse the same artifact)
    (vdir / "default.npy").write_bytes((vdir / "persisted.npy").read_bytes())
    idx["speakers"]["default"] = "my voice"
    (vdir / "index.json").write_text(json.dumps(idx))
    voices, default = load_speaker_prompts(
        vdir, state.pipeline.prompt_encoder, NUM_CODEBOOKS
    )
    np.testing.assert_array_equal(voices["persisted"], state.voices["persisted"])


def test_opus_streaming_route(state):
    from fish_speech_tpu.audio.opus import OggOpusEncoder

    if not OggOpusEncoder.available():
        pytest.skip("native opus unavailable")

    async def fn(client):
        resp = await client.post(
            "/v1/audio/speech",
            json={
                "model": "fish",
                "voice": "default",
                "input": "Hello.",
                "response_format": "opus",
                "seed": 1,
            },
        )
        assert resp.status == 200
        assert resp.content_type == "audio/ogg"
        return await _read_stream_or_skip(resp)

    data = _sync(_run(state, fn))
    assert data[:4] == b"OggS"
    assert b"OpusHead" in data[:64]


def test_hidden_states_route(state):
    import zipfile

    async def fn(client):
        resp = await client.post(
            "/v1/audio/hidden_states",
            json={"voice": "default", "input": "Hello.", "return_audio": True, "seed": 1},
        )
        assert resp.status == 200, await resp.text()
        assert resp.content_type == "application/zip"
        return await resp.read()

    body = _sync(_run(state, fn))
    zf = zipfile.ZipFile(io.BytesIO(body))
    names = set(zf.namelist())
    assert {"hidden_states.npy", "metadata.json", "audio.wav"} <= names
    hidden = np.load(io.BytesIO(zf.read("hidden_states.npy")))
    assert hidden.ndim == 2 and hidden.shape[1] == LM_CFG.dim
    meta = json.loads(zf.read("metadata.json"))
    assert meta["num_frames"] == hidden.shape[0]
    assert meta["frame_rate"] > 0


def test_speech_route_batched(state):
    async def fn(client):
        resp = await client.post(
            "/v1/audio/speech",
            json={
                "voice": "default",
                "input": "Hello world. Another sentence here.",
                "batch_size": 2,
            },
        )
        assert resp.status == 200, await resp.text()
        assert resp.content_type == "audio/wav"
        return await resp.read()

    wav = _sync(_run(state, fn))
    assert wav[:4] == b"RIFF"


def test_speech_route_with_continuous_batcher(pipeline):
    """Speech route through a shared ContinuousBatcher: concurrent
    requests decode through batch rows with no global lock."""
    voice = pipeline.prompt_encoder.encode_conditioning_prompt(
        "hi", np.zeros((NUM_CODEBOOKS, 3), np.int32)
    )
    batcher = pipeline.create_batcher(rows=2, horizon=4)
    st = AppState(pipeline, {"default": voice}, voice, batcher=batcher)
    try:
        async def fn(client):
            resps = await asyncio.gather(
                client.post(
                    "/v1/audio/speech",
                    json={"voice": "default", "input": "Hello world."},
                ),
                client.post(
                    "/v1/audio/speech",
                    json={"voice": "default", "input": "Another one."},
                ),
            )
            out = []
            for r in resps:
                assert r.status == 200, await r.text()
                assert r.content_type == "audio/wav"
                out.append(await r.read())
            return out

        wavs = _sync(_run(st, fn))
        for w in wavs:
            assert w[:4] == b"RIFF"
    finally:
        batcher.shutdown()


def test_opus_streaming_route_with_continuous_batcher(pipeline):
    """Streaming Ogg/Opus response while decoding through the shared
    batcher (the use_batcher + streaming composition in handle_speech)."""
    voice = pipeline.prompt_encoder.encode_conditioning_prompt(
        "hi", np.zeros((NUM_CODEBOOKS, 3), np.int32)
    )
    batcher = pipeline.create_batcher(rows=2, horizon=4)
    st = AppState(pipeline, {"default": voice}, voice, batcher=batcher)
    try:
        async def fn(client):
            resp = await client.post(
                "/v1/audio/speech",
                json={
                    "voice": "default",
                    "input": "Hello world.",
                    "response_format": "opus",
                },
            )
            assert resp.status == 200, await resp.text()
            assert resp.content_type == "audio/ogg"
            return await _read_stream_or_skip(resp)

        ogg = _sync(_run(st, fn))
        assert ogg[:4] == b"OggS"
    finally:
        batcher.shutdown()


def test_opus_streaming_lowlatency_route(state):
    """stream_chunk_frames routes the request through the sub-chunk
    low-latency path (synthesize_streaming_lowlatency + carried-state
    vocoder) rather than per-text-chunk streaming."""
    from fish_speech_tpu.audio.opus import OggOpusEncoder

    if not OggOpusEncoder.available():
        pytest.skip("native opus unavailable")

    calls = []
    pipeline = state.pipeline
    orig = pipeline.synthesize_streaming_lowlatency

    def spy(text, **kw):
        calls.append(kw.get("frame_chunk"))
        return orig(text, **kw)

    pipeline.synthesize_streaming_lowlatency = spy
    try:
        async def fn(client):
            resp = await client.post(
                "/v1/audio/speech",
                json={
                    "model": "fish",
                    "voice": "default",
                    "input": "Hello.",
                    "response_format": "opus",
                    "seed": 1,
                    "stream_chunk_frames": 4,
                },
            )
            assert resp.status == 200
            assert resp.content_type == "audio/ogg"
            return await _read_stream_or_skip(resp)

        data = _sync(_run(state, fn))
    finally:
        pipeline.synthesize_streaming_lowlatency = orig
    assert data[:4] == b"OggS"
    assert b"OpusHead" in data[:64]
    assert calls == [4], "low-latency path was not used"


def test_batched_lowlatency_stream_matches_per_chunk(pipeline):
    """synthesize_streaming_continuous_lowlatency (sub-chunk PCM through
    the shared batcher + carried-state vocoder) must produce the same
    audio as the per-chunk continuous path for a deterministic batcher."""
    from fish_speech_tpu.ops.sampling import SamplingArgs
    from fish_speech_tpu.pipeline import TTSPipeline

    det = TTSPipeline(
        pipeline.engine, pipeline.codec, DummyTokenizer(), WhichLM.FISH_1_5,
        max_new_tokens=8, default_sampling=SamplingArgs(temp=0.0),
    )
    batcher = det.create_batcher(rows=2, horizon=4)
    try:
        whole = np.concatenate(
            list(det.synthesize_streaming_continuous(batcher, "Hello world."))
        )
        streamed = np.concatenate(
            list(
                det.synthesize_streaming_continuous_lowlatency(
                    batcher, "Hello world."
                )
            )
        )
        assert streamed.shape == whole.shape
        np.testing.assert_allclose(streamed, whole, atol=1e-5)
    finally:
        batcher.shutdown()


def test_opus_batched_lowlatency_route(pipeline):
    """stream_chunk_frames + an attached batcher routes through the
    batched sub-chunk streaming path (not the serial engine)."""
    from fish_speech_tpu.audio.opus import OggOpusEncoder

    if not OggOpusEncoder.available():
        pytest.skip("native opus unavailable")

    voice = pipeline.prompt_encoder.encode_conditioning_prompt(
        "hi", np.zeros((NUM_CODEBOOKS, 3), np.int32)
    )
    batcher = pipeline.create_batcher(rows=2, horizon=4)
    st = AppState(pipeline, {"default": voice}, voice, batcher=batcher)
    calls = []
    orig = pipeline.synthesize_streaming_continuous_lowlatency

    def spy(b, text, **kw):
        calls.append(text)
        return orig(b, text, **kw)

    pipeline.synthesize_streaming_continuous_lowlatency = spy
    try:
        async def fn(client):
            resp = await client.post(
                "/v1/audio/speech",
                json={
                    "voice": "default",
                    "input": "Hello.",
                    "response_format": "opus",
                    "stream_chunk_frames": 4,
                },
            )
            assert resp.status == 200
            return await _read_stream_or_skip(resp)

        data = _sync(_run(st, fn))
    finally:
        pipeline.synthesize_streaming_continuous_lowlatency = orig
        batcher.shutdown()
    assert data[:4] == b"OggS"
    assert calls == ["Hello."], "batched lowlatency path was not used"


def test_warmup_codec_compiles_serving_shapes(pipeline):
    """warmup_codec must pre-populate the vocoder jit caches for every
    decode bucket up to the budget and every streaming step shape the
    session's power-of-two feed can produce."""
    pipeline.warmup_codec(frame_chunk=4)
    codec = pipeline.codec
    # all buckets <= budget warmed through decode()
    assert codec._decode_jit._cache_size() >= 1
    # streaming step shapes: 4, 2, 1
    step_keys = {k[1][-1] for k in codec._step_jit}
    assert {4, 2, 1} <= step_keys


def test_opus_stream_aborts_connection_on_midstream_error(state):
    """A generation failure AFTER headers are sent (no 500 possible) must
    close the connection promptly — the client sees a terminated stream
    instead of waiting out its timeout on an unfinished chunked body
    (regression: the runaway-reroll RuntimeError used to leave the
    response open forever)."""
    import time as _time

    import aiohttp

    from fish_speech_tpu.audio.opus import OggOpusEncoder

    if not OggOpusEncoder.available():
        pytest.skip("native opus unavailable")

    pipeline = state.pipeline
    orig = pipeline.synthesize_streaming

    def boom(text, **kw):
        gen = orig(text, **kw)
        yield next(gen)
        raise RuntimeError("generation ran away (synthetic)")

    pipeline.synthesize_streaming = boom
    try:
        async def fn(client):
            resp = await client.post(
                "/v1/audio/speech",
                json={
                    "voice": "default",
                    "input": "Hello.",
                    "response_format": "opus",
                    "seed": 1,
                },
            )
            assert resp.status == 200  # headers were already sent
            t0 = _time.perf_counter()
            try:
                await resp.read()
            except aiohttp.ClientError:
                pass  # terminated stream is the expected signal
            return _time.perf_counter() - t0

        elapsed = _sync(_run(state, fn))
    finally:
        pipeline.synthesize_streaming = orig
    assert elapsed < 60, "client waited on an unterminated stream"
