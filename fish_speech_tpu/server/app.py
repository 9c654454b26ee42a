"""OpenAI-compatible TTS server.

Routes (reference: server/src/main.rs:61-64):
  POST /v1/audio/speech    — text -> WAV body, or streaming Ogg/Opus when
                             response_format == "opus"
  POST /v1/audio/encoding  — multipart WAV -> .npy codec tokens; optional
                             ?id=&prompt= registers the voice in-memory
  GET  /v1/voices          — list registered voices
  GET  /healthz            — readiness (superset: reference has none)
  GET  /metrics            — Prometheus counters (superset: SURVEY §5
                             notes the reference has no observability)

Built on aiohttp. Generation runs in a worker thread; an asyncio lock
serializes access to the engine (the reference serializes on a tokio
mutex, state.rs:13 — replacing this with continuous decode batching
across requests is the next step on the serving roadmap and the engine's
per-row decode state is already built for it).
"""

from __future__ import annotations

import asyncio
import io
import json
import logging
from typing import Dict, Optional

import numpy as np
from aiohttp import web

from fish_speech_tpu.audio.decode import decode_audio_bytes
from fish_speech_tpu.audio.resample import StreamingResampler
from fish_speech_tpu.audio.wav import pcm_to_wav_bytes
from fish_speech_tpu.ops.sampling import SamplingArgs
from fish_speech_tpu.pipeline import TTSPipeline

logger = logging.getLogger(__name__)

MAX_BODY_SIZE = 32 * 1024 * 1024  # 32 MiB, matching main.rs:69
OPUS_RATE = 24000


class Metrics:
    """Process-wide serving counters, rendered in Prometheus text format
    at GET /metrics. The reference has NO observability surface at all —
    stdout prints only, no metrics endpoint, no request log (SURVEY §5);
    this is the production-serving superset. Counters are updated from
    the event loop and worker threads; CPython dict/float ops under the
    GIL make the increments safe without a lock."""

    def __init__(self) -> None:
        import time

        self.requests_total: Dict[tuple, int] = {}
        self.request_seconds: Dict[str, float] = {}
        self.in_flight = 0
        self.audio_seconds_total = 0.0
        self.started_at = time.time()

    def observe(self, route: str, status: int, seconds: float) -> None:
        key = (route, status)
        self.requests_total[key] = self.requests_total.get(key, 0) + 1
        self.request_seconds[route] = (
            self.request_seconds.get(route, 0.0) + seconds
        )

    def add_audio_seconds(self, seconds: float) -> None:
        self.audio_seconds_total += seconds

    def render(self) -> str:
        import time

        lines = [
            "# HELP fish_requests_total Requests by route and status.",
            "# TYPE fish_requests_total counter",
        ]
        for (route, status), n in sorted(self.requests_total.items()):
            lines.append(
                f'fish_requests_total{{route="{route}",status="{status}"}} {n}'
            )
        lines += [
            "# HELP fish_request_seconds_total Wall time by route.",
            "# TYPE fish_request_seconds_total counter",
        ]
        for route, s in sorted(self.request_seconds.items()):
            lines.append(
                f'fish_request_seconds_total{{route="{route}"}} {s:.3f}'
            )
        lines += [
            "# HELP fish_audio_seconds_total Seconds of audio synthesized.",
            "# TYPE fish_audio_seconds_total counter",
            f"fish_audio_seconds_total {self.audio_seconds_total:.3f}",
            "# HELP fish_requests_in_flight Requests currently in flight.",
            "# TYPE fish_requests_in_flight gauge",
            f"fish_requests_in_flight {self.in_flight}",
            "# HELP fish_uptime_seconds Seconds since server start.",
            "# TYPE fish_uptime_seconds gauge",
            f"fish_uptime_seconds {time.time() - self.started_at:.0f}",
        ]
        return "\n".join(lines) + "\n"


class AppState:
    """(reference: server/lib/state.rs:12-29)."""

    def __init__(
        self,
        pipeline: TTSPipeline,
        voices: Optional[Dict[str, np.ndarray]] = None,
        default_voice: Optional[np.ndarray] = None,
        batcher=None,
    ) -> None:
        self.pipeline = pipeline
        self.voices: Dict[str, np.ndarray] = voices or {}
        self.default_voice = default_voice
        # With a ContinuousBatcher attached, speech requests decode
        # concurrently through shared batch rows and skip this lock (the
        # reference serializes every request on a tokio mutex).
        self.batcher = batcher
        self.lock = asyncio.Lock()  # serializes engine access (serial path)
        self.metrics = Metrics()
        # when set, /v1/audio/encoding?id=&prompt= ALSO persists the new
        # voice into this directory (npy + index.json) so it survives
        # restarts — the reference leaves that manual (README
        # "Persisting cloned voices")
        self.persist_voice_dir = None


def _resolve_voice(state: AppState, name: str) -> Optional[np.ndarray]:
    """'unconditioned' -> None; unknown names fall back to the default
    voice (reference: handlers/speech.rs:258-270)."""
    if name == "unconditioned":
        return None
    return state.voices.get(name, state.default_voice)


async def handle_speech(request: web.Request) -> web.StreamResponse:
    state: AppState = request.app["state"]
    body = await request.json()
    text = body.get("input", "")
    voice = body.get("voice", "default")
    response_format = body.get("response_format")
    # `speaker_prompt` overrides the system prompt (reference:
    # handlers/speech.rs:283-290 — despite the name, it is sysprompt text)
    sysprompt = body.get("speaker_prompt")
    seed = body.get("seed")
    max_new = body.get("max_new_tokens")
    batch_size = body.get("batch_size")
    # opt-in sub-chunk streaming: emit PCM every N LM frames instead of
    # per text chunk (carried-state streaming vocoder; serial engine)
    stream_chunk_frames = body.get("stream_chunk_frames")
    # optional per-request sampling overrides (extension over the
    # reference schema, handlers/speech.rs:238-247 — the reference has
    # no per-request sampling at all)
    sampling = None
    if any(
        k in body
        for k in ("temperature", "top_p", "top_k", "repetition_penalty")
    ):
        d = state.pipeline.default_sampling
        sampling = SamplingArgs(
            temp=float(body.get("temperature", d.temp)),
            top_p=float(body.get("top_p", d.top_p)),
            top_k=int(body.get("top_k", d.top_k)),
            repetition_penalty=float(
                body.get("repetition_penalty", d.repetition_penalty)
            ),
        )

    conditioning = _resolve_voice(state, voice)
    pipeline = state.pipeline

    kwargs = dict(
        voice_conditioning=conditioning,
        sysprompt=sysprompt,
        seed=seed,
        max_new_tokens=max_new,
        sampling=sampling,
    )

    # continuous-batching path: requests share decode rows, no global
    # lock. A dynamic-sampling batcher engine (the default from
    # pipeline.create_batcher) honors per-request seed/sampling as
    # device operands, so seeded requests batch too; only a static
    # batcher engine or in-request static batching fall back to the
    # serial engine.
    dyn = (
        state.batcher is not None
        and getattr(state.batcher.engine, "dynamic_sampling", False)
    )
    use_batcher = state.batcher is not None and not batch_size and (
        dyn or (seed is None and sampling is None)
    )
    # Batched sub-chunk streaming emits at the batcher's horizon
    # granularity; a request asking for FINER chunks than the horizon
    # gets the serial engine, which honors the exact frame_chunk.
    if (
        use_batcher
        and stream_chunk_frames
        and int(stream_chunk_frames) < state.batcher.horizon
    ):
        use_batcher = False

    if response_format == "opus":
        from fish_speech_tpu.audio.opus import OggOpusEncoder

        if not OggOpusEncoder.available():
            raise web.HTTPNotImplemented(
                text="opus streaming requires the native encoder "
                "(native/libfishaudio.so)"
            )
        resp = web.StreamResponse(
            status=200,
            headers={
                "Content-Type": "audio/ogg",
                # set here, not in cors_middleware: a prepared
                # StreamResponse's headers are already on the wire by the
                # time middlewares unwind
                "Access-Control-Allow-Origin": "*",
                "Access-Control-Expose-Headers": "*",
            },
        )
        resp.enable_chunked_encoding()
        await resp.prepare(request)
        encoder = OggOpusEncoder(OPUS_RATE)
        await resp.write(encoder.header())

        async def _stream(gen, as_pcm):
            loop = asyncio.get_running_loop()
            # carried-phase resampler: per-chunk stateless resampling
            # restarts the interpolation phase at every boundary (the
            # 44.1k->24k ratio is non-integer) — an audible click per
            # text chunk; the streaming resampler's concatenated output
            # equals resampling the whole signal
            rs = StreamingResampler(pipeline.codec.sample_rate, OPUS_RATE)
            while True:
                chunk = await loop.run_in_executor(None, next, gen, None)
                if chunk is None:
                    break
                pcm = chunk if as_pcm else chunk.pcm
                state.metrics.add_audio_seconds(
                    pcm.shape[-1] / pipeline.codec.sample_rate
                )
                data = encoder.encode(rs.process(pcm))
                # stream in 1024-byte chunks like the reference
                # (speech.rs:216-223)
                for i in range(0, len(data), 1024):
                    await resp.write(data[i : i + 1024])
            tail_pcm = rs.process(np.zeros(0, np.float32), final=True)
            tail = encoder.encode(tail_pcm, final=True)
            if tail:
                await resp.write(tail)

        try:
            if use_batcher:
                # with stream_chunk_frames >= horizon, PCM flows every
                # scheduler tick (sub-chunk latency) while other requests
                # share the chip; otherwise per text chunk
                make_gen = (
                    pipeline.synthesize_streaming_continuous_lowlatency
                    if stream_chunk_frames
                    else pipeline.synthesize_streaming_continuous
                )
                gen = make_gen(
                    state.batcher,
                    text,
                    voice_conditioning=conditioning,
                    sysprompt=sysprompt,
                    max_new_tokens=max_new,
                    sampling=sampling,
                    seed=seed,
                )
                await _stream(gen, as_pcm=True)
            else:
                async with state.lock:
                    if stream_chunk_frames:
                        # emit PCM every N LM frames through the
                        # carried-state streaming vocoder (pipeline
                        # lowlatency path) instead of per text chunk
                        gen = pipeline.synthesize_streaming_lowlatency(
                            text,
                            frame_chunk=int(stream_chunk_frames),
                            **kwargs,
                        )
                        await _stream(gen, as_pcm=True)
                    else:
                        gen = pipeline.synthesize_streaming(text, **kwargs)
                        await _stream(gen, as_pcm=False)
        except Exception:
            # headers are already sent, so a 500 is impossible — close
            # the connection so the client sees a terminated stream
            # instead of waiting out its timeout on a chunked response
            # that will never end (e.g. the runaway-reroll failure,
            # pipeline._generate_codes_chunked)
            logger.exception("streaming synthesis failed mid-response")
            encoder.close()
            if request.transport is not None:
                request.transport.close()
            return resp
        encoder.close()
        await resp.write_eof()
        return resp

    if use_batcher:
        def _run_batched():
            parts = list(
                pipeline.synthesize_streaming_continuous(
                    state.batcher,
                    text,
                    voice_conditioning=conditioning,
                    sysprompt=sysprompt,
                    max_new_tokens=max_new,
                    sampling=sampling,
                    seed=seed,
                )
            )
            return (
                np.concatenate(parts) if parts else np.zeros((0,), np.float32)
            )

        pcm = await asyncio.to_thread(_run_batched)
        state.metrics.add_audio_seconds(len(pcm) / pipeline.codec.sample_rate)
        wav = pcm_to_wav_bytes(pcm, pipeline.codec.sample_rate)
        return web.Response(body=wav, content_type="audio/wav")

    # blocking WAV path; opt-in static batching over the request's text
    # chunks (reference: handlers/speech.rs:73-92,140-150)
    async with state.lock:
        if batch_size and int(batch_size) > 1:
            pcm = await asyncio.to_thread(
                pipeline.synthesize_batched,
                text,
                int(batch_size),
                voice_conditioning=conditioning,
                sysprompt=sysprompt,
                seed=seed,
                max_new_tokens=max_new,
                sampling=sampling,
            )
        else:
            pcm = await asyncio.to_thread(pipeline.synthesize, text, **kwargs)
    state.metrics.add_audio_seconds(len(pcm) / pipeline.codec.sample_rate)
    wav = pcm_to_wav_bytes(pcm, pipeline.codec.sample_rate)
    return web.Response(body=wav, content_type="audio/wav")


async def handle_hidden_states(request: web.Request) -> web.Response:
    """Distillation/debug route: generate with slow-transformer hidden-state
    collection and return a ZIP of hidden_states.npy (+ audio.wav when
    requested) + metadata.json (reference: handlers/send_hidden_states.rs
    — exported there but unrouted; routed here as /v1/audio/hidden_states).
    """
    import zipfile

    state: AppState = request.app["state"]
    body = await request.json()
    text = body.get("input", "")
    voice = body.get("voice", "default")
    return_audio = bool(body.get("return_audio", True))
    conditioning = _resolve_voice(state, voice)
    pipeline = state.pipeline

    async with state.lock:
        hidden, pcm = await asyncio.to_thread(
            pipeline.synthesize_with_hidden,
            text,
            voice_conditioning=conditioning,
            sysprompt=body.get("speaker_prompt"),
            seed=body.get("seed"),
            max_new_tokens=body.get("max_new_tokens"),
            return_audio=return_audio,
        )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        npy = io.BytesIO()
        np.save(npy, hidden.astype(np.float32))
        zf.writestr("hidden_states.npy", npy.getvalue())
        if pcm is not None:
            zf.writestr(
                "audio.wav", pcm_to_wav_bytes(pcm, pipeline.codec.sample_rate)
            )
        zf.writestr(
            "metadata.json",
            json.dumps(
                {
                    "frame_rate": pipeline.codec.cfg.frame_rate,
                    "num_frames": int(hidden.shape[0]),
                    "dim": int(hidden.shape[1]),
                }
            ),
        )
    return web.Response(
        body=buf.getvalue(), content_type="application/zip"
    )


async def handle_encoding(request: web.Request) -> web.Response:
    """(reference: handlers/encode_speech.rs:36-94)."""
    state: AppState = request.app["state"]
    pipeline = state.pipeline

    reader = await request.multipart()
    field = await reader.next()
    if field is None:
        raise web.HTTPBadRequest(text="No file provided")
    data = await field.read(decode=False)

    # any container the native decoder knows: WAV/MP3/Ogg-Vorbis/Ogg-Opus
    # (reference decodes via symphonia, audio/pcm_decode.rs:26-89)
    audio, sr = decode_audio_bytes(data)
    async with state.lock:
        codes = await asyncio.to_thread(
            pipeline.encode_reference_audio, audio, sr
        )

    voice_id = request.query.get("id")
    prompt_text = request.query.get("prompt")
    if voice_id and prompt_text:
        if voice_id in state.voices:
            raise web.HTTPInternalServerError(
                text=f"ID already exists on server: {voice_id}"
            )
        state.voices[voice_id] = (
            pipeline.prompt_encoder.encode_conditioning_prompt(prompt_text, codes)
        )
        if state.persist_voice_dir is not None:
            from fish_speech_tpu.server.voices import save_voice

            await asyncio.to_thread(
                save_voice, state.persist_voice_dir, voice_id,
                prompt_text, codes,
            )

    buf = io.BytesIO()
    np.save(buf, codes.astype(np.uint32))
    return web.Response(
        body=buf.getvalue(), content_type="application/x-npy"
    )


async def handle_voices(request: web.Request) -> web.Response:
    """(reference: handlers/supported_voices.rs:6-14)."""
    state: AppState = request.app["state"]
    return web.json_response({"voices": sorted(state.voices.keys())})


@web.middleware
async def error_middleware(request: web.Request, handler):
    """anyhow -> 500 + log (reference: handlers/error.rs:4-38)."""
    try:
        return await handler(request)
    except web.HTTPException:
        raise
    except Exception as exc:  # noqa: BLE001
        logger.exception("request failed")
        return web.json_response({"error": str(exc)}, status=500)


@web.middleware
async def metrics_middleware(request: web.Request, handler):
    """Counts every request by route/status with wall time; sits outside
    error_middleware so 500s are recorded too."""
    import time

    m: Metrics = request.app["state"].metrics
    m.in_flight += 1
    t0 = time.perf_counter()
    status = 500
    try:
        resp = await handler(request)
        status = resp.status
        return resp
    except web.HTTPException as exc:
        status = exc.status
        raise
    finally:
        m.in_flight -= 1
        m.observe(request.path, status, time.perf_counter() - t0)


async def handle_healthz(request: web.Request) -> web.Response:
    """Liveness/readiness: models are loaded before serve() starts, so a
    responding server is a ready server."""
    state: AppState = request.app["state"]
    return web.json_response(
        {
            "status": "ok",
            "voices": len(state.voices),
            "continuous_batching": state.batcher is not None,
        }
    )


async def handle_metrics(request: web.Request) -> web.Response:
    state: AppState = request.app["state"]
    return web.Response(
        text=state.metrics.render(),
        content_type="text/plain",
        charset="utf-8",
    )


@web.middleware
async def cors_middleware(request: web.Request, handler):
    """Permissive CORS, mirroring the reference's
    `CorsLayer::permissive()` on the axum router
    (reference: server/src/main.rs:61-75): any origin / method / headers,
    so browser-based OpenAI-compatible clients on another origin pass
    preflight and can read responses."""
    def _apply(resp) -> None:
        if resp.prepared:  # streaming responses set their own (app.py:117)
            return
        resp.headers["Access-Control-Allow-Origin"] = "*"
        resp.headers["Access-Control-Allow-Methods"] = "*"
        resp.headers["Access-Control-Allow-Headers"] = request.headers.get(
            "Access-Control-Request-Headers", "*"
        )
        resp.headers["Access-Control-Expose-Headers"] = "*"

    if (
        request.method == "OPTIONS"
        and "Access-Control-Request-Method" in request.headers
    ):
        resp = web.Response(status=204)
    else:
        try:
            resp = await handler(request)
        except web.HTTPException as exc:
            # an HTTPException IS a response; without the headers the
            # browser hides the error body from the calling page
            _apply(exc)
            raise
    _apply(resp)
    return resp


def create_app(state: AppState) -> web.Application:
    # cors outermost so even error responses carry the CORS headers;
    # metrics outside error_middleware so 500s are counted
    app = web.Application(
        client_max_size=MAX_BODY_SIZE,
        middlewares=[cors_middleware, metrics_middleware, error_middleware],
    )
    app["state"] = state
    app.router.add_post("/v1/audio/speech", handle_speech)
    app.router.add_post("/v1/audio/encoding", handle_encoding)
    app.router.add_post("/v1/audio/hidden_states", handle_hidden_states)
    app.router.add_get("/v1/voices", handle_voices)
    app.router.add_get("/healthz", handle_healthz)
    app.router.add_get("/metrics", handle_metrics)

    async def _shutdown_batcher(app: web.Application) -> None:
        # graceful stop: release clients blocked on in-flight batched
        # requests (ContinuousBatcher.shutdown signals their iterators)
        b = app["state"].batcher
        if b is not None:
            await asyncio.to_thread(b.shutdown)

    app.on_cleanup.append(_shutdown_batcher)
    return app


def serve(state: AppState, port: int = 3000) -> None:
    web.run_app(create_app(state), port=port)
