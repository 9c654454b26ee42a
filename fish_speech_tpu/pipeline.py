"""TTSPipeline: text -> tokens -> semantic codes -> PCM, end to end.

The high-level object behind both the CLI tools and the HTTP server,
combining the pieces the reference wires together in
server/lib/handlers/speech.rs + fish_speech_core/src/bin/llama_generate.rs:
text cleaning/chunking, prompt encoding with speaker conditioning,
KV-cache-reusing chunked generation (with the reference's
conditioning-prefix retention and runaway reroll), the Fish <=1.4 -1
token shift, and codec decode.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from pathlib import Path
from typing import Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.config import (
    DEFAULT_MAX_NEW_TOKENS,
    DualARConfig,
    FireflyConfig,
    TokenConfig,
    WhichLM,
    WhichModel,
    default_rep_pen,
)
from fish_speech_tpu.generate.engine import GenerationResult, LMEngine
from fish_speech_tpu.io.checkpoint import load_firefly_params, load_lm_params
from fish_speech_tpu.models.codec.firefly import FireflyCodec
from fish_speech_tpu.ops.sampling import SamplingArgs
from fish_speech_tpu.text.clean import preprocess_text
from fish_speech_tpu.text.prompt import PromptEncoder

logger = logging.getLogger(__name__)

# Hardcoded 1.5 system prompt (reference: bin/llama_generate.rs:52-66)
FISH_1_5_SYSPROMPT = "Speak out the provided text."


@dataclasses.dataclass
class SynthesisChunk:
    pcm: np.ndarray  # (T,) f32 at the codec sample rate
    codes: np.ndarray  # (C, frames)
    result: GenerationResult
    # the encoded (C+1, S) prompt this chunk was generated from — lets
    # offline scorers (scripts/verify_real_checkpoint.py's teacher-forced
    # int8 proxy) rebuild the exact LM context without re-deriving the
    # text frontend's chunking/sysprompt decisions
    prompt: Optional[np.ndarray] = None


class TTSPipeline:
    def __init__(
        self,
        engine: LMEngine,
        codec: FireflyCodec,
        tokenizer,
        lm: WhichLM,
        *,
        max_new_tokens: int = DEFAULT_MAX_NEW_TOKENS,
        default_sampling: Optional[SamplingArgs] = None,
    ) -> None:
        self.engine = engine
        self.codec = codec
        self.tokenizer = tokenizer
        self.lm = lm
        self.max_new_tokens = max_new_tokens
        # runaway policy (reference: handlers/speech.rs:41-61); benchmarks
        # on untrained weights disable it to get fixed-length generations
        self.reroll_on_runaway = True
        self.default_sampling = default_sampling or SamplingArgs(
            repetition_penalty=default_rep_pen(lm)
        )
        self.prompt_encoder = PromptEncoder(
            tokenizer, engine.cfg.num_codebooks, lm
        )

    # -- loading -----------------------------------------------------------

    @staticmethod
    def load(
        checkpoint_dir: str | Path,
        model: WhichModel,
        *,
        lm_dtype=jnp.bfloat16,
        codec_dtype=jnp.float32,
        codec_file: Optional[str | Path] = None,
        max_new_tokens: int = DEFAULT_MAX_NEW_TOKENS,
        cache_len: Optional[int] = None,
        quantize_int8: bool = False,
        mesh=None,
    ) -> "TTSPipeline":
        """Load config.json + tokenizer.json + weights from a checkpoint
        directory, resolving a Hub repo id (or the version's pinned repo
        when the path doesn't exist locally) via io/hub.py
        (reference: server/lib/utils/load.rs:62-188).

        mesh: optional (dp, tp) jax.sharding.Mesh (parallel/mesh.py) —
        LM params are sharded over it and the engine decodes with the
        Pallas kernel shard_mapped per device. The codec stays replicated
        (it is a fraction of the LM's FLOPs and runs per-request)."""
        from tokenizers import Tokenizer

        # NB: Path("") is PosixPath(".") whose is_dir() is True — an empty
        # checkpoint argument means "use the version's pinned Hub repo"
        # (load.rs:50-60) and must go through resolution, not the CWD
        if not str(checkpoint_dir) or not Path(checkpoint_dir).is_dir():
            from fish_speech_tpu.io.hub import resolve_checkpoint

            resolved = resolve_checkpoint(checkpoint_dir, model)
            checkpoint_dir = resolved.dir
            codec_file = codec_file or resolved.codec_file
        else:
            checkpoint_dir = Path(checkpoint_dir)
        lm = WhichLM.from_model(model)
        cfg_path = checkpoint_dir / "config.json"
        cfg = (
            DualARConfig.from_json(cfg_path)
            if cfg_path.exists()
            else DualARConfig.fish_speech_1_2()
        )
        tokenizer = Tokenizer.from_file(str(checkpoint_dir / "tokenizer.json"))
        token_cfg = TokenConfig.from_tokenizer(lm, tokenizer, cfg)

        t0 = time.perf_counter()
        params = load_lm_params(checkpoint_dir, cfg, dtype=lm_dtype)
        if mesh is not None:
            from fish_speech_tpu.parallel.mesh import shard_lm_params

            params = shard_lm_params(params, mesh, cfg)
        engine = LMEngine(
            params, cfg, token_cfg, lm,
            cache_len=cache_len, dtype=lm_dtype,
            quantize_int8=quantize_int8, mesh=mesh,
        )
        logger.info("LM loaded in %.1fs", time.perf_counter() - t0)

        fish_version = model.fish_version
        if fish_version is None:
            # Generic DualAR (smoltts): Mimi codec at the LM's codebook
            # count (reference: load.rs:176-186, audio/codec.rs Codec::Mimi)
            from fish_speech_tpu.models.codec.mimi import (
                MimiCodec,
                MimiConfig,
                load_mimi_params,
            )

            mimi_cfg = MimiConfig()
            mimi_path = (
                Path(codec_file)
                if codec_file is not None
                else checkpoint_dir / "mimi.safetensors"
            )
            codec = MimiCodec(
                load_mimi_params(mimi_path, mimi_cfg),
                mimi_cfg,
                num_quantizers=cfg.num_codebooks,
            )
        else:
            codec_cfg = FireflyConfig.for_version(fish_version)
            codec_params = load_firefly_params(
                codec_file if codec_file is not None else checkpoint_dir,
                codec_cfg,
                dtype=codec_dtype,
            )
            codec = FireflyCodec(codec_params, codec_cfg)
        return TTSPipeline(
            engine, codec, tokenizer, lm, max_new_tokens=max_new_tokens
        )

    # -- warmup ------------------------------------------------------------

    def warmup_codec(self, frame_chunk: int = 16) -> None:
        """Pre-compile the vocoder programs a serving request can hit:
        every decode bucket up to the generation budget (the blocking WAV
        path decodes whole text chunks into these), and — when the codec
        streams — the carried-state session step shapes (the power-of-two
        pieces feed() cuts chunks into). Without this, the FIRST request
        per shape pays the compile mid-serving (multi-second; minutes on
        a remote toolchain). LM/batcher warmup is separate
        (LMEngine.warmup / ContinuousBatcher.warmup)."""
        c = self.engine.cfg.num_codebooks
        max_frames = min(self.max_new_tokens, self.engine.max_frames)
        codes1 = np.zeros((c, 1), np.int32)
        buckets = getattr(self.codec, "buckets", None)
        if buckets:
            # each bucket up to (and including) the one covering the
            # generation budget
            for b in buckets:
                self.codec.decode(np.zeros((c, b), np.int32))
                if b >= max_frames:
                    break
        else:
            self.codec.decode(codes1)
        if getattr(self.codec, "can_stream", False):
            sess = self.codec.start_stream(max_step_frames=frame_chunk)
            step = sess.max_step
            while step >= 1:
                sess.feed(np.zeros((c, step), np.int32))
                step //= 2
        logger.info("codec warmup done")

    # -- generation --------------------------------------------------------

    def _shift_output_tokens(self, codes: np.ndarray) -> np.ndarray:
        """Fish <=1.4 codebook tokens come out +1; shift back
        (reference: handlers/speech.rs:63-68)."""
        if self.lm.uses_explicit_semantic_ids:
            return codes
        return np.maximum(codes.astype(np.int64) - 1, 0).astype(np.int32)

    def _generate_codes_chunked(
        self,
        encoded_chunks: List[np.ndarray],
        n_conditioning: int,
        sampling: SamplingArgs,
        max_new_tokens: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> Iterator[SynthesisChunk]:
        """Generate per chunk with conditioning-prefix cache retention and
        one reroll on suspected runaway (reference: speech.rs:19-71).

        When the codec can stream (Fish 1.4+/Mimi, batch-1 engine), each
        text chunk runs through the OVERLAPPED driver
        (generate/overlap.py): LM decode chunks and vocode feeds pipeline
        on the chip instead of vocoding after the generation completes
        (which is all the reference can do, handlers/speech.rs:115-130).
        A rerolled runaway discards the already-vocoded PCM — the rare
        path wastes one vocode, the common path saves the vocoder wall."""
        max_new = max_new_tokens or self.max_new_tokens
        state = self.engine.init_state(seed)
        overlap = (
            self.engine.batch_size == 1
            and getattr(self.codec, "can_stream", False)
        )
        if overlap:
            from fish_speech_tpu.generate.overlap import (
                generate_vocode_overlapped,
            )

        def _run(chunk_tokens, state, offset):
            if overlap:
                pcm, result, state = generate_vocode_overlapped(
                    self.engine,
                    self.codec,
                    chunk_tokens,
                    sampling=sampling,
                    max_new_tokens=max_new,
                    state=state,
                    conditioning_offset=offset,
                    shift_fn=self._shift_output_tokens,
                )
                return pcm, result, state
            result, state = self.engine.generate(
                chunk_tokens,
                max_new_tokens=max_new,
                sampling=sampling,
                state=state,
                conditioning_offset=offset,
            )
            return None, result, state

        cond_len = 0
        for i, chunk_tokens in enumerate(encoded_chunks):
            offset = cond_len if i > 0 else 0
            pcm, result, state = _run(chunk_tokens, state, offset)
            if result.hit_max and self.reroll_on_runaway:
                logger.warning("Suspected runaway generation; rerolling once")
                state = self.engine.rewind(state, offset)
                pcm, result, state = _run(chunk_tokens, state, offset)
                if result.hit_max:
                    raise RuntimeError(
                        "Generation ran away twice; bailing (reference "
                        "behavior: speech.rs:41-61)"
                    )
            if i == 0:
                cond_len = n_conditioning
            state = self.engine.rewind(state, cond_len)

            codes = self._shift_output_tokens(result.tokens)
            if pcm is None:
                pcm = self.codec.decode(codes)[0]
            yield SynthesisChunk(
                pcm=pcm, codes=codes, result=result, prompt=chunk_tokens
            )

    def synthesize_streaming(
        self,
        text: str,
        voice_tokens: Optional[np.ndarray] = None,
        voice_text: Optional[str] = None,
        *,
        voice_conditioning: Optional[np.ndarray] = None,
        sampling: Optional[SamplingArgs] = None,
        sysprompt: Optional[str] = None,
        max_new_tokens: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> Iterator[SynthesisChunk]:
        """Yield one decoded PCM chunk per text chunk.

        voice_conditioning: a pre-encoded (C+1, N) conditioning prompt
        (what the server's voice registry stores); voice_tokens/voice_text
        are raw codec tokens + transcript encoded on the fly.
        """
        sampling = sampling or self.default_sampling
        chunks = preprocess_text(text)
        if not chunks:
            return

        if sysprompt is None and self.lm == WhichLM.FISH_1_5:
            sysprompt = FISH_1_5_SYSPROMPT

        speaker = voice_conditioning
        if speaker is None and voice_tokens is not None:
            speaker = self.prompt_encoder.encode_conditioning_prompt(
                voice_text or "", voice_tokens
            )
        n_cond, encoded = self.prompt_encoder.encode_sequence(
            chunks,
            sysprompt_text=sysprompt,
            cached_speaker=speaker,
            assume_kv_cache=True,
        )
        yield from self._generate_codes_chunked(
            encoded, n_cond, sampling, max_new_tokens, seed
        )

    def synthesize(self, text: str, **kwargs) -> np.ndarray:
        """Blocking synthesis: full PCM at the codec sample rate."""
        parts = [c.pcm for c in self.synthesize_streaming(text, **kwargs)]
        if not parts:
            return np.zeros((0,), np.float32)
        return np.concatenate(parts)

    def synthesize_streaming_lowlatency(
        self,
        text: str,
        *,
        frame_chunk: int = 16,
        voice_conditioning: Optional[np.ndarray] = None,
        sampling: Optional[SamplingArgs] = None,
        sysprompt: Optional[str] = None,
        max_new_tokens: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> Iterator[np.ndarray]:
        """Yield PCM every `frame_chunk` LM frames (~0.74 s of audio at 16
        frames) instead of per text chunk: the LM decodes fixed-horizon
        slices and the vocoder streams them with carried state
        (FireflyCodec/MimiCodec.start_stream). Time-to-first-audio becomes
        prefill + frame_chunk decode + one small vocode — the reference
        can only stream whole text chunks (handlers/speech.rs:180-236).

        No runaway reroll in this mode (audio already streamed can't be
        retracted); runaway chunks are truncated at the budget. Requires a
        causal codec. Both codecs stream with TRUE carried state — each
        frame is vocoded once: Firefly 1.4+ via FireflyCodec.start_stream
        (models/codec/firefly_stream.py) and Mimi via
        MimiCodec.start_stream (the reference's decode_step,
        mimi.rs:52-88). Fish 1.2 (non-causal convs) falls back to the
        decode_tail left-context recompute.
        """
        sampling = sampling or self.default_sampling
        chunks = preprocess_text(text)
        if not chunks:
            return
        if sysprompt is None and self.lm == WhichLM.FISH_1_5:
            sysprompt = FISH_1_5_SYSPROMPT
        n_cond, encoded = self.prompt_encoder.encode_sequence(
            chunks,
            sysprompt_text=sysprompt,
            cached_speaker=voice_conditioning,
            assume_kv_cache=True,
        )
        max_new = max_new_tokens or self.max_new_tokens
        engine = self.engine
        state = engine.init_state(seed)
        cond_len = 0
        use_stream = getattr(self.codec, "can_stream", False)
        for i, chunk_tokens in enumerate(encoded):
            offset = cond_len if i > 0 else 0
            # one codec stream per text chunk (chunks are independent
            # generations; reference resets Mimi state per decode,
            # audio/codec.rs:41-43)
            stream = (
                self.codec.start_stream(max_step_frames=frame_chunk)
                if use_stream
                else None
            )
            state, first_frame, first_eos, _ = engine._prefill_raw(
                state, chunk_tokens, sampling, offset=offset
            )
            frames = [np.asarray(first_frame)[0]]
            budget = min(
                max_new - 1,
                engine.cache_len - (offset + chunk_tokens.shape[-1]) - 1,
            )
            done = bool(np.asarray(first_eos)[0])
            emitted_frames = 0
            # Pipelined like the continuous batcher: chunk N+1 is
            # dispatched (async) before chunk N's frames are fetched, so
            # the chip decodes while the host unpacks + vocodes. The
            # speculative chunk decoded past an EOS/budget end is
            # device-harmless (EOS rows emit invalid frames and freeze
            # their position; budget overruns are rewound by the next
            # chunk's prefill/rewind) — it just gets discarded.
            pending = None
            if not done and budget > 0:
                pending = engine.decode_chunk(state, sampling, frame_chunk)
            while pending is not None:
                state, out, valid, steps = pending
                done_dev = jnp.copy(state.done)  # state is donated next
                # speculate only if the in-flight chunk cannot already
                # exhaust the budget — a budget-truncated final chunk
                # would otherwise burn a full discarded horizon of decode
                if len(frames) - 1 + frame_chunk < budget:
                    pending = engine.decode_chunk(state, sampling, frame_chunk)
                    state = pending[0]
                else:
                    pending = None
                out, valid, steps, done_arr = jax.device_get(
                    (out, valid, steps, done_dev)
                )
                for s in range(int(steps)):
                    if valid[s, 0] and len(frames) - 1 < budget:
                        frames.append(out[s, 0])
                    else:
                        done = True
                        break
                else:
                    done = bool(done_arr[0])
                if done or len(frames) - 1 >= budget:
                    # drop the speculative dispatch; its state is still
                    # the carry (positions past the end are rewound below)
                    pending = None
                if stream is not None:
                    # carried-state path consumes only the new slice — no
                    # need to restack/re-shift the whole history per chunk
                    if len(frames) > emitted_frames:
                        new = self._shift_output_tokens(
                            np.stack(frames[emitted_frames:], axis=1)[1:]
                        )
                        yield stream.feed(new)[0]
                        emitted_frames = len(frames)
                elif len(frames) > emitted_frames:
                    # non-causal codec (Fish 1.2): no carried-state stream
                    # exists, and a fixed left-context window (decode_tail)
                    # mis-renders every chunk boundary because symmetric
                    # pads also need FUTURE context. Re-decoding the whole
                    # prefix and emitting the new samples is the best
                    # possible approximation (already-emitted audio can't
                    # be retracted); 1.2 generations are <=1024 frames so
                    # the O(T^2) recompute stays small.
                    codes = self._shift_output_tokens(
                        np.stack(frames, axis=1)[1:]
                    )
                    pcm = self.codec.decode(codes)[0]
                    spf = pcm.shape[-1] // codes.shape[1]
                    yield pcm[emitted_frames * spf :]
                    emitted_frames = codes.shape[1]
            # flush anything not yet emitted (e.g. EOS on the very first
            # frame, where the decode loop never runs)
            if len(frames) > emitted_frames:
                if stream is not None:
                    yield stream.feed(
                        self._shift_output_tokens(
                            np.stack(frames[emitted_frames:], axis=1)[1:]
                        )
                    )[0]
                else:
                    codes = self._shift_output_tokens(
                        np.stack(frames, axis=1)[1:]
                    )
                    pcm = self.codec.decode(codes)[0]
                    spf = pcm.shape[-1] // codes.shape[1]
                    yield pcm[emitted_frames * spf :]
            if i == 0:
                cond_len = n_cond
            state = engine.rewind(state, cond_len)

    # -- continuous batching ----------------------------------------------

    def create_batcher(self, rows: int = 16, horizon: int = 16):
        """Build a ContinuousBatcher over `rows` shared decode rows (the
        BASELINE serving config targets 16 concurrent requests). The
        batched engine runs with DYNAMIC sampling: per-request
        temp/top_p/top_k/rep-pen and seeds are device operands installed
        at admission, so one compiled decode program serves any mix of
        requests (pipeline default sampling is just the fallback)."""
        from fish_speech_tpu.generate.continuous import ContinuousBatcher
        from fish_speech_tpu.ops.sampling import BATCHED_REP_PEN_WINDOW

        e = self.engine
        engine = LMEngine(
            e.params,
            e.cfg,
            e.token_cfg,
            e.lm,
            batch_size=rows,
            cache_len=e.cache_len,
            max_frames=e.max_frames,
            rep_pen_window=BATCHED_REP_PEN_WINDOW,
            prompt_buckets=e.prompt_buckets,
            dtype=e.dtype,
            mesh=e.mesh,
            quantize_int8=e.quantize_int8,
            dynamic_sampling=True,
            _params_preprocessed=True,
        )
        shard_state = None
        if e.mesh is not None:
            from fish_speech_tpu.parallel.mesh import shard_gen_state

            shard_state = lambda s: shard_gen_state(s, e.mesh, e.cfg)  # noqa: E731
        # central batched vocoding: streamable codecs vocode deliver_pcm
        # requests through ONE B-row carried-state program per tick
        # (continuous._CentralVocoder) instead of per-request sessions
        central = getattr(self.codec, "can_stream", False) and hasattr(
            self.codec, "decode_step_async"
        )
        return ContinuousBatcher(
            engine, self.default_sampling, horizon=horizon,
            shard_state=shard_state,
            codec=self.codec if central else None,
            shift_fn=self._shift_output_tokens if central else None,
        )

    def synthesize_streaming_continuous(
        self,
        batcher,
        text: str,
        *,
        voice_conditioning: Optional[np.ndarray] = None,
        sysprompt: Optional[str] = None,
        max_new_tokens: Optional[int] = None,
        sampling: Optional[SamplingArgs] = None,
        seed: Optional[int] = None,
    ) -> Iterator[np.ndarray]:
        """Yield PCM per text chunk through a shared continuous batcher.
        Unlike the serial path, many requests decode concurrently; this
        call only blocks on ITS chunks. Vocoding runs in the caller's
        thread (the codec jit is independent of the batcher).

        sampling/seed are per-request device operands on the batcher's
        dynamic engine — no recompiles, deterministic streams per seed.

        When the codec streams (Fish 1.4+/Mimi), each chunk's frames are
        vocoded AS THEY DECODE through a carried-state session in this
        thread (stream delivery with low_latency=False: full-horizon
        scheduling, no TTFA short ticks) — by a chunk's last LM frame,
        all but its final tick is already PCM. The reference vocodes
        strictly after generation (handlers/speech.rs:115-130); no
        synthesis entry point here does (VERDICT r4 #7)."""
        chunks = preprocess_text(text)
        if not chunks:
            return
        if sysprompt is None and self.lm == WhichLM.FISH_1_5:
            sysprompt = FISH_1_5_SYSPROMPT
        n_cond, encoded = self.prompt_encoder.encode_sequence(
            chunks,
            sysprompt_text=sysprompt,
            cached_speaker=voice_conditioning,
            assume_kv_cache=True,
        )
        max_new = max_new_tokens or self.max_new_tokens
        if not getattr(self.codec, "can_stream", False):
            req = batcher.submit(
                encoded, n_cond, max_new, sampling=sampling, seed=seed,
            )
            for chunk in req:
                codes = self._shift_output_tokens(chunk.tokens)
                yield self.codec.decode(codes)[0]
            return
        from fish_speech_tpu.generate.continuous import (
            _PartialFrames,
            _PartialPCM,
        )

        if batcher._central is not None:
            # central batched vocoding: the batcher delivers PCM events
            # (one B-row vocode program per tick shared by every
            # deliver_pcm request — continuous._CentralVocoder)
            req = batcher.submit(
                encoded, n_cond, max_new,
                deliver_pcm=True, low_latency=False,
                sampling=sampling, seed=seed,
            )
            parts = []
            for ev in req.iter_events():
                if isinstance(ev, _PartialPCM):
                    parts.append(ev.pcm)
                elif not isinstance(ev, _PartialFrames):
                    yield (
                        np.concatenate(parts)
                        if parts
                        else np.zeros((0,), np.float32)
                    )
                    parts = []
            return
        req = batcher.submit(
            encoded, n_cond, max_new,
            stream=True, low_latency=False, sampling=sampling, seed=seed,
        )
        session = None
        parts: List[np.ndarray] = []
        for ev in req.iter_events():
            if isinstance(ev, _PartialFrames):
                if session is None:
                    session = self.codec.start_stream(
                        max_step_frames=batcher.horizon
                    )
                codes = self._shift_output_tokens(ev.frames[1:])
                parts.append(session.feed(codes)[0])
            else:  # _ChunkResult: chunk boundary — emit, fresh session
                yield (
                    np.concatenate(parts)
                    if parts
                    else np.zeros((0,), np.float32)
                )
                session = None
                parts = []

    def synthesize_streaming_continuous_lowlatency(
        self,
        batcher,
        text: str,
        *,
        voice_conditioning: Optional[np.ndarray] = None,
        sysprompt: Optional[str] = None,
        max_new_tokens: Optional[int] = None,
        sampling: Optional[SamplingArgs] = None,
        seed: Optional[int] = None,
    ) -> Iterator[np.ndarray]:
        """Sub-chunk streaming THROUGH the shared continuous batcher:
        PCM is yielded every scheduler tick (one decode horizon, default
        16 frames ~ 0.74 s of audio) while other requests decode
        concurrently on the same chip. Combines the batcher's
        concurrency with the low-latency path's carried-state vocoding —
        the serial `synthesize_streaming_lowlatency` gets the same
        latency but owns the whole engine; the reference can do neither
        (requests serialize on a mutex and stream only whole text
        chunks, state.rs:13 / handlers/speech.rs:180-236)."""
        chunks = preprocess_text(text)
        if not chunks:
            return
        if sysprompt is None and self.lm == WhichLM.FISH_1_5:
            sysprompt = FISH_1_5_SYSPROMPT
        n_cond, encoded = self.prompt_encoder.encode_sequence(
            chunks,
            sysprompt_text=sysprompt,
            cached_speaker=voice_conditioning,
            assume_kv_cache=True,
        )
        from fish_speech_tpu.generate.continuous import (
            _PartialFrames,
            _PartialPCM,
        )

        if batcher._central is not None:
            # central batched vocoding with low-latency scheduling: PCM
            # events arrive per tick, first audio behind a short admit
            # chunk (the batcher fetches a chunk's first PCM immediately)
            req = batcher.submit(
                encoded, n_cond, max_new_tokens or self.max_new_tokens,
                deliver_pcm=True, sampling=sampling, seed=seed,
            )
            for ev in req.iter_events():
                if isinstance(ev, _PartialPCM):
                    yield ev.pcm
            return
        req = batcher.submit(
            encoded, n_cond, max_new_tokens or self.max_new_tokens,
            stream=True, sampling=sampling, seed=seed,
        )
        can_stream = getattr(self.codec, "can_stream", False)
        session = None
        chunk_frames: list = []  # non-streamable-codec fallback prefix
        emitted = 0
        for ev in req.iter_events():
            if isinstance(ev, _PartialFrames):
                codes = self._shift_output_tokens(ev.frames[1:])
                if can_stream:
                    if session is None:
                        session = self.codec.start_stream(
                            max_step_frames=batcher.horizon
                        )
                    yield session.feed(codes)[0]
                else:
                    # full-prefix delta decode (see the serial path's
                    # fallback note: best approximation for non-causal
                    # codecs once audio is already emitted)
                    chunk_frames.append(codes)
                    allc = np.concatenate(chunk_frames, axis=1)
                    pcm = self.codec.decode(allc)[0]
                    spf = pcm.shape[-1] // allc.shape[1]
                    yield pcm[emitted * spf :]
                    emitted = allc.shape[1]
            else:  # _ChunkResult: chunk boundary — fresh vocoder state
                session = None
                chunk_frames = []
                emitted = 0

    # -- static batching ---------------------------------------------------

    def _get_batch_engine(self, batch_size: int) -> LMEngine:
        """Lazily build one engine per batch size, sharing weights with the
        main engine (separate jit cache + decode state shapes).
        Batched runs use the reference's smaller rep-pen window
        (static_batch.rs:47)."""
        from fish_speech_tpu.ops.sampling import BATCHED_REP_PEN_WINDOW

        if not hasattr(self, "_batch_engines"):
            self._batch_engines = {}
        if batch_size not in self._batch_engines:
            e = self.engine
            self._batch_engines[batch_size] = LMEngine(
                e.params,
                e.cfg,
                e.token_cfg,
                e.lm,
                batch_size=batch_size,
                cache_len=e.cache_len,
                max_frames=e.max_frames,
                rep_pen_window=BATCHED_REP_PEN_WINDOW,
                prompt_buckets=e.prompt_buckets,
                dtype=e.dtype,
                mesh=e.mesh,
                quantize_int8=e.quantize_int8,
                _params_preprocessed=True,
            )
        return self._batch_engines[batch_size]

    def synthesize_batched(
        self,
        text: str,
        batch_size: int,
        *,
        voice_conditioning: Optional[np.ndarray] = None,
        sampling: Optional[SamplingArgs] = None,
        sysprompt: Optional[str] = None,
        max_new_tokens: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> np.ndarray:
        """Blocking batched synthesis: text chunks run `batch_size` at a
        time through a static-batch engine (reference: handlers/
        speech.rs:73-92,140-150). Each chunk prompt carries its full
        conditioning (no KV-prefix reuse across batch rows). Chunk audio is
        concatenated in input order. Short tail groups are padded with a
        repeat row whose output is dropped.
        """
        if batch_size <= 1:
            return self.synthesize(
                text,
                voice_conditioning=voice_conditioning,
                sampling=sampling,
                sysprompt=sysprompt,
                max_new_tokens=max_new_tokens,
                seed=seed,
            )
        sampling = sampling or self.default_sampling
        chunks = preprocess_text(text)
        if not chunks:
            return np.zeros((0,), np.float32)
        if sysprompt is None and self.lm == WhichLM.FISH_1_5:
            sysprompt = FISH_1_5_SYSPROMPT

        _, encoded = self.prompt_encoder.encode_sequence(
            chunks,
            sysprompt_text=sysprompt,
            cached_speaker=voice_conditioning,
            assume_kv_cache=False,
        )
        engine = self._get_batch_engine(batch_size)
        max_new = max_new_tokens or self.max_new_tokens
        pcm_parts: List[np.ndarray] = []
        spf = getattr(
            self.codec, "samples_per_frame",
            None,
        )
        for g in range(0, len(encoded), batch_size):
            group = encoded[g : g + batch_size]
            real = len(group)
            group = group + [group[-1]] * (batch_size - real)
            results = engine.generate_batch(
                group, max_new_tokens=max_new, sampling=sampling, seed=seed
            )
            # ONE batched vocode per group (rows zero-padded to the
            # longest, per-row PCM trimmed to its own frame count —
            # decode() zero-pads to its bucket anyway, so padding
            # semantics are unchanged) instead of `real` sequential
            # decode programs. The reference vocodes the batch in one
            # call too (handlers/speech.rs:90-91).
            rows = [
                self._shift_output_tokens(results[r].tokens)
                for r in range(real)
            ]
            if spf is not None:
                tmax = max(r_.shape[1] for r_ in rows)
                c = rows[0].shape[0]
                batch = np.zeros((real, c, tmax), np.int32)
                for r, codes in enumerate(rows):
                    batch[r, :, : codes.shape[1]] = codes
                pcm = self.codec.decode(batch)
                for r, codes in enumerate(rows):
                    pcm_parts.append(pcm[r, : codes.shape[1] * spf])
            else:
                for codes in rows:
                    pcm_parts.append(self.codec.decode(codes)[0])
        return np.concatenate(pcm_parts)

    def synthesize_with_hidden(
        self,
        text: str,
        *,
        voice_conditioning: Optional[np.ndarray] = None,
        sampling: Optional[SamplingArgs] = None,
        sysprompt: Optional[str] = None,
        max_new_tokens: Optional[int] = None,
        seed: Optional[int] = None,
        return_audio: bool = True,
    ):
        """Generate while collecting the slow transformer's per-frame
        hidden states — the distillation/debug path (reference:
        handlers/send_hidden_states.rs:22-126).

        Returns (hidden (T, dim) f32, pcm or None).
        """
        sampling = sampling or self.default_sampling
        chunks = preprocess_text(text)
        if not chunks:
            return np.zeros((0, self.engine.cfg.dim), np.float32), None
        if sysprompt is None and self.lm == WhichLM.FISH_1_5:
            sysprompt = FISH_1_5_SYSPROMPT

        n_cond, encoded = self.prompt_encoder.encode_sequence(
            chunks,
            sysprompt_text=sysprompt,
            cached_speaker=voice_conditioning,
            assume_kv_cache=True,
        )
        max_new = max_new_tokens or self.max_new_tokens
        state = self.engine.init_state(seed)
        hiddens: List[np.ndarray] = []
        pcm_parts: List[np.ndarray] = []
        cond_len = 0
        for i, chunk_tokens in enumerate(encoded):
            offset = cond_len if i > 0 else 0
            result, state = self.engine.generate(
                chunk_tokens,
                max_new_tokens=max_new,
                sampling=sampling,
                state=state,
                conditioning_offset=offset,
                collect_hidden=True,
            )
            if i == 0:
                cond_len = n_cond
            state = self.engine.rewind(state, cond_len)
            hiddens.append(result.hidden)
            if return_audio:
                codes = self._shift_output_tokens(result.tokens)
                pcm_parts.append(self.codec.decode(codes)[0])
        hidden = np.concatenate(hiddens, axis=0)
        pcm = np.concatenate(pcm_parts) if pcm_parts else None
        return hidden, pcm

    def encode_reference_audio(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        """wav -> codec tokens for voice cloning
        (reference: handlers/encode_speech.rs:36-94)."""
        from fish_speech_tpu.audio.resample import resample

        audio = resample(audio, sample_rate, self.codec.sample_rate)
        return self.codec.encode(audio)[0]
