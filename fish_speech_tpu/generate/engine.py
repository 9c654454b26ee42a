"""LMEngine: statically-shaped, jitted generation driver for the DualAR LM.

Replaces the reference's iterator-based drivers
(reference: lm/generate/single_batch.rs:217-324, static_batch.rs:282-390)
with a TPU-native design:

* `prefill_and_frame` — one jit per prompt-length bucket; prompts are
  right-padded to the bucket so arbitrary lengths reuse compilations.
* `decode_frames` — the entire decode loop is ONE `lax.while_loop` on
  device; tokens land in a pre-allocated output buffer and the host syncs
  once at the end (the reference syncs per token per codebook).
* Conditioning-prefix reuse (`clear_slow_caches_until`,
  reference: dual_ar.rs:687-693) is a host-side rewind of the length
  counter — no data movement.
* Batched: all shapes carry a leading batch dim; rows track independent
  positions, so ragged prompts need no left-padding (the reference
  left-pads and its pad mask is dead code, SURVEY §2.5).
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.config import DualARConfig, TokenConfig, WhichLM
from fish_speech_tpu.generate.frame import (
    FrameResult,
    generate_frame,
    semantic_head_columns,
)
from fish_speech_tpu.models.dual_ar import (
    DualARParams,
    KVCache,
    slow_decode_step,
    slow_prefill,
    use_pallas_attention_default,
)
from fish_speech_tpu.ops.sampling import (
    SINGLE_STREAM_REP_PEN_WINDOW,
    RepPenWindow,
    RowSampling,
    SamplingArgs,
    split_row_keys,
)

logger = logging.getLogger(__name__)

DEFAULT_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 4096)


class GenState(NamedTuple):
    """Decode-loop carry for a batch of sequences.

    rng is ONE PRNG key (2,) on static-sampling engines, or (B, 2)
    per-row key chains on dynamic_sampling engines (each request's draw
    sequence then depends only on its own seed + frame count).
    samp carries the per-row device sampling parameters; static engines
    thread it untouched (their sampling is compiled in)."""

    cache: KVCache
    pos: jnp.ndarray  # (B,) int32 — per-row cache length / next write slot
    prev: jnp.ndarray  # (B, C+1) int32 — last emitted frame
    rep_pen: RepPenWindow  # tokens (B, C, W)
    rng: jax.Array
    done: jnp.ndarray  # (B,) bool
    samp: RowSampling  # per-row (B,) sampling params (dynamic engines)


class GenerationResult(NamedTuple):
    tokens: np.ndarray  # (num_codebooks, T) — codebook rows only
    semantic: np.ndarray  # (T,) — semantic row (vocab ids)
    frames: int
    hit_max: bool
    prefill_s: float
    decode_s: float
    prompt_tokens: int
    hidden: Optional[np.ndarray] = None  # (T, D) f32 slow hiddens if collected

    @property
    def codes(self) -> np.ndarray:
        return self.tokens


def _bucket_for(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"Prompt length {n} exceeds the largest bucket {buckets[-1]}")


class LMEngine:
    """Owns jitted generation functions and per-engine decode state.

    One engine per (model, batch size, cache length) triple. The engine is
    NOT thread-safe; the server serializes access per engine (and scales by
    batching inside the engine, not by locking — see server/).
    """

    def __init__(
        self,
        params: DualARParams,
        cfg: DualARConfig,
        token_cfg: TokenConfig,
        lm: WhichLM,
        *,
        batch_size: int = 1,
        cache_len: Optional[int] = None,
        max_frames: int = 2048,
        rep_pen_window: int = SINGLE_STREAM_REP_PEN_WINDOW,
        prompt_buckets=DEFAULT_BUCKETS,
        dtype=jnp.bfloat16,
        attention_impl: str = "auto",
        fast_frame_impl: str = "auto",
        slow_impl: str = "auto",
        prefill_impl: str = "auto",
        decode_unroll="auto",
        mesh=None,
        quantize_int8: bool = False,
        dynamic_sampling: bool = False,
        dyn_top_k_cap: int = 256,
        _params_preprocessed: bool = False,
    ) -> None:
        # dynamic_sampling: temp/top_p/top_k/rep-pen become PER-ROW device
        # operands (GenState.samp) and the RNG becomes per-row key chains,
        # so ONE compiled decode program serves mixed per-request sampling
        # configs and per-request seeds (the continuous batcher's serving
        # mode; reference fixes one SamplingArgs per batch,
        # static_batch.rs:29-63). Static engines keep sampling compiled in
        # (constant folding + the fused fast-frame kernel's in-kernel
        # sampler need static knobs).
        # dyn_top_k_cap: static ceiling on per-request top_k for dynamic
        # engines (requests asking for more, or 0 = "all", clamp to it).
        # It bounds lax.top_k's static width: an uncapped dynamic sampler
        # must sort the whole head per row, measured at ~30% of the
        # 16-way serving decode step (BASELINE.md r4). Must be a multiple
        # of 128 (or >= the codebook size) for the batched fused kernel's
        # tile loops.
        self.dynamic_sampling = dynamic_sampling
        self.dyn_top_k_cap = int(dyn_top_k_cap)
        # Gather the LM head down to the audio-legal columns once: the
        # per-frame head matmul then reads ~1 MB instead of ~200 MB
        # (constrained sampling can never pick any other column; see
        # frame.semantic_head_columns). The un-gathered params are NOT
        # retained — pinning the full head (and, under int8, the bf16
        # stacks) would cost hundreds of MB of device memory for the
        # engine's lifetime. Sibling engines (batch sizes, batcher) share
        # these processed params via _params_preprocessed=True.
        self.quantize_int8 = quantize_int8
        if not _params_preprocessed:
            cols = semantic_head_columns(lm, token_cfg, cfg)
            params = dict(params)
            params["output"] = jnp.take(
                params["output"], jnp.asarray(cols), axis=1
            )
            if quantize_int8:
                # weight-only int8 for the matmul stacks: ~2x faster
                # weight streaming on the HBM-bound decode (ops/quant.py);
                # OFF by default — bf16 is the reference-parity path
                from fish_speech_tpu.ops.quant import quantize_lm_params

                params = quantize_lm_params(params)
        self.params = params
        self.cfg = cfg
        # "auto" -> fused Pallas decode attention on TPU (single-device
        # directly; multi-device via shard_map when a mesh is given), XLA
        # lowering elsewhere. On non-TPU backends "pallas" runs the kernel
        # in interpret mode (CPU-mesh parity tests).
        self.mesh = mesh
        # The shard_mapped kernel needs dp | batch and tp | head counts
        # (attention_pallas.fused_decode_attention_sharded). "auto" falls
        # back to the XLA lowering (which GSPMD partitions fine) for
        # engines the mesh doesn't divide — e.g. the batch-1 serial
        # engine under dp>1; an explicit "pallas" request fails fast here
        # rather than asserting mid-request.
        shardable = mesh is None or (
            batch_size % mesh.shape.get("dp", 1) == 0
            and cfg.n_head % mesh.shape.get("tp", 1) == 0
            and cfg.n_local_heads % mesh.shape.get("tp", 1) == 0
        )
        if attention_impl == "auto":
            self.use_pallas = use_pallas_attention_default(mesh) and shardable
        else:
            self.use_pallas = attention_impl == "pallas"
            if self.use_pallas and not shardable:
                raise ValueError(
                    f"attention_impl='pallas' with mesh {dict(mesh.shape)} "
                    f"cannot shard batch={batch_size}, heads="
                    f"{cfg.n_head}/{cfg.n_local_heads}; use a dividing "
                    "mesh or attention_impl='xla'"
                )
        self.pallas_interpret = (
            self.use_pallas and jax.default_backend() != "tpu"
        )
        # Whole-frame fused fast-stack kernel (ops/fast_frame_pallas.py):
        # single-device engines. Static-sampling engines use the B=1
        # kernel (in-kernel sampler with compiled-in knobs); dynamic-
        # sampling engines (the batcher) use the BATCHED variant whose
        # per-request params ride in as SMEM operands — B rows share one
        # VMEM weight fetch per frame instead of XLA's 8x re-read.
        # "auto" -> on for TPU; "fused" forces it (interpret mode off-TPU,
        # for parity tests); "xla" disables.
        from fish_speech_tpu.ops.fast_frame_pallas import (
            fused_fast_frame_batched_supported,
            fused_fast_frame_supported,
        )

        if dynamic_sampling:
            fused_ok = (
                (mesh is None or mesh.size == 1)
                and fused_fast_frame_batched_supported(
                    cfg, params, batch_size
                )
            )
        else:
            fused_ok = (
                (mesh is None or mesh.size == 1)
                and fused_fast_frame_supported(cfg, params, batch_size)
            )
        if fast_frame_impl == "auto":
            # auto: fused for SINGLE-row engines only. The batched kernel
            # compiles and is token-distribution-correct up to B=32, but
            # its VMEM-bounded row-block grid + fori-serialized per-row
            # sampler measured ~25% SLOWER than the row-batched XLA fast
            # stack at B=4 (927 vs 1529 frames/s warm, 2026-08-19) — at
            # batch the 8x/frame weight re-read is already amortized
            # across rows, so the kernel's bandwidth win no longer pays
            # for its serialization. Explicit fast_frame_impl="fused"
            # still selects it for A/B.
            self.use_fused_fast = (
                fused_ok
                and batch_size == 1
                and jax.default_backend() == "tpu"
            )
        else:
            self.use_fused_fast = fast_frame_impl == "fused"
            if self.use_fused_fast and not fused_ok:
                raise ValueError(
                    "fast_frame_impl='fused' requires a single device and "
                    "batch_size=1 (static engines) or batch_size<=32 "
                    "(dynamic_sampling engines)"
                )
        self.fused_fast_interpret = (
            self.use_fused_fast and jax.default_backend() != "tpu"
        )
        # Whole-step fused slow-stack kernel (ops/slow_step_pallas.py):
        # single-device engines, batch-1 OR batched within the VMEM/
        # compute bounds of fused_slow_step_supported (bf16/f32 or
        # int8-quantized; int8 halves the kernel's HBM weight traffic).
        # Logits agree with the XLA lowering to ~2 ulp (reduction-order),
        # token streams are checked equal in tests/test_slow_step.py.
        from fish_speech_tpu.ops.slow_step_pallas import (
            fused_slow_step_supported,
        )

        slow_ok = (
            (mesh is None or mesh.size == 1)
            and fused_slow_step_supported(
                cfg, params, batch_size, cache_len or cfg.max_seq_len
            )
        )
        if slow_impl == "auto":
            # auto: fused for SINGLE-row engines only, same reasoning as
            # the fast kernel above — at batch the weight stream is
            # already amortized across rows and XLA's batched attention
            # einsums beat the kernel's per-row flat-lane expansion.
            # Measured 16-way serving p50 RTF (2026-08-19, identical
            # harness): fused slow 0.185 vs XLA slow 0.163. Explicit
            # slow_impl="fused" still selects it (bench --slow-impl).
            self.use_fused_slow = (
                slow_ok
                and batch_size == 1
                and jax.default_backend() == "tpu"
            )
        else:
            self.use_fused_slow = slow_impl == "fused"
            if self.use_fused_slow and not slow_ok:
                raise ValueError(
                    "slow_impl='fused' requires a single device and a "
                    "batch x cache_len within the kernel's VMEM bounds "
                    "(ops/slow_step_pallas.fused_slow_step_supported)"
                )
        self.fused_slow_interpret = (
            self.use_fused_slow and jax.default_backend() != "tpu"
        )
        # Flash prefill attention (ops/prefill_pallas.py): online-softmax
        # kernel replacing the XLA prefill's HBM-resident (S, E) score
        # tensor. Single-device engines only (the Mosaic kernel is a
        # per-device program; sharded engines keep the XLA lowering,
        # which GSPMD partitions fine). Per-shape eligibility (block
        # divisibility) is decided inside slow_prefill; ineligible
        # shapes silently fall back to the identical-semantics XLA path.
        flash_ok = mesh is None or mesh.size == 1
        if prefill_impl == "auto":
            # Default ON for single-device TPU: verified on the real
            # Mosaic toolchain 2026-08-18 (`bench.py --verify`: max-err
            # 0.0078 vs XLA at ragged extents) and measured faster where
            # prefill leaves the tunnel floor — 1000-tok prompt 67.4 ms
            # (XLA) -> 57.5 ms median, neutral at <=500 tok
            # (`bench.py --prefill`, BASELINE.md). CPU/multi-device
            # engines keep the identical-semantics XLA path.
            self.use_flash_prefill = flash_ok and jax.default_backend() == "tpu"
        else:
            self.use_flash_prefill = prefill_impl == "flash"
            if self.use_flash_prefill and not flash_ok:
                raise ValueError(
                    "prefill_impl='flash' requires a single device; use "
                    "prefill_impl='xla' on a multi-chip mesh"
                )
        self.flash_prefill_interpret = (
            self.use_flash_prefill and jax.default_backend() != "tpu"
        )
        # Decode-loop body unroll: N frames per `lax.while_loop` iteration.
        # The deploy platform (remote axon tunnel) pays a ~0.3 ms fixed
        # cost PER LOOP ITERATION regardless of body size (measured,
        # docs/TPU_NOTES.md #11), so folding N frames into one iteration
        # reclaims (N-1)/N of that floor; on directly-attached hardware
        # the same program is neutral. Semantics are exact for any
        # max_steps: tail sub-steps past max_steps write nothing to
        # out/valid and their frames are discarded (see _get_decode_loop).
        # Carried-state REPEATED decode (the batcher / streaming pipeline)
        # should use horizons divisible by the unroll so the carried
        # position never runs ahead of the reported frames — the batcher
        # rounds its admit horizon up to the unroll in its ctor and
        # steady horizons (16) are multiples of every in-repo unroll;
        # one-shot generate() overshoot is discarded by the rewind that
        # precedes any continuation.
        if decode_unroll == "auto":
            # A/B measured on hardware 2026-08-18 (`bench.py --unroll`,
            # best-of-5 e2e RTF): u1 0.0560 / u2 0.0557 / u4 0.0555,
            # lm medians 272.6 / 271.0 / 270.5 ms — within run-to-run
            # noise. The ~0.3 ms/iter floor predicted from the trivial
            # fori_loop probe does NOT apply to the real decode loop
            # (one device program either way), so auto stays 1: same
            # speed, smallest compile (u2/u4 warmups measured 26-51 s
            # vs 8 s) and the simplest carried-state semantics.
            self.decode_unroll = 1
        else:
            self.decode_unroll = int(decode_unroll)
            assert self.decode_unroll >= 1
        self.token_cfg = token_cfg
        self.lm = lm
        self.batch_size = batch_size
        self.cache_len = cache_len or cfg.max_seq_len
        self.max_frames = max_frames
        self.rep_pen_window = rep_pen_window
        self.prompt_buckets = tuple(
            b for b in prompt_buckets if b <= self.cache_len
        ) or (self.cache_len,)
        self.dtype = dtype

        self._prefill_jit = {}  # sampling -> fn
        self._decode_jit = {}
        self._init_state_jit = None  # built lazily (init_state)

    def _aot_parts(self):
        """Engine identity for AOT program seeds (utils/aot.py): every
        ctor-resolved knob that shapes the traced program. Single-device
        engines only — exported modules are per-platform, per-device
        programs; sharded engines always trace (utils.aot.wrap enabled=
        mesh is None at the call sites)."""
        return (
            self.cfg,
            self.token_cfg,
            self.lm,
            self.batch_size,
            self.cache_len,
            self.max_frames,
            self.rep_pen_window,
            self.dtype.__name__ if hasattr(self.dtype, "__name__")
            else str(self.dtype),
            self.use_pallas,
            self.pallas_interpret,
            self.use_fused_fast,
            self.fused_fast_interpret,
            self.use_fused_slow,
            self.fused_slow_interpret,
            self.use_flash_prefill,
            self.flash_prefill_interpret,
            self.decode_unroll,
            self.quantize_int8,
            self.dynamic_sampling,
            self.dyn_top_k_cap,
        )

    def _skey(self, sampling: SamplingArgs):
        """Jit/AOT key contribution of the sampling config: dynamic
        engines read every knob from GenState.samp at run time, so their
        programs are sampling-independent and share ONE key."""
        return None if self.dynamic_sampling else sampling

    # -- state ------------------------------------------------------------

    def init_state(self, seed: Optional[int] = None) -> GenState:
        if seed is None:
            seed = int(np.random.default_rng().integers(0, 2**31 - 1))
        if self._init_state_jit is None:
            # ONE jitted program with the seed as a traced operand: eager
            # construction dispatches ~10 tiny device programs (zeros,
            # PRNGKey, broadcasts), each a separate compile + remote
            # execution — measured ~3.6 s per cold process through the
            # axon tunnel on a 1-vCPU host (same disease as the codec
            # stream-state init, docs/TPU_NOTES.md #14).
            self._init_state_jit = jax.jit(self._init_state_fn)
        return self._init_state_jit(jnp.uint32(seed & 0x7FFFFFFF))

    def _init_state_fn(self, seed: jnp.ndarray) -> GenState:
        b, c = self.batch_size, self.cfg.num_codebooks
        if self.dynamic_sampling:
            # one key chain per row; admissions overwrite their row's key
            rng = jax.vmap(jax.random.PRNGKey)(
                jnp.arange(b, dtype=jnp.uint32) + seed
            )
        else:
            rng = jax.random.PRNGKey(seed)
        return GenState(
            cache=KVCache.init(
                self.cfg.n_layer,
                b,
                self.cfg.n_local_heads,
                self.cache_len,
                self.cfg.head_dim,
                self.dtype,
            ),
            pos=jnp.zeros((b,), jnp.int32),
            prev=jnp.zeros((b, c + 1), jnp.int32),
            rep_pen=RepPenWindow.init((b, c), self.rep_pen_window),
            rng=rng,
            done=jnp.zeros((b,), bool),
            samp=RowSampling.broadcast(SamplingArgs(), b),
        )

    # -- jitted kernels ---------------------------------------------------

    def _kv_extent_for(self, offset: int, bucket: int) -> int:
        """Static attention read extent for a prefill at host-side
        `offset` with a `bucket`-padded prompt: the smallest prompt bucket
        covering offset + bucket (capped at cache_len). Keeps per-layer
        prefill scores O(prompt) instead of O(S_max) with a bounded set of
        compilations."""
        need = min(offset + bucket, self.cache_len)
        for b in self.prompt_buckets:
            if need <= b:
                return b
        return self.cache_len

    def _get_prefill(self, sampling: SamplingArgs, kv_extent: int):
        """Jitted prefill+first-frame. `params` flows through as a jit
        ARGUMENT — closing over the weights would embed them as compiler
        constants, which the TPU toolchain ingests per program and blows
        compile times up by >10x (measured: 6s as an argument vs 8+ min
        captured for the same graph)."""
        key = (self._skey(sampling), kv_extent)
        if key not in self._prefill_jit:

            @partial(jax.jit, donate_argnums=(2,))
            def prefill_fn(params, tokens, state: GenState, seq_lens, offset):
                if self.dynamic_sampling:
                    rng, frame_rng = split_row_keys(state.rng)
                else:
                    rng, frame_rng = jax.random.split(state.rng)
                logits, hidden, cache = slow_prefill(
                    params,
                    self.cfg,
                    self.token_cfg,
                    tokens,
                    seq_lens,
                    state.cache,
                    0,
                    offset,
                    kv_extent=kv_extent,
                    use_flash=self.use_flash_prefill,
                    flash_interpret=self.flash_prefill_interpret,
                )
                res: FrameResult = generate_frame(
                    params,
                    self.cfg,
                    self.token_cfg,
                    self.lm,
                    sampling,
                    logits,
                    hidden,
                    RepPenWindow.init(
                        (self.batch_size, self.cfg.num_codebooks),
                        self.rep_pen_window,
                    ),
                    None,
                    frame_rng,
                    samp=state.samp if self.dynamic_sampling else None,
                )
                new_state = GenState(
                    cache=cache,
                    pos=offset + seq_lens,
                    prev=res.tokens,
                    rep_pen=res.rep_pen,
                    rng=rng,
                    done=res.is_eos,
                    samp=state.samp,
                )
                return new_state, res.tokens, res.is_eos, hidden

            from fish_speech_tpu.utils import aot

            self._prefill_jit[key] = aot.wrap(
                "prefill",
                (*self._aot_parts(), self._skey(sampling), kv_extent),
                prefill_fn,
                donate_argnums=(2,),
                enabled=self.mesh is None,
            )
        return self._prefill_jit[key]

    def _decode_body(self, params, sampling: SamplingArgs, state: GenState):
        if self.dynamic_sampling:
            rng, frame_rng = split_row_keys(state.rng)
        else:
            rng, frame_rng = jax.random.split(state.rng)
        if self.use_fused_slow:
            from fish_speech_tpu.models.dual_ar import KVCache, embed_tokens
            from fish_speech_tpu.ops.slow_step_pallas import fused_slow_step

            x0 = embed_tokens(
                params, self.cfg, self.token_cfg, state.prev[:, :, None]
            )[:, 0, :]
            logits, hidden, ck, cv = fused_slow_step(
                params,
                self.cfg,
                x0,
                state.pos,
                state.cache.k,
                state.cache.v,
                interpret=self.fused_slow_interpret,
            )
            cache = KVCache(k=ck, v=cv)
        else:
            logits, hidden, cache = slow_decode_step(
                params,
                self.cfg,
                self.token_cfg,
                state.prev,
                state.cache,
                state.pos,
                use_pallas=self.use_pallas,
                mesh=self.mesh,
                pallas_interpret=self.pallas_interpret,
            )
        res: FrameResult = generate_frame(
            params,
            self.cfg,
            self.token_cfg,
            self.lm,
            sampling,
            logits,
            hidden,
            state.rep_pen,
            state.prev,
            frame_rng,
            samp=state.samp if self.dynamic_sampling else None,
            use_fused_fast=self.use_fused_fast,
            fused_interpret=self.fused_fast_interpret,
            dyn_top_k_cap=self.dyn_top_k_cap,
        )
        # Done rows keep emitting EOS frames and stop advancing.
        frame = jnp.where(
            state.done[:, None],
            state.prev.at[:, 0].set(self.token_cfg.im_end_id).at[:, 1:].set(0),
            res.tokens,
        )
        new_state = GenState(
            cache=cache,
            pos=jnp.where(state.done, state.pos, state.pos + 1),
            prev=frame,
            rep_pen=res.rep_pen,
            rng=rng,
            done=state.done | res.is_eos,
            samp=state.samp,
        )
        return new_state, frame, hidden

    def _get_decode_loop(
        self,
        sampling: SamplingArgs,
        collect_hidden: bool = False,
        horizon: Optional[int] = None,
    ):
        """Jitted multi-frame decode. `horizon` caps the output buffer
        (defaults to max_frames); the continuous batcher uses short
        horizons so it can admit new requests between chunks.

        The while body runs `self.decode_unroll` frames per iteration
        (the deploy platform charges a fixed ~0.3 ms per loop ITERATION —
        TPU_NOTES #11). Tail sub-steps whose index reaches max_steps
        still execute (trip count stays data-independent) but their
        out/valid writes are masked, their EOS cannot leak into the
        reported done flags, and `steps` is clamped to max_steps — so
        the REPORTED stream (valid flags + frames at valid rows, done,
        hit_max) is identical to the unroll=1 loop for ANY max_steps.
        Two documented deltas: `steps` may group-round up to unroll-1
        past an in-range EOS (the trailing rows are valid=False EOS
        padding — consume via `valid`, as every in-repo caller does),
        and the DISCARDED carry may sit up to unroll-1 frames ahead when
        max_steps is not a multiple (ctor comment; decode_chunk asserts
        divisibility so carried-state streams can never hit it)."""
        key = (self._skey(sampling), collect_hidden, horizon)
        if key not in self._decode_jit:
            cap = horizon or self.max_frames
            unroll = self.decode_unroll

            @partial(jax.jit, donate_argnums=(1,))
            def decode_loop(params, state: GenState, max_steps):
                b, c = self.batch_size, self.cfg.num_codebooks
                out = jnp.zeros((cap, b, c + 1), jnp.int32)
                valid = jnp.zeros((cap, b), bool)
                # hidden-state trace (distillation/debug; reference:
                # handlers/send_hidden_states.rs) — only materialized in
                # the collect_hidden variant of the loop
                hid = (
                    jnp.zeros((cap, b, self.cfg.dim), jnp.float32)
                    if collect_hidden
                    else jnp.zeros((0,), jnp.float32)
                )

                def cond(carry):
                    state, _, _, _, step = carry
                    return (step < max_steps) & ~jnp.all(state.done)

                def body(carry):
                    state, out, valid, hid, step = carry
                    for k in range(unroll):
                        was_done = state.done
                        state, frame, hidden = self._decode_body(
                            params, sampling, state
                        )
                        ok = ~was_done & (
                            frame[:, 0] != self.token_cfg.im_end_id
                        )
                        if k == 0:
                            # cond guarantees step < max_steps <= cap
                            idx = step
                            keep = None
                        else:
                            # tail sub-step may land past max_steps: clamp
                            # the index into the buffer and write back the
                            # CURRENT contents so nothing real is clobbered
                            idx = jnp.minimum(step + k, cap - 1)
                            keep = (step + k) < max_steps
                            # A DISCARDED tail sub-step's EOS must not leak
                            # into the done flags the caller reads
                            # (hit_max / batcher finish logic) — the
                            # single-step loop would never have run it.
                            # pos/cache/rng advances are harmless (any
                            # continuation rewinds), but done is reported.
                            state = state._replace(
                                done=jnp.where(keep, state.done, was_done)
                            )
                        fr = frame[None]
                        okr = ok[None]
                        hr = (
                            hidden.astype(jnp.float32)[None]
                            if collect_hidden
                            else None
                        )
                        if keep is not None:
                            cur = jax.lax.dynamic_slice(
                                out, (idx, 0, 0), (1, b, c + 1)
                            )
                            fr = jnp.where(keep, fr, cur)
                            curv = jax.lax.dynamic_slice(
                                valid, (idx, 0), (1, b)
                            )
                            okr = jnp.where(keep, okr, curv)
                            if collect_hidden:
                                curh = jax.lax.dynamic_slice(
                                    hid, (idx, 0, 0), (1, b, self.cfg.dim)
                                )
                                hr = jnp.where(keep, hr, curh)
                        out = jax.lax.dynamic_update_slice(
                            out, fr, (idx, 0, 0)
                        )
                        valid = jax.lax.dynamic_update_slice(
                            valid, okr, (idx, 0)
                        )
                        if collect_hidden:
                            hid = jax.lax.dynamic_update_slice(
                                hid, hr, (idx, 0, 0)
                            )
                    return state, out, valid, hid, step + unroll

                state, out, valid, hid, step = jax.lax.while_loop(
                    cond, body, (state, out, valid, hid, jnp.int32(0))
                )
                return state, out, valid, hid, jnp.minimum(step, max_steps)

            from fish_speech_tpu.utils import aot

            self._decode_jit[key] = aot.wrap(
                "decode_loop",
                (*self._aot_parts(), self._skey(sampling), collect_hidden,
                 horizon, cap),
                decode_loop,
                donate_argnums=(1,),
                enabled=self.mesh is None,
            )
        params = self.params
        fn = self._decode_jit[key]
        return lambda state, max_steps: fn(params, state, max_steps)

    def _get_step(self, sampling: SamplingArgs):
        """Single decode frame, jitted. NOT on the serving path (streaming
        uses decode_chunk); kept for frame-at-a-time callers and the
        sharded-parity test (tests/test_parallel.py), and routed through
        the same _decode_body as decode_chunk so the two cannot diverge."""
        key = ("step", self._skey(sampling))
        if key not in self._decode_jit:

            @partial(jax.jit, donate_argnums=(1,))
            def step_fn(params, state: GenState):
                new_state, frame, _hidden = self._decode_body(
                    params, sampling, state
                )
                return new_state, frame

            self._decode_jit[key] = step_fn
        params = self.params
        fn = self._decode_jit[key]
        return lambda state: fn(params, state)

    def _get_prefill_row(self, sampling: SamplingArgs, kv_extent: int):
        """Jitted single-row admission prefill for the continuous batcher:
        prefill ONE request's prompt into row `row` of a shared B-row
        cache and splice its first frame / position / rep-pen state into
        the shared GenState without touching other rows."""
        key = ("row", self._skey(sampling), kv_extent)
        if key not in self._prefill_jit:

            @partial(jax.jit, donate_argnums=(2,))
            def prefill_row_fn(params, tokens, state: GenState, seq_len,
                               offset, row, samp_vec, row_key):
                if self.dynamic_sampling:
                    # reset this row's key chain to the request's seed and
                    # install its sampling params; other rows untouched
                    ks = jax.random.split(row_key, 2)
                    rng = state.rng.at[row].set(ks[0])
                    frame_rng = ks[1][None]  # (1, 2) per-row key
                    samp_all = state.samp.set_rows(row, samp_vec)
                    row_samp = RowSampling(
                        temp=samp_vec[:, 0],
                        top_p=samp_vec[:, 1],
                        top_k=samp_vec[:, 2].astype(jnp.int32),
                        rep_pen=samp_vec[:, 3],
                    )
                else:
                    rng, frame_rng = jax.random.split(state.rng)
                    samp_all = state.samp
                    row_samp = None
                logits, hidden, cache = slow_prefill(
                    params,
                    self.cfg,
                    self.token_cfg,
                    tokens,
                    seq_len,
                    state.cache,
                    row,
                    offset,
                    kv_extent=kv_extent,
                    use_flash=self.use_flash_prefill,
                    flash_interpret=self.flash_prefill_interpret,
                )
                res: FrameResult = generate_frame(
                    params,
                    self.cfg,
                    self.token_cfg,
                    self.lm,
                    sampling,
                    logits,
                    hidden,
                    RepPenWindow.init((1, self.cfg.num_codebooks), self.rep_pen_window),
                    None,
                    frame_rng,
                    samp=row_samp,
                    dyn_top_k_cap=self.dyn_top_k_cap,
                )
                new_state = GenState(
                    cache=cache,
                    pos=state.pos.at[row].set(offset + seq_len[0]),
                    prev=state.prev.at[row].set(res.tokens[0]),
                    rep_pen=RepPenWindow(
                        tokens=state.rep_pen.tokens.at[row].set(
                            jnp.full(
                                (self.cfg.num_codebooks, self.rep_pen_window),
                                -1,
                                jnp.int32,
                            )
                        ),
                        ptr=state.rep_pen.ptr,
                    ),
                    rng=rng,
                    done=state.done.at[row].set(res.is_eos[0]),
                    samp=samp_all,
                )
                return new_state, res.tokens[0], res.is_eos[0]

            from fish_speech_tpu.utils import aot

            self._prefill_jit[key] = aot.wrap(
                "prefill_row",
                (*self._aot_parts(), self._skey(sampling), kv_extent),
                prefill_row_fn,
                donate_argnums=(2,),
                enabled=self.mesh is None,
            )
        return self._prefill_jit[key]

    def prefill_row(
        self,
        state: GenState,
        prompt: np.ndarray,
        sampling: SamplingArgs,
        row: int,
        offset: int = 0,
        seed: Optional[int] = None,
    ) -> Tuple[GenState, np.ndarray, bool]:
        """Admit one prompt into row `row` of a shared decode batch.
        Returns (state, first frame (C+1,), is_eos).

        On dynamic_sampling engines `sampling` and `seed` become this
        row's DEVICE params/key chain (per-request sampling without
        recompiles); static engines compile `sampling` in and ignore
        `seed`."""
        prompt = np.asarray(prompt)
        if prompt.ndim == 3:
            prompt = prompt[0]
        rows_, sl = prompt.shape
        bucket = _bucket_for(sl, self.prompt_buckets)
        padded = np.zeros((1, rows_, bucket), np.int32)
        padded[0, :, :sl] = prompt
        fn = self._get_prefill_row(
            sampling, self._kv_extent_for(offset, bucket)
        )
        # numpy operands throughout: each jnp construction here was its
        # own host->device transfer on the scheduler thread; jit bundles
        # numpy args into the call instead
        state, frame, is_eos = fn(
            self.params,
            padded,
            state,
            np.asarray([sl], np.int32),
            np.int32(offset),
            np.int32(row),
            np.asarray(RowSampling.row_vector(sampling))[None, :],
            self._row_key(seed),
        )
        return state, frame, is_eos

    def _row_key(self, seed: Optional[int]) -> np.ndarray:
        """Admission key for one row's chain: the raw threefry key data
        of PRNGKey(seed) ([hi, lo] uint32 — layout-asserted in
        tests/test_dynamic_sampling.py), or a fresh random seed when none
        was requested. Built host-side: jax.random.PRNGKey dispatches a
        device program per call, which at a 16-row admission burst was 16
        needless round trips on the scheduler thread."""
        if seed is None:
            seed = int(np.random.default_rng().integers(0, 2**31 - 1))
        seed = int(seed) & 0x7FFFFFFF
        return np.array([seed >> 32, seed & 0xFFFFFFFF], np.uint32)

    def _get_prefill_rows(self, sampling: SamplingArgs, kv_extent: int,
                          k_rows: int):
        """Jitted k-row admission prefill (contiguous rows [row0, row0+k)):
        one device program admits a whole burst of requests instead of k
        sequential prefill_row dispatches. Cached (and AOT-seeded) per
        burst size k — jit would specialize per tokens shape anyway, and
        the seed store needs one artifact per shape; the batcher groups
        admissions into pow2 bursts so only log2(B) values ever occur."""
        key = ("rows", self._skey(sampling), kv_extent, k_rows)
        if key not in self._prefill_jit:

            @partial(jax.jit, donate_argnums=(2,))
            def prefill_rows_fn(params, tokens, state: GenState, seq_lens,
                                offset, row0, samp_vecs, row_keys):
                k = tokens.shape[0]
                if self.dynamic_sampling:
                    ks = jax.vmap(lambda kk: jax.random.split(kk, 2))(
                        row_keys
                    )  # (k, 2, 2)
                    rng = jax.lax.dynamic_update_slice(
                        state.rng, ks[:, 0], (row0, 0)
                    )
                    frame_rng = ks[:, 1]
                    samp_all = state.samp.set_rows(row0, samp_vecs)
                    burst_samp = RowSampling(
                        temp=samp_vecs[:, 0],
                        top_p=samp_vecs[:, 1],
                        top_k=samp_vecs[:, 2].astype(jnp.int32),
                        rep_pen=samp_vecs[:, 3],
                    )
                else:
                    rng, frame_rng = jax.random.split(state.rng)
                    samp_all = state.samp
                    burst_samp = None
                logits, hidden, cache = slow_prefill(
                    params,
                    self.cfg,
                    self.token_cfg,
                    tokens,
                    seq_lens,
                    state.cache,
                    row0,
                    offset,
                    kv_extent=kv_extent,
                    use_flash=self.use_flash_prefill,
                    flash_interpret=self.flash_prefill_interpret,
                )
                res: FrameResult = generate_frame(
                    params,
                    self.cfg,
                    self.token_cfg,
                    self.lm,
                    sampling,
                    logits,
                    hidden,
                    RepPenWindow.init((k, self.cfg.num_codebooks), self.rep_pen_window),
                    None,
                    frame_rng,
                    samp=burst_samp,
                    dyn_top_k_cap=self.dyn_top_k_cap,
                )
                upd = jax.lax.dynamic_update_slice
                new_state = GenState(
                    cache=cache,
                    pos=upd(state.pos, offset + seq_lens, (row0,)),
                    prev=upd(state.prev, res.tokens, (row0, 0)),
                    rep_pen=RepPenWindow(
                        tokens=upd(
                            state.rep_pen.tokens,
                            jnp.full(
                                (k, self.cfg.num_codebooks, self.rep_pen_window),
                                -1,
                                jnp.int32,
                            ),
                            (row0, 0, 0),
                        ),
                        ptr=state.rep_pen.ptr,
                    ),
                    rng=rng,
                    done=upd(state.done, res.is_eos, (row0,)),
                    samp=samp_all,
                )
                return new_state, res.tokens, res.is_eos

            from fish_speech_tpu.utils import aot

            self._prefill_jit[key] = aot.wrap(
                "prefill_rows",
                (*self._aot_parts(), self._skey(sampling), kv_extent,
                 k_rows),
                prefill_rows_fn,
                donate_argnums=(2,),
                enabled=self.mesh is None,
            )
        return self._prefill_jit[key]

    def prefill_rows(
        self,
        state: GenState,
        prompts,  # list of (C+1, L_i) prompts, one per row
        sampling: SamplingArgs,
        row0: int,
        per_row=None,  # optional list of (SamplingArgs, seed) per row
    ) -> Tuple[GenState, jnp.ndarray, jnp.ndarray]:
        """Admit a burst of fresh prompts into contiguous rows
        [row0, row0+k) in ONE device program (fresh sequences only:
        offset 0). Returns (state, frames (k, C+1), is_eos (k,)) —
        frames/is_eos are device futures.

        per_row: on dynamic_sampling engines, each row's
        (SamplingArgs, seed or None); defaults to `sampling` with fresh
        random seeds."""
        k = len(prompts)
        sls = [p.shape[-1] for p in prompts]
        bucket = _bucket_for(max(sls), self.prompt_buckets)
        c = self.cfg.num_codebooks
        padded = np.zeros((k, c + 1, bucket), np.int32)
        for i, p in enumerate(prompts):
            padded[i, :, : sls[i]] = p
        fn = self._get_prefill_rows(
            sampling, self._kv_extent_for(0, bucket), k
        )
        if per_row is None:
            per_row = [(sampling, None)] * k
        vecs = np.stack(
            [RowSampling.row_vector(s) for s, _ in per_row]
        )
        keys = np.stack([self._row_key(sd) for _, sd in per_row])
        return fn(
            self.params,
            padded,
            state,
            np.asarray(sls, np.int32),
            np.int32(0),
            np.int32(row0),
            vecs,
            keys,
        )

    def decode_chunk(
        self,
        state: GenState,
        sampling: SamplingArgs,
        horizon: int,
        max_steps: Optional[int] = None,
    ):
        """Run up to `horizon` decode frames for the whole batch.
        Returns (state, out (horizon, B, C+1), valid (horizon, B), steps).

        Carried-state REPEATED decode requires the horizon to be a
        multiple of decode_unroll: a non-multiple would let the unrolled
        loop's discarded tail sub-steps advance the carry past the
        reported frames, silently dropping them from the stream.

        max_steps < horizon reuses the same compiled program for a
        budget-truncated FINAL chunk (max_steps is a device operand, not
        part of the jit key). Only valid when no further carried-state
        decode follows: with decode_unroll > 1 a non-multiple max_steps
        lets the discarded carry run ahead of the reported frames."""
        assert horizon % self.decode_unroll == 0, (
            f"decode_chunk horizon {horizon} must be a multiple of "
            f"decode_unroll={self.decode_unroll}"
        )
        steps_in = horizon if max_steps is None else min(max_steps, horizon)
        state, out, valid, _hid, steps = self._get_decode_loop(
            sampling, horizon=horizon
        )(state, np.int32(steps_in))
        return state, out, valid, steps

    # -- drivers ----------------------------------------------------------

    def prefill(
        self,
        state: GenState,
        prompt: np.ndarray,
        sampling: SamplingArgs,
        offset: int = 0,
        seq_lens=None,
    ) -> Tuple[GenState, jnp.ndarray, jnp.ndarray]:
        """Prefill a (C+1, S) prompt (batch=1 engines) or (B, C+1, S) batch
        and sample the first frame. Returns (state, frame (B, C+1), is_eos).

        seq_lens: optional (B,) real row lengths for ragged batches whose
        rows are right-padded to a common S."""
        prompt = np.asarray(prompt)
        if prompt.ndim == 2:
            prompt = prompt[None]
        b, rows, s = prompt.shape
        assert b == self.batch_size, (b, self.batch_size)
        assert rows == self.cfg.num_codebooks + 1
        bucket = _bucket_for(s, self.prompt_buckets)
        padded = np.zeros((b, rows, bucket), np.int32)
        padded[:, :, :s] = prompt
        if seq_lens is None:
            seq_lens = jnp.full((b,), s, jnp.int32)
        else:
            seq_lens = jnp.asarray(np.asarray(seq_lens, np.int32))
        fn = self._get_prefill(sampling, self._kv_extent_for(offset, bucket))
        state, frame, is_eos, _hidden = fn(
            self.params, jnp.asarray(padded), state, seq_lens, jnp.int32(offset)
        )
        return state, frame, is_eos

    def _prefill_raw(
        self,
        state: GenState,
        prompt: np.ndarray,
        sampling: SamplingArgs,
        offset: int = 0,
        seq_lens=None,
    ):
        """Like prefill() but also returns the first frame's slow hidden
        state (B, D)."""
        prompt = np.asarray(prompt)
        if prompt.ndim == 2:
            prompt = prompt[None]
        b, rows, s = prompt.shape
        bucket = _bucket_for(s, self.prompt_buckets)
        padded = np.zeros((b, rows, bucket), np.int32)
        padded[:, :, :s] = prompt
        if seq_lens is None:
            seq_lens = jnp.full((b,), s, jnp.int32)
        else:
            seq_lens = jnp.asarray(np.asarray(seq_lens, np.int32))
        fn = self._get_prefill(sampling, self._kv_extent_for(offset, bucket))
        return fn(
            self.params, jnp.asarray(padded), state, seq_lens, jnp.int32(offset)
        )

    def generate(
        self,
        prompt: np.ndarray,
        *,
        max_new_tokens: int = 1024,
        sampling: Optional[SamplingArgs] = None,
        state: Optional[GenState] = None,
        conditioning_offset: int = 0,
        seed: Optional[int] = None,
        collect_hidden: bool = False,
        profile: bool = False,
    ) -> Tuple[GenerationResult, GenState]:
        """Blocking generation for a single prompt (batch-1 engine).

        prompt: (C+1, S) int array — semantic row + codebook rows, as
        produced by text.prompt.PromptEncoder. Returns codebook-row tokens
        shaped (C, T), mirroring `generate_blocking`
        (reference: single_batch.rs:217-324).

        profile=False (default): the decode loop is dispatched right
        behind the prefill with NO host sync between them — the chip runs
        both back-to-back and ONE batched fetch at the end collects
        everything (a mid-path first-frame fetch costs a full round trip,
        ~30 ms through the remote tunnel, per generation). prefill_s then
        measures dispatch only; pass profile=True (the CLI does, for the
        reference-parity timing print) to sync after prefill and get the
        true phase split at the cost of that round trip.
        """
        assert self.batch_size == 1, "generate() drives batch-1 engines"
        sampling = sampling or SamplingArgs()
        if state is None:
            state = self.init_state(seed)
        if self.dynamic_sampling:
            state = state._replace(
                samp=RowSampling.broadcast(sampling, self.batch_size)
            )

        prompt = np.asarray(prompt)
        prompt_len = prompt.shape[-1]
        t0 = time.perf_counter()
        state, first_frame, first_eos, first_hidden = self._prefill_raw(
            state, prompt, sampling, offset=conditioning_offset
        )
        if profile:
            first_frame = np.asarray(first_frame)
        prefill_s = time.perf_counter() - t0

        budget = min(
            max_new_tokens - 1,
            self.max_frames,
            self.cache_len - (conditioning_offset + prompt_len) - 1,
        )
        t1 = time.perf_counter()
        state, out, valid, hid, steps = self._get_decode_loop(
            sampling, collect_hidden
        )(state, jnp.int32(max(budget, 0)))
        # ONE batched device->host fetch: per-array np.asarray costs a
        # full round trip each, which at remote-device latencies dominates
        # short generations.
        out, valid, steps, done_host, first_frame, hid, first_hidden = (
            jax.device_get(
                (out, valid, steps, state.done, first_frame, hid,
                 first_hidden)
            )
        )
        steps = int(steps)
        decode_s = time.perf_counter() - t1

        # First frame is always included (even if EOS), matching the
        # reference driver (single_batch.rs:250-251,262-266).
        frames = [first_frame[0]]
        kept = []
        for i in range(steps):
            if valid[i, 0]:
                frames.append(out[i, 0])
                kept.append(i)
        stacked = np.stack(frames, axis=1)  # (C+1, T)
        hit_max = steps >= budget > 0 and not bool(done_host[0])

        hidden = None
        if collect_hidden:
            hidden = np.concatenate(
                [np.asarray(first_hidden, np.float32)[0][None], hid[kept, 0]],
                axis=0,
            )

        result = GenerationResult(
            tokens=stacked[1:],
            semantic=stacked[0],
            frames=stacked.shape[1],
            hit_max=hit_max,
            prefill_s=prefill_s,
            decode_s=decode_s,
            prompt_tokens=prompt_len,
            hidden=hidden,
        )
        return result, state

    def generate_batch(
        self,
        prompts,
        *,
        max_new_tokens: int = 1024,
        sampling: Optional[SamplingArgs] = None,
        seed: Optional[int] = None,
    ):
        """Blocking generation for a fixed batch of ragged prompts.

        Counterpart of the reference's static batch driver
        (reference: lm/generate/static_batch.rs:282-390) with the padding
        model inverted: rows are right-padded and tracked by per-row
        length/position, so the combined causal+validity mask is correct by
        construction (the reference left-pads and its pad mask is dead
        code — SURVEY §2.5). Dead rows keep emitting EOS frames without
        advancing, like the reference's `is_active` tracking
        (static_batch.rs:160-173).

        prompts: list of (C+1, S_i) int arrays, len == batch_size.
        Returns a list of GenerationResult, one per row, in order.
        """
        b, c = self.batch_size, self.cfg.num_codebooks
        assert len(prompts) == b, (len(prompts), b)
        sampling = sampling or SamplingArgs()
        state = self.init_state(seed)
        if self.dynamic_sampling:
            state = state._replace(samp=RowSampling.broadcast(sampling, b))

        prompts = [np.asarray(p) for p in prompts]
        lens = [int(p.shape[-1]) for p in prompts]
        s = max(lens)
        stacked = np.zeros((b, c + 1, s), np.int32)
        for r, p in enumerate(prompts):
            stacked[r, :, : lens[r]] = p

        t0 = time.perf_counter()
        state, first_frame, first_eos, _hid = self._prefill_raw(
            state, stacked, sampling, seq_lens=lens
        )
        # no mid-path sync: the decode loop is dispatched behind the
        # prefill and ONE batched fetch collects everything (see generate)
        prefill_s = time.perf_counter() - t0

        budget = min(
            max_new_tokens - 1,
            self.max_frames,
            self.cache_len - max(lens) - 1,
        )
        t1 = time.perf_counter()
        state, out, valid, _hidbuf, steps = self._get_decode_loop(sampling)(
            state, jnp.int32(max(budget, 0))
        )
        out, valid, steps, done, first_frame = jax.device_get(
            (out, valid, steps, state.done, first_frame)
        )
        steps = int(steps)
        decode_s = time.perf_counter() - t1

        results = []
        for r in range(b):
            frames = [first_frame[r]]
            for i in range(steps):
                if valid[i, r]:
                    frames.append(out[i, r])
            row = np.stack(frames, axis=1)  # (C+1, T_r)
            results.append(
                GenerationResult(
                    tokens=row[1:],
                    semantic=row[0],
                    frames=row.shape[1],
                    hit_max=steps >= budget > 0 and not bool(done[r]),
                    prefill_s=prefill_s,
                    decode_s=decode_s,
                    prompt_tokens=lens[r],
                )
            )
        return results

    def warmup(
        self,
        sampling: Optional[SamplingArgs] = None,
        buckets=None,
        conditioning_lens=(0,),
        chunk_horizons=(),
    ):
        """Pre-compile the prefill (per prompt bucket) and decode-loop
        programs so the first real request pays no compile latency
        (production servers call this at startup via --warmup; the
        persistent compile cache makes later restarts near-instant).

        conditioning_lens: offsets to warm prefill at. The prefill jit key
        includes the bucketed attention extent (_kv_extent_for), so chunk
        2+ of a conditioned request (offset = conditioning length) can hit
        a different program than offset 0 — pass each voice's conditioning
        length (the server does) or the first conditioned chunk compiles
        mid-serving."""
        sampling = sampling or SamplingArgs()
        b, c = self.batch_size, self.cfg.num_codebooks
        seen = set()
        for bucket in buckets or self.prompt_buckets:
            for cond in conditioning_lens:
                # prefill writes [cond, cond+bucket) — no +1: warmup never
                # decodes past the prefill, and the largest bucket
                # (== cache_len) must stay warmable at offset 0
                if cond + bucket > self.cache_len:
                    continue
                key = (bucket, self._kv_extent_for(cond, bucket))
                if key in seen:
                    continue
                seen.add(key)
                t0 = time.perf_counter()
                state = self.init_state(seed=0)
                prompt = np.zeros((b, c + 1, bucket), np.int32)
                state, _, _ = self.prefill(state, prompt, sampling, offset=cond)
                jax.block_until_ready(state.pos)
                logger.info(
                    "warmup prefill bucket %d (offset %d): %.1fs",
                    bucket,
                    cond,
                    time.perf_counter() - t0,
                )
        t0 = time.perf_counter()
        state = self.init_state(seed=0)
        state, out, _, _, _ = self._get_decode_loop(sampling)(
            state, jnp.int32(1)
        )
        np.asarray(out[:1])
        logger.info("warmup decode loop: %.1fs", time.perf_counter() - t0)
        # short-horizon decode chunks are DISTINCT programs (jit key
        # includes the horizon cap); the low-latency streaming path uses
        # them, so warm each horizon the server will serve
        for h in chunk_horizons:
            t0 = time.perf_counter()
            state = self.init_state(seed=0)
            state, out, _, _ = self.decode_chunk(state, sampling, h)
            np.asarray(out[:1])
            logger.info(
                "warmup decode chunk horizon %d: %.1fs",
                h,
                time.perf_counter() - t0,
            )

    def rewind(self, state: GenState, length: int) -> GenState:
        """Logical equivalent of clear_slow_caches_until(length)
        (reference: dual_ar.rs:687-693): keep the first `length` cache
        positions, reset everything else."""
        b, c = self.batch_size, self.cfg.num_codebooks
        return GenState(
            cache=state.cache,
            pos=jnp.full((b,), length, jnp.int32),
            prev=jnp.zeros((b, c + 1), jnp.int32),
            rep_pen=RepPenWindow.init((b, c), self.rep_pen_window),
            rng=state.rng,
            done=jnp.zeros((b,), bool),
            samp=state.samp,
        )
