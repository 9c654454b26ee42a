"""On-device sampling: temperature / top-k / top-p and windowed repetition
penalty.

The reference samples on the host every token (one device→host sync per
slow step plus one per codebook; reference: lm/sampling/mod.rs:40-109,
single_batch.rs:38-46). Here the whole pipeline is jnp so the decode loop
never syncs: top-k via `lax.top_k`, nucleus mask over sorted probabilities,
Gumbel/categorical draw with `jax.random`, and the sliding-window
repetition penalty as a membership test against a small on-device ring
buffer (replacing the host-side FIFO+refcount hashmaps in
lm/sampling/rep_pen.rs — window membership is equivalent to refcount > 0).

Semantics match candle's `Sampling::TopKThenTopP` + the reference's
`sample_topp` (keep sorted tokens while the exclusive cumulative
probability is < top_p, always keeping the first).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingArgs:
    """(reference: lm/sampling/mod.rs:29-34). Static per-compilation."""

    temp: float = 0.7
    top_p: float = 0.8
    top_k: int = 256
    repetition_penalty: float = 1.2

    @property
    def is_argmax(self) -> bool:
        return self.temp <= 1e-7


def sample_top_k_top_p(
    logits: jnp.ndarray,
    rng: jax.Array,
    *,
    temp: float,
    top_p: float,
    top_k: int,
) -> jnp.ndarray:
    """Sample token ids from logits (..., V) -> (...) int32.

    temp/top_p/top_k are Python floats/ints (static). temp==0 is argmax.
    """
    if temp <= 1e-7:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits.astype(jnp.float32) / temp
    vocab = logits.shape[-1]
    k = min(top_k, vocab)

    # softmax then top-k (sorted descending), like the reference which
    # softmaxes first and then selects (sampling/mod.rs:88-109).
    probs = jax.nn.softmax(logits, axis=-1)
    top_probs, top_idx = jax.lax.top_k(probs, k)  # (..., k) sorted desc

    if 0.0 < top_p < 1.0:
        cum_excl = jnp.cumsum(top_probs, axis=-1) - top_probs
        keep = cum_excl < top_p  # first entry always kept (0 < top_p)
        top_probs = jnp.where(keep, top_probs, 0.0)

    # categorical over the (renormalization-free) weights via Gumbel trick
    gumbel = jax.random.gumbel(rng, top_probs.shape, dtype=jnp.float32)
    scores = jnp.where(top_probs > 0.0, jnp.log(top_probs) + gumbel, -jnp.inf)
    choice = jnp.argmax(scores, axis=-1)
    return jnp.take_along_axis(
        top_idx, choice[..., None], axis=-1
    ).squeeze(-1).astype(jnp.int32)


class RowSampling(NamedTuple):
    """Per-row DEVICE sampling parameters — the dynamic counterpart of
    the static `SamplingArgs`. Carried in the decode state so ONE
    compiled decode program serves mixed per-request sampling configs
    (the reference compiles nothing, but fixes one SamplingArgs per
    batch, static_batch.rs:29-63; the round-3 batcher matched that and
    VERDICT #4 asked for per-request params as device operands).

    temp/top_p/rep_pen: (B,) f32; top_k: (B,) int32 (<=0 means "all").
    """

    temp: jnp.ndarray
    top_p: jnp.ndarray
    top_k: jnp.ndarray
    rep_pen: jnp.ndarray

    @staticmethod
    def broadcast(args: "SamplingArgs", batch: int) -> "RowSampling":
        return RowSampling(
            temp=jnp.full((batch,), args.temp, jnp.float32),
            top_p=jnp.full((batch,), args.top_p, jnp.float32),
            top_k=jnp.full((batch,), args.top_k, jnp.int32),
            rep_pen=jnp.full(
                (batch,), args.repetition_penalty, jnp.float32
            ),
        )

    @staticmethod
    def row_vector(args: "SamplingArgs") -> "np.ndarray":
        """(4,) f32 [temp, top_p, top_k, rep_pen] — the admission-prefill
        operand form (engine.prefill_row splices it into the state)."""
        import numpy as np

        return np.array(
            [args.temp, args.top_p, float(args.top_k),
             args.repetition_penalty],
            np.float32,
        )

    def set_rows(self, row0, vecs: jnp.ndarray) -> "RowSampling":
        """Splice (k, 4) f32 row vectors into rows [row0, row0+k)."""
        upd = jax.lax.dynamic_update_slice
        return RowSampling(
            temp=upd(self.temp, vecs[:, 0], (row0,)),
            top_p=upd(self.top_p, vecs[:, 1], (row0,)),
            top_k=upd(self.top_k, vecs[:, 2].astype(jnp.int32), (row0,)),
            rep_pen=upd(self.rep_pen, vecs[:, 3], (row0,)),
        )


def split_row_keys(keys: jnp.ndarray) -> tuple:
    """Advance per-row PRNG chains: (B, 2) uint32 keys -> (next, frame),
    each (B, 2). The dynamic-sampling engines keep one key chain PER ROW
    so a request's draw sequence depends only on its own seed and frame
    count — deterministic regardless of co-tenant rows."""
    both = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
    return both[:, 0], both[:, 1]


def sample_top_k_top_p_dynamic(
    logits: jnp.ndarray,
    keys: jnp.ndarray,
    *,
    temp: jnp.ndarray,
    top_p: jnp.ndarray,
    top_k: jnp.ndarray,
    k_max: int,
) -> jnp.ndarray:
    """Per-row dynamic-parameter sampling: logits (B, V), keys (B, 2)
    uint32, temp/top_p (B,) f32, top_k (B,) i32 -> (B,) int32.

    Same semantics as `sample_top_k_top_p` with every knob a device
    operand: temp <= 1e-7 rows take argmax; top_k <= 0 or > k_max means
    k_max; top_p outside (0, 1) disables the nucleus mask. k_max bounds
    the static `lax.top_k` width (the engine passes the vocab/codebook
    size cap)."""
    logits = logits.astype(jnp.float32)
    vocab = logits.shape[-1]
    k = min(k_max, vocab)

    t = jnp.maximum(temp, 1e-6)[:, None]
    probs = jax.nn.softmax(logits / t, axis=-1)
    top_probs, top_idx = jax.lax.top_k(probs, k)  # (B, k) sorted desc

    k_eff = jnp.where((top_k <= 0) | (top_k > k), k, top_k)  # (B,)
    keep = jnp.arange(k)[None, :] < k_eff[:, None]
    top_probs = jnp.where(keep, top_probs, 0.0)

    p_eff = jnp.where((top_p <= 0.0) | (top_p >= 1.0), 1.0, top_p)
    cum_excl = jnp.cumsum(top_probs, axis=-1) - top_probs
    top_probs = jnp.where(cum_excl < p_eff[:, None], top_probs, 0.0)

    gumbel = jax.vmap(
        lambda kk: jax.random.gumbel(kk, (k,), dtype=jnp.float32)
    )(keys)
    scores = jnp.where(
        top_probs > 0.0, jnp.log(top_probs) + gumbel, -jnp.inf
    )
    choice = jnp.argmax(scores, axis=-1)
    sampled = jnp.take_along_axis(
        top_idx, choice[:, None], axis=-1
    ).squeeze(-1)
    return jnp.where(
        temp <= 1e-7, top_idx[:, 0], sampled
    ).astype(jnp.int32)


def legacy_pad_eos_sample(
    pad_logit: jnp.ndarray,
    eos_logit: jnp.ndarray,
    pad_id: int,
    eos_id: int,
    rng: jax.Array,
) -> jnp.ndarray:
    """Two-way PAD vs <|im_end|> softmax draw for Fish <=1.4 slow heads
    (reference: lm/sampling/mod.rs:8-26). Shapes: scalars or (B,)."""
    m = jnp.maximum(pad_logit, eos_logit)
    exp_pad = jnp.exp(pad_logit - m)
    exp_eos = jnp.exp(eos_logit - m)
    p_pad = exp_pad / (exp_pad + exp_eos)
    u = jax.random.uniform(rng, jnp.shape(p_pad))
    return jnp.where(u < p_pad, pad_id, eos_id).astype(jnp.int32)


def legacy_pad_eos_sample_rows(
    pad_logit: jnp.ndarray,
    eos_logit: jnp.ndarray,
    pad_id: int,
    eos_id: int,
    keys: jnp.ndarray,
) -> jnp.ndarray:
    """legacy_pad_eos_sample with one PRNG key per row: (B,) logits,
    (B, 2) uint32 keys."""
    m = jnp.maximum(pad_logit, eos_logit)
    exp_pad = jnp.exp(pad_logit - m)
    exp_eos = jnp.exp(eos_logit - m)
    p_pad = exp_pad / (exp_pad + exp_eos)
    u = jax.vmap(lambda k: jax.random.uniform(k, ()))(keys)
    return jnp.where(u < p_pad, pad_id, eos_id).astype(jnp.int32)


# --------------------------------------------------------------------------
# Sliding-window repetition penalty
# --------------------------------------------------------------------------


class RepPenWindow(NamedTuple):
    """Ring buffer of recently sampled tokens, one row per (batch, codebook).

    tokens: (..., window) int32, initialized to -1 (matches nothing).
    ptr: () int32, next write slot (shared across rows: all rows advance
    once per frame).
    """

    tokens: jnp.ndarray
    ptr: jnp.ndarray

    @staticmethod
    def init(shape_prefix: tuple, window: int) -> "RepPenWindow":
        return RepPenWindow(
            tokens=jnp.full(shape_prefix + (window,), -1, dtype=jnp.int32),
            ptr=jnp.zeros((), dtype=jnp.int32),
        )

    def push(self, new_tokens: jnp.ndarray) -> "RepPenWindow":
        """Insert one token per row at the current slot. new_tokens: (...)."""
        window = self.tokens.shape[-1]
        onehot = jnp.arange(window, dtype=jnp.int32) == self.ptr
        tokens = jnp.where(onehot, new_tokens[..., None], self.tokens)
        return RepPenWindow(tokens=tokens, ptr=(self.ptr + 1) % window)

    def penalize(self, logits: jnp.ndarray, penalty: float) -> jnp.ndarray:
        """Divide logits of tokens present in the window by `penalty`.

        logits: (..., V) where the leading dims match self.tokens' prefix.
        Plain division regardless of sign, matching the reference
        (rep_pen.rs:63-66: logits.broadcast_div(penalty_mask)).
        """
        if penalty == 1.0:
            return logits
        vocab = logits.shape[-1]
        vocab_ids = jnp.arange(vocab, dtype=jnp.int32)
        # (..., W, V) equality reduced over W -> (..., V) membership
        member = jnp.any(
            self.tokens[..., :, None] == vocab_ids, axis=-2
        )
        divisor = jnp.where(member, jnp.float32(penalty), jnp.float32(1.0))
        return (logits.astype(jnp.float32) / divisor).astype(logits.dtype)

    def penalize_rows(
        self, logits: jnp.ndarray, penalty: jnp.ndarray
    ) -> jnp.ndarray:
        """penalize with a per-row device penalty: logits (B, V),
        penalty (B,) f32 (1.0 rows are untouched)."""
        vocab = logits.shape[-1]
        vocab_ids = jnp.arange(vocab, dtype=jnp.int32)
        member = jnp.any(self.tokens[..., :, None] == vocab_ids, axis=-2)
        pen = jnp.broadcast_to(
            penalty.reshape(penalty.shape + (1,) * (logits.ndim - 1)),
            logits.shape,
        )
        divisor = jnp.where(member, pen, jnp.float32(1.0))
        return (logits.astype(jnp.float32) / divisor).astype(logits.dtype)


# Rep-pen window sizes (reference: single_batch.rs:50 / static_batch.rs:47)
SINGLE_STREAM_REP_PEN_WINDOW = 16
BATCHED_REP_PEN_WINDOW = 12
