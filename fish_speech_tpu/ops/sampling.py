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


# Rep-pen window sizes (reference: single_batch.rs:50 / static_batch.rs:47)
SINGLE_STREAM_REP_PEN_WINDOW = 16
BATCHED_REP_PEN_WINDOW = 12
