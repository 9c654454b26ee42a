"""Pallas TPU kernel: flash prefill attention for the DualAR slow stack.

The XLA prefill path (models/dual_ar.py::_layer_prefill) materializes the
full (B, KV, G, S, E) f32 score tensor in HBM and walks it several times
(max / sub-exp / sum / div — XLA does not fuse a softmax over a tensor
this size into the matmuls). For a 1024-token prompt that is ~64 MB of
score traffic per layer, several passes each: measured ~1.9 ms/layer
where the roofline for the actual operands (QKV + KV rows + weights) is
~0.4 ms. This kernel runs the standard online-softmax ("flash") scheme
instead: scores live in VMEM one (Sq_blk, E_blk) tile at a time, with
running max / normalizer / output accumulators carried in VMEM scratch
across the E-block sweep, so HBM sees only Q, the KV rows, and the
output — exactly the operands the math needs.

Masking parity with the XLA path (slow_prefill): query i sits at
absolute position offset + i; key j is attendable iff
  j <= offset + i                      (causal)
  offset + i - j < window              (max_seq_len sliding window,
                                        reference dual_ar.rs:702-712)
  j <  offset + seq_lens[row]          (right-pad masking of this
                                        prefill's own padded tail)
`offset` is a TRACED scalar (conditioning-prefix reuse changes it per
call without recompiling) and seq_lens is a per-row vector — which is
why the stock pallas flash kernels (static numpy masks) don't fit.
Masked lanes take the same finite NEG_INF bias as ops/attention.py, so
fully-masked right-pad query rows produce the same
uniform-over-least-masked behavior instead of NaNs; their outputs are
discarded by the caller either way (slow_prefill gathers last_idx).

Reference behavior replaced: prefill SDPA chain (dual_ar.rs:252-279,
masked_fill + softmax over the full score tensor) — the candle path has
the same O(S*E) HBM score traffic this kernel removes; its CUDA build
reaches for flash-attn the same way (dual_ar.rs:207-216).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9  # finite, matches ops/attention.py
_RUNNING_MIN = -1e30  # accumulator init; exp(_RUNNING_MIN - m) underflows to 0

# Score tile: (SQ_BLK, E_BLK) f32 = 512 KB VMEM. E_BLK=512 keeps the KV
# block fetch (512 x 64 bf16 = 64 KB) cheap enough that re-fetching it
# per (kv, g, q-block) costs well under the score traffic it replaces.
SQ_BLK = 256
E_BLK = 512


def _kernel(off_ref, lens_ref, q_ref, k_ref, v_ref, out_ref,
            m_s, l_s, acc_s, *, window: int, scale: float,
            sq_blk: int, e_blk: int, n_e: int):
    """One (row, kv-head, q-group, q-block, e-block) grid step.

    off_ref: (1,) scalar-prefetch traced offset; lens_ref: (B,) scalar-
    prefetch per-row real lengths; q_ref: (1, 1, sq_blk, hd);
    k_ref/v_ref: (1, 1, e_blk, hd); out_ref: (1, 1, sq_blk, hd).
    Scratch (persist across the innermost e sweep): m_s/l_s
    (sq_blk, 128) f32 running max / normalizer — logically per-query
    scalars, stored lane-replicated because 128 lanes is the Mosaic
    vreg minor dim (the layout jax's own TPU flash kernels use for
    these accumulators; a 1-lane VMEM ref risks unsupported-relayout
    compile errors) — and acc_s (sq_blk, hd) f32.
    """
    b_i = pl.program_id(0)
    q_i = pl.program_id(3)
    e_i = pl.program_id(4)

    offset = off_ref[0]
    seq_len = lens_ref[b_i]

    @pl.when(e_i == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, _RUNNING_MIN)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    # Absolute positions of this tile's queries and keys.
    q_pos = (
        offset + q_i * sq_blk
        + jax.lax.broadcasted_iota(jnp.int32, (sq_blk, 1), 0)
    )  # (sq_blk, 1)
    k_pos = (
        e_i * e_blk
        + jax.lax.broadcasted_iota(jnp.int32, (1, e_blk), 1)
    )  # (1, e_blk)

    # Whole tile above the causal diagonal -> skip the matmuls entirely.
    # (Blocks are still DMA'd; the compute+score traffic is what matters.)
    tile_live = (e_i * e_blk) <= (offset + q_i * sq_blk + sq_blk - 1)

    @pl.when(tile_live)
    def _compute():
        q = q_ref[0, 0]  # (sq_blk, hd)
        k = k_ref[0, 0]  # (e_blk, hd)
        v = v_ref[0, 0]
        scores = (
            jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        )  # (sq_blk, e_blk) f32
        allowed = (
            (k_pos <= q_pos)
            & (q_pos - k_pos < window)
            & (k_pos < offset + seq_len)
        )
        scores = jnp.where(allowed, scores, NEG_INF)

        m_prev = m_s[...][:, :1]  # (sq_blk, 1) from lane-replicated store
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)  # (sq_blk, 1)
        w = jnp.exp(scores - m_new)  # (sq_blk, e_blk) f32
        # Mirror ops/attention.py: the PV matmul consumes activation-dtype
        # weights (weights.astype(v.dtype)); accumulate in f32.
        pv = jnp.dot(
            w.astype(v.dtype), v, preferred_element_type=jnp.float32
        )  # (sq_blk, hd)
        lanes = m_s.shape[-1]
        m_s[...] = jnp.broadcast_to(m_new, (m_new.shape[0], lanes))
        l_new = l_s[...][:, :1] * alpha + jnp.sum(w, axis=-1, keepdims=True)
        l_s[...] = jnp.broadcast_to(l_new, (l_new.shape[0], lanes))
        acc_s[...] = acc_s[...] * alpha + pv

    @pl.when(e_i == n_e - 1)
    def _finalize():
        # l is >= exp(0) = 1 whenever any key was attendable; fully-masked
        # rows (possible only in the discarded right-pad region when every
        # key is NEG_INF) still have l = sum of exp(score - m) = e_count
        # terms of 1.0 at the running max, so no division guard is needed.
        out_ref[0, 0] = (acc_s[...] / l_s[...][:, :1]).astype(out_ref.dtype)


def flash_prefill_supported(
    s_pad: int, kv_extent: int, n_head: int, n_kv: int, head_dim: int
) -> bool:
    """Static eligibility: block divisibility (engine buckets are powers
    of two so any s_pad >= 16 / extent >= 16 divides or is divided by the
    tile sizes) and an even lane count."""
    sq = min(SQ_BLK, s_pad)
    eb = min(E_BLK, kv_extent)
    if s_pad % sq or kv_extent % eb:
        return False
    if n_head % n_kv:
        return False
    return head_dim % 8 == 0


@functools.partial(
    jax.jit, static_argnames=("window", "interpret")
)
def flash_prefill_attention(
    q: jnp.ndarray,  # (B, H, S_pad, hd) post-RoPE queries
    k: jnp.ndarray,  # (B, KV, E, hd) cache rows incl. this chunk's keys
    v: jnp.ndarray,  # (B, KV, E, hd)
    offset,  # () int32 traced: conditioning-prefix length
    seq_lens: jnp.ndarray,  # (B,) int32 real lengths of this chunk
    window: int,  # cfg.max_seq_len sliding window
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, H, S_pad, hd) — drop-in for the gqa_attention call in
    _layer_prefill (same mask semantics, softmax f32, bf16 PV weights)."""
    b, h, s_pad, hd = q.shape
    kv = k.shape[1]
    e = k.shape[2]
    group = h // kv
    scale = 1.0 / (hd**0.5)

    sq_blk = min(SQ_BLK, s_pad)
    e_blk = min(E_BLK, e)
    n_q = s_pad // sq_blk
    n_e = e // e_blk

    kernel = functools.partial(
        _kernel,
        window=window,
        scale=scale,
        sq_blk=sq_blk,
        e_blk=e_blk,
        n_e=n_e,
    )

    # q viewed as (B, KV*G, S, hd): head index = kv_i * group + g_i.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # offset, seq_lens
        grid=(b, kv, group, n_q, n_e),
        in_specs=[
            pl.BlockSpec(
                (1, 1, sq_blk, hd),
                lambda bi, ki, gi, qi, ei, *_: (bi, ki * group + gi, qi, 0),
            ),
            pl.BlockSpec(
                (1, 1, e_blk, hd),
                lambda bi, ki, gi, qi, ei, *_: (bi, ki, ei, 0),
            ),
            pl.BlockSpec(
                (1, 1, e_blk, hd),
                lambda bi, ki, gi, qi, ei, *_: (bi, ki, ei, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, sq_blk, hd),
            lambda bi, ki, gi, qi, ei, *_: (bi, ki * group + gi, qi, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((sq_blk, 128), jnp.float32),  # running max
            pltpu.VMEM((sq_blk, 128), jnp.float32),  # running normalizer
            pltpu.VMEM((sq_blk, hd), jnp.float32),   # output accumulator
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "arbitrary", "arbitrary", "arbitrary", "arbitrary",
                "arbitrary",
            ),
        ),
        interpret=interpret,
    )(
        jnp.asarray(offset, jnp.int32).reshape(1),
        seq_lens.astype(jnp.int32),
        q,
        k,
        v,
    )
    return out
