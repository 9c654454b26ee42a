"""Pallas TPU kernel: fused GQA decode attention + in-place KV cache update.

This is the "flash-decode" op the BASELINE north star names, replacing the
reference's CUDA repeat_kv kernel + SDPA chain (reference:
candle-gqa-kernels/src/unary.cu, lm/dual_ar.rs:252-343) AND our previous
XLA lowering of the same step. Per layer and batch row it fuses what XLA
runs as ~8 separate fusions (two cache scatters, mask build, QK einsum,
masked softmax, PV einsum) into one kernel, and — crucially for the
while-loop decode — updates the full (L, B, KV, S, hd) cache buffers via
`input_output_aliases`, which guarantees in-place carry updates. The XLA
path's scatter chain intermittently defeats while-carry aliasing and
shows up as full-cache device copies (~0.26 ms/frame, ~11% of the decode
step — docs/TPU_NOTES.md #7).

Layout notes: head_dim=64 lanes and S up to 4096 keep one layer's cache
row (KV=2, S, 64) at <=1 MB bf16, comfortably within VMEM, so the kernel
reads the whole row per grid step (the attention must read it anyway).
Repeated KV heads are never materialized: each KV head's q-group does its
own (group, S) matmul.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(layer_ref, q_ref, kn_ref, vn_ref, pos_ref, ck_ref, cv_ref,
            attn_ref, cko_ref, cvo_ref, *, n_heads: int, n_kv: int,
            scale: float):
    """One (layer, batch-row) block.

    layer_ref: (1,) scalar-prefetch (consumed by the index maps only);
    q_ref: (1, H, hd); kn/vn: (1, KV, hd); pos_ref: (B, 1) SMEM (full
    array, indexed by the grid row); ck/cv (aliased in->out):
    (1, 1, KV, S, hd); attn_ref: (1, H, hd).
    """
    del layer_ref
    pos = pos_ref[pl.program_id(0), 0]
    group = n_heads // n_kv
    s = ck_ref.shape[3]

    # Insert the new K/V at this row's position as a masked full-block
    # merge: Mosaic cannot store at a dynamic sublane offset ("index in
    # dimension 3 must be a multiple of 8"), and the aliased VMEM block is
    # written back in full regardless, so the select costs nothing extra.
    write_sel = (
        jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0) == pos
    )  # (S, 1)
    valid = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1) <= pos  # (1, S)

    for g in range(n_kv):
        kg = jnp.where(write_sel, kn_ref[0, g, :][None], ck_ref[0, 0, g, :, :])
        vg = jnp.where(write_sel, vn_ref[0, g, :][None], cv_ref[0, 0, g, :, :])
        cko_ref[0, 0, g, :, :] = kg
        cvo_ref[0, 0, g, :, :] = vg

        qg = q_ref[0, g * group : (g + 1) * group, :]  # (group, hd)
        scores = (
            jnp.dot(qg, kg.T, preferred_element_type=jnp.float32) * scale
        )  # (group, S) — kg includes the new token
        scores = jnp.where(valid, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        w = jnp.exp(scores - m)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        out = jnp.dot(
            w.astype(vg.dtype), vg, preferred_element_type=jnp.float32
        )  # (group, hd)
        attn_ref[0, g * group : (g + 1) * group, :] = out.astype(
            attn_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_decode_attention(
    q: jnp.ndarray,  # (B, H, hd) post-RoPE queries
    k_new: jnp.ndarray,  # (B, KV, hd) post-RoPE new keys
    v_new: jnp.ndarray,  # (B, KV, hd)
    pos: jnp.ndarray,  # (B,) int32 write/attend position per row
    ck: jnp.ndarray,  # (L, B, KV, S, hd) full K cache (donated)
    cv: jnp.ndarray,  # (L, B, KV, S, hd) full V cache (donated)
    layer,  # () int32 — runtime scalar so ONE kernel serves all layers
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (attn (B, H, hd), ck, cv) with caches updated in place at
    [layer, :, :, pos, :]. `layer` is a scalar-prefetch operand feeding
    the cache block index map (a static layer would compile 24 distinct
    kernels; remote Mosaic compiles are minutes each)."""
    b, h, hd = q.shape
    kv = k_new.shape[1]
    l, _, _, s, _ = ck.shape
    scale = 1.0 / (hd**0.5)

    kernel = functools.partial(_kernel, n_heads=h, n_kv=kv, scale=scale)

    def cache_map(i, layer_ref):
        return (layer_ref[0], i, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, hd), lambda i, _: (i, 0, 0)),
            pl.BlockSpec((1, kv, hd), lambda i, _: (i, 0, 0)),
            pl.BlockSpec((1, kv, hd), lambda i, _: (i, 0, 0)),
            pl.BlockSpec(
                (b, 1), lambda i, _: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, 1, kv, s, hd), cache_map),
            pl.BlockSpec((1, 1, kv, s, hd), cache_map),
        ],
        out_specs=[
            pl.BlockSpec((1, h, hd), lambda i, _: (i, 0, 0)),
            pl.BlockSpec((1, 1, kv, s, hd), cache_map),
            pl.BlockSpec((1, 1, kv, s, hd), cache_map),
        ],
    )
    attn, ck_out, cv_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, hd), q.dtype),
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
        ],
        # indices count the scalar-prefetch operand: ck=5 -> out 1, cv=6 -> out 2
        input_output_aliases={5: 1, 6: 2},
        interpret=interpret,
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        q,
        k_new,
        v_new,
        pos[:, None].astype(jnp.int32),
        ck,
        cv,
    )
    return attn, ck_out, cv_out


def fused_decode_attention_sharded(
    q: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    pos: jnp.ndarray,
    ck: jnp.ndarray,
    cv: jnp.ndarray,
    layer,
    mesh,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Multi-chip variant: shard_map the per-(layer, row) kernel over the
    (dp, tp) mesh (parallel/mesh.py axes). dp splits cache/batch rows —
    each device runs the kernel on its local rows; tp splits Q and KV
    heads, which preserves the kernel's q-group-per-KV-head structure as
    long as tp divides the KV head count (tp in {1, 2} for the stock
    Fish models, mesh.py design note). The kernel needs NO cross-device
    communication — shard_map here exists purely so the Mosaic kernel
    (a per-device program GSPMD cannot partition) runs on every shard,
    instead of silently falling back to the XLA lowering whose
    while-carry aliasing failure costs ~11% of the decode step (#7)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    b, h, _ = q.shape
    kv = k_new.shape[1]
    assert b % dp == 0, f"batch {b} not divisible by dp={dp}"
    assert h % tp == 0 and kv % tp == 0, (
        f"heads ({h} q, {kv} kv) not divisible by tp={tp}; "
        "use the XLA attention for this mesh"
    )

    qs = P("dp", "tp", None)
    cs = P(None, "dp", "tp", None, None)
    fn = shard_map(
        functools.partial(fused_decode_attention, interpret=interpret),
        mesh=mesh,
        in_specs=(qs, qs, qs, P("dp"), cs, cs, P()),
        out_specs=(qs, cs, cs),
        check_vma=False,
    )
    return fn(q, k_new, v_new, pos, ck, cv, jnp.asarray(layer, jnp.int32))
