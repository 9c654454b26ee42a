"""Pallas TPU kernel: the ENTIRE slow-stack decode step in one kernel.

Motivation (profiled, round 3): one decode frame spends ~1.42 ms of
device time in the slow stack as ~287 separate XLA fusions (24 layers x
~12 ops), against a ~0.95 ms HBM roofline for its ~717 MiB of weight
reads — the gap is per-op launch overhead plus activation HBM
round-trips between fusions. This kernel runs all n_layer layers PLUS
the in-place KV-cache update, masked GQA attention, final norm, and the
(column-gathered) LM head in ONE kernel: the layer loop is the grid
dimension, so Pallas's pipeline prefetches layer l+1's ~30 MiB weight
blocks from HBM while layer l computes, and activations never leave
VMEM.

Counterpart of the reference's per-layer eager loop
(lm/dual_ar.rs:252-343, forward at :569-599) at the opposite altitude,
and the in-kernel sibling of models/dual_ar.py::slow_decode_step (the
XLA lowering it replaces for batch-1 TPU decode).

Design notes (same Mosaic constraints as ops/fast_frame_pallas.py):
  * Layer loop = sequential grid; per-layer weight windows use the grid
    index, so the pipeline double-buffers exactly one layer ahead
    (~60 MiB of weight windows in flight, within the 128 MiB VMEM).
  * Activations stay FLAT (1, lanes). Attention on flat vectors via
    constant 0/1 matrices (E aligns q lanes with their GQA KV lane,
    R sums lanes per head, P is the interleaved-RoPE pair swap); the
    per-position cos/sin lane vectors are built OUTSIDE in XLA from the
    shared rope tables (one tiny gather per step).
  * KV cache keeps the engine's standard (L, B=1, KV, S, hd) layout —
    per-layer windows are read, merged with the new K/V at row `pos`
    (masked RMW; Mosaic cannot store at dynamic sublane offsets), and
    written back through `input_output_aliases`, so the while-loop
    carry updates in place exactly like ops/attention_pallas.py.
  * Per-KV-group lane extraction (k/v lanes per group start at
    hd-multiples, not 128-multiples, so lane slicing is illegal) runs
    through constant selector matmuls — exact, entries are 0/1.
  * The epilogue (final rms_norm + gathered-head logits) runs only on
    the last grid step under pl.when.

Batched (B >= 1, round 4): the continuous batcher's decode rows run
through the same kernel — weight matmuls batch rows on the MXU, and the
KV merge + attention section loops rows statically (each row has its own
cache, position, and mask extent). Eligibility is bounded by the VMEM
cache-window budget and the per-row alignment-expansion compute
(fused_slow_step_supported).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fish_speech_tpu.config import DualARConfig

NEG_INF = float("-inf")


@functools.lru_cache(maxsize=4)
def _constants(d: int, h: int, kv: int, hd: int, qkv: int):
    """Constant matrices for flat-lane attention (see module docstring).

    Returns (E_g (KV, D, hd), R (H, D), P (QKV, QKV), Sel (KV, KV*hd, hd)):
    E_g[g] maps q lanes of group g to that group's hd KV lanes; Sel[g]
    extracts group g's hd lanes from the flat (1, KV*hd) k/v vector.
    """
    group = h // kv
    e = np.zeros((kv, d, hd), np.float32)
    for i in range(d):
        g = (i // hd) // group
        e[g, i, i % hd] = 1.0
    r = np.zeros((h, d), np.float32)
    for i in range(d):
        r[i // hd, i] = 1.0
    p = np.zeros((qkv, qkv), np.float32)
    rot_end = d + kv * hd
    for i in range(0, rot_end, 2):
        p[i + 1, i] = 1.0
        p[i, i + 1] = 1.0
    for i in range(rot_end, qkv):
        p[i, i] = 1.0
    sel = np.zeros((kv, kv * hd, hd), np.float32)
    for g in range(kv):
        for j in range(hd):
            sel[g, g * hd + j, j] = 1.0
    return e, r, p, sel


@functools.lru_cache(maxsize=4)
def _lane_maps(cfg: DualARConfig):
    """Constant per-lane (pair-index, sin-sign, is-rotated) vectors over
    the flat QKV lanes, for building position-dependent cos/sin lane
    vectors with one rope-table gather per step."""
    d, kv, hd = cfg.dim, cfg.n_local_heads, cfg.head_dim
    qkv = (cfg.n_head + 2 * kv) * hd
    rot_end = d + kv * hd
    pair = np.zeros((qkv,), np.int32)
    sign = np.zeros((qkv,), np.float32)
    rot = np.zeros((qkv,), np.float32)
    for lane in range(rot_end):
        pair[lane] = (lane % hd) // 2
        sign[lane] = 1.0 if lane % 2 else -1.0
        rot[lane] = 1.0
    return pair, sign, rot


def rope_lane_vectors(
    cfg: DualARConfig, pos: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cos_flat, sin_flat) (1, QKV) f32 at scalar position `pos`, such
    that rope(x) = x * cos_flat + (x @ P) * sin_flat reproduces
    ops/rope.py::apply_rope_interleaved on the flat q+k lane region and
    is the identity on v lanes. Runs in XLA (one rope-table row gather)."""
    cos_flat, sin_flat = rope_lane_vectors_batch(cfg, pos[None])
    return cos_flat, sin_flat


def rope_lane_vectors_batch(
    cfg: DualARConfig, pos: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cos_flat, sin_flat) (B, QKV) f32 at per-row positions (B,) —
    the batched decode step rotates each row at its own cache position."""
    from fish_speech_tpu.models.dual_ar import rope_tables

    cos, sin = rope_tables(cfg.head_dim, cfg.max_seq_len, cfg.rope_base)
    pair, sign, rot = _lane_maps(cfg)
    cos_rows = jnp.asarray(cos)[pos]  # (B, hd/2)
    sin_rows = jnp.asarray(sin)[pos]
    pair_v = jnp.asarray(pair)
    cos_flat = jnp.where(
        jnp.asarray(rot)[None, :] > 0,
        jnp.take(cos_rows, pair_v, axis=1),
        1.0,
    )
    sin_flat = jnp.asarray(sign)[None, :] * jnp.take(
        sin_rows, pair_v, axis=1
    )
    return cos_flat, sin_flat


def _rms_flat(x, w_row, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * w_row.astype(jnp.float32)).astype(x.dtype)


def _make_kernel(cfg: DualARConfig, head_width: int, s_max: int,
                 quantized: bool, b_rows: int = 1):
    d, h, kv, hd = cfg.dim, cfg.n_head, cfg.n_local_heads, cfg.head_dim
    n_layers = cfg.n_layer
    eps = cfg.norm_eps
    scale = 1.0 / (hd**0.5)
    q_sz = h * hd
    kv_sz = kv * hd

    def kernel(
        x0_ref,       # (B, D) embedded step input
        an_ref,       # (L, D) attention_norm (whole)
        wqkv_ref,     # (1, D, QKV) this layer's block (int8 when quantized)
        wo_ref,       # (1, D, D)
        fn_ref,       # (L, D) ffn_norm (whole)
        w1_ref,       # (1, D, F)
        w3_ref,       # (1, D, F)
        w2_ref,       # (1, F, D)
        *rest,
    ):
        # optional per-layer scale blocks follow the weights when the
        # stack is int8-quantized (ops/quant.py per-output-channel)
        if quantized:
            (sqkv_ref, so_ref, s1_ref, s3_ref, s2_ref) = rest[:5]
            rest = rest[5:]
        else:
            sqkv_ref = so_ref = s1_ref = s3_ref = s2_ref = None
        (
            norm_ref,     # (1, D) final norm
            head_ref,     # (D, W) gathered LM head
            e_ref,        # (KV, D, hd) act dtype
            r_ref,        # (H, D) f32
            p_ref,        # (QKV, QKV) act dtype
            sel_ref,      # (KV, KV*hd, hd) act dtype
            cosf_ref,     # (B, QKV) f32 — per-row position rotation
            sinf_ref,     # (B, QKV) f32
            pos_ref,      # (1, B) SMEM int32 — per-row write positions
            ck_ref,       # (1, B, KV, S, hd) aliased in
            cv_ref,       # (1, B, KV, S, hd) aliased in
            logits_ref,   # (B, W) f32 out (constant window)
            hidden_ref,   # (B, D) out (constant window)
            cko_ref,      # (1, B, KV, S, hd) aliased out
            cvo_ref,      # (1, B, KV, S, hd) aliased out
            x_s,          # VMEM scratch (B, D): activation across layers
        ) = rest

        def _wdot(xv, w_ref, s_ref):
            """x @ w mirroring ops/quant.py::matmul: int8 weights convert
            at the dot's operand read, then per-channel rescale."""
            if not quantized:
                return jnp.dot(
                    xv, w_ref[0], preferred_element_type=jnp.float32
                ).astype(xv.dtype)
            y = jnp.dot(
                xv, w_ref[0].astype(xv.dtype),
                preferred_element_type=jnp.float32,
            ).astype(xv.dtype)
            return y * s_ref[0, 0, :].astype(xv.dtype)

        l = pl.program_id(0)
        r_m = r_ref[...]
        x = jnp.where(l == 0, x0_ref[...], x_s[...])  # (B, D)

        # attention_norm row for this layer: whole-table row select (the
        # (1, D) row block over an (L, D) array is illegal when L is not
        # 8-divisible; L=24 is, but the masked select costs nothing and
        # keeps the kernel layout-agnostic)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (n_layers, 1), 0)
        row_sel = iota_l == l  # (L, 1)

        def _row(ref):
            return jnp.sum(
                jnp.where(row_sel, ref[...].astype(jnp.float32), 0.0),
                axis=0,
                keepdims=True,
            )

        hN = _rms_flat(x, _row(an_ref)[0], eps)
        qkv_f = _wdot(hN, wqkv_ref, sqkv_ref)  # (B, QKV)
        perm = jnp.dot(qkv_f, p_ref[...], preferred_element_type=jnp.float32)
        rot = (
            qkv_f.astype(jnp.float32) * cosf_ref[...] + perm * sinf_ref[...]
        ).astype(qkv_f.dtype)
        q_flat = rot[:, :q_sz]                    # (B, D)
        k_flat = rot[:, q_sz : q_sz + kv_sz]      # (B, KV*hd)
        v_flat = qkv_f[:, q_sz + kv_sz :]         # (B, KV*hd)

        # Attention per row: each row has its own cache, write position,
        # and mask extent (static Python loop — b is a compile-time
        # index, so every slice below is a legal static sublane slice).
        # The weight matmuls above stay batched on the MXU; only the
        # KV merge + flat-lane alignment expansion runs per row.
        attn_rows = []
        for b in range(b_rows):
            pos_b = pos_ref[0, b]
            write_sel = (
                jax.lax.broadcasted_iota(jnp.int32, (s_max, 1), 0) == pos_b
            )  # (S, 1)
            valid = (
                jax.lax.broadcasted_iota(jnp.int32, (h, s_max), 1) <= pos_b
            )  # (H, S)
            k_aligned = jnp.zeros((d, s_max), jnp.float32)
            v_aligned = jnp.zeros((d, s_max), jnp.float32)
            for g in range(kv):
                kg_new = jnp.dot(
                    k_flat[b : b + 1].astype(jnp.float32),
                    sel_ref[g].astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                ).astype(ck_ref.dtype)  # (1, hd)
                vg_new = jnp.dot(
                    v_flat[b : b + 1].astype(jnp.float32),
                    sel_ref[g].astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                ).astype(cv_ref.dtype)
                # masked merge in f32 (bf16 sublane broadcasts are
                # rejected by Mosaic; exact — values already rounded)
                kg = jnp.where(
                    write_sel, kg_new.astype(jnp.float32),
                    ck_ref[0, b, g, :, :].astype(jnp.float32),
                ).astype(ck_ref.dtype)  # (S, hd)
                vg = jnp.where(
                    write_sel, vg_new.astype(jnp.float32),
                    cv_ref[0, b, g, :, :].astype(jnp.float32),
                ).astype(cv_ref.dtype)
                cko_ref[0, b, g, :, :] = kg
                cvo_ref[0, b, g, :, :] = vg
                k_aligned = k_aligned + jnp.dot(
                    e_ref[g].astype(jnp.float32), kg.T.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )  # (D, S)
                v_aligned = v_aligned + jnp.dot(
                    e_ref[g].astype(jnp.float32), vg.T.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )

            prod = (
                q_flat[b : b + 1].T.astype(jnp.float32) * k_aligned
            )  # (D, S)
            scores = (
                jnp.dot(r_m, prod, preferred_element_type=jnp.float32)
                * scale
            )  # (H, S)
            scores = jnp.where(valid, scores, NEG_INF)
            w = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
            w = w / jnp.sum(w, axis=-1, keepdims=True)
            # gqa_attention rounds weights to v.dtype before PV — mirror
            w = w.astype(x.dtype).astype(jnp.float32)
            w_lanes = jnp.dot(r_m.T, w, preferred_element_type=jnp.float32)
            attn_rows.append(
                jnp.sum(w_lanes * v_aligned, axis=-1)[None, :].astype(
                    x.dtype
                )  # (1, D)
            )
        attn_flat = (
            jnp.concatenate(attn_rows, axis=0)
            if b_rows > 1
            else attn_rows[0]
        )  # (B, D)

        x = x + _wdot(attn_flat, wo_ref, so_ref)
        h2 = _rms_flat(x, _row(fn_ref)[0], eps)
        if quantized:
            # mirror ops/quant.py::matmul + the XLA fast path's
            # silu(f32-cast) ordering: the scaled bf16 product is what
            # silu sees
            gate = jax.nn.silu(
                _wdot(h2, w1_ref, s1_ref).astype(jnp.float32)
            ).astype(x.dtype)
        else:
            gate = jax.nn.silu(
                jnp.dot(h2, w1_ref[0], preferred_element_type=jnp.float32)
            ).astype(x.dtype)
        w3h = _wdot(h2, w3_ref, s3_ref)
        x = x + _wdot(gate * w3h, w2_ref, s2_ref)
        x_s[...] = x

        @pl.when(l == n_layers - 1)
        def _epilogue():
            slow_out = _rms_flat(x, norm_ref[0, :], eps)
            logits_ref[...] = jnp.dot(
                slow_out, head_ref[...], preferred_element_type=jnp.float32
            ).astype(jnp.float32)
            hidden_ref[...] = x

    return kernel


def fused_slow_step(
    params,
    cfg: DualARConfig,
    x0: jnp.ndarray,        # (B, D) embedded input (embed_tokens output rows)
    pos: jnp.ndarray,       # (B,) int32 per-row write/attend positions
    ck: jnp.ndarray,        # (L, B, KV, S, hd) K cache (donated)
    cv: jnp.ndarray,        # (L, B, KV, S, hd) V cache (donated)
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (logits (B, W) f32, hidden (B, D), ck, cv) — the fused
    equivalent of models/dual_ar.py::slow_decode_step, with the caches
    updated in place at [:, b, :, pos[b], :] per row. B >= 1: the weight
    matmuls batch rows on the MXU and the per-layer weight blocks are
    streamed ONCE per step shared by all rows (the XLA path's ~287
    fusions collapse to one kernel either way; at B > 1 the win is the
    launch/fusion overhead plus activation residency, since XLA also
    shares weight reads across rows)."""
    d, h, kv, hd = cfg.dim, cfg.n_head, cfg.n_local_heads, cfg.head_dim
    qkv = (h + 2 * kv) * hd
    lay = cfg.n_layer
    b = x0.shape[0]
    s_max = ck.shape[3]
    act_dtype = x0.dtype
    slow = params["slow"]
    quantized = isinstance(slow["wqkv"], dict)
    if quantized:
        wq = {k: slow[k]["q"] for k in ("wqkv", "wo", "w1", "w3", "w2")}
        ws = {k: slow[k]["s"] for k in ("wqkv", "wo", "w1", "w3", "w2")}
    else:
        wq = {k: slow[k] for k in ("wqkv", "wo", "w1", "w3", "w2")}
        ws = None
    f_dim = wq["w1"].shape[2]
    head = params["output"]
    head_width = head.shape[1]

    e_np, r_np, p_np, sel_np = _constants(d, h, kv, hd, qkv)
    cos_flat, sin_flat = rope_lane_vectors_batch(cfg, pos)

    kernel = _make_kernel(cfg, head_width, s_max, quantized, b_rows=b)

    const2 = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    layer3 = lambda i: (i, 0, 0)
    cache_map = lambda i: (i, 0, 0, 0, 0)
    in_specs = [
        pl.BlockSpec((b, d), const2),                    # x0
        pl.BlockSpec((lay, d), const2),                  # attention_norm
        pl.BlockSpec((1, d, qkv), layer3),               # wqkv
        pl.BlockSpec((1, d, d), layer3),                 # wo
        pl.BlockSpec((lay, d), const2),                  # ffn_norm
        pl.BlockSpec((1, d, f_dim), layer3),             # w1
        pl.BlockSpec((1, d, f_dim), layer3),             # w3
        pl.BlockSpec((1, f_dim, d), layer3),             # w2
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, qkv), layer3),           # wqkv scales
            pl.BlockSpec((1, 1, d), layer3),             # wo scales
            pl.BlockSpec((1, 1, f_dim), layer3),         # w1 scales
            pl.BlockSpec((1, 1, f_dim), layer3),         # w3 scales
            pl.BlockSpec((1, 1, d), layer3),             # w2 scales
        ]
    in_specs += [
        pl.BlockSpec((1, d), const2),                    # final norm
        pl.BlockSpec((d, head_width), const2),           # gathered head
        pl.BlockSpec((kv, d, hd), const3),               # E_g
        pl.BlockSpec((h, d), const2),                    # R
        pl.BlockSpec((qkv, qkv), const2),                # P
        pl.BlockSpec((kv, kv * hd, hd), const3),         # Sel
        pl.BlockSpec((b, qkv), const2),                  # cos lanes
        pl.BlockSpec((b, qkv), const2),                  # sin lanes
        pl.BlockSpec((1, b), const2, memory_space=pltpu.SMEM),  # pos
        pl.BlockSpec((1, b, kv, s_max, hd), cache_map),  # ck
        pl.BlockSpec((1, b, kv, s_max, hd), cache_map),  # cv
    ]
    out_specs = [
        pl.BlockSpec((b, head_width), const2),           # logits
        pl.BlockSpec((b, d), const2),                    # hidden
        pl.BlockSpec((1, b, kv, s_max, hd), cache_map),  # ck out
        pl.BlockSpec((1, b, kv, s_max, hd), cache_map),  # cv out
    ]
    ck_idx = len(in_specs) - 2  # position of ck among the operands
    operands = [
        x0,
        slow["attention_norm"],
        wq["wqkv"],
        wq["wo"],
        slow["ffn_norm"],
        wq["w1"],
        wq["w3"],
        wq["w2"],
    ]
    if quantized:
        operands += [ws["wqkv"], ws["wo"], ws["w1"], ws["w3"], ws["w2"]]
    operands += [
        params["norm"][None, :],
        head,
        jnp.asarray(e_np, act_dtype),
        jnp.asarray(r_np, jnp.float32),
        jnp.asarray(p_np, act_dtype),
        jnp.asarray(sel_np, act_dtype),
        cos_flat,
        sin_flat,
        pos.astype(jnp.int32).reshape(1, b),
        ck,
        cv,
    ]
    logits, hidden, ck_out, cv_out = pl.pallas_call(
        kernel,
        grid=(lay,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, head_width), jnp.float32),
            jax.ShapeDtypeStruct((b, d), act_dtype),
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((b, d), act_dtype)],
        input_output_aliases={ck_idx: 2, ck_idx + 1: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return logits, hidden, ck_out, cv_out


def fused_slow_step_supported(
    cfg: DualARConfig, params, batch: int, cache_len: int = 0
) -> bool:
    """Static eligibility: even head_dim (paired RoPE); any batch whose
    per-layer cache window fits the VMEM budget next to the double-
    buffered weight blocks. Both bf16/f32 and int8-quantized
    (ops/quant.py) slow stacks are supported — int8 halves the kernel's
    HBM weight traffic, which is exactly what this HBM-bound kernel is
    limited by.

    The per-row attention section costs ~2*D*hd*S MACs of flat-lane
    alignment expansion per row per layer, so large batch x deep cache
    combinations shift the kernel from HBM-bound to MXU-bound; the
    B*S bound below keeps the expansion under ~15% of the weight-stream
    time on v5e (measured shapes: B=16 x S=512 serving config)."""
    if cfg.head_dim % 2:
        return False
    if batch == 1:
        return True
    # batched: cache windows (B, KV, S, hd) x2 (k,v) x2 (in,out) must sit
    # in VMEM beside ~2x30 MiB of weight windows; and bound the per-row
    # expansion compute
    s = cache_len or cfg.max_seq_len
    win_bytes = 4 * batch * cfg.n_local_heads * s * cfg.head_dim * 2
    if win_bytes > 48 * 1024 * 1024:
        return False
    if batch * s > 16384:
        return False
    return True
