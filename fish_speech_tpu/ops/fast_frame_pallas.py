"""Pallas TPU kernel: the ENTIRE fast-codebook frame in one kernel.

Motivation (measured, round 3): the DualAR fast transformer re-reads its
~118 MiB of weights once per codebook — 8x per frame for Fish 1.5 — which
is ~57% of decode HBM traffic (0.96 of 1.68 GB/frame) and ~1.1 ms of the
2.66 ms frame. XLA streams weights from HBM for every matmul; there is
no cross-iteration VMEM residency. This kernel runs all num_codebooks
steps x n_fast_layer layers PLUS rep-pen, top-k/top-p gumbel sampling,
and the next-step embedding inside ONE kernel whose weights are fetched
into VMEM once per frame.

Counterpart of the reference's per-codebook host loop
(lm/generate/single_batch.rs:151-184, dual_ar.rs:638-673) at the
opposite altitude: the reference round-trips to the host per codebook;
here the whole frame never leaves VMEM.

Mosaic constraints shape the design (all probed on the real toolchain):
  * The codebook loop is the GRID dimension (sequential "arbitrary"
    semantics), NOT a Python unroll: an unrolled loop re-uses every
    weight load 8x, so the register allocator kept all ~118 MiB of
    loads live and spilled a second copy of the weights to VMEM
    (measured: "register allocator spill slots 123.07M" -> 248 MiB
    total, OOM). With the grid, every weight window has a CONSTANT
    index map — Pallas fetches it once and never re-copies — and each
    grid step's loads die within the step.
  * Frame state crosses grid steps in VMEM scratch: the activation row,
    the per-layer K/V history (C positions), and the growing token
    vector accumulates in the (constant-index) output window itself.
  * No reshape between sublane/lane layouts -> activations stay FLAT
    (1, lanes) everywhere. Attention runs on flat vectors via constant
    0/1 matrices: E (D, KV*hd) aligns each q lane with its GQA KV lane,
    R (H, D) sums lanes per head, and RoPE's pair rotation is a constant
    permutation matmul P with per-position cos/sin lane vectors. E and P
    are cast to the activation dtype (exact: entries are 0/1, and P/E
    merely select already-rounded activation values).
  * No sort/top_k -> sampling reproduces ops/sampling.py's exact math
    rank-wise: j-tiled (V, tile) comparisons give each token's sort rank
    (ties by index, like lax.top_k) and the exclusive cumulative mass of
    strictly-greater tokens; top-k/top-p keep-masks follow, and the
    categorical draw reuses the SAME per-slot gumbel vector the XLA
    sampler would draw (passed in, generated with the same rng splits).

Single-row kernel (B == 1): the single-stream serving/bench path is
where the 8x weight re-read dominates; batched engines amortize fast
weights across rows (the re-read is shared by all rows per step) so they
keep the XLA path.
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
    """Constant matrices for flat-lane attention (see module docstring)."""
    group = h // kv
    # E: (D, KV*hd) — q lane i corresponds to kv head (i//hd)//group,
    # lane-in-head i%hd
    e = np.zeros((d, kv * hd), np.float32)
    for i in range(d):
        g = (i // hd) // group
        e[i, g * hd + (i % hd)] = 1.0
    # R: (H, D) — head h owns lanes [h*hd, (h+1)*hd)
    r = np.zeros((h, d), np.float32)
    for i in range(d):
        r[i // hd, i] = 1.0
    # P: (QKV, QKV) pair-swap permutation for interleaved RoPE over the
    # q+k lane region; identity elsewhere (v region is masked off by the
    # sin lane vector anyway)
    p = np.zeros((qkv, qkv), np.float32)
    rot_end = d + kv * hd  # q lanes then k lanes get rotated
    for i in range(0, rot_end, 2):
        p[i + 1, i] = 1.0
        p[i, i + 1] = 1.0
    for i in range(rot_end, qkv):
        p[i, i] = 1.0
    return e, r, p


@functools.lru_cache(maxsize=4)
def _rope_lane_tables(cfg: DualARConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Per-position cos/sin lane vectors over the flat QKV lanes.

    cos_flat[pos, lane] = cos(pos, pair) for rotated lanes, 1 for v lanes;
    sin_flat carries the interleaved sign: -sin on even, +sin on odd, 0 on
    v lanes — so rope(x) = x * cos_flat + (x @ P) * sin_flat reproduces
    ops/rope.py::apply_rope_interleaved exactly.
    """
    from fish_speech_tpu.models.dual_ar import rope_tables

    d, h, kv, hd = cfg.dim, cfg.n_head, cfg.n_local_heads, cfg.head_dim
    qkv = (h + 2 * kv) * hd
    cos, sin = rope_tables(hd, cfg.max_seq_len, cfg.rope_base)
    c = cos[: cfg.num_codebooks]  # (C, hd/2)
    s = sin[: cfg.num_codebooks]
    n_pos = c.shape[0]
    cos_flat = np.ones((n_pos, qkv), np.float32)
    sin_flat = np.zeros((n_pos, qkv), np.float32)
    rot_end = d + kv * hd
    for lane in range(rot_end):
        pair = (lane % hd) // 2
        cos_flat[:, lane] = c[:, pair]
        sin_flat[:, lane] = (1.0 if lane % 2 else -1.0) * s[:, pair]
    return cos_flat, sin_flat


def _rms_flat(x, w_row, eps):
    """rms_norm on a flat (1, D) row, mirroring ops/norms.py."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * w_row.astype(jnp.float32)).astype(x.dtype)


def _make_kernel(cfg: DualARConfig, *, temp: float, top_p: float,
                 top_k: int, penalty: float, rep_enabled: bool,
                 quantized: bool):
    d, h, kv, hd = cfg.dim, cfg.n_head, cfg.n_local_heads, cfg.head_dim
    n_layers, n_cb = cfg.n_fast_layer, cfg.num_codebooks
    cb_size = cfg.codebook_size
    eps = cfg.norm_eps
    scale = 1.0 / (hd**0.5)
    vocab = cb_size
    k_eff = min(top_k, vocab)

    def kernel(
        x0_ref,        # (1, D) slow hidden
        an_ref,        # (L, D) attention_norm
        wqkv_ref,      # (L, D, QKV) (int8 when quantized)
        wo_ref,        # (L, D, D)
        fn_ref,        # (L, D) ffn_norm
        w1_ref,        # (L, D, F)
        w3_ref,        # (L, D, F)
        w2_ref,        # (L, F, D)
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
            fnorm_ref,     # (1, D) fast_norm
            head_ref,      # (D, cb_size) block (depthwise: step's slice)
            emb_ref,       # (vocab, D) block (depthwise_wte: step's slice)
            e_ref,         # (D, KV*hd) activation dtype
            r_ref,         # (H, D) f32
            p_ref,         # (QKV, QKV) activation dtype
            cosf_ref,      # (C, QKV) f32 — per-step rows (row cb in-kernel)
            sinf_ref,      # (C, QKV) f32
            rp_ref,        # (C, W) int32 — per-step rep-pen window tokens
            gum_ref,       # (C, k_eff) f32 — per-step gumbel noise
            eos_ref,       # (1, 1) int32 is_eos
            out_ref,       # (1, C) int32 sampled tokens (constant window)
            x_s,           # VMEM scratch (1, D): activation across steps
            k_s,           # VMEM scratch (L, C, KV*hd): K history
            v_s,           # VMEM scratch (L, C, KV*hd): V history
        ) = rest

        def _wdot(xv, w_ref, s_ref, l):
            """x @ w[l] mirroring ops/quant.py::matmul (same semantics as
            slow_step_pallas._wdot): int8 weights convert at the dot's
            operand read, then per-output-channel rescale in act dtype."""
            if not quantized:
                return jnp.dot(
                    xv, w_ref[l], preferred_element_type=jnp.float32
                ).astype(xv.dtype)
            y = jnp.dot(
                xv, w_ref[l].astype(xv.dtype),
                preferred_element_type=jnp.float32,
            ).astype(xv.dtype)
            return y * s_ref[l, 0, :].astype(xv.dtype)

        cb = pl.program_id(0)
        e_m = e_ref[...]
        r_m = r_ref[...]
        p_m = p_ref[...]
        is_eos = eos_ref[0, 0] != 0
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (1, vocab), 1)
        # (C,)-lane iotas for history masking / scatter writes
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (n_cb, 1), 0)

        x = jnp.where(cb == 0, x0_ref[...], x_s[...])  # (1, D)
        # Row-select the per-step tables in-kernel: Mosaic rejects (1, n)
        # blocks over (C, n) arrays (sublane block dim must be 8-divisible
        # or full), so the whole table is resident and row cb is picked by
        # a masked sum — C <= 8 rows, negligible.
        row_sel = iota_c == cb  # (C, 1)

        def _row(ref):
            return jnp.sum(
                jnp.where(row_sel, ref[...].astype(jnp.float32), 0.0),
                axis=0,
                keepdims=True,
            )

        cosf = _row(cosf_ref)  # (1, QKV)
        sinf = _row(sinf_ref)

        for l in range(n_layers):
            hN = _rms_flat(x, an_ref[l, :], eps)
            qkv_f = _wdot(hN, wqkv_ref, sqkv_ref, l)  # (1, QKV) f32-accum
            # RoPE: P only permutes qkv_f's (already rounded) values, so
            # the activation-dtype dot is exact; combine in f32 like
            # apply_rope_interleaved, round back to activation dtype.
            perm = jnp.dot(
                qkv_f, p_m, preferred_element_type=jnp.float32
            )  # (1, QKV) f32, exact permutation of qkv_f values
            rot = (
                qkv_f.astype(jnp.float32) * cosf + perm * sinf
            ).astype(qkv_f.dtype)
            q_flat = rot[:, :d]                      # (1, D)
            k_flat = rot[:, d : d + kv * hd]         # (1, KV*hd)
            v_flat = qkv_f[:, d + kv * hd :]         # (1, KV*hd)
            # append at position cb via masked RMW (no dynamic sublane
            # stores needed)
            sel = iota_c == cb  # (C, 1)
            # Zero the history on the first step: stale rows must be
            # FINITE (not just weight-masked) because the PV sum runs
            # over all C positions and 0 * NaN = NaN. Uninitialized VMEM
            # scratch is arbitrary bits (NaN in interpret mode).
            # The select runs in f32: Mosaic rejects the bf16 (1, n) ->
            # (C, n) sublane broadcast ("Invalid input layout" on
            # vector.broadcast with the (16, 128) bf16 tiling); the f32
            # round-trip is exact because both operands already carry
            # activation-dtype-rounded values.
            k_prev = jnp.where(cb == 0, 0.0, k_s[l].astype(jnp.float32))
            v_prev = jnp.where(cb == 0, 0.0, v_s[l].astype(jnp.float32))
            k_s[l] = jnp.where(
                sel, k_flat.astype(jnp.float32), k_prev
            ).astype(x.dtype)
            v_s[l] = jnp.where(
                sel, v_flat.astype(jnp.float32), v_prev
            ).astype(x.dtype)
            ks = k_s[l]  # (C, KV*hd), rows > cb are stale/garbage
            vs = v_s[l]
            # scores (H, C): align kv lanes under each q lane, multiply,
            # sum per head
            k_aligned = jnp.dot(
                e_m, ks.T, preferred_element_type=jnp.float32
            )  # (D, C)
            prod = q_flat.T.astype(jnp.float32) * k_aligned  # (D, C)
            scores = (
                jnp.dot(r_m, prod, preferred_element_type=jnp.float32)
                * scale
            )  # (H, C)
            # causal-within-frame: only positions 0..cb are real history
            pos_ok = (
                jax.lax.broadcasted_iota(jnp.int32, (h, n_cb), 1) <= cb
            )
            scores = jnp.where(pos_ok, scores, NEG_INF)
            w = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
            w = w / jnp.sum(w, axis=-1, keepdims=True)
            # gqa_attention rounds weights to v.dtype before the PV
            # product — mirror for bit parity
            w = w.astype(x.dtype).astype(jnp.float32)
            # out lanes: expand weights back per lane, dot with aligned v
            w_lanes = jnp.dot(
                r_m.T, w, preferred_element_type=jnp.float32
            )  # (D, C)
            v_aligned = jnp.dot(
                e_m, vs.T, preferred_element_type=jnp.float32
            )  # (D, C)
            # stale rows contribute 0 weight (w == 0 there), so the sum
            # over all C positions is exact
            attn_flat = jnp.sum(w_lanes * v_aligned, axis=-1)[None, :]
            attn_flat = attn_flat.astype(x.dtype)  # (1, D)
            x = x + _wdot(attn_flat, wo_ref, so_ref, l)
            h2 = _rms_flat(x, fn_ref[l, :], eps)
            if quantized:
                # mirror ops/quant.py::matmul + the XLA path's
                # silu(f32-cast) ordering: silu sees the scaled bf16
                # product (models/dual_ar.py fast_step)
                gate = jax.nn.silu(
                    _wdot(h2, w1_ref, s1_ref, l).astype(jnp.float32)
                ).astype(x.dtype)
            else:
                gate = jax.nn.silu(
                    jnp.dot(h2, w1_ref[l], preferred_element_type=jnp.float32)
                ).astype(x.dtype)
            w3h = _wdot(h2, w3_ref, s3_ref, l)
            x = x + _wdot(gate * w3h, w2_ref, s2_ref, l)

        fast_out = _rms_flat(x, fnorm_ref[0, :], eps)  # (1, D)
        logits = jnp.dot(
            fast_out, head_ref[...], preferred_element_type=jnp.float32
        ).astype(jnp.float32)  # (1, V)

        if rep_enabled:
            win = jnp.sum(
                jnp.where(row_sel, rp_ref[...], 0), axis=0, keepdims=True
            )  # (1, W) — exactly row cb (all other rows zeroed pre-sum)
            member = jnp.any(win.T == iota_v, axis=0)[None, :]  # (1, V)
            divisor = jnp.where(member, jnp.float32(penalty), 1.0)
            logits = logits / divisor

        if temp <= 1e-7:
            m = jnp.max(logits, axis=-1, keepdims=True)
            cand = jnp.where(logits == m, iota_v, vocab)
            tok = jnp.min(cand)
        else:
            p_row = jax.nn.softmax(logits / temp, axis=-1)  # (1, V)
            pv = p_row[0, :]
            # rank/cum-mass via j-TILED comparisons: one (V, V) f32
            # materialization per step blew VMEM; 256-wide j-blocks keep
            # ~1 MB live at a time
            ti = min(256, vocab)
            rank_f = jnp.zeros((vocab, 1), jnp.float32)
            cum_f = jnp.zeros((vocab, 1), jnp.float32)
            for jb in range(0, vocab, ti):
                tw = min(ti, vocab - jb)
                pj = pv[jb : jb + tw]  # (tw,)
                iota_j = (
                    jax.lax.broadcasted_iota(jnp.int32, (vocab, tw), 1)
                    + jb
                )
                iota_i = jax.lax.broadcasted_iota(
                    jnp.int32, (vocab, tw), 0
                )
                cmp = (pj[None, :] > pv[:, None]) | (
                    (pj[None, :] == pv[:, None]) & (iota_j < iota_i)
                )  # cmp[i, j]: j sorts before i (desc, ties by index)
                cf = cmp.astype(jnp.float32)
                rank_f = rank_f + jnp.sum(cf, axis=1, keepdims=True)
                cum_f = cum_f + jnp.dot(
                    cf, pj[:, None], preferred_element_type=jnp.float32
                )
            rank = rank_f[:, 0].astype(jnp.int32)  # (V,)
            cum_excl = cum_f[:, 0]  # (V,) mass of strictly-earlier tokens
            keep = rank < k_eff
            if 0.0 < top_p < 1.0:
                keep = keep & (cum_excl < top_p)
            # same per-slot gumbel the XLA sampler draws: g[rank]
            oh = (
                jnp.clip(rank, 0, k_eff - 1)[:, None]
                == jax.lax.broadcasted_iota(jnp.int32, (vocab, k_eff), 1)
            ).astype(jnp.float32)
            g_row = _row(gum_ref)  # (1, k_eff) — this step's draws
            g_tok = jnp.dot(
                oh, g_row[0, :][:, None],
                preferred_element_type=jnp.float32,
            )[:, 0]  # (V,)
            score = jnp.where(keep, jnp.log(pv) + g_tok, NEG_INF)
            m = jnp.max(score)
            cand = jnp.where(score == m, iota_v[0, :], vocab)
            tok = jnp.min(cand)

        tok = jnp.where(is_eos, 0, tok)
        # accumulate into the (constant-window) output: zero once, then
        # set this step's lane
        acc = jnp.where(cb == 0, 0, out_ref[...])
        out_ref[...] = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, n_cb), 1) == cb,
            tok,
            acc,
        )
        # next-step input: embedding row via one-hot matmul (no
        # dynamic-index gather in Mosaic); emb_ref is already this step's
        # (vocab, D) slice when depthwise_wte.
        oh_e = (iota_v == tok).astype(emb_ref.dtype)  # (1, V)
        x_s[...] = jnp.dot(
            oh_e, emb_ref[...], preferred_element_type=jnp.float32
        ).astype(x0_ref.dtype)  # (1, D)

    return kernel


def fused_fast_frame(
    params,
    cfg: DualARConfig,
    sampling,
    hidden: jnp.ndarray,      # (1, D) slow hidden (pre-norm residual)
    rp_tokens: jnp.ndarray,   # (C, W) int32 window tokens (post-push)
    gumbel: jnp.ndarray,      # (C, k_eff) f32 — same draws the XLA path makes
    is_eos: jnp.ndarray,      # (1,) bool
    *,
    rep_enabled: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (C,) int32 codebook tokens for one frame (batch 1)."""
    d, h, kv, hd = cfg.dim, cfg.n_head, cfg.n_local_heads, cfg.head_dim
    qkv = (h + 2 * kv) * hd
    n_cb = cfg.num_codebooks
    cb_size = cfg.codebook_size
    e_np, r_np, p_np = _constants(d, h, kv, hd, qkv)
    cos_flat, sin_flat = _rope_lane_tables(cfg)
    act_dtype = hidden.dtype

    fast = params["fast"]
    quantized = isinstance(fast["wqkv"], dict)
    if quantized:
        wq = {k: fast[k]["q"] for k in ("wqkv", "wo", "w1", "w3", "w2")}
        ws = {k: fast[k]["s"] for k in ("wqkv", "wo", "w1", "w3", "w2")}
    else:
        wq = {k: fast[k] for k in ("wqkv", "wo", "w1", "w3", "w2")}
        ws = None
    lay = wq["wqkv"].shape[0]
    f_dim = wq["w1"].shape[2]
    kernel = _make_kernel(
        cfg,
        temp=sampling.temp,
        top_p=sampling.top_p,
        top_k=sampling.top_k,
        penalty=sampling.repetition_penalty,
        rep_enabled=rep_enabled,
        quantized=quantized,
    )

    # weight/constant windows: constant index maps -> fetched once,
    # resident in VMEM for the whole frame (Pallas only re-copies a
    # block when its index changes between grid steps)
    const2 = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)
    in_specs = [
        pl.BlockSpec((1, d), const2),                   # x0
        pl.BlockSpec((lay, d), const2),                 # attention_norm
        pl.BlockSpec((lay, d, qkv), const3),            # wqkv
        pl.BlockSpec((lay, d, d), const3),              # wo
        pl.BlockSpec((lay, d), const2),                 # ffn_norm
        pl.BlockSpec((lay, d, f_dim), const3),          # w1
        pl.BlockSpec((lay, d, f_dim), const3),          # w3
        pl.BlockSpec((lay, f_dim, d), const3),          # w2
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec((lay, 1, qkv), const3),        # wqkv scales
            pl.BlockSpec((lay, 1, d), const3),          # wo scales
            pl.BlockSpec((lay, 1, f_dim), const3),      # w1 scales
            pl.BlockSpec((lay, 1, f_dim), const3),      # w3 scales
            pl.BlockSpec((lay, 1, d), const3),          # w2 scales
        ]
    in_specs += [
        pl.BlockSpec((1, d), const2),                   # fast_norm
        # head: depthwise_output -> per-step column block; else constant
        pl.BlockSpec(
            (d, cb_size),
            (lambda i: (0, i)) if cfg.depthwise_output else const2,
        ),
        # embeddings: depthwise_wte -> per-step row block; else the
        # first-vocab-rows window
        pl.BlockSpec(
            (cb_size, d),
            (lambda i: (i, 0)) if cfg.depthwise_wte else const2,
        ),
        pl.BlockSpec((d, kv * hd), const2),             # E
        pl.BlockSpec((h, d), const2),                   # R
        pl.BlockSpec((qkv, qkv), const2),               # P
        pl.BlockSpec((n_cb, qkv), const2),              # cos table
        pl.BlockSpec((n_cb, qkv), const2),              # sin table
        pl.BlockSpec((n_cb, rp_tokens.shape[1]), const2),  # rp windows
        pl.BlockSpec((n_cb, gumbel.shape[1]), const2),     # gumbel draws
        pl.BlockSpec((1, 1), const2),                   # is_eos
    ]
    operands = [
        hidden,
        fast["attention_norm"],
        wq["wqkv"],
        wq["wo"],
        fast["ffn_norm"],
        wq["w1"],
        wq["w3"],
        wq["w2"],
    ]
    if quantized:
        operands += [ws["wqkv"], ws["wo"], ws["w1"], ws["w3"], ws["w2"]]
    operands += [
        params["fast_norm"][None, :],
        params["fast_output"],
        params["fast_embeddings"][: (
            n_cb * cb_size if cfg.depthwise_wte else cb_size
        )],
        jnp.asarray(e_np, act_dtype),
        jnp.asarray(r_np, jnp.float32),
        jnp.asarray(p_np, act_dtype),
        jnp.asarray(cos_flat),
        jnp.asarray(sin_flat),
        rp_tokens.astype(jnp.int32),
        gumbel.astype(jnp.float32),
        is_eos.astype(jnp.int32).reshape(1, 1),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n_cb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_cb), const2),
        out_shape=jax.ShapeDtypeStruct((1, n_cb), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, d), act_dtype),              # x across steps
            pltpu.VMEM((lay, n_cb, kv * hd), act_dtype),  # K history
            pltpu.VMEM((lay, n_cb, kv * hd), act_dtype),  # V history
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out[0]


def _row_block(b: int) -> int:
    """Rows processed per grid step of the batched kernel. 4 is the
    largest hardware-proven unroll: the per-row attention + rank-sampler
    loops are Python-unrolled inside one grid step, and at 16 unrolled
    rows the register allocator spilled 66 MiB to VMEM next to the
    ~119 MiB resident weight windows — "Ran out of memory in memory
    space vmem. Used 188.57M of 128.00M" (measured, 2026-08-19, B=16
    continuous serving shape). Rows beyond the block ride a SECOND grid
    dimension instead: weight windows keep constant index maps so they
    are still fetched once per frame (the whole point of the kernel),
    while per-step live state stays at the B<=4 footprint."""
    for rb in (4, 2, 1):
        if b % rb == 0:
            return rb
    return 1


def _make_kernel_batched(cfg: DualARConfig, *, rep_enabled: bool,
                         quantized: bool, b_rows: int, rb: int,
                         k_dyn: int):
    """Batched variant (round 4): B decode rows share ONE VMEM weight
    fetch per frame, with PER-ROW dynamic sampling parameters
    (temp/top_p/top_k/penalty from SMEM) mirroring
    ops/sampling.sample_top_k_top_p_dynamic — the continuous batcher's
    decode rows run mixed per-request configs through one program.
    Layer math batches rows on the MXU; attention (C <= 8 positions) and
    the sampler unroll only `rb` rows per grid step (see _row_block);
    the grid is (num_codebooks, B/rb) with the row dimension innermost,
    so all row blocks of codebook step cb complete before cb+1."""
    d, h, kv, hd = cfg.dim, cfg.n_head, cfg.n_local_heads, cfg.head_dim
    n_layers, n_cb = cfg.n_fast_layer, cfg.num_codebooks
    cb_size = cfg.codebook_size
    eps = cfg.norm_eps
    scale = 1.0 / (hd**0.5)
    vocab = cb_size
    # k_dyn: the engine's static dynamic-top_k cap (generate_frame's
    # dyn_top_k_cap clamped to the vocab) — bounds the gumbel operand
    # width and the keep mask exactly like the XLA sampler's k_max
    nb = b_rows // rb
    qkv_width = (h + 2 * kv) * hd

    def kernel(
        x0_ref,        # (1, rb, D) slow hiddens — this row block (leading
                       #   nb dim blocked: sublane/lane dims must stay full
                       #   or 8/128-divisible, so rows ride a LEADING axis)
        an_ref,        # (L, D)
        wqkv_ref,      # (L, D, QKV)
        wo_ref,        # (L, D, D)
        fn_ref,        # (L, D)
        w1_ref,        # (L, D, F)
        w3_ref,        # (L, D, F)
        w2_ref,        # (L, F, D)
        *rest,
    ):
        if quantized:
            (sqkv_ref, so_ref, s1_ref, s3_ref, s2_ref) = rest[:5]
            rest = rest[5:]
        else:
            sqkv_ref = so_ref = s1_ref = s3_ref = s2_ref = None
        (
            fnorm_ref,     # (1, D)
            head_ref,      # (D, cb_size) block
            emb_ref,       # (vocab, D) block
            e_ref,         # (D, KV*hd)
            r_ref,         # (H, D) f32
            cosf_ref,      # (C, QKV) f32
            sinf_ref,      # (C, QKV) f32
            rp_ref,        # (1, rb, C, W) int32 — this row block
            gum_ref,       # (1, rb, C, k_dyn) f32 — this row block's draws
            temp_ref,      # (1, B) f32 SMEM — FULL width, dynamic reads
            topp_ref,      # (1, B) f32 SMEM
            topk_ref,      # (1, B) i32 SMEM
            pen_ref,       # (1, B) f32 SMEM
            eos_ref,       # (1, B) i32 SMEM
            out_ref,       # (B, C) int32 (constant window, all rows)
            x_s,           # VMEM scratch (nb, rb, D): x across cb steps
            k_s,           # VMEM scratch (L, nb, rb, C, KV*hd): K history
            v_s,           # VMEM scratch (L, nb, rb, C, KV*hd): V history
        ) = rest

        def _wdot(xv, w_ref, s_ref, l):
            if not quantized:
                return jnp.dot(
                    xv, w_ref[l], preferred_element_type=jnp.float32
                ).astype(xv.dtype)
            y = jnp.dot(
                xv, w_ref[l].astype(xv.dtype),
                preferred_element_type=jnp.float32,
            ).astype(xv.dtype)
            return y * s_ref[l, 0, :].astype(xv.dtype)

        cb = pl.program_id(0)
        jblk = pl.program_id(1)  # row-block index (innermost grid dim)
        e_m = e_ref[...]
        r_m = r_ref[...]
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (1, vocab), 1)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (n_cb, 1), 0)
        row_sel = iota_c == cb  # (C, 1)

        def _row(ref2d):
            return jnp.sum(
                jnp.where(row_sel, ref2d.astype(jnp.float32), 0.0),
                axis=0,
                keepdims=True,
            )

        x = jnp.where(cb == 0, x0_ref[0], x_s[jblk])  # (rb, D)
        cosf = _row(cosf_ref[...])  # (1, QKV) — position == cb, row-shared
        sinf = _row(sinf_ref[...])

        lane_even = (
            jax.lax.broadcasted_iota(jnp.int32, (rb, qkv_width), 1) % 2
        ) == 0

        for l in range(n_layers):
            hN = _rms_flat(x, an_ref[l, :], eps)
            qkv_f = _wdot(hN, wqkv_ref, sqkv_ref, l)  # (rb, QKV)
            # interleaved-RoPE pair swap via two STATIC lane rolls + an
            # even/odd select — exact (pure lane moves), and drops the
            # (QKV, QKV) permutation operand the B=1 kernel uses (3.1 MiB
            # resident + a per-layer matmul; the B=16 VMEM budget has no
            # room for it). Wraparound lanes pair across the boundary but
            # QKV is even, so every even lane reads its right neighbor
            # and every odd lane its left — the exact pair swap. v lanes
            # get garbage pairs; sinf is 0 there, neutralizing them.
            xf = qkv_f.astype(jnp.float32)
            perm = jnp.where(
                lane_even,
                # even lane i <- x[i+1] (roll shift must be >= 0: QKV-1)
                pltpu.roll(xf, qkv_width - 1, 1),
                pltpu.roll(xf, 1, 1),   # odd lane i <- x[i-1]
            )
            rot = (xf * cosf + perm * sinf).astype(qkv_f.dtype)
            q_flat = rot[:, :d]                      # (rb, D)
            k_flat = rot[:, d : d + kv * hd]         # (rb, KV*hd)
            v_flat = qkv_f[:, d + kv * hd :]         # (rb, KV*hd)
            sel = iota_c == cb  # (C, 1)
            attn_rows = []
            for b in range(rb):
                k_prev = jnp.where(
                    cb == 0, 0.0, k_s[l, jblk, b].astype(jnp.float32)
                )
                v_prev = jnp.where(
                    cb == 0, 0.0, v_s[l, jblk, b].astype(jnp.float32)
                )
                k_s[l, jblk, b] = jnp.where(
                    sel, k_flat[b : b + 1].astype(jnp.float32), k_prev
                ).astype(x.dtype)
                v_s[l, jblk, b] = jnp.where(
                    sel, v_flat[b : b + 1].astype(jnp.float32), v_prev
                ).astype(x.dtype)
                ks = k_s[l, jblk, b]  # (C, KV*hd)
                vs = v_s[l, jblk, b]
                k_aligned = jnp.dot(
                    e_m, ks.T, preferred_element_type=jnp.float32
                )  # (D, C)
                prod = (
                    q_flat[b : b + 1].T.astype(jnp.float32) * k_aligned
                )
                scores = (
                    jnp.dot(r_m, prod, preferred_element_type=jnp.float32)
                    * scale
                )  # (H, C)
                pos_ok = (
                    jax.lax.broadcasted_iota(jnp.int32, (h, n_cb), 1)
                    <= cb
                )
                scores = jnp.where(pos_ok, scores, NEG_INF)
                w = jnp.exp(
                    scores - jnp.max(scores, axis=-1, keepdims=True)
                )
                w = w / jnp.sum(w, axis=-1, keepdims=True)
                w = w.astype(x.dtype).astype(jnp.float32)
                w_lanes = jnp.dot(
                    r_m.T, w, preferred_element_type=jnp.float32
                )  # (D, C)
                v_aligned = jnp.dot(
                    e_m, vs.T, preferred_element_type=jnp.float32
                )
                attn_rows.append(
                    jnp.sum(w_lanes * v_aligned, axis=-1)[None, :].astype(
                        x.dtype
                    )
                )
            attn_flat = (
                jnp.concatenate(attn_rows, axis=0)
                if rb > 1
                else attn_rows[0]
            )  # (rb, D)
            x = x + _wdot(attn_flat, wo_ref, so_ref, l)
            h2 = _rms_flat(x, fn_ref[l, :], eps)
            if quantized:
                gate = jax.nn.silu(
                    _wdot(h2, w1_ref, s1_ref, l).astype(jnp.float32)
                ).astype(x.dtype)
            else:
                gate = jax.nn.silu(
                    jnp.dot(h2, w1_ref[l], preferred_element_type=jnp.float32)
                ).astype(x.dtype)
            w3h = _wdot(h2, w3_ref, s3_ref, l)
            x = x + _wdot(gate * w3h, w2_ref, s2_ref, l)

        fast_out = _rms_flat(x, fnorm_ref[0, :], eps)  # (rb, D)
        logits_all = jnp.dot(
            fast_out, head_ref[...], preferred_element_type=jnp.float32
        ).astype(jnp.float32)  # (rb, V)

        # Per-row dynamic sampling, mirroring
        # ops/sampling.sample_top_k_top_p_dynamic exactly. A fori_loop,
        # NOT a Python unroll: the rank/cum-mass pass keeps ~3 MiB of
        # (V, tile) temporaries live per row, and with 4 unrolled rows
        # the register allocator spilled >20 MiB to VMEM next to the
        # ~119 MiB resident weight windows — compile-time OOM at the
        # B=16 serving shape. The loop body compiles once, so only ONE
        # row's temporaries are ever live.
        iota_rb = jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)
        # 128-wide rank tiles (the B=1 kernel uses 256), fori-looped —
        # must divide vocab (gated in fused_fast_frame_batched_supported)
        ti = min(128, vocab)

        def _sample_row(r, tok_acc):
            rmask = iota_rb == r  # (rb, 1)
            brow = jblk * rb + r  # global row: SMEM param column
            logits = jnp.sum(
                jnp.where(rmask, logits_all, 0.0), axis=0, keepdims=True
            )  # (1, V)
            if rep_enabled:
                # rp_ref[0] is (rb, C, W): pick row r, codebook step cb
                win_r = jnp.sum(
                    jnp.where(rmask[:, :, None], rp_ref[0][...], 0),
                    axis=0,
                )  # (C, W)
                win = jnp.sum(
                    jnp.where(row_sel, win_r, 0), axis=0, keepdims=True
                )  # (1, W)
                member = jnp.any(win.T == iota_v, axis=0)[None, :]
                divisor = jnp.where(member, pen_ref[0, brow], 1.0)
                logits = logits / divisor
            temp_b = temp_ref[0, brow]
            t_eff = jnp.maximum(temp_b, 1e-6)
            p_row = jax.nn.softmax(logits / t_eff, axis=-1)  # (1, V)
            pv = p_row[0, :]
            pv_col = pv[:, None]  # (V, 1)
            pv_row = pv[None, :]  # (1, V)

            # rank/cum-mass tiles as a fori_loop, NOT a Python unroll:
            # unrolled, the Mosaic scheduler interleaves every tile's
            # (V, ti) temporaries and the register allocator spills
            # ~9 MiB to VMEM (measured, B=16: 133 MB > the 128 MB cap
            # next to the ~122 MiB resident weights). The loop body
            # compiles once; tile jt reaches lanes [0, ti) via a dynamic
            # lane rotation (pltpu.roll), the one Mosaic op that allows
            # a data-dependent lane offset.
            def _rank_tile(jt, rc):
                rank_a, cum_a = rc
                base = jt * ti
                # lanes [base, base+ti) to [0, ti): roll by -base, which
                # as a non-negative shift is (V - base) % V
                pj = pltpu.roll(
                    pv_row, (vocab - base) % vocab, 1
                )[:, :ti]  # (1, ti)
                iota_j = (
                    jax.lax.broadcasted_iota(jnp.int32, (vocab, ti), 1)
                    + base
                )
                iota_i = jax.lax.broadcasted_iota(
                    jnp.int32, (vocab, ti), 0
                )
                cmp = (pj > pv_col) | ((pj == pv_col) & (iota_j < iota_i))
                cf = cmp.astype(jnp.float32)
                return (
                    rank_a + jnp.sum(cf, axis=1, keepdims=True),
                    cum_a + jnp.sum(cf * pj, axis=1, keepdims=True),
                )

            rank_f, cum_f = jax.lax.fori_loop(
                0,
                vocab // ti,
                _rank_tile,
                (
                    jnp.zeros((vocab, 1), jnp.float32),
                    jnp.zeros((vocab, 1), jnp.float32),
                ),
            )
            rank = rank_f[:, 0].astype(jnp.int32)  # (V,)
            cum_excl = cum_f[:, 0]
            # dynamic operand semantics: top_k <= 0 or > k -> all;
            # top_p outside (0, 1) -> disabled
            tk = topk_ref[0, brow]
            k_eff_b = jnp.where((tk <= 0) | (tk > k_dyn), k_dyn, tk)
            tp = topp_ref[0, brow]
            p_eff_b = jnp.where((tp <= 0.0) | (tp >= 1.0), 1.0, tp)
            keep = (rank < k_eff_b) & (cum_excl < p_eff_b)
            # gumbel by rank: g_tok[i] = gum[brow, cb, rank[i]] — j-tiled
            # like the rank pass (a full (V, k_dyn) one-hot is 4 MiB)
            g_r = jnp.sum(
                jnp.where(rmask[:, :, None], gum_ref[0][...], 0.0),
                axis=0,
            )  # (C, V)
            g_row = _row(g_r)  # (1, k_dyn) — this step's draws
            rank_col = rank[:, None]  # (V, 1)
            tig = min(ti, k_dyn)

            def _g_tile(jt, acc):
                base = jt * tig
                g_t = pltpu.roll(
                    g_row, (k_dyn - base) % k_dyn, 1
                )[:, :tig]  # (1, tig)
                oh_b = (
                    rank_col
                    == jax.lax.broadcasted_iota(jnp.int32, (vocab, tig), 1)
                    + base
                ).astype(jnp.float32)
                # exact: oh_b has one nonzero per row
                return acc + jnp.sum(oh_b * g_t, axis=1, keepdims=True)

            g_tok = jax.lax.fori_loop(
                0, k_dyn // tig, _g_tile,
                jnp.zeros((vocab, 1), jnp.float32),
            )[:, 0]
            score = jnp.where(keep, jnp.log(pv) + g_tok, NEG_INF)
            m = jnp.max(score)
            cand = jnp.where(score == m, iota_v[0, :], vocab)
            tok_sampled = jnp.min(cand)
            # argmax rows (temp ~ 0): rank-0 token, ties by lowest index
            cand_am = jnp.where(rank == 0, iota_v[0, :], vocab)
            tok_argmax = jnp.min(cand_am)
            tok = jnp.where(temp_b <= 1e-7, tok_argmax, tok_sampled)
            tok = jnp.where(eos_ref[0, brow] != 0, 0, tok)
            return jnp.where(rmask, tok, tok_acc)

        tok_col = jax.lax.fori_loop(
            0, rb, _sample_row, jnp.zeros((rb, 1), jnp.int32)
        )  # (rb, 1)

        # Scatter this block's tokens into the FULL (B, C) output window
        # (constant index map -> persists across every grid step, flushed
        # once at the end). sel_rows[i, r] == 1 iff global row i is this
        # block's local row r; the f32 dot is exact (tokens < vocab).
        sel_rows = (
            jax.lax.broadcasted_iota(jnp.int32, (b_rows, rb), 0)
            - jblk * rb
            == jax.lax.broadcasted_iota(jnp.int32, (b_rows, rb), 1)
        )
        tok_full = jnp.dot(
            sel_rows.astype(jnp.float32),
            tok_col.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # (B, 1)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (b_rows, n_cb), 0)
        in_block = (iota_b >= jblk * rb) & (iota_b < jblk * rb + rb)
        acc = jnp.where((cb == 0) & (jblk == 0), 0, out_ref[...])
        out_ref[...] = jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (b_rows, n_cb), 1) == cb)
            & in_block,
            tok_full,
            acc,
        )
        oh_e = (
            jax.lax.broadcasted_iota(jnp.int32, (rb, vocab), 1)
            == tok_col
        ).astype(emb_ref.dtype)  # (rb, V)
        x_s[jblk] = jnp.dot(
            oh_e, emb_ref[...], preferred_element_type=jnp.float32
        ).astype(x0_ref.dtype)  # (rb, D)

    return kernel


def fused_fast_frame_batched(
    params,
    cfg: DualARConfig,
    samp,                     # RowSampling — per-row device params
    hidden: jnp.ndarray,      # (B, D) slow hiddens
    rp_tokens: jnp.ndarray,   # (B, C, W) int32 window tokens (post-push)
    gumbel: jnp.ndarray,      # (B, C, V) f32 — same draws the XLA path makes
    is_eos: jnp.ndarray,      # (B,) bool
    *,
    rep_enabled: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, C) int32 codebook tokens for one frame. The dynamic
    counterpart of `fused_fast_frame`: one VMEM weight fetch per frame
    shared by all B rows (the XLA path re-reads the fast stack once per
    codebook step — ~8x per frame), with per-request sampling params as
    SMEM operands."""
    d, h, kv, hd = cfg.dim, cfg.n_head, cfg.n_local_heads, cfg.head_dim
    qkv = (h + 2 * kv) * hd
    n_cb = cfg.num_codebooks
    cb_size = cfg.codebook_size
    b = hidden.shape[0]
    e_np, r_np, p_np = _constants(d, h, kv, hd, qkv)
    cos_flat, sin_flat = _rope_lane_tables(cfg)
    act_dtype = hidden.dtype

    fast = params["fast"]
    quantized = isinstance(fast["wqkv"], dict)
    if quantized:
        wq = {k: fast[k]["q"] for k in ("wqkv", "wo", "w1", "w3", "w2")}
        ws = {k: fast[k]["s"] for k in ("wqkv", "wo", "w1", "w3", "w2")}
    else:
        wq = {k: fast[k] for k in ("wqkv", "wo", "w1", "w3", "w2")}
        ws = None
    lay = wq["wqkv"].shape[0]
    f_dim = wq["w1"].shape[2]
    rb = _row_block(b)
    nb = b // rb
    k_dyn = gumbel.shape[-1]  # the engine's dyn_top_k_cap (<= cb_size)
    kernel = _make_kernel_batched(
        cfg, rep_enabled=rep_enabled, quantized=quantized, b_rows=b,
        rb=rb, k_dyn=k_dyn,
    )

    const2 = lambda i, j: (0, 0)
    const3 = lambda i, j: (0, 0, 0)
    # Per-row-block windows ride a LEADING (nb, rb, ...) axis: Mosaic
    # requires the last two block dims be 8/128-divisible or full, so
    # blocking rows on the sublane axis directly is illegal for rb=4.
    rows3 = lambda i, j: (j, 0, 0)
    rows4 = lambda i, j: (j, 0, 0, 0)
    in_specs = [
        pl.BlockSpec((1, rb, d), rows3),                # x0 (nb, rb, D)
        pl.BlockSpec((lay, d), const2),                 # attention_norm
        pl.BlockSpec((lay, d, qkv), const3),            # wqkv
        pl.BlockSpec((lay, d, d), const3),              # wo
        pl.BlockSpec((lay, d), const2),                 # ffn_norm
        pl.BlockSpec((lay, d, f_dim), const3),          # w1
        pl.BlockSpec((lay, d, f_dim), const3),          # w3
        pl.BlockSpec((lay, f_dim, d), const3),          # w2
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec((lay, 1, qkv), const3),
            pl.BlockSpec((lay, 1, d), const3),
            pl.BlockSpec((lay, 1, f_dim), const3),
            pl.BlockSpec((lay, 1, f_dim), const3),
            pl.BlockSpec((lay, 1, d), const3),
        ]
    in_specs += [
        pl.BlockSpec((1, d), const2),                   # fast_norm
        pl.BlockSpec(
            (d, cb_size),
            (lambda i, j: (0, i)) if cfg.depthwise_output else const2,
        ),
        pl.BlockSpec(
            (cb_size, d),
            (lambda i, j: (i, 0)) if cfg.depthwise_wte else const2,
        ),
        pl.BlockSpec((d, kv * hd), const2),             # E
        pl.BlockSpec((h, d), const2),                   # R
        pl.BlockSpec((n_cb, qkv), const2),              # cos table
        pl.BlockSpec((n_cb, qkv), const2),              # sin table
        pl.BlockSpec((1, rb, n_cb, rp_tokens.shape[-1]), rows4),  # rp
        pl.BlockSpec((1, rb, n_cb, k_dyn), rows4),      # gumbel draws
        pl.BlockSpec((1, b), const2, memory_space=pltpu.SMEM),  # temp
        pl.BlockSpec((1, b), const2, memory_space=pltpu.SMEM),  # top_p
        pl.BlockSpec((1, b), const2, memory_space=pltpu.SMEM),  # top_k
        pl.BlockSpec((1, b), const2, memory_space=pltpu.SMEM),  # penalty
        pl.BlockSpec((1, b), const2, memory_space=pltpu.SMEM),  # is_eos
    ]
    operands = [
        hidden.reshape(nb, rb, d),
        fast["attention_norm"],
        wq["wqkv"],
        wq["wo"],
        fast["ffn_norm"],
        wq["w1"],
        wq["w3"],
        wq["w2"],
    ]
    if quantized:
        operands += [ws["wqkv"], ws["wo"], ws["w1"], ws["w3"], ws["w2"]]
    operands += [
        params["fast_norm"][None, :],
        params["fast_output"],
        params["fast_embeddings"][: (
            n_cb * cb_size if cfg.depthwise_wte else cb_size
        )],
        jnp.asarray(e_np, act_dtype),
        jnp.asarray(r_np, jnp.float32),
        jnp.asarray(cos_flat),
        jnp.asarray(sin_flat),
        rp_tokens.astype(jnp.int32).reshape(
            nb, rb, n_cb, rp_tokens.shape[-1]
        ),
        gumbel.astype(jnp.float32).reshape(nb, rb, n_cb, k_dyn),
        samp.temp.astype(jnp.float32).reshape(1, b),
        samp.top_p.astype(jnp.float32).reshape(1, b),
        samp.top_k.astype(jnp.int32).reshape(1, b),
        samp.rep_pen.astype(jnp.float32).reshape(1, b),
        is_eos.astype(jnp.int32).reshape(1, b),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(n_cb, nb),  # row blocks innermost: all rows finish cb, then cb+1
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, n_cb), const2),
        out_shape=jax.ShapeDtypeStruct((b, n_cb), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nb, rb, d), act_dtype),                   # x
            pltpu.VMEM((lay, nb, rb, n_cb, kv * hd), act_dtype),  # K history
            pltpu.VMEM((lay, nb, rb, n_cb, kv * hd), act_dtype),  # V history
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return out


def fused_fast_frame_batched_supported(
    cfg: DualARConfig, params, batch: int
) -> bool:
    """Static eligibility for the batched dynamic-sampling kernel: the
    B=1 layout constraints plus a row bound (the gumbel operand and the
    row-block grid grow linearly with B)."""
    if batch < 1 or batch > 32:
        return False
    if cfg.head_dim % 2:
        return False
    # the fori-looped rank/gumbel tiles must divide the vocab evenly
    if cfg.codebook_size % min(128, cfg.codebook_size):
        return False
    if cfg.num_codebooks > 1:
        if cfg.depthwise_output and cfg.codebook_size % 128:
            return False
        if cfg.depthwise_wte and cfg.codebook_size % 8:
            return False
    return True


def fused_fast_frame_supported(cfg: DualARConfig, params, batch: int) -> bool:
    """Static eligibility: single row and the flat-lane layout assumptions
    (even head_dim for paired RoPE). Both bf16/f32 and int8-quantized
    (ops/quant.py) fast stacks are supported — int8 halves the once-per-
    frame VMEM weight fetch (~118 -> ~59 MiB for Fish 1.5)."""
    if batch != 1:
        return False
    if cfg.head_dim % 2:
        return False
    # depthwise_output walks the (D, n_cb*cb_size) head in per-step
    # column blocks of cb_size lanes; Mosaic requires lane blocks be
    # multiples of 128 (or the full dim). Same walk over the embedding
    # rows for depthwise_wte needs 8-sublane divisibility. Real Mimi
    # DualAR checkpoints (cb_size 2048) pass; ineligible shapes take the
    # identical-semantics XLA path (caught by tests/test_tpu_lowering.py).
    if cfg.num_codebooks > 1:
        if cfg.depthwise_output and cfg.codebook_size % 128:
            return False
        if cfg.depthwise_wte and cfg.codebook_size % 8:
            return False
    return True
