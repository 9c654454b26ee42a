"""DualAR transformer — TPU-native implementation.

Behavioral counterpart of the reference's `DualARTransformer`
(reference: fish_speech_core/lib/lm/dual_ar.rs:443-713), redesigned for
XLA's compilation model instead of candle's eager graphs:

* KV caches are pre-allocated static buffers `(L, B, KV, S_max, hd)`
  updated in place with `lax.dynamic_update_slice` / scatter — the
  reference's per-step `Tensor::cat` (dual_ar.rs:316-324) reallocates
  every step and would force a recompile per shape under XLA.
* Decode tracks a position PER BATCH ROW, so rows with different prompt
  lengths decode together without left-padding. This is what enables
  continuous batching in the server (the reference left-pads into a
  static batch and its pad mask is dead code — dual_ar.rs:589-615,
  SURVEY §2.5; here padding is handled correctly by construction).
* Prefill layers run under `lax.scan` over a stacked `(L, ...)`
  parameter pytree (one compiled block regardless of depth; natural
  layout for tensor-parallel sharding). DECODE layers are unrolled with
  in-place updates of one carried cache buffer — scan restacks the
  per-layer KV every frame and defeats while-carry aliasing (measured as
  two full-cache copies per frame), and the optional Pallas fused
  attention (ops/attention_pallas.py) makes the in-place update
  explicit via input_output_aliases.
* GQA never materializes repeated KV heads (see ops/attention.py); this
  replaces the reference's custom CUDA `repeat_kv` kernel
  (candle-gqa-kernels/src/unary.cu).
* Masks are additive biases built on device (the reference builds a u8
  mask on the CPU every step, dual_ar.rs:702-712).
* "Clearing" the cache back to a conditioning prefix
  (dual_ar.rs:687-693) is free: the engine rewinds its per-row length
  counter and stale positions are masked out.

Parameter layout: all linear weights are stored as (in, out) so the
forward pass is `x @ w`; the checkpoint loader transposes from torch's
(out, in).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fish_speech_tpu.config import DualARConfig, TokenConfig
from fish_speech_tpu.ops.attention import NEG_INF, gqa_attention
from fish_speech_tpu.ops.norms import rms_norm
from fish_speech_tpu.ops.quant import matmul as _mm


def _layer_slice(stack: Dict[str, Any], l: int) -> Dict[str, Any]:
    """Per-layer view of a stacked parameter dict; quantized entries are
    {"q": (L, in, out) int8, "s": (L, 1, out)} pairs."""
    return {
        k: (
            {"q": v["q"][l], "s": v["s"][l]}
            if isinstance(v, dict)
            else v[l]
        )
        for k, v in stack.items()
    }
from fish_speech_tpu.ops.rope import apply_rope_interleaved

# A DualARParams is a nested dict:
# {
#   "embeddings":          (V, D)
#   "codebook_embeddings": (C*CB, D)
#   "fast_embeddings":     (fast_vocab, D)
#   "norm":                (D,)
#   "fast_norm":           (D,)
#   "output":              (D, V)        # embeddings.T if tie_word_embeddings
#   "fast_output":         (D, fast_out)
#   "slow": { stacked (L, ...) arrays: wqkv, wo, w1, w2, w3,
#             attention_norm, ffn_norm }
#   "fast": { same, stacked (L_fast, ...) }
# }
DualARParams = Dict[str, Any]


class KVCache(NamedTuple):
    """Static KV cache for one transformer stack: (L, B, KV, S, hd)."""

    k: jnp.ndarray
    v: jnp.ndarray

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @staticmethod
    def init(
        n_layer: int,
        batch: int,
        n_kv_heads: int,
        max_len: int,
        head_dim: int,
        dtype=jnp.bfloat16,
    ) -> "KVCache":
        shape = (n_layer, batch, n_kv_heads, max_len, head_dim)
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def _stack_init(rng, n_layer: int, cfg: DualARConfig, dtype) -> Dict[str, jnp.ndarray]:
    d, f = cfg.dim, cfg.ffn_dim
    qkv_out = (cfg.n_head + 2 * cfg.n_local_heads) * cfg.head_dim
    keys = jax.random.split(rng, 5)
    scale = cfg.initializer_range

    def w_init(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    return {
        "wqkv": w_init(keys[0], (n_layer, d, qkv_out)),
        "wo": w_init(keys[1], (n_layer, d, d)),
        "w1": w_init(keys[2], (n_layer, d, f)),
        "w3": w_init(keys[3], (n_layer, d, f)),
        "w2": w_init(keys[4], (n_layer, f, d)),
        "attention_norm": jnp.ones((n_layer, d), dtype),
        "ffn_norm": jnp.ones((n_layer, d), dtype),
    }


def init_dual_ar_params(
    rng: jax.Array, cfg: DualARConfig, dtype=jnp.bfloat16
) -> DualARParams:
    """Random-init parameters (for tests and benchmarks without weights)."""
    keys = jax.random.split(rng, 8)
    scale = cfg.initializer_range

    def w_init(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    emb = w_init(keys[0], (cfg.vocab_size, cfg.dim))
    return {
        "embeddings": emb,
        "codebook_embeddings": w_init(
            keys[1], (cfg.codebook_size * cfg.num_codebooks, cfg.dim)
        ),
        "fast_embeddings": w_init(keys[2], (cfg.fast_vocab_size, cfg.dim)),
        "norm": jnp.ones((cfg.dim,), dtype),
        "fast_norm": jnp.ones((cfg.dim,), dtype),
        "output": emb.T
        if cfg.tie_word_embeddings
        else w_init(keys[3], (cfg.dim, cfg.vocab_size)),
        "fast_output": w_init(keys[4], (cfg.dim, cfg.fast_output_size)),
        "slow": _stack_init(keys[5], cfg.n_layer, cfg, dtype),
        "fast": _stack_init(keys[6], cfg.n_fast_layer, cfg, dtype),
    }


# --------------------------------------------------------------------------
# Embedding
# --------------------------------------------------------------------------


def embed_tokens(
    params: DualARParams,
    cfg: DualARConfig,
    token_cfg: TokenConfig,
    tokens: jnp.ndarray,
) -> jnp.ndarray:
    """Sum semantic-token and (masked) codebook embeddings.

    tokens: (B, num_codebooks + 1, S) int32 -> (B, S, D).
    Codebook embeddings only contribute at positions whose semantic token
    is inside the semantic range (1.5+) or equals PAD (<=1.4)
    (reference: dual_ar.rs:532-567).
    """
    semantic = tokens[:, 0, :]  # (B, S)
    codebooks = tokens[:, 1:, :]  # (B, C, S)

    sem_emb = jnp.take(params["embeddings"], semantic, axis=0)  # (B, S, D)

    offsets = (
        jnp.arange(cfg.num_codebooks, dtype=tokens.dtype) * cfg.codebook_size
    )[None, :, None]
    cb_emb = jnp.take(
        params["codebook_embeddings"], codebooks + offsets, axis=0
    )  # (B, C, S, D)

    if token_cfg.semantic_end_id is not None:
        keep = (semantic >= token_cfg.semantic_start_id) & (
            semantic <= token_cfg.semantic_end_id
        )
    else:
        keep = semantic == token_cfg.semantic_start_id
    cb_sum = jnp.sum(cb_emb, axis=1)  # (B, S, D)
    return sem_emb + jnp.where(keep[..., None], cb_sum, 0).astype(sem_emb.dtype)


# --------------------------------------------------------------------------
# Transformer stack (shared by slow and fast paths)
# --------------------------------------------------------------------------


def _project_qkv(x, lp, cfg: DualARConfig):
    b, s, _ = x.shape
    qkv = _mm(x, lp["wqkv"])  # (B, S, (H+2KV)*hd)
    q_sz = cfg.n_head * cfg.head_dim
    kv_sz = cfg.n_local_heads * cfg.head_dim
    q = qkv[..., :q_sz].reshape(b, s, cfg.n_head, cfg.head_dim)
    k = qkv[..., q_sz : q_sz + kv_sz].reshape(b, s, cfg.n_local_heads, cfg.head_dim)
    v = qkv[..., q_sz + kv_sz :].reshape(b, s, cfg.n_local_heads, cfg.head_dim)
    # -> (B, heads, S, hd)
    return (
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
    )


def _layer_prefill(
    x, lp, ck, cv, cos, sin, mask, slot, offset, cfg: DualARConfig,
    kv_extent: Optional[int] = None,
    flash_seq_lens: Optional[jnp.ndarray] = None,
    flash_interpret: bool = False,
):
    """One block over a contiguous row range [slot, slot+B) at seq offset.

    x: (B, S, D); ck/cv: (B_total, KV, S_max, hd). Returns updated row
    cache written back into the full buffer. `slot` and `offset` may both
    be traced scalars — cache access is scatter/gather at computed
    indices, NOT dynamic_update_slice/dynamic_slice: a traced-offset DUS
    inside the layer scan sends the TPU compiler into a >10-minute pass,
    while the equivalent scatter compiles in seconds (same story as the
    decode path). Traced `slot` is what lets the continuous batcher
    prefill one row of a shared multi-request cache.
    """
    b, s, d = x.shape
    h = rms_norm(x, lp["attention_norm"], cfg.norm_eps)
    q, k, v = _project_qkv(h, lp, cfg)
    q = apply_rope_interleaved(q, cos, sin)
    k = apply_rope_interleaved(k, cos, sin)

    pos_idx = offset + jnp.arange(s)  # (S,) absolute cache positions
    row_idx = slot + jnp.arange(b)  # (B,) row range
    # (B,1) x (1,S) advanced indices over dims (0, 2) -> value (B, S, KV, hd)
    ck = ck.at[row_idx[:, None], :, pos_idx[None, :], :].set(
        k.astype(ck.dtype).transpose(0, 2, 1, 3)
    )
    cv = cv.at[row_idx[:, None], :, pos_idx[None, :], :].set(
        v.astype(cv.dtype).transpose(0, 2, 1, 3)
    )
    rows_k = ck[row_idx]  # gather, traced-slot safe
    rows_v = cv[row_idx]
    if kv_extent is not None:
        # static KV read extent (caller guarantees it covers
        # offset + seq_len): identical masked softmax, but scores/reads
        # scale with the prompt's own length instead of S_max
        rows_k = rows_k[:, :, :kv_extent, :]
        rows_v = rows_v[:, :, :kv_extent, :]

    scale = 1.0 / (cfg.head_dim**0.5)
    if flash_seq_lens is not None:
        # Flash prefill kernel: same mask semantics computed in-kernel
        # from (offset, seq_lens); the (S, E) score tensor never touches
        # HBM (ops/prefill_pallas.py).
        from fish_speech_tpu.ops.prefill_pallas import flash_prefill_attention

        attn = flash_prefill_attention(
            q, rows_k, rows_v, offset, flash_seq_lens,
            window=cfg.max_seq_len, interpret=flash_interpret,
        )
    else:
        attn = gqa_attention(q, rows_k, rows_v, mask, scale)
    x = x + _mm(attn.transpose(0, 2, 1, 3).reshape(b, s, d), lp["wo"])

    h2 = rms_norm(x, lp["ffn_norm"], cfg.norm_eps)
    gate = jax.nn.silu(_mm(h2, lp["w1"]).astype(jnp.float32)).astype(x.dtype)
    x = x + _mm(gate * _mm(h2, lp["w3"]), lp["w2"])
    return x, ck, cv


def _scan_stack(layer_fn, stack, x, cache: KVCache):
    def body(carry_x, per_layer):
        lp, ck, cv = per_layer
        new_x, nk, nv = layer_fn(carry_x, lp, ck, cv)
        return new_x, (nk, nv)

    x, (ks, vs) = jax.lax.scan(body, x, (stack, cache.k, cache.v))
    return x, KVCache(k=ks, v=vs)


# --------------------------------------------------------------------------
# Slow (semantic) path
# --------------------------------------------------------------------------


@lru_cache(maxsize=None)
def rope_tables(head_dim: int, max_seq_len: int, rope_base: float):
    """Concrete HOST-side (cos, sin) tables, computed once per config.

    Two TPU-toolchain traps shape this function:
    * Re-deriving the table inside every traced function makes XLA
      constant-fold a trig subgraph into each program, bloating compile
      times for the many small programs of the decode path.
    * Caching it as a *device* array is worse: lowering a captured device
      array embeds it as an MLIR constant via a device->host readback
      (jax _array_mlir_constant_handler), which stalls for minutes through
      the remote-device tunnel. Numpy arrays embed directly.
    """
    import numpy as _np

    exponents = _np.arange(0, head_dim, 2, dtype=_np.float32) / head_dim
    theta = (1.0 / rope_base**exponents).astype(_np.float32)
    angles = _np.arange(max_seq_len, dtype=_np.float32)[:, None] * theta[None, :]
    return _np.cos(angles).astype(_np.float32), _np.sin(angles).astype(_np.float32)


def _rope_slice(cfg: DualARConfig, length: int, offset):
    """(cos, sin) rows [offset, offset+length). Static offsets embed only
    the needed rows as constants; traced offsets embed the full table and
    gather (dynamic_slice at a traced start is another TPU compile-time
    trap, see _layer_prefill)."""
    cos, sin = rope_tables(cfg.head_dim, cfg.max_seq_len, cfg.rope_base)
    if isinstance(offset, int):
        return (
            jnp.asarray(cos[offset : offset + length]),
            jnp.asarray(sin[offset : offset + length]),
        )
    idx = offset + jnp.arange(length)
    return jnp.asarray(cos)[idx], jnp.asarray(sin)[idx]


def _rope_gather(cfg: DualARConfig, pos: jnp.ndarray):
    """Per-row single-position tables -> (B, 1, 1, hd/2)."""
    cos, sin = rope_tables(cfg.head_dim, cfg.max_seq_len, cfg.rope_base)
    cos_rows = jnp.asarray(cos)[pos]
    sin_rows = jnp.asarray(sin)[pos]
    return cos_rows[:, None, None, :], sin_rows[:, None, None, :]


def slow_prefill(
    params: DualARParams,
    cfg: DualARConfig,
    token_cfg: TokenConfig,
    tokens: jnp.ndarray,
    seq_lens: jnp.ndarray,
    cache: KVCache,
    slot,
    offset,
    kv_extent: Optional[int] = None,
    use_flash: bool = False,
    flash_interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """Prefill cache rows [slot, slot+B) with a right-padded prompt chunk.

    tokens: (B, C+1, S_pad) int32, real length per row in seq_lens (B,).
    The prompt occupies cache positions [offset, offset + seq_lens[b])
    of each row; `offset` is the retained conditioning-prefix length
    (0 for a fresh sequence), shared across rows.

    kv_extent: optional STATIC bound on the attention read extent — the
    caller must guarantee kv_extent >= offset + max(seq_lens) (the engine
    buckets it from the host-side offset). With it, per-layer scores are
    (S_pad, kv_extent) instead of (S_pad, S_max): a 64-token prompt in a
    2048-slot cache stops paying 24 x 16 MB of masked-out score traffic.
    Everything masked away was NEG_INF before, so results are identical.

    Returns (logits (B, V) f32 at each row's last real token,
             hidden (B, D) pre-norm at the same position, updated cache).
    """
    b, _, s_pad = tokens.shape
    x = embed_tokens(params, cfg, token_cfg, tokens)  # (B, S_pad, D)
    cos, sin = _rope_slice(cfg, s_pad, offset)

    s_kv = kv_extent if kv_extent is not None else cache.max_len
    from fish_speech_tpu.ops.prefill_pallas import flash_prefill_supported

    flash = use_flash and flash_prefill_supported(
        s_pad, s_kv, cfg.n_head, cfg.n_local_heads, cfg.head_dim
    )
    if flash:
        # mask semantics live inside the kernel (ops/prefill_pallas.py)
        mask = None
        flash_lens = seq_lens
    else:
        q_pos = offset + jnp.arange(s_pad)[:, None]  # (S_pad, 1) absolute
        k_pos = jnp.arange(s_kv)[None, :]  # (1, S_kv)
        causal = (k_pos <= q_pos) & (q_pos - k_pos < cfg.max_seq_len)
        k_valid = k_pos < (offset + seq_lens[:, None])  # (B, S_kv)
        allowed = causal[None, :, :] & k_valid[:, None, :]
        mask = jnp.where(allowed, 0.0, NEG_INF).astype(
            jnp.float32
        )[:, None, :, :]
        flash_lens = None

    def layer_fn(xc, lp, ck, cv):
        return _layer_prefill(
            xc, lp, ck, cv, cos, sin, mask, slot, offset, cfg,
            kv_extent=kv_extent,
            flash_seq_lens=flash_lens,
            flash_interpret=flash_interpret,
        )

    x, cache = _scan_stack(layer_fn, params["slow"], x, cache)

    last_idx = jnp.clip(seq_lens - 1, 0, s_pad - 1)  # (B,)
    hidden = jnp.take_along_axis(x, last_idx[:, None, None], axis=1).squeeze(1)
    slow_out = rms_norm(hidden, params["norm"], cfg.norm_eps)
    logits = (slow_out @ params["output"]).astype(jnp.float32)
    return logits, hidden, cache


def use_pallas_attention_default(mesh=None) -> bool:
    """Fused Pallas decode attention: on for TPU backends — single-device
    directly, multi-device via shard_map over the provided (dp, tp) mesh
    (ops/attention_pallas.py::fused_decode_attention_sharded) when the
    head counts divide tp. Off on CPU by default (tests opt in with
    attention_impl="pallas", which runs the kernel in interpret mode on
    non-TPU backends)."""
    try:
        if jax.default_backend() != "tpu":
            return False
        if jax.device_count() == 1:
            return True
    except RuntimeError:  # pragma: no cover — backend not initialized
        return False
    return mesh is not None


def slow_decode_step(
    params: DualARParams,
    cfg: DualARConfig,
    token_cfg: TokenConfig,
    tokens: jnp.ndarray,
    cache: KVCache,
    pos: jnp.ndarray,
    use_pallas: bool = False,
    mesh=None,
    pallas_interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """One slow-stack decode step for all cache rows.

    tokens: (B, C+1) — the previous frame per row.
    pos: (B,) int32 — each row's write position (== its current length).
    mesh: with use_pallas on a multi-device mesh, shard_map the kernel
    over (dp, tp) so each device runs it on its local rows/heads.
    Returns (logits (B, V) f32, hidden (B, D) pre-norm, updated cache).

    The layer loop is UNROLLED (not lax.scan): scanning restacks the
    per-layer KV as fresh (L, ...) outputs every step, which defeats XLA's
    while-loop carry aliasing and shows up as two full-cache device copies
    per frame in profiles (~15% of the decode step). Scatter-updating one
    carried (L, B, KV, S, hd) buffer in place keeps the carry aliased.
    With use_pallas, the scatter + mask + attention chain per layer is one
    fused kernel with guaranteed in-place cache updates
    (ops/attention_pallas.py).
    """
    b = tokens.shape[0]
    x = embed_tokens(params, cfg, token_cfg, tokens[:, :, None])  # (B, 1, D)
    cos, sin = _rope_gather(cfg, pos)

    s_max = cache.max_len
    k_pos = jnp.arange(s_max)[None, None, None, :]
    mask = jnp.where(
        k_pos <= pos[:, None, None, None], 0.0, NEG_INF
    ).astype(jnp.float32)  # (B, 1, 1, S_max)

    ck, cv = cache.k, cache.v
    rows = jnp.arange(b)
    scale = 1.0 / (cfg.head_dim**0.5)
    d = cfg.dim
    for l in range(cfg.n_layer):
        lp = _layer_slice(params["slow"], l)
        h = rms_norm(x, lp["attention_norm"], cfg.norm_eps)
        q, k, v = _project_qkv(h, lp, cfg)  # (B, heads, 1, hd)
        q = apply_rope_interleaved(q, cos, sin)
        k = apply_rope_interleaved(k, cos, sin)
        if use_pallas:
            from fish_speech_tpu.ops.attention_pallas import (
                fused_decode_attention,
                fused_decode_attention_sharded,
            )

            if mesh is not None:
                attn, ck, cv = fused_decode_attention_sharded(
                    q[:, :, 0, :],
                    k[:, :, 0, :].astype(ck.dtype),
                    v[:, :, 0, :].astype(cv.dtype),
                    pos,
                    ck,
                    cv,
                    jnp.int32(l),
                    mesh,
                    interpret=pallas_interpret,
                )
            else:
                attn, ck, cv = fused_decode_attention(
                    q[:, :, 0, :],
                    k[:, :, 0, :].astype(ck.dtype),
                    v[:, :, 0, :].astype(cv.dtype),
                    pos,
                    ck,
                    cv,
                    jnp.int32(l),
                    interpret=pallas_interpret,
                )
            attn = attn[:, :, None, :]
        else:
            ck = ck.at[l, rows, :, pos, :].set(k.squeeze(2).astype(ck.dtype))
            cv = cv.at[l, rows, :, pos, :].set(v.squeeze(2).astype(cv.dtype))
            attn = gqa_attention(q, ck[l], cv[l], mask, scale)
        x = x + _mm(attn.transpose(0, 2, 1, 3).reshape(b, 1, d), lp["wo"])
        h2 = rms_norm(x, lp["ffn_norm"], cfg.norm_eps)
        gate = jax.nn.silu(_mm(h2, lp["w1"]).astype(jnp.float32)).astype(x.dtype)
        x = x + _mm(gate * _mm(h2, lp["w3"]), lp["w2"])
    cache = KVCache(k=ck, v=cv)

    hidden = x[:, 0, :]
    slow_out = rms_norm(hidden, params["norm"], cfg.norm_eps)
    logits = (slow_out @ params["output"]).astype(jnp.float32)
    return logits, hidden, cache


# --------------------------------------------------------------------------
# Fast (codebook) path
# --------------------------------------------------------------------------


def fast_hist_init(cfg: DualARConfig, batch: int, dtype=jnp.bfloat16):
    """Empty per-layer fast-transformer KV history: a list of
    (k, v) pairs shaped (B, KV, 0, hd), one per fast layer."""
    shape = (batch, cfg.n_local_heads, 0, cfg.head_dim)
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(cfg.n_fast_layer)
    ]


def fast_step(
    params: DualARParams,
    cfg: DualARConfig,
    x: jnp.ndarray,
    hist,
    codebook_idx: int,
):
    """One fast-transformer step at STATIC codebook position codebook_idx.

    x: (B, 1, D) — the slow hidden state (codebook 0) or the embedding of
    the previously sampled codebook token. hist: per-layer list of (k, v)
    histories shaped (B, KV, codebook_idx, hd) — the KV "cache" for the
    fast model is just the concatenated history of this frame's steps.
    With at most num_codebooks (<= 8) positions there is nothing to
    pre-allocate, every shape is static (the per-frame codebook loop is
    unrolled in Python), and no mask is needed: the single query attends
    to all history (the reference's fast mask is all-zeros anyway,
    dual_ar.rs:640-647).

    The 4 layers are UNROLLED rather than lax.scan'd: the scanned form
    runs 2.2x slower on TPU (1.77 vs 0.80 ms per 8-step frame — scan's
    per-iteration parameter slicing and carry management dominate these
    tiny matvecs).

    The fast model's sequence axis is the codebook axis: RoPE is indexed
    by codebook position, history reset every frame
    (reference: dual_ar.rs:638-673, single_batch.rs:146-159).
    Returns (logits (B, codebook_size) f32, grown hist).
    """
    cos, sin = _rope_slice(cfg, 1, codebook_idx)
    scale = 1.0 / (cfg.head_dim**0.5)

    new_hist = []
    for l in range(cfg.n_fast_layer):
        lp = _layer_slice(params["fast"], l)
        kh_l, vh_l = hist[l]
        b, _, d = x.shape
        h = rms_norm(x, lp["attention_norm"], cfg.norm_eps)
        q, k, v = _project_qkv(h, lp, cfg)  # (B, heads, 1, hd)
        q = apply_rope_interleaved(q, cos, sin)
        k = apply_rope_interleaved(k, cos, sin)
        ks = jnp.concatenate([kh_l, k.astype(kh_l.dtype)], axis=2)
        vs = jnp.concatenate([vh_l, v.astype(vh_l.dtype)], axis=2)
        attn = gqa_attention(q, ks, vs, None, scale)
        x = x + _mm(attn.transpose(0, 2, 1, 3).reshape(b, 1, d), lp["wo"])
        h2 = rms_norm(x, lp["ffn_norm"], cfg.norm_eps)
        gate = jax.nn.silu(_mm(h2, lp["w1"]).astype(jnp.float32)).astype(x.dtype)
        x = x + _mm(gate * _mm(h2, lp["w3"]), lp["w2"])
        new_hist.append((ks, vs))

    fast_out = rms_norm(x[:, 0, :], params["fast_norm"], cfg.norm_eps)  # (B, D)

    w = params["fast_output"]  # (D, fast_output_size)
    if cfg.depthwise_output:
        # per-codebook output head slice (reference: dual_ar.rs:661-671)
        w = w[:, codebook_idx * cfg.codebook_size : (codebook_idx + 1) * cfg.codebook_size]
    logits = (fast_out @ w).astype(jnp.float32)
    return logits, new_hist


def fast_embed(
    params: DualARParams, cfg: DualARConfig, token: jnp.ndarray, codebook_idx
) -> jnp.ndarray:
    """Embed a sampled codebook token for the next fast step.

    token: (B,) int32 -> (B, 1, D). For depthwise_wte models the embedding
    table is offset per codebook (reference: single_batch.rs:169-175).
    """
    if cfg.depthwise_wte:
        token = token + codebook_idx * cfg.codebook_size
    return jnp.take(params["fast_embeddings"], token, axis=0)[:, None, :]
