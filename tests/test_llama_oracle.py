"""Third-party oracle: the DualAR slow stack vs `transformers.LlamaModel`.

BASELINE.md is loud that the in-repo torch golden mirror
(tests/test_golden_lm.py) shares authorship with the implementation — a
shared misreading of dual_ar.rs (wqkv split order, RoPE pairing, GQA
head grouping) would pass both. This file closes that gap for the slow
stack with an oracle NOBODY in this repo wrote: the stack is
llama-architecture (RMSNorm -> fused-QKV GQA with interleaved RoPE ->
SwiGLU), so after the STANDARD interleaved->half RoPE weight permutation
(the same one HF's llama conversion script applies to Meta checkpoints),
`transformers.LlamaModel` must reproduce our layer stack exactly:

  * interleaved (GPT-J style, candle `rope_i`, dual_ar.rs:239-249) lane
    2i of a head  -> half (NeoX style, transformers) lane i
  * interleaved lane 2i+1 -> half lane head_dim/2 + i
  * q/k projection ROWS permute; v/o/mlp/norm weights transpose only.

Both models run f32 eager on the same random weights and inputs; hidden
states after the final norm must agree to float tolerance at EVERY
position. A canary asserts the permutation is load-bearing: loading q/k
without it must break the match (so the test cannot silently pass via
some permutation-insensitive degenerate configuration).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import DualARConfig
from fish_speech_tpu.models.dual_ar import (
    KVCache,
    _layer_prefill,
    _rope_slice,
    _scan_stack,
    init_dual_ar_params,
)
from fish_speech_tpu.ops.attention import NEG_INF
from fish_speech_tpu.ops.norms import rms_norm

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CFG = DualARConfig(
    vocab_size=64,
    n_layer=3,
    n_fast_layer=2,
    n_head=4,
    dim=64,
    intermediate_size=96,
    n_local_heads=2,
    head_dim=16,
    rope_base=10000.0,
    norm_eps=1e-6,
    max_seq_len=64,
    codebook_size=16,
    num_codebooks=4,
)
SEQ = 12


def _interleaved_to_half_idx(hd: int) -> np.ndarray:
    """Lane permutation within one head: out[i] = in[2i], out[hd/2+i] =
    in[2i+1] — maps rope_i pair (2i, 2i+1) onto NeoX pair (i, hd/2+i)."""
    return np.concatenate([np.arange(0, hd, 2), np.arange(1, hd, 2)])


def _perm_heads(w: np.ndarray, n_heads: int, hd: int) -> np.ndarray:
    """Apply the lane permutation to the head-output axis (last) of a
    (D, n_heads*hd) projection."""
    idx = _interleaved_to_half_idx(hd)
    full = np.concatenate([h * hd + idx for h in range(n_heads)])
    return w[:, full]


def _build_llama(params, permute_rope: bool = True, which: str = "slow"):
    from transformers import LlamaConfig
    from transformers.models.llama.modeling_llama import LlamaModel

    h, kv, hd = CFG.n_head, CFG.n_local_heads, CFG.head_dim
    n_layers = CFG.n_layer if which == "slow" else CFG.n_fast_layer
    final_norm = params["norm"] if which == "slow" else params["fast_norm"]
    lcfg = LlamaConfig(
        vocab_size=8,  # unused: we feed inputs_embeds
        hidden_size=CFG.dim,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=n_layers,
        num_attention_heads=h,
        num_key_value_heads=kv,
        head_dim=hd,
        rms_norm_eps=CFG.norm_eps,
        rope_theta=CFG.rope_base,
        max_position_embeddings=CFG.max_seq_len,
        attention_bias=False,
        mlp_bias=False,
        attn_implementation="eager",
    )
    model = LlamaModel(lcfg)
    model.eval()
    slow = jax.tree.map(lambda a: np.asarray(a, np.float64), params[which])
    q_sz, kv_sz = h * hd, kv * hd

    def t(x):
        return torch.tensor(np.ascontiguousarray(x), dtype=torch.float32)

    with torch.no_grad():
        for l, layer in enumerate(model.layers):
            wqkv = slow["wqkv"][l]  # (D, (H+2KV)*hd)
            q = wqkv[:, :q_sz]
            k = wqkv[:, q_sz : q_sz + kv_sz]
            v = wqkv[:, q_sz + kv_sz :]
            if permute_rope:
                q = _perm_heads(q, h, hd)
                k = _perm_heads(k, kv, hd)
            layer.self_attn.q_proj.weight.copy_(t(q.T))
            layer.self_attn.k_proj.weight.copy_(t(k.T))
            layer.self_attn.v_proj.weight.copy_(t(v.T))
            layer.self_attn.o_proj.weight.copy_(t(slow["wo"][l].T))
            layer.input_layernorm.weight.copy_(t(slow["attention_norm"][l]))
            layer.post_attention_layernorm.weight.copy_(t(slow["ffn_norm"][l]))
            layer.mlp.gate_proj.weight.copy_(t(slow["w1"][l].T))
            layer.mlp.up_proj.weight.copy_(t(slow["w3"][l].T))
            layer.mlp.down_proj.weight.copy_(t(slow["w2"][l].T))
        model.norm.weight.copy_(t(np.asarray(final_norm, np.float64)))
    return model


def _run_ours(params, x: np.ndarray) -> np.ndarray:
    """Run the slow layer stack + final norm over embeddings x (1, S, D)
    exactly as slow_prefill does (fresh sequence: slot 0, offset 0,
    full-extent causal+window mask)."""
    s = x.shape[1]
    cache = KVCache.init(
        CFG.n_layer, 1, CFG.n_local_heads, s, CFG.head_dim, jnp.float32
    )
    cos, sin = _rope_slice(CFG, s, 0)
    q_pos = jnp.arange(s)[:, None]
    k_pos = jnp.arange(s)[None, :]
    allowed = (k_pos <= q_pos) & (q_pos - k_pos < CFG.max_seq_len)
    mask = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)[None, None]

    def layer_fn(xc, lp, ck, cv):
        return _layer_prefill(
            xc, lp, ck, cv, cos, sin, mask, 0, 0, CFG, kv_extent=s
        )

    out, _ = _scan_stack(layer_fn, params["slow"], jnp.asarray(x), cache)
    out = rms_norm(out, params["norm"], CFG.norm_eps)
    return np.asarray(out, np.float32)


def _run_llama(model, x: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        out = model(
            inputs_embeds=torch.tensor(x, dtype=torch.float32)
        ).last_hidden_state
    return out.numpy()


def test_slow_stack_matches_llama_model():
    params = init_dual_ar_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)
    x = (
        np.random.default_rng(7)
        .normal(size=(1, SEQ, CFG.dim))
        .astype(np.float32)
        * 0.5
    )
    ours = _run_ours(params, x)
    theirs = _run_llama(_build_llama(params), x)
    err = np.max(np.abs(ours - theirs))
    scale = np.maximum(np.max(np.abs(theirs)), 1.0)
    assert err / scale < 2e-5, f"slow stack diverges from LlamaModel: {err}"


def test_permutation_is_load_bearing():
    """Loading q/k WITHOUT the interleaved->half permutation must break
    the match — proves the oracle is sensitive to exactly the RoPE/QKV
    layout class of bug the in-repo mirror could share with the
    implementation."""
    params = init_dual_ar_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)
    x = (
        np.random.default_rng(7)
        .normal(size=(1, SEQ, CFG.dim))
        .astype(np.float32)
        * 0.5
    )
    ours = _run_ours(params, x)
    theirs = _run_llama(_build_llama(params, permute_rope=False), x)
    assert np.max(np.abs(ours - theirs)) > 1e-3


def test_fast_stack_matches_llama_model():
    """The fast (codebook) transformer steps one position at a time with
    a concat-grown KV history and RoPE indexed by codebook position
    (dual_ar.rs:638-673) — architecturally the same llama stack. Running
    our incremental fast_step over a sequence of embeddings must equal
    LlamaModel's one-shot causal prefill on the same (permuted) weights:
    this independently validates the QKV split, RoPE pairing, GQA
    grouping AND the incremental-history equivalence of the fast path.
    fast_output is set to the identity so fast_step's logits ARE the
    post-norm hidden states LlamaModel returns."""
    import dataclasses

    from fish_speech_tpu.models.dual_ar import fast_hist_init, fast_step

    params = dict(
        init_dual_ar_params(jax.random.PRNGKey(5), CFG, dtype=jnp.float32)
    )
    params["fast_output"] = jnp.eye(CFG.dim, dtype=jnp.float32)
    cfg = dataclasses.replace(CFG, depthwise_output=False)
    n_pos = cfg.num_codebooks  # the fast axis never exceeds this
    x = (
        np.random.default_rng(19)
        .normal(size=(1, n_pos, cfg.dim))
        .astype(np.float32)
        * 0.5
    )
    hist = fast_hist_init(cfg, 1, jnp.float32)
    ours = []
    for i in range(n_pos):
        logits, hist = fast_step(
            params, cfg, jnp.asarray(x[:, i : i + 1, :]), hist, i
        )
        ours.append(np.asarray(logits)[0])
    ours = np.stack(ours)  # (n_pos, D) post-norm hidden per position

    theirs = _run_llama(_build_llama(params, which="fast"), x)[0]
    err = np.max(np.abs(ours - theirs))
    scale = np.maximum(np.max(np.abs(theirs)), 1.0)
    assert err / scale < 2e-5, f"fast stack diverges from LlamaModel: {err}"


def test_matches_llama_longer_sequence_and_other_seed():
    params = init_dual_ar_params(jax.random.PRNGKey(11), CFG, dtype=jnp.float32)
    x = (
        np.random.default_rng(23)
        .normal(size=(1, 33, CFG.dim))
        .astype(np.float32)
        * 0.5
    )
    ours = _run_ours(params, x)
    theirs = _run_llama(_build_llama(params), x)
    err = np.max(np.abs(ours - theirs))
    scale = np.maximum(np.max(np.abs(theirs)), 1.0)
    assert err / scale < 2e-5, f"slow stack diverges from LlamaModel: {err}"
