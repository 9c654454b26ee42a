"""Cross-implementation golden parity for the DualAR LM.

The reference validates its LM by allclose against upstream PyTorch
fish-speech (reference: tests/e2e/backbone-allclose.py:63-92,
allclose_indices.py:23-51). This file applies the same methodology to
our JAX implementation: a minimal, independent torch reimplementation of
the reference's DualAR semantics (fused-wqkv split per dual_ar.rs:289-297,
interleaved rope_i per dual_ar.rs:239-249, embed gating per
dual_ar.rs:532-567, fast path per dual_ar.rs:638-673) is run on the SAME
checkpoint, and prefill logits, decode-step logits, and fast-codebook
logits must agree to f32 tolerance.

A silent RoPE sign/interleave flip, QKV split-order bug, or norm
misplacement fails these tests; the self-consistency tests in
test_dual_ar.py cannot catch those.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fish_speech_tpu.config import DualARConfig, TokenConfig
from fish_speech_tpu.io.checkpoint import load_lm_params
from fish_speech_tpu.models.dual_ar import (
    KVCache,
    fast_embed,
    fast_hist_init,
    fast_step,
    slow_decode_step,
    slow_prefill,
)
from tests.test_dual_ar import CFG, TOK, TOK_LEGACY

torch.manual_seed(0)

# smoltts-style variant: per-codebook embedding/output tables
# (reference: dual_ar.rs:491-507, single_batch.rs:162-181).
CFG_DEPTHWISE = dataclasses.replace(
    CFG, depthwise_wte=True, depthwise_output=True, num_codebooks=3
)


def make_state_dict(cfg: DualARConfig, seed: int):
    """Reference-named f32 state dict with random weights.

    Norm scales are random (not ones) so a missing/misplaced norm
    multiplication cannot silently pass.
    """
    rng = np.random.default_rng(seed)
    d, f = cfg.dim, cfg.ffn_dim
    qkv = (cfg.n_head + 2 * cfg.n_local_heads) * cfg.head_dim

    def w(*shape, scale=0.1):
        return (rng.normal(size=shape) * scale).astype(np.float32)

    sd = {
        "embeddings.weight": w(cfg.vocab_size, d, scale=0.3),
        "codebook_embeddings.weight": w(
            cfg.codebook_size * cfg.num_codebooks, d, scale=0.3
        ),
        "fast_embeddings.weight": w(cfg.fast_vocab_size, d, scale=0.3),
        "norm.weight": (0.5 + rng.random(d)).astype(np.float32),
        "fast_norm.weight": (0.5 + rng.random(d)).astype(np.float32),
        "output.weight": w(cfg.vocab_size, d),
        "fast_output.weight": w(cfg.fast_output_size, d),
    }
    for prefix, n in [("layers", cfg.n_layer), ("fast_layers", cfg.n_fast_layer)]:
        for i in range(n):
            sd[f"{prefix}.{i}.attention.wqkv.weight"] = w(qkv, d)
            sd[f"{prefix}.{i}.attention.wo.weight"] = w(d, d)
            sd[f"{prefix}.{i}.feed_forward.w1.weight"] = w(f, d)
            sd[f"{prefix}.{i}.feed_forward.w3.weight"] = w(f, d)
            sd[f"{prefix}.{i}.feed_forward.w2.weight"] = w(d, f)
            sd[f"{prefix}.{i}.attention_norm.weight"] = (
                0.5 + rng.random(d)
            ).astype(np.float32)
            sd[f"{prefix}.{i}.ffn_norm.weight"] = (0.5 + rng.random(d)).astype(
                np.float32
            )
    return sd


# --------------------------------------------------------------------------
# Minimal torch DualAR following the reference's math
# --------------------------------------------------------------------------


class TorchDualAR:
    """Independent torch mirror of the reference DualARTransformer.

    Eager, dynamic KV caches via torch.cat — deliberately the reference's
    architecture (dual_ar.rs:316-324), NOT ours, so shared bugs are
    unlikely.
    """

    def __init__(self, sd, cfg: DualARConfig, tok: TokenConfig):
        self.w = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
        self.cfg = cfg
        self.tok = tok
        # RoPE tables for the full max_seq_len (dual_ar.rs:168-186)
        n_elem = cfg.head_dim
        theta = 1.0 / (
            cfg.rope_base
            ** (torch.arange(0, n_elem, 2, dtype=torch.float32) / n_elem)
        )
        pos = torch.arange(cfg.max_seq_len, dtype=torch.float32)
        angles = pos[:, None] * theta[None, :]
        self.cos, self.sin = angles.cos(), angles.sin()
        self.slow_cache = [None] * cfg.n_layer
        self.fast_cache = [None] * cfg.n_fast_layer

    @staticmethod
    def _rms_norm(x, weight, eps):
        v = (x.float() ** 2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(v + eps)) * weight.float()

    @staticmethod
    def _rope_i(x, cos, sin):
        # candle rope_i: adjacent-lane pairs (x[2i], x[2i+1])
        x0, x1 = x[..., 0::2], x[..., 1::2]
        o0 = x0 * cos - x1 * sin
        o1 = x0 * sin + x1 * cos
        out = torch.stack([o0, o1], dim=-1)
        return out.reshape(x.shape)

    def embed(self, tokens):
        """tokens: (B, C+1, S) -> (B, S, D) per dual_ar.rs:532-567."""
        cfg, tok = self.cfg, self.tok
        semantic = tokens[:, 0, :]
        codebooks = tokens[:, 1:, :]
        sem_emb = self.w["embeddings.weight"][semantic]
        offsets = (
            torch.arange(cfg.num_codebooks) * cfg.codebook_size
        )[None, :, None]
        cb_emb = self.w["codebook_embeddings.weight"][codebooks + offsets]
        if tok.semantic_end_id is not None:
            keep = (semantic >= tok.semantic_start_id) & (
                semantic <= tok.semantic_end_id
            )
        else:
            keep = semantic == tok.semantic_start_id
        cb_sum = (cb_emb * keep[:, None, :, None].float()).sum(1)
        return sem_emb + cb_sum

    def _block(self, x, prefix, i, cos, sin, mask, cache, window_pos=None):
        """One transformer block; cache is a list slot holding (k, v) or None."""
        cfg = self.cfg
        b, s, d = x.shape
        h = self._rms_norm(
            x, self.w[f"{prefix}.{i}.attention_norm.weight"], cfg.norm_eps
        )
        qkv = h @ self.w[f"{prefix}.{i}.attention.wqkv.weight"].t()
        q_sz = cfg.n_head * cfg.head_dim
        kv_sz = cfg.n_local_heads * cfg.head_dim
        q = qkv[..., :q_sz].view(b, s, cfg.n_head, cfg.head_dim).transpose(1, 2)
        k = (
            qkv[..., q_sz : q_sz + kv_sz]
            .view(b, s, cfg.n_local_heads, cfg.head_dim)
            .transpose(1, 2)
        )
        v = (
            qkv[..., q_sz + kv_sz :]
            .view(b, s, cfg.n_local_heads, cfg.head_dim)
            .transpose(1, 2)
        )
        q = self._rope_i(q, cos, sin)
        k = self._rope_i(k, cos, sin)
        if cache[i] is not None:
            pk, pv = cache[i]
            k = torch.cat([pk, k], dim=2)
            v = torch.cat([pv, v], dim=2)
        cache[i] = (k, v)
        # GQA repeat via expand (dual_ar.rs:330-334)
        n_rep = cfg.n_head // cfg.n_local_heads
        kv_len = k.shape[2]
        ke = (
            k[:, :, None]
            .expand(b, cfg.n_local_heads, n_rep, kv_len, cfg.head_dim)
            .reshape(b, cfg.n_head, kv_len, cfg.head_dim)
        )
        ve = (
            v[:, :, None]
            .expand(b, cfg.n_local_heads, n_rep, kv_len, cfg.head_dim)
            .reshape(b, cfg.n_head, kv_len, cfg.head_dim)
        )
        scores = (q @ ke.transpose(-1, -2)) / (cfg.head_dim**0.5)
        if mask is not None:
            scores = scores.masked_fill(mask, float("-inf"))
        attn = torch.softmax(scores, dim=-1) @ ve
        x = x + attn.transpose(1, 2).reshape(b, s, d) @ self.w[
            f"{prefix}.{i}.attention.wo.weight"
        ].t()
        h2 = self._rms_norm(x, self.w[f"{prefix}.{i}.ffn_norm.weight"], cfg.norm_eps)
        gate = torch.nn.functional.silu(
            h2 @ self.w[f"{prefix}.{i}.feed_forward.w1.weight"].t()
        )
        up = h2 @ self.w[f"{prefix}.{i}.feed_forward.w3.weight"].t()
        x = x + (gate * up) @ self.w[f"{prefix}.{i}.feed_forward.w2.weight"].t()
        return x

    def forward_generate(self, tokens, input_pos):
        """tokens: (B, C+1, S); returns (logits (B, V), hidden (B, D))."""
        cfg = self.cfg
        x = self.embed(tokens)
        b, s, _ = x.shape
        kv_len = input_pos + s
        # get_mask_abs semantics (dual_ar.rs:702-712): True = MASK
        q_pos = input_pos + torch.arange(s)[:, None]
        k_pos = torch.arange(kv_len)[None, :]
        masked = (k_pos > q_pos) | (q_pos - k_pos >= cfg.max_seq_len)
        mask = masked[None, None]
        cos = self.cos[input_pos : input_pos + s]
        sin = self.sin[input_pos : input_pos + s]
        for i in range(cfg.n_layer):
            x = self._block(x, "layers", i, cos, sin, mask, self.slow_cache)
        hidden = x[:, -1, :]
        slow_out = self._rms_norm(hidden, self.w["norm.weight"], cfg.norm_eps)
        logits = slow_out @ self.w["output.weight"].t()
        return logits, hidden

    def clear_fast_caches(self):
        self.fast_cache = [None] * self.cfg.n_fast_layer

    def forward_generate_fast(self, x, codebook_idx):
        """x: (B, 1, D); returns (B, codebook_size) logits
        (dual_ar.rs:638-673: fast mask is all-keep, RoPE at the codebook
        position, depthwise output head sliced per codebook)."""
        cfg = self.cfg
        cos = self.cos[codebook_idx : codebook_idx + 1]
        sin = self.sin[codebook_idx : codebook_idx + 1]
        for i in range(cfg.n_fast_layer):
            x = self._block(x, "fast_layers", i, cos, sin, None, self.fast_cache)
        fast_out = self._rms_norm(
            x[:, -1, :], self.w["fast_norm.weight"], cfg.norm_eps
        )
        w = self.w["fast_output.weight"]
        if cfg.depthwise_output:
            w = w[
                codebook_idx * cfg.codebook_size : (codebook_idx + 1)
                * cfg.codebook_size
            ]
        return fast_out @ w.t()


# --------------------------------------------------------------------------
# Fixtures
# --------------------------------------------------------------------------


def load_pair(tmp_path, cfg, tok, seed):
    """(jax params via the real checkpoint loader, torch mirror)."""
    from safetensors.numpy import save_file

    sd = make_state_dict(cfg, seed)
    save_file(sd, str(tmp_path / "model.safetensors"))
    params = load_lm_params(tmp_path, cfg, dtype=jnp.float32)
    return params, TorchDualAR(sd, cfg, tok)


def random_prompt(cfg, tok, batch, seq, seed):
    """Mixed prompt: some positions in the semantic range (codebook
    embeddings active), some text tokens (gated out)."""
    rng = np.random.default_rng(seed)
    if tok.semantic_end_id is not None:
        sem_pool = np.concatenate(
            [
                rng.integers(
                    tok.semantic_start_id, tok.semantic_end_id + 1, size=seq
                ),
                rng.integers(0, tok.semantic_start_id, size=seq),
            ]
        )
    else:
        sem_pool = np.concatenate(
            [np.full(seq, tok.semantic_start_id), rng.integers(0, 5, size=seq)]
        )
    sem = rng.choice(sem_pool, size=(batch, 1, seq))
    cbs = rng.integers(0, cfg.codebook_size, size=(batch, cfg.num_codebooks, seq))
    return np.concatenate([sem, cbs], axis=1).astype(np.int64)


CASES = [
    ("fish15", CFG, TOK),
    ("depthwise", CFG_DEPTHWISE, TOK_LEGACY),
]


@pytest.mark.parametrize("name,cfg,tok", CASES, ids=[c[0] for c in CASES])
class TestGoldenParity:
    def test_prefill_and_decode(self, tmp_path, name, cfg, tok):
        params, ref = load_pair(tmp_path, cfg, tok, seed=7)
        prompt = random_prompt(cfg, tok, 1, 12, seed=11)

        # --- prefill
        t_logits, t_hidden = ref.forward_generate(torch.from_numpy(prompt), 0)
        cache = KVCache.init(
            cfg.n_layer, 1, cfg.n_local_heads, 32, cfg.head_dim, jnp.float32
        )
        j_logits, j_hidden, cache = slow_prefill(
            params,
            cfg,
            tok,
            jnp.asarray(prompt, jnp.int32),
            jnp.array([12], jnp.int32),
            cache,
            0,
            0,
        )
        np.testing.assert_allclose(
            np.asarray(j_logits), t_logits.numpy(), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(j_hidden), t_hidden.numpy(), atol=1e-4, rtol=1e-4
        )

        # --- three sequential decode steps
        pos = jnp.array([12], jnp.int32)
        rng = np.random.default_rng(13)
        for step in range(3):
            frame = random_prompt(cfg, tok, 1, 1, seed=100 + step)[:, :, 0]
            t_logits, t_hidden = ref.forward_generate(
                torch.from_numpy(frame[:, :, None]), 12 + step
            )
            j_logits, j_hidden, cache = slow_decode_step(
                params, cfg, tok, jnp.asarray(frame, jnp.int32), cache, pos
            )
            pos = pos + 1
            np.testing.assert_allclose(
                np.asarray(j_logits),
                t_logits.numpy(),
                atol=1e-4,
                rtol=1e-4,
                err_msg=f"decode step {step}",
            )

    def test_fast_codebook_loop(self, tmp_path, name, cfg, tok):
        """Full fast loop: same hidden state in, per-step logits and argmax
        tokens must agree (reference flow: single_batch.rs:148-184)."""
        params, ref = load_pair(tmp_path, cfg, tok, seed=17)
        prompt = random_prompt(cfg, tok, 1, 6, seed=19)

        _, t_hidden = ref.forward_generate(torch.from_numpy(prompt), 0)
        cache = KVCache.init(
            cfg.n_layer, 1, cfg.n_local_heads, 32, cfg.head_dim, jnp.float32
        )
        _, j_hidden, _ = slow_prefill(
            params,
            cfg,
            tok,
            jnp.asarray(prompt, jnp.int32),
            jnp.array([6], jnp.int32),
            cache,
            0,
            0,
        )

        ref.clear_fast_caches()
        t_x = t_hidden[:, None, :]
        j_x = j_hidden[:, None, :]
        hist = fast_hist_init(cfg, 1, jnp.float32)
        for cb in range(cfg.num_codebooks):
            t_logits = ref.forward_generate_fast(t_x, cb)
            j_logits, hist = fast_step(params, cfg, j_x, hist, cb)
            np.testing.assert_allclose(
                np.asarray(j_logits),
                t_logits.numpy(),
                atol=1e-4,
                rtol=1e-4,
                err_msg=f"codebook {cb}",
            )
            t_tok = t_logits.argmax(-1)
            j_tok = jnp.argmax(j_logits, axis=-1)
            assert int(t_tok[0]) == int(j_tok[0]), f"codebook {cb} token"
            if cb != cfg.num_codebooks - 1:
                emb_tok = t_tok
                if cfg.depthwise_wte:
                    emb_tok = emb_tok + cb * cfg.codebook_size
                t_x = ref.w["fast_embeddings.weight"][emb_tok][:, None, :]
                j_x = fast_embed(params, cfg, j_tok.astype(jnp.int32), cb)

    def test_ragged_prefill_rows_match_individual(self, tmp_path, name, cfg, tok):
        """Right-padded ragged batch prefill must equal per-row torch runs
        on the unpadded prompts (the reference's pad mask is dead code —
        dual_ar.rs:589-615 — ours must be correct)."""
        lens = [9, 5]
        params, ref = load_pair(tmp_path, cfg, tok, seed=23)
        rows = [random_prompt(cfg, tok, 1, n, seed=31 + n) for n in lens]

        padded = np.zeros((2, cfg.num_codebooks + 1, max(lens)), np.int64)
        for b, (row, n) in enumerate(zip(rows, lens)):
            padded[b, :, :n] = row[0]
        cache = KVCache.init(
            cfg.n_layer, 2, cfg.n_local_heads, 32, cfg.head_dim, jnp.float32
        )
        j_logits, _, _ = slow_prefill(
            params,
            cfg,
            tok,
            jnp.asarray(padded, jnp.int32),
            jnp.asarray(lens, jnp.int32),
            cache,
            0,
            0,
        )
        for b, (row, n) in enumerate(zip(rows, lens)):
            ref_b = TorchDualAR(
                {k: v.numpy() for k, v in ref.w.items()}, cfg, tok
            )
            t_logits, _ = ref_b.forward_generate(torch.from_numpy(row), 0)
            np.testing.assert_allclose(
                np.asarray(j_logits[b : b + 1]),
                t_logits.numpy(),
                atol=1e-4,
                rtol=1e-4,
                err_msg=f"row {b} (len {n})",
            )

    def test_rope_flip_is_caught(self, tmp_path, name, cfg, tok):
        """Meta-test: a deliberately sign-flipped RoPE in the mirror must
        NOT match — proves the parity tests have teeth."""
        params, ref = load_pair(tmp_path, cfg, tok, seed=7)
        prompt = random_prompt(cfg, tok, 1, 12, seed=11)

        orig = TorchDualAR._rope_i

        def flipped(x, cos, sin):
            return orig(x, cos, -sin)

        ref._rope_i = flipped
        t_logits, _ = ref.forward_generate(torch.from_numpy(prompt), 0)
        cache = KVCache.init(
            cfg.n_layer, 1, cfg.n_local_heads, 32, cfg.head_dim, jnp.float32
        )
        j_logits, _, _ = slow_prefill(
            params,
            cfg,
            tok,
            jnp.asarray(prompt, jnp.int32),
            jnp.array([12], jnp.int32),
            cache,
            0,
            0,
        )
        assert not np.allclose(
            np.asarray(j_logits), t_logits.numpy(), atol=1e-4, rtol=1e-4
        )
