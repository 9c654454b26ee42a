"""Unit tests for core ops: RoPE, norms, attention, sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.ops.attention import causal_mask, gqa_attention
from fish_speech_tpu.ops.norms import layer_norm, rms_norm
from fish_speech_tpu.ops.rope import apply_rope_interleaved, precompute_freqs_cis
from fish_speech_tpu.ops.sampling import (
    RepPenWindow,
    legacy_pad_eos_sample,
    sample_top_k_top_p,
)


class TestRope:
    def test_tables_match_reference_formula(self):
        # reference: dual_ar.rs:168-186 — theta_i = base^(-2i/d), outer with positions
        head_dim, max_len, base = 8, 16, 1e6
        cos, sin = precompute_freqs_cis(head_dim, max_len, base)
        pos = np.arange(max_len)[:, None]
        theta = 1.0 / base ** (np.arange(0, head_dim, 2) / head_dim)
        np.testing.assert_allclose(cos, np.cos(pos * theta), rtol=1e-5)
        np.testing.assert_allclose(sin, np.sin(pos * theta), rtol=1e-5)

    def test_interleaved_rotation(self):
        # candle rope_i: out[2i] = x0 c - x1 s; out[2i+1] = x0 s + x1 c
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 2, 5, 6)).astype(np.float32)
        cos, sin = precompute_freqs_cis(6, 5, 10000.0)
        out = np.asarray(apply_rope_interleaved(jnp.asarray(x), cos, sin))
        c, s = np.asarray(cos), np.asarray(sin)
        expected = np.empty_like(x)
        for i in range(3):
            x0, x1 = x[..., 2 * i], x[..., 2 * i + 1]
            expected[..., 2 * i] = x0 * c[:, i] - x1 * s[:, i]
            expected[..., 2 * i + 1] = x0 * s[:, i] + x1 * c[:, i]
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)

    def test_position_zero_is_identity(self):
        x = jnp.ones((1, 1, 1, 8))
        cos, sin = precompute_freqs_cis(8, 4, 100.0)
        out = apply_rope_interleaved(x, cos[:1], sin[:1])
        np.testing.assert_allclose(out, x, atol=1e-6)


class TestNorms:
    def test_rms_norm(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 3, 8)).astype(np.float32)
        w = rng.normal(size=(8,)).astype(np.float32)
        out = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-6))
        expected = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * w
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_layer_norm(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 4, 8)).astype(np.float32)
        w = rng.normal(size=(8,)).astype(np.float32)
        b = rng.normal(size=(8,)).astype(np.float32)
        out = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1e-6))
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        expected = (x - mu) / np.sqrt(var + 1e-6) * w + b
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


class TestAttention:
    def test_matches_naive_mha(self):
        """GQA with KV==H must equal plain multi-head attention."""
        rng = np.random.default_rng(3)
        b, h, s, hd = 2, 4, 6, 8
        q = rng.normal(size=(b, h, s, hd)).astype(np.float32)
        k = rng.normal(size=(b, h, s, hd)).astype(np.float32)
        v = rng.normal(size=(b, h, s, hd)).astype(np.float32)
        scale = hd**-0.5
        out = np.asarray(
            gqa_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None, scale)
        )
        scores = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
        w = np.exp(scores - scores.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        expected = np.einsum("bhqk,bhkd->bhqd", w, v)
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_gqa_repeats_kv_heads(self):
        """GQA must equal MHA with explicitly repeated KV heads
        (the semantics of the reference's repeat_kv CUDA kernel)."""
        rng = np.random.default_rng(4)
        b, h, kv, s, hd = 1, 4, 2, 5, 8
        q = rng.normal(size=(b, h, s, hd)).astype(np.float32)
        k = rng.normal(size=(b, kv, s, hd)).astype(np.float32)
        v = rng.normal(size=(b, kv, s, hd)).astype(np.float32)
        scale = hd**-0.5
        out = np.asarray(
            gqa_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None, scale)
        )
        # repeat each kv head h//kv times, matching unary.cu's gather order
        k_rep = np.repeat(k, h // kv, axis=1)
        v_rep = np.repeat(v, h // kv, axis=1)
        expected = np.asarray(
            gqa_attention(
                jnp.asarray(q), jnp.asarray(k_rep), jnp.asarray(v_rep), None, scale
            )
        )
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    def test_causal_mask(self):
        m = np.asarray(causal_mask(4, 6, window=100))[0, 0]
        for i in range(4):
            for j in range(6):
                assert (m[i, j] == 0) == (j <= i), (i, j)

    def test_causal_mask_window(self):
        m = np.asarray(causal_mask(5, 5, window=2))[0, 0]
        # position i attends to j iff j <= i and i - j < 2
        for i in range(5):
            for j in range(5):
                assert (m[i, j] == 0) == (j <= i and i - j < 2)


class TestSampling:
    def test_argmax_when_temp_zero(self):
        logits = jnp.asarray([[0.1, 5.0, -1.0], [2.0, 0.0, 3.0]])
        out = sample_top_k_top_p(
            logits, jax.random.PRNGKey(0), temp=0.0, top_p=0.8, top_k=2
        )
        np.testing.assert_array_equal(out, [1, 2])

    def test_top_k_restricts_support(self):
        logits = jnp.asarray([1.0, 0.9, 0.8, -10.0, -10.0, -10.0])
        draws = set()
        for i in range(64):
            t = sample_top_k_top_p(
                logits, jax.random.PRNGKey(i), temp=1.0, top_p=1.0, top_k=3
            )
            draws.add(int(t))
        assert draws <= {0, 1, 2}
        assert len(draws) > 1  # actually samples

    def test_top_p_keeps_nucleus(self):
        # probs ~ [0.97, 0.01, ...] with top_p=0.5 only token 0 survives
        logits = jnp.asarray([10.0, 5.0, 1.0, 0.0])
        for i in range(32):
            t = sample_top_k_top_p(
                logits, jax.random.PRNGKey(i), temp=1.0, top_p=0.5, top_k=4
            )
            assert int(t) == 0

    def test_top_p_keeps_first_crossing_token(self):
        # reference sample_topp keeps tokens while exclusive cumsum < p,
        # so with equal probs 0.25 each and p=0.3, tokens 0 and 1 survive
        # (token 1's exclusive cumsum is 0.25 < 0.3).
        logits = jnp.zeros((4,))
        draws = set()
        for i in range(256):
            t = sample_top_k_top_p(
                logits, jax.random.PRNGKey(i), temp=1.0, top_p=0.3, top_k=4
            )
            draws.add(int(t))
        assert draws == {0, 1}

    def test_legacy_pad_eos(self):
        pad = jnp.asarray(10.0)
        eos = jnp.asarray(-10.0)
        out = legacy_pad_eos_sample(pad, eos, pad_id=5, eos_id=4, rng=jax.random.PRNGKey(0))
        assert int(out) == 5

    def test_batched_shape(self):
        logits = jnp.zeros((3, 7, 100))
        out = sample_top_k_top_p(
            logits, jax.random.PRNGKey(0), temp=0.7, top_p=0.8, top_k=10
        )
        assert out.shape == (3, 7)
        assert out.dtype == jnp.int32


class TestSamplingDistribution:
    """Distributional golden tests vs an independent numpy implementation
    of candle's `Sampling::TopKThenTopP` (the reference's sampler,
    lm/sampling/mod.rs:88-109 + candle LogitsProcessor): softmax, top-k
    (sorted desc), keep while the exclusive cumulative probability is
    < top_p (first always kept), multinomial over the kept mass."""

    @staticmethod
    def _analytic_top_k_top_p(logits, temp, top_k, top_p):
        """Exact per-token sampling probabilities under the reference
        semantics, computed independently in numpy float64."""
        z = np.asarray(logits, np.float64) / temp
        probs = np.exp(z - z.max())
        probs /= probs.sum()
        order = np.argsort(-probs, kind="stable")
        kept = order[:top_k]
        kept_probs = probs[kept]
        if 0.0 < top_p < 1.0:
            cum_excl = np.cumsum(kept_probs) - kept_probs
            kept = kept[cum_excl < top_p]
            kept_probs = probs[kept]
        out = np.zeros_like(probs)
        out[kept] = kept_probs / kept_probs.sum()
        return out

    def test_matches_analytic_distribution(self):
        rng = np.random.default_rng(7)
        logits = jnp.asarray(rng.normal(0.0, 2.0, size=50), jnp.float32)
        temp, top_k, top_p = 0.7, 10, 0.8
        expected = self._analytic_top_k_top_p(logits, temp, top_k, top_p)

        n = 50_000
        draws = sample_top_k_top_p(
            jnp.broadcast_to(logits, (n, 50)),
            jax.random.PRNGKey(0),
            temp=temp,
            top_p=top_p,
            top_k=top_k,
        )
        freq = np.bincount(np.asarray(draws), minlength=50) / n

        # exact support match (zero-probability tokens are never drawn)
        assert set(np.nonzero(freq)[0]) <= set(np.nonzero(expected)[0])
        # total-variation distance small at n=50k
        tv = 0.5 * np.abs(freq - expected).sum()
        assert tv < 0.015, f"TV distance {tv:.4f} vs analytic distribution"
        # per-token binomial 5-sigma bound
        sigma = np.sqrt(expected * (1 - expected) / n)
        assert np.all(np.abs(freq - expected) <= 5 * sigma + 1e-9)

    def test_top_p_one_matches_plain_top_k(self):
        """top_p=1.0 disables the nucleus stage entirely."""
        rng = np.random.default_rng(3)
        logits = jnp.asarray(rng.normal(size=20), jnp.float32)
        expected = self._analytic_top_k_top_p(logits, 1.0, 5, 1.0)
        n = 30_000
        draws = sample_top_k_top_p(
            jnp.broadcast_to(logits, (n, 20)),
            jax.random.PRNGKey(1),
            temp=1.0,
            top_p=1.0,
            top_k=5,
        )
        freq = np.bincount(np.asarray(draws), minlength=20) / n
        assert 0.5 * np.abs(freq - expected).sum() < 0.015

    def test_legacy_pad_eos_distribution(self):
        """Two-way softmax draw matches the analytic sigmoid
        (reference: lm/sampling/mod.rs:8-26)."""
        pad_logit, eos_logit = 0.4, -0.3
        p_pad = 1.0 / (1.0 + np.exp(eos_logit - pad_logit))
        n = 50_000
        out = legacy_pad_eos_sample(
            jnp.full((n,), pad_logit),
            jnp.full((n,), eos_logit),
            pad_id=5,
            eos_id=4,
            rng=jax.random.PRNGKey(2),
        )
        emp = float(np.mean(np.asarray(out) == 5))
        sigma = np.sqrt(p_pad * (1 - p_pad) / n)
        assert abs(emp - p_pad) < 5 * sigma


class TestRepPen:
    def test_membership_penalty(self):
        w = RepPenWindow.init((1,), window=4)
        w = w.push(jnp.asarray([2], dtype=jnp.int32))
        logits = jnp.ones((1, 5))
        out = np.asarray(w.penalize(logits, 2.0))
        np.testing.assert_allclose(out[0], [1, 1, 0.5, 1, 1])

    def test_window_eviction(self):
        w = RepPenWindow.init((1,), window=2)
        for tok in [1, 2, 3]:  # 1 evicted after pushing 3
            w = w.push(jnp.asarray([tok], dtype=jnp.int32))
        logits = jnp.ones((1, 5))
        out = np.asarray(w.penalize(logits, 2.0))
        np.testing.assert_allclose(out[0], [1, 1, 0.5, 0.5, 1])

    def test_duplicate_tokens_stay_penalized(self):
        """Refcount semantics: token present twice stays penalized after
        one copy leaves the window (reference: rep_pen.rs:44-60)."""
        w = RepPenWindow.init((1,), window=3)
        for tok in [7, 7, 1, 2]:  # first 7 evicted, second 7 still in window
            w = w.push(jnp.asarray([tok], dtype=jnp.int32))
        logits = jnp.ones((1, 10))
        out = np.asarray(w.penalize(logits, 2.0))
        assert out[0, 7] == 0.5
        assert out[0, 1] == 0.5 and out[0, 2] == 0.5

    def test_identity_when_penalty_one(self):
        w = RepPenWindow.init((2,), window=4).push(
            jnp.asarray([1, 2], dtype=jnp.int32)
        )
        logits = jnp.ones((2, 4))
        np.testing.assert_array_equal(w.penalize(logits, 1.0), logits)

    def test_per_row_windows(self):
        w = RepPenWindow.init((2,), window=4)
        w = w.push(jnp.asarray([0, 3], dtype=jnp.int32))
        out = np.asarray(w.penalize(jnp.ones((2, 4)), 4.0))
        np.testing.assert_allclose(out[0], [0.25, 1, 1, 1])
        np.testing.assert_allclose(out[1], [1, 1, 1, 0.25])
