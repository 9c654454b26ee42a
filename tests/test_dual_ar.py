"""Tests for the DualAR transformer: embedding semantics, prefill/decode
cache equivalence, causality, per-row positions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import DualARConfig, TokenConfig
from fish_speech_tpu.models.dual_ar import (
    KVCache,
    embed_tokens,
    fast_embed,
    fast_hist_init,
    fast_step,
    init_dual_ar_params,
    slow_decode_step,
    slow_prefill,
)

CFG = DualARConfig(
    vocab_size=64,
    n_layer=2,
    n_fast_layer=2,
    n_head=4,
    dim=32,
    intermediate_size=64,
    n_local_heads=2,
    head_dim=8,
    rope_base=10000.0,
    norm_eps=1e-6,
    max_seq_len=64,
    codebook_size=8,
    num_codebooks=2,
)

TOK = TokenConfig(im_end_id=4, pad_id=5, semantic_start_id=10, semantic_end_id=17)
TOK_LEGACY = TokenConfig(im_end_id=4, pad_id=5, semantic_start_id=5, semantic_end_id=None)


@pytest.fixture(scope="module")
def params():
    return init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


def make_cache(batch=1, max_len=32):
    return KVCache.init(
        CFG.n_layer, batch, CFG.n_local_heads, max_len, CFG.head_dim, jnp.float32
    )


def random_tokens(rng, batch, seq):
    r = np.random.default_rng(rng)
    sem = r.integers(10, 18, size=(batch, 1, seq))
    cbs = r.integers(0, CFG.codebook_size, size=(batch, CFG.num_codebooks, seq))
    return jnp.asarray(np.concatenate([sem, cbs], axis=1), dtype=jnp.int32)


class TestEmbed:
    def test_codebook_embeddings_masked_outside_semantic_range(self, params):
        """Codebook rows only contribute where the semantic token is in
        range (reference: dual_ar.rs:553-563)."""
        tokens = random_tokens(0, 1, 4)
        tokens_out = tokens.at[0, 0, 2].set(3)  # non-semantic token
        e = embed_tokens(params, CFG, TOK, tokens_out)
        # position 2 must equal the bare semantic embedding
        expected = params["embeddings"][3]
        np.testing.assert_allclose(e[0, 2], expected, rtol=1e-5)
        # position 0 (in range) must differ from bare embedding
        bare = params["embeddings"][tokens[0, 0, 0]]
        assert not np.allclose(e[0, 0], bare)

    def test_legacy_pad_gating(self, params):
        """<=1.4: codebooks only under the PAD token (dual_ar.rs:558)."""
        tokens = random_tokens(1, 1, 3)
        tokens = tokens.at[0, 0, :].set(jnp.asarray([5, 6, 5]))
        e = embed_tokens(params, CFG, TOK_LEGACY, tokens)
        np.testing.assert_allclose(
            e[0, 1], params["embeddings"][6], rtol=1e-5
        )
        assert not np.allclose(e[0, 0], params["embeddings"][5])

    def test_codebook_offsets(self, params):
        """Codebook c uses rows [c*CB, (c+1)*CB) (dual_ar.rs:543-551)."""
        tokens = jnp.zeros((1, CFG.num_codebooks + 1, 1), dtype=jnp.int32)
        tokens = tokens.at[0, 0, 0].set(10)  # semantic in range
        tokens = tokens.at[0, 1, 0].set(3)
        tokens = tokens.at[0, 2, 0].set(3)
        e = embed_tokens(params, CFG, TOK, tokens)
        expected = (
            params["embeddings"][10]
            + params["codebook_embeddings"][3]
            + params["codebook_embeddings"][CFG.codebook_size + 3]
        )
        np.testing.assert_allclose(e[0, 0], expected, rtol=1e-5)


class TestSlowPath:
    def test_prefill_then_decode_matches_longer_prefill(self, params):
        """Decoding token S given a prefill of S-1 must equal prefilling S
        tokens directly — the static-cache analogue of the reference's
        cat-based cache consistency."""
        s = 6
        tokens = random_tokens(2, 1, s)
        lens = jnp.asarray([s])

        logits_full, hidden_full, _ = slow_prefill(
            params, CFG, TOK, tokens, lens, make_cache(), 0, 0
        )

        cache = make_cache()
        _, _, cache = slow_prefill(
            params, CFG, TOK, tokens[:, :, : s - 1], jnp.asarray([s - 1]), cache, 0, 0
        )
        logits_step, hidden_step, _ = slow_decode_step(
            params, CFG, TOK, tokens[:, :, s - 1], cache, jnp.asarray([s - 1])
        )
        np.testing.assert_allclose(logits_step, logits_full, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(hidden_step, hidden_full, rtol=2e-4, atol=2e-4)

    def test_kv_extent_restriction_is_exact(self, params):
        """Prefill with a static kv_extent (the engine's bucketed
        attention-read bound) must produce bit-identical results to
        attending over the whole cache: every position it drops was
        NEG_INF-masked. Covers offset=0 and a conditioning offset, plus
        the cache contents written for later decode steps."""
        s = 5
        tokens = random_tokens(4, 1, s)
        lens = jnp.asarray([s])
        full_l, full_h, full_c = slow_prefill(
            params, CFG, TOK, tokens, lens, make_cache(), 0, 0
        )
        ext_l, ext_h, ext_c = slow_prefill(
            params, CFG, TOK, tokens, lens, make_cache(), 0, 0, kv_extent=8
        )
        np.testing.assert_allclose(ext_l, full_l, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(ext_h, full_h, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(ext_c.k), np.asarray(full_c.k)
        )

        # with a conditioning prefix: prefill [0, 4), then chunk at offset 4
        cond = random_tokens(5, 1, 4)
        c1 = make_cache()
        _, _, c1 = slow_prefill(params, CFG, TOK, cond, jnp.asarray([4]), c1, 0, 0)
        c2 = jax.tree_util.tree_map(jnp.copy, c1)
        l1, _, _ = slow_prefill(params, CFG, TOK, tokens, lens, c1, 0, 4)
        l2, _, _ = slow_prefill(
            params, CFG, TOK, tokens, lens, c2, 0, 4, kv_extent=16
        )
        np.testing.assert_allclose(l2, l1, rtol=1e-5, atol=1e-5)

    def test_right_padding_does_not_affect_logits(self, params):
        s = 5
        tokens = random_tokens(3, 1, s)
        lens = jnp.asarray([s])
        logits_a, _, _ = slow_prefill(params, CFG, TOK, tokens, lens, make_cache(), 0, 0)
        padded = jnp.concatenate(
            [tokens, jnp.full((1, CFG.num_codebooks + 1, 3), 7, jnp.int32)], axis=2
        )
        logits_b, _, _ = slow_prefill(params, CFG, TOK, padded, lens, make_cache(), 0, 0)
        np.testing.assert_allclose(logits_a, logits_b, rtol=2e-4, atol=2e-4)

    def test_causality(self, params):
        """Changing the last token must not change what a prefix-prefill
        would produce (verified via the cache + step route)."""
        s = 6
        t1 = random_tokens(4, 1, s)
        t2 = t1.at[0, 0, s - 1].set(11)
        cache1 = make_cache()
        _, _, cache1 = slow_prefill(
            params, CFG, TOK, t1[:, :, : s - 1], jnp.asarray([s - 1]), cache1, 0, 0
        )
        l1, _, _ = slow_decode_step(
            params, CFG, TOK, t1[:, :, s - 1], cache1, jnp.asarray([s - 1])
        )
        cache2 = make_cache()
        _, _, cache2 = slow_prefill(
            params, CFG, TOK, t2[:, :, : s - 1], jnp.asarray([s - 1]), cache2, 0, 0
        )
        np.testing.assert_allclose(cache1.k, cache2.k, atol=1e-6)

    def test_conditioning_prefix_reuse(self, params):
        """Rewinding the length counter reproduces clear_slow_caches_until
        (reference: dual_ar.rs:687-693): prefill [cond; chunk2] from
        scratch must equal prefill(cond) then prefill(chunk2, offset)."""
        cond_len, chunk = 4, 3
        tokens = random_tokens(5, 1, cond_len + chunk)

        logits_full, _, _ = slow_prefill(
            params, CFG, TOK, tokens, jnp.asarray([cond_len + chunk]),
            make_cache(), 0, 0,
        )

        cache = make_cache()
        _, _, cache = slow_prefill(
            params, CFG, TOK, tokens[:, :, :cond_len], jnp.asarray([cond_len]),
            cache, 0, 0,
        )
        # pretend we generated junk after the prefix, then rewound:
        junk = random_tokens(99, 1, 2)
        _, _, cache_junk = slow_prefill(
            params, CFG, TOK, junk, jnp.asarray([2]), cache, 0, cond_len
        )
        logits_resumed, _, _ = slow_prefill(
            params, CFG, TOK, tokens[:, :, cond_len:], jnp.asarray([chunk]),
            cache_junk, 0, cond_len,
        )
        np.testing.assert_allclose(logits_resumed, logits_full, rtol=2e-4, atol=2e-4)

    def test_per_row_decode_positions(self, params):
        """Two rows at different positions must decode identically to the
        same rows decoded separately."""
        sa, sb = 4, 6
        ta = random_tokens(6, 1, sa)
        tb = random_tokens(7, 1, sb)

        # separate single-row runs
        ca = make_cache()
        _, _, ca = slow_prefill(params, CFG, TOK, ta[:, :, :-1], jnp.asarray([sa - 1]), ca, 0, 0)
        la, _, _ = slow_decode_step(params, CFG, TOK, ta[:, :, -1], ca, jnp.asarray([sa - 1]))

        cb = make_cache()
        _, _, cb = slow_prefill(params, CFG, TOK, tb[:, :, :-1], jnp.asarray([sb - 1]), cb, 0, 0)
        lb, _, _ = slow_decode_step(params, CFG, TOK, tb[:, :, -1], cb, jnp.asarray([sb - 1]))

        # joint batch with per-row prefill into slots 0 and 1
        cache = make_cache(batch=2)
        _, _, cache = slow_prefill(
            params, CFG, TOK, ta[:, :, :-1], jnp.asarray([sa - 1]), cache, 0, 0
        )
        _, _, cache = slow_prefill(
            params, CFG, TOK, tb[:, :, :-1], jnp.asarray([sb - 1]), cache, 1, 0
        )
        tokens_step = jnp.concatenate([ta[:, :, -1], tb[:, :, -1]], axis=0)
        lj, _, _ = slow_decode_step(
            params, CFG, TOK, tokens_step, cache, jnp.asarray([sa - 1, sb - 1])
        )
        np.testing.assert_allclose(lj[0], la[0], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(lj[1], lb[0], rtol=2e-4, atol=2e-4)


class TestFastPath:
    def test_fast_chain_shapes(self, params):
        b = 2
        hidden = jnp.ones((b, 1, CFG.dim), dtype=jnp.float32)
        hist = fast_hist_init(CFG, b, jnp.float32)
        x = hidden
        for cb in range(CFG.num_codebooks):
            logits, hist = fast_step(params, CFG, x, hist, cb)
            assert logits.shape == (b, CFG.codebook_size)
            assert hist[0][0].shape[2] == cb + 1
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            x = fast_embed(params, CFG, tok, cb)
            assert x.shape == (b, 1, CFG.dim)

    def test_fast_history_accumulates(self, params):
        """Second fast step must see the first step's KV (different result
        than running it against an empty history)."""
        b = 1
        h = jax.random.normal(jax.random.PRNGKey(3), (b, 1, CFG.dim), jnp.float32)
        empty = fast_hist_init(CFG, b, jnp.float32)
        _, hist_after0 = fast_step(params, CFG, h, empty, 0)
        x1 = fast_embed(params, CFG, jnp.asarray([3], jnp.int32), 0)
        logits_with, _ = fast_step(params, CFG, x1, hist_after0, 1)
        logits_without, _ = fast_step(params, CFG, x1, empty, 0)
        assert not np.allclose(logits_with, logits_without)

    def test_depthwise_output_slices_head(self):
        cfg = DualARConfig(
            **{**CFG.__dict__, "depthwise_output": True}
        )
        p = init_dual_ar_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
        assert p["fast_output"].shape == (
            cfg.dim, cfg.codebook_size * cfg.num_codebooks
        )
        hist = fast_hist_init(cfg, 1, jnp.float32)
        h = jnp.ones((1, 1, cfg.dim), jnp.float32)
        l0, hist = fast_step(p, cfg, h, hist, 0)
        l1, _ = fast_step(p, cfg, h, hist, 1)
        assert l0.shape == l1.shape == (1, cfg.codebook_size)
        assert not np.allclose(l0, l1)
