"""Parity tests for the Pallas fused decode-attention kernel (interpret
mode on CPU) against the XLA scatter+attention path."""

import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.ops.attention import NEG_INF, gqa_attention
from fish_speech_tpu.ops.attention_pallas import fused_decode_attention


def _xla_reference(q, kn, vn, pos, ck, cv, layer):
    b = q.shape[0]
    s = ck.shape[3]
    hd = q.shape[-1]
    rows = jnp.arange(b)
    ck = ck.at[layer, rows, :, pos, :].set(kn)
    cv = cv.at[layer, rows, :, pos, :].set(vn)
    k_pos = jnp.arange(s)[None, None, None, :]
    mask = jnp.where(
        k_pos <= pos[:, None, None, None], 0.0, NEG_INF
    ).astype(jnp.float32)
    attn = gqa_attention(
        q[:, :, None, :], ck[layer], cv[layer], mask, 1.0 / (hd**0.5)
    )[:, :, 0, :]
    return attn, ck, cv


def test_fused_decode_attention_matches_xla():
    rng = np.random.default_rng(0)
    B, H, KV, S, HD, L = 2, 8, 2, 64, 64, 3
    q = jnp.asarray(rng.normal(size=(B, H, HD)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, KV, HD)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, KV, HD)), jnp.float32)
    pos = jnp.asarray([5, 37], jnp.int32)
    ck = jnp.asarray(rng.normal(size=(L, B, KV, S, HD)), jnp.float32)
    cv = jnp.asarray(rng.normal(size=(L, B, KV, S, HD)), jnp.float32)

    for layer in (0, 2):
        got_a, got_k, got_v = fused_decode_attention(
            q, kn, vn, pos, ck, cv, jnp.int32(layer), interpret=True
        )
        ref_a, ref_k, ref_v = _xla_reference(q, kn, vn, pos, ck, cv, layer)
        np.testing.assert_allclose(got_a, ref_a, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))


def test_fused_decode_attention_untouched_layers_preserved():
    """Only the addressed layer's cache block may change."""
    rng = np.random.default_rng(1)
    B, H, KV, S, HD, L = 1, 4, 2, 32, 64, 4
    q = jnp.asarray(rng.normal(size=(B, H, HD)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, KV, HD)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, KV, HD)), jnp.float32)
    pos = jnp.asarray([3], jnp.int32)
    ck = jnp.asarray(rng.normal(size=(L, B, KV, S, HD)), jnp.float32)
    cv = jnp.asarray(rng.normal(size=(L, B, KV, S, HD)), jnp.float32)
    _, got_k, got_v = fused_decode_attention(
        q, kn, vn, pos, ck, cv, jnp.int32(1), interpret=True
    )
    for l in (0, 2, 3):
        np.testing.assert_array_equal(np.asarray(got_k[l]), np.asarray(ck[l]))
        np.testing.assert_array_equal(np.asarray(got_v[l]), np.asarray(cv[l]))


def test_fused_decode_attention_randomized_shapes():
    """Randomized sweep over (B, H/KV ratio, S, pos) incl. edge positions
    (0 and S-1) — shape- or indexing-specific kernel bugs that the two
    fixed-shape tests above could miss."""
    rng = np.random.default_rng(42)
    cases = [
        (1, 4, 1, 16, 64),   # kv=1 (max grouping)
        (3, 8, 4, 48, 64),   # odd batch
        (2, 16, 2, 128, 64), # long cache
        (4, 2, 2, 16, 64),   # no grouping (h == kv)
    ]
    for B, H, KV, S, HD in cases:
        q = jnp.asarray(rng.normal(size=(B, H, HD)), jnp.float32)
        kn = jnp.asarray(rng.normal(size=(B, KV, HD)), jnp.float32)
        vn = jnp.asarray(rng.normal(size=(B, KV, HD)), jnp.float32)
        # edge write positions: first slot, last slot, plus random interior
        pos_vals = [0, S - 1] + list(rng.integers(0, S, size=max(B - 2, 0)))
        pos = jnp.asarray(pos_vals[:B], jnp.int32)
        ck = jnp.asarray(rng.normal(size=(2, B, KV, S, HD)), jnp.float32)
        cv = jnp.asarray(rng.normal(size=(2, B, KV, S, HD)), jnp.float32)
        got_a, got_k, got_v = fused_decode_attention(
            q, kn, vn, pos, ck, cv, jnp.int32(1), interpret=True
        )
        ref_a, ref_k, ref_v = _xla_reference(q, kn, vn, pos, ck, cv, 1)
        np.testing.assert_allclose(
            got_a, ref_a, rtol=1e-5, atol=1e-5,
            err_msg=f"case B={B} H={H} KV={KV} S={S}",
        )
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
