"""Flash prefill attention kernel: parity vs the XLA prefill path
(ops/prefill_pallas.py, interpret mode on CPU).

The kernel replaces the materialized (S, E) masked-score softmax of
_layer_prefill with an online-softmax sweep; these tests assert the
mask semantics (traced offset, per-row ragged lengths, causal + sliding
window + right-pad masking) and the end-to-end engine behavior match
the XLA lowering.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import DualARConfig, TokenConfig, WhichLM
from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.models.dual_ar import init_dual_ar_params
from fish_speech_tpu.ops.attention import NEG_INF, gqa_attention
from fish_speech_tpu.ops.prefill_pallas import (
    flash_prefill_attention,
    flash_prefill_supported,
)
from fish_speech_tpu.ops.sampling import SamplingArgs

CFG = DualARConfig(
    vocab_size=256,
    n_layer=2,
    n_fast_layer=2,
    n_head=4,
    dim=64,
    intermediate_size=128,
    n_local_heads=2,
    head_dim=16,
    rope_base=10000.0,
    norm_eps=1e-6,
    max_seq_len=64,
    codebook_size=32,
    num_codebooks=4,
)
TOK = TokenConfig(im_end_id=9, pad_id=5, semantic_start_id=10, semantic_end_id=41)


def _xla_reference(q, k, v, offset, seq_lens, window):
    """The exact mask construction of models/dual_ar.py::slow_prefill."""
    _, _, s, hd = q.shape
    e = k.shape[2]
    q_pos = offset + jnp.arange(s)[:, None]
    k_pos = jnp.arange(e)[None, :]
    causal = (k_pos <= q_pos) & (q_pos - k_pos < window)
    k_valid = k_pos < (offset + seq_lens[:, None])
    allowed = causal[None] & k_valid[:, None, :]
    mask = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)[:, None, :, :]
    return gqa_attention(q, k, v, mask, 1.0 / hd**0.5)


def _max_err_real_rows(ref, got, seq_lens):
    errs = []
    for bi in range(ref.shape[0]):
        sl = int(seq_lens[bi])
        errs.append(
            float(
                np.max(
                    np.abs(
                        np.asarray(ref[bi, :, :sl], np.float32)
                        - np.asarray(got[bi, :, :sl], np.float32)
                    )
                )
            )
        )
    return max(errs)


@pytest.mark.parametrize(
    "b,h,kvh,s,e,offset",
    [
        (1, 16, 2, 16, 64, 0),    # Fish head shape, fresh sequence
        (2, 16, 2, 64, 128, 37),  # traced-offset conditioning reuse
        (3, 8, 8, 32, 64, 0),     # MHA
        (2, 4, 1, 16, 32, 5),     # MQA
    ],
)
def test_kernel_matches_xla(b, h, kvh, s, e, offset):
    rng = np.random.default_rng(b * 100 + s)
    hd = 64
    q = jnp.asarray(rng.standard_normal((b, h, s, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, kvh, e, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, kvh, e, hd)), jnp.bfloat16)
    lens = jnp.asarray(rng.integers(1, s + 1, size=(b,)), jnp.int32)
    ref = _xla_reference(q, k, v, offset, lens, 4096)
    got = flash_prefill_attention(
        q, k, v, offset, lens, window=4096, interpret=True
    )
    # pad-query-row outputs are discarded by slow_prefill; compare the
    # real rows (per-row seq_lens) only
    assert _max_err_real_rows(ref, got, lens) < 0.03


def test_kernel_sliding_window():
    """window < offset + S forces the reference's max_seq_len window
    masking (dual_ar.rs:702-712) to actually bind."""
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((1, 16, 64, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2, 128, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2, 128, 64)), jnp.bfloat16)
    lens = jnp.asarray([64], jnp.int32)
    ref = _xla_reference(q, k, v, 30, lens, 16)
    got = flash_prefill_attention(q, k, v, 30, lens, window=16, interpret=True)
    assert _max_err_real_rows(ref, got, lens) < 0.03


def test_kernel_multi_block_sweep():
    """Shapes large enough that the grid actually tiles (n_q > 1,
    n_e > 1): the online-softmax rescale across E blocks and the
    accumulator reset across Q blocks both get exercised."""
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((1, 4, 512, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2, 1024, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2, 1024, 64)), jnp.bfloat16)
    lens = jnp.asarray([512], jnp.int32)
    ref = _xla_reference(q, k, v, 100, lens, 4096)
    got = flash_prefill_attention(
        q, k, v, 100, lens, window=4096, interpret=True
    )
    assert _max_err_real_rows(ref, got, lens) < 0.03


def test_supported_gating():
    assert flash_prefill_supported(64, 64, 16, 2, 64)
    assert flash_prefill_supported(512, 2048, 16, 2, 64)
    assert not flash_prefill_supported(300, 512, 16, 2, 64)  # 300 % 256
    assert flash_prefill_supported(64, 96, 16, 2, 64)  # e <= E_BLK: one block
    assert not flash_prefill_supported(64, 768, 16, 2, 64)  # 768 % 512
    assert not flash_prefill_supported(64, 64, 16, 3, 64)  # group split
    assert not flash_prefill_supported(64, 64, 16, 2, 17)  # lane count


def _run_engine(impl, prompt, sampling, params, rows=None):
    engine = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=1 if rows is None else rows,
        cache_len=64, max_frames=6,
        dtype=jnp.float32, prompt_buckets=(16,),
        prefill_impl=impl,
    )
    state = engine.init_state(seed=13)
    if rows is None:
        state, frame, _ = engine.prefill(state, prompt[None], sampling)
        frames = [np.asarray(frame)]
        step = engine._get_step(sampling)
        for _ in range(3):
            state, f = step(state)
            frames.append(np.asarray(f))
        return frames
    prompts = [prompt[:, : 4 + 3 * i] for i in range(rows)]
    state, fr, _ = engine.prefill_rows(state, prompts, sampling, 0)
    return [np.asarray(fr)]


def test_engine_flash_matches_xla():
    """Engine-level: prefill + decode with prefill_impl='flash'
    (interpret) produces the same token stream as 'xla' — the flash
    attention feeds the same logits into the same sampler rng."""
    params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    sampling = SamplingArgs(temp=0.7, top_p=0.8, top_k=16, repetition_penalty=1.3)
    rng = np.random.default_rng(11)
    prompt = np.concatenate(
        [
            rng.integers(TOK.semantic_start_id, TOK.semantic_end_id, size=(1, 8)),
            np.zeros((CFG.num_codebooks, 8), np.int64),
        ],
        axis=0,
    )
    for a, b in zip(
        _run_engine("xla", prompt, sampling, params),
        _run_engine("flash", prompt, sampling, params),
    ):
        np.testing.assert_array_equal(a, b)


def test_engine_flash_ragged_rows():
    """Burst admission (prefill_rows) with ragged per-row lengths: the
    kernel's per-row seq_lens masking must reproduce the XLA pad mask."""
    params = init_dual_ar_params(jax.random.PRNGKey(1), CFG, dtype=jnp.float32)
    sampling = SamplingArgs(temp=0.7, top_p=0.8, top_k=16, repetition_penalty=1.3)
    rng = np.random.default_rng(12)
    prompt = np.concatenate(
        [
            rng.integers(TOK.semantic_start_id, TOK.semantic_end_id, size=(1, 14)),
            np.zeros((CFG.num_codebooks, 14), np.int64),
        ],
        axis=0,
    )
    for a, b in zip(
        _run_engine("xla", prompt, sampling, params, rows=4),
        _run_engine("flash", prompt, sampling, params, rows=4),
    ):
        np.testing.assert_array_equal(a, b)


def test_flash_rejects_mesh():
    """Sharded engines keep the XLA prefill (GSPMD partitions it); a
    forced flash impl on a multi-device mesh fails fast."""
    from fish_speech_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 2:
        pytest.skip("needs multi-device mesh")
    params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    mesh = make_mesh(2, tp=1)
    with pytest.raises(ValueError):
        LMEngine(
            params, CFG, TOK, WhichLM.FISH_1_5,
            batch_size=2, dtype=jnp.float32,
            prefill_impl="flash", mesh=mesh,
        )
    # auto on a mesh silently keeps XLA
    engine = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=2, dtype=jnp.float32, mesh=mesh,
    )
    assert not engine.use_flash_prefill
