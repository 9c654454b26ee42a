"""Per-request dynamic sampling (VERDICT r3 #4): temp/top_p/top_k/rep-pen
and seeds as DEVICE operands on the batched engine.

Pins the contract:
- one compiled decode program serves mixed per-row sampling configs;
- a seeded request's token stream is deterministic and independent of
  co-tenant rows (per-row PRNG key chains);
- argmax rows (temp=0) of a dynamic engine match the static engine's
  argmax stream exactly;
- the dynamic sampler's operand edge cases (top_k<=0, top_p>=1, temp=0)
  reduce to the static sampler's semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import DualARConfig, TokenConfig, WhichLM
from fish_speech_tpu.generate.continuous import ContinuousBatcher
from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.models.dual_ar import init_dual_ar_params
from fish_speech_tpu.ops.sampling import (
    RowSampling,
    SamplingArgs,
    sample_top_k_top_p,
    sample_top_k_top_p_dynamic,
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
    max_seq_len=128,
    codebook_size=8,
    num_codebooks=2,
)
TOK = TokenConfig(im_end_id=9, pad_id=5, semantic_start_id=10, semantic_end_id=17)


@pytest.fixture(scope="module")
def params():
    p = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    # suppress EOS so streams run their full budget (deterministic length)
    p["output"] = p["output"].at[:, TOK.im_end_id].multiply(0.0)
    return p


def make_prompt(seq=7, seed=0):
    r = np.random.default_rng(seed)
    sem = r.integers(18, 30, size=(1, seq))
    return np.concatenate(
        [sem, np.zeros((CFG.num_codebooks, seq), np.int64)], axis=0
    )


def _engine(params, batch=1, dynamic=True):
    return LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=batch, cache_len=128, max_frames=16, dtype=jnp.float32,
        prompt_buckets=(16,), dynamic_sampling=dynamic,
    )


class TestDynamicSampler:
    def test_matches_static_semantics_per_row(self):
        """Row-wise dynamic == static run row by row with the same key
        (the gumbel draw for (k,) under one key equals the (1, k) static
        draw for that key)."""
        r = np.random.default_rng(1)
        logits = jnp.asarray(r.normal(size=(3, 32)).astype(np.float32))
        keys = jnp.stack([jax.random.PRNGKey(s) for s in (11, 22, 33)])
        configs = [(0.9, 0.8, 8), (0.5, 0.95, 16), (1.3, 0.6, 4)]
        dyn = sample_top_k_top_p_dynamic(
            logits, keys,
            temp=jnp.asarray([c[0] for c in configs]),
            top_p=jnp.asarray([c[1] for c in configs]),
            top_k=jnp.asarray([c[2] for c in configs], jnp.int32),
            k_max=32,
        )
        for i, (t, p, k) in enumerate(configs):
            ref = sample_top_k_top_p(
                logits[i][None], keys[i], temp=t, top_p=p, top_k=k
            )
            # distributions must agree on the SUPPORT; with identical
            # keys the draws may still differ if the gumbel stream for
            # (k,) vs (1, k) differs — so check support membership AND
            # determinism instead of bit equality
            probs = jax.nn.softmax(logits[i] / t)
            top = jnp.argsort(-probs)[:k]
            assert int(dyn[i]) in np.asarray(top)
            assert int(ref[0]) in np.asarray(top)
        # determinism
        dyn2 = sample_top_k_top_p_dynamic(
            logits, keys,
            temp=jnp.asarray([c[0] for c in configs]),
            top_p=jnp.asarray([c[1] for c in configs]),
            top_k=jnp.asarray([c[2] for c in configs], jnp.int32),
            k_max=32,
        )
        np.testing.assert_array_equal(np.asarray(dyn), np.asarray(dyn2))

    def test_edge_operands(self):
        r = np.random.default_rng(2)
        logits = jnp.asarray(r.normal(size=(4, 16)).astype(np.float32))
        keys = jnp.stack([jax.random.PRNGKey(s) for s in range(4)])
        out = sample_top_k_top_p_dynamic(
            logits, keys,
            temp=jnp.asarray([0.0, 1.0, 1.0, 1.0]),
            top_p=jnp.asarray([0.5, 1.0, 0.0, 0.5]),  # >=1 / <=0 disable
            top_k=jnp.asarray([4, 0, 99, 1], jnp.int32),  # <=0 / >k -> all
            k_max=8,
        )
        # temp=0 row is argmax
        assert int(out[0]) == int(jnp.argmax(logits[0]))
        # top_k=1 row is argmax regardless of draw
        assert int(out[3]) == int(jnp.argmax(logits[3]))
        assert out.shape == (4,) and out.dtype == jnp.int32

    def test_argmax_engine_parity(self, params):
        """temp=0: dynamic engine == static engine, token-exact."""
        s = SamplingArgs(temp=0.0)
        ref, _ = _engine(params, dynamic=False).generate(
            make_prompt(), max_new_tokens=10, sampling=s, seed=3
        )
        got, _ = _engine(params, dynamic=True).generate(
            make_prompt(), max_new_tokens=10, sampling=s, seed=3
        )
        np.testing.assert_array_equal(ref.tokens, got.tokens)
        np.testing.assert_array_equal(ref.semantic, got.semantic)

    def test_seeded_generate_reproducible(self, params):
        s = SamplingArgs(temp=0.9, top_p=0.9, top_k=8, repetition_penalty=1.1)
        eng = _engine(params, dynamic=True)
        r1, _ = eng.generate(make_prompt(), max_new_tokens=8, sampling=s, seed=42)
        r2, _ = eng.generate(make_prompt(), max_new_tokens=8, sampling=s, seed=42)
        np.testing.assert_array_equal(r1.tokens, r2.tokens)


class TestBatcherPerRequest:
    def _run_batcher(self, params, submits, rows=4):
        """submits: list of (seed, SamplingArgs) -> list of (sem, toks)."""
        eng = _engine(params, batch=rows, dynamic=True)
        batcher = ContinuousBatcher(
            eng, SamplingArgs(temp=0.7, top_p=0.9, top_k=8),
            horizon=4, admit_horizon=4,
        )
        try:
            reqs = [
                batcher.submit(
                    [make_prompt()], 0, 7, sampling=s, seed=sd
                )
                for sd, s in submits
            ]
            out = []
            for req in reqs:
                chunks = list(req)
                out.append((chunks[0].semantic, chunks[0].tokens))
            return out
        finally:
            batcher.shutdown()

    def test_seeded_stream_independent_of_cotenants(self, params):
        """The SAME seeded request must produce the SAME tokens whether
        it runs alone or packed with three other requests using
        different seeds and sampling configs."""
        target = (1234, SamplingArgs(temp=0.9, top_p=0.85, top_k=6,
                                     repetition_penalty=1.15))
        solo = self._run_batcher(params, [target])
        crowd = self._run_batcher(
            params,
            [
                target,
                (99, SamplingArgs(temp=1.3, top_p=0.7, top_k=4)),
                (7, SamplingArgs(temp=0.0)),
                (None, SamplingArgs(temp=0.8, top_p=0.95, top_k=8)),
            ],
        )
        np.testing.assert_array_equal(solo[0][0], crowd[0][0])
        np.testing.assert_array_equal(solo[0][1], crowd[0][1])

    def test_mixed_configs_one_program(self, params):
        """A temp=0 request in a mixed batch matches the static argmax
        stream; and the batcher compiled exactly ONE decode program per
        horizon (the dynamic jit key is sampling-independent)."""
        ref, _ = _engine(params, dynamic=False).generate(
            make_prompt(), max_new_tokens=7,
            sampling=SamplingArgs(temp=0.0), seed=0,
        )
        out = self._run_batcher(
            params,
            [
                (5, SamplingArgs(temp=0.0)),
                (6, SamplingArgs(temp=1.1, top_p=0.8, top_k=5)),
                (7, SamplingArgs(temp=0.5, top_p=0.99, top_k=8,
                                 repetition_penalty=1.3)),
            ],
        )
        np.testing.assert_array_equal(
            out[0][0], ref.semantic[: len(out[0][0])]
        )
        np.testing.assert_array_equal(
            out[0][1], ref.tokens[:, : out[0][1].shape[1]]
        )


def test_row_key_matches_jax_prngkey_layout():
    """engine._row_key builds the raw threefry key data host-side (a
    jax.random.PRNGKey call dispatches a device program per admission);
    the layout must stay bit-identical to jax's or every seeded request's
    stream silently changes."""
    import jax

    from fish_speech_tpu.generate.engine import LMEngine

    for seed in (0, 7, 12345678, 2**31 - 1):
        got = LMEngine._row_key(None, seed)
        ref = np.asarray(jax.random.PRNGKey(seed & 0x7FFFFFFF))
        assert got.dtype == ref.dtype == np.uint32
        np.testing.assert_array_equal(got, ref)
