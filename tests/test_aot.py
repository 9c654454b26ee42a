"""AOT program seeds (fish_speech_tpu/utils/aot.py): export/load
roundtrip, key invalidation (stale source fingerprint), corrupt-artifact
and aval-drift fallbacks, and the engine-level end-to-end path.

The seeds exist to kill the cold-start trace+lower cost on the serving
host (BASELINE.md "1-vCPU cold-start"); these tests pin the SAFETY
contract — a stale or mismatched seed must fall back to the traced path,
never run silently or crash the engine."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.utils import aot


@pytest.fixture
def aot_env(tmp_path, monkeypatch):
    monkeypatch.setenv("FISH_TPU_AOT_DIR", str(tmp_path))
    monkeypatch.delenv("FISH_TPU_AOT_EXPORT", raising=False)
    return tmp_path


def _jit_fn():
    return jax.jit(lambda x: x * 2.0 + 1.0)


PARTS = ("unit-test", 1, "f32")


class TestWrap:
    def test_miss_returns_fn_unchanged(self, aot_env):
        fn = _jit_fn()
        assert aot.wrap("t", PARTS, fn) is fn

    def test_disabled_returns_fn_unchanged(self, aot_env, monkeypatch):
        monkeypatch.setenv("FISH_TPU_AOT_EXPORT", "1")
        fn = _jit_fn()
        assert aot.wrap("t", PARTS, fn, enabled=False) is fn

    def test_export_then_hit_roundtrip(self, aot_env, monkeypatch):
        monkeypatch.setenv("FISH_TPU_AOT_EXPORT", "1")
        fn = _jit_fn()
        wrapped = aot.wrap("t", PARTS, fn)
        assert isinstance(wrapped, aot._ExportOnFirstCall)
        x = jnp.arange(4.0)
        out = wrapped(x)
        np.testing.assert_allclose(np.asarray(out), np.arange(4.0) * 2 + 1)
        files = [f for f in os.listdir(aot_env) if f.endswith(".jaxexport")]
        assert len(files) == 1 and files[0].startswith("t-")

        monkeypatch.delenv("FISH_TPU_AOT_EXPORT")
        hit = aot.wrap("t", PARTS, _jit_fn())
        assert isinstance(hit, aot._SeedWithFallback)
        np.testing.assert_allclose(
            np.asarray(hit(x)), np.arange(4.0) * 2 + 1
        )

    def test_stale_source_fingerprint_misses(self, aot_env, monkeypatch):
        monkeypatch.setenv("FISH_TPU_AOT_EXPORT", "1")
        wrapped = aot.wrap("t", PARTS, _jit_fn())
        wrapped(jnp.arange(4.0))
        monkeypatch.delenv("FISH_TPU_AOT_EXPORT")
        # Simulate an edit to a compute-path source file: the cached
        # fingerprint changes, every existing key must stop matching.
        monkeypatch.setattr(aot, "_source_fp_cache", "0" * 64)
        fn = _jit_fn()
        assert aot.wrap("t", PARTS, fn) is fn

    def test_different_parts_miss(self, aot_env, monkeypatch):
        monkeypatch.setenv("FISH_TPU_AOT_EXPORT", "1")
        aot.wrap("t", PARTS, _jit_fn())(jnp.arange(4.0))
        monkeypatch.delenv("FISH_TPU_AOT_EXPORT")
        fn = _jit_fn()
        assert aot.wrap("t", (*PARTS, "extra"), fn) is fn

    def test_corrupt_artifact_falls_back(self, aot_env):
        key = aot.program_key("t", PARTS)
        with open(os.path.join(aot_env, key + ".jaxexport"), "wb") as f:
            f.write(b"not a jax export")
        fn = _jit_fn()
        assert aot.wrap("t", PARTS, fn) is fn  # load() failed -> unchanged

    def test_aval_drift_falls_back_on_first_call(self, aot_env):
        """A seed exported at one shape, called at another under the same
        key (identity parts missed a drift): the guard must route to the
        traced fn instead of raising."""
        fn = _jit_fn()
        key = aot.program_key("t", PARTS)
        aot.save(key, fn, (jnp.zeros((4,), jnp.float32),))
        wrapped = aot.wrap("t", PARTS, fn)
        assert isinstance(wrapped, aot._SeedWithFallback)
        x = jnp.arange(8.0)  # different shape than export time
        np.testing.assert_allclose(
            np.asarray(wrapped(x)), np.arange(8.0) * 2 + 1
        )
        # and it stays on the fallback afterwards
        np.testing.assert_allclose(
            np.asarray(wrapped(x)), np.arange(8.0) * 2 + 1
        )

    def test_key_pins_versions_and_device(self):
        import jaxlib.version

        key1 = aot.program_key("t", PARTS)
        # same inputs -> stable key
        assert key1 == aot.program_key("t", PARTS)
        # the identity string includes jax AND jaxlib versions (ADVICE r3:
        # they can differ; a Mosaic payload serialized under one jaxlib
        # must not load under another)
        assert jaxlib.version.__version__  # present in the environment


class TestEngineSeeds:
    """End-to-end: a tiny CPU engine exports its prefill + decode-loop
    programs, a fresh engine loads them, and the token stream is
    identical to the traced path."""

    def _build(self):
        from fish_speech_tpu.config import DualARConfig, TokenConfig, WhichLM
        from fish_speech_tpu.generate.engine import LMEngine
        from fish_speech_tpu.models.dual_ar import init_dual_ar_params

        cfg = DualARConfig(
            vocab_size=64, n_layer=2, n_fast_layer=2, n_head=4, dim=32,
            intermediate_size=64, n_local_heads=2, head_dim=8,
            rope_base=10000.0, norm_eps=1e-6, max_seq_len=64,
            codebook_size=8, num_codebooks=2,
        )
        tok = TokenConfig(
            im_end_id=9, pad_id=5, semantic_start_id=10, semantic_end_id=17
        )
        params = init_dual_ar_params(
            jax.random.PRNGKey(0), cfg, dtype=jnp.float32
        )
        eng = LMEngine(
            params, cfg, tok, WhichLM.FISH_1_5,
            cache_len=64, max_frames=8, dtype=jnp.float32,
            prompt_buckets=(16,),
        )
        r = np.random.default_rng(0)
        prompt = np.concatenate(
            [r.integers(18, 30, size=(1, 7)), np.zeros((2, 7), np.int64)],
            axis=0,
        )
        return eng, prompt

    def test_engine_roundtrip_token_exact(self, aot_env, monkeypatch):
        from fish_speech_tpu.ops.sampling import SamplingArgs

        s = SamplingArgs(temp=0.8, top_p=0.9, top_k=8, repetition_penalty=1.1)

        monkeypatch.setenv("FISH_TPU_AOT_EXPORT", "1")
        eng, prompt = self._build()
        ref, _ = eng.generate(prompt, max_new_tokens=8, sampling=s, seed=3)
        names = sorted(
            f.split("-")[0] for f in os.listdir(aot_env)
            if f.endswith(".jaxexport")
        )
        assert names == ["decode_loop", "prefill"]

        monkeypatch.delenv("FISH_TPU_AOT_EXPORT")
        eng2, prompt = self._build()
        got, _ = eng2.generate(prompt, max_new_tokens=8, sampling=s, seed=3)
        # the seeded programs were actually used...
        assert any(
            isinstance(v, aot._SeedWithFallback)
            for v in eng2._decode_jit.values()
        )
        assert any(
            isinstance(v, aot._SeedWithFallback)
            for v in eng2._prefill_jit.values()
        )
        # ...and reproduce the traced path exactly
        np.testing.assert_array_equal(ref.tokens, got.tokens)
        np.testing.assert_array_equal(ref.semantic, got.semantic)
