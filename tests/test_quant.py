"""Weight-only int8 quantization: round-trip accuracy and a quantized
engine end-to-end run."""

import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.config import WhichLM
from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.models.dual_ar import init_dual_ar_params
from fish_speech_tpu.ops.quant import dequantize_weight, matmul, quantize_weight
from fish_speech_tpu.ops.sampling import SamplingArgs
from tests.test_engine import CFG, TOK, make_prompt


def test_quantize_roundtrip_error_small():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 64, 128)) * 0.02, jnp.float32)
    wq = quantize_weight(w)
    assert wq["q"].dtype == jnp.int8
    err = np.abs(np.asarray(dequantize_weight(wq)) - np.asarray(w))
    # per-channel scales bound the error by scale/2 per element
    assert err.max() <= np.asarray(wq["s"], np.float32).max() * 1.05


def test_quant_matmul_matches_dequant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 32)) * 0.05, jnp.float32)
    wq = quantize_weight(w)
    got = np.asarray(matmul(x, wq))
    ref = np.asarray(x @ dequantize_weight(wq))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_quantized_engine_generates():
    params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    engine = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        cache_len=64, max_frames=8, dtype=jnp.float32,
        prompt_buckets=(16,), quantize_int8=True,
    )
    res, _ = engine.generate(
        make_prompt(6), max_new_tokens=6, sampling=SamplingArgs(temp=0.0), seed=0
    )
    assert res.frames >= 1
    assert res.tokens.min() >= 0 and res.tokens.max() < CFG.codebook_size
    # logit agreement with the unquantized engine on the first frame
    ref_engine = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        cache_len=64, max_frames=8, dtype=jnp.float32, prompt_buckets=(16,),
    )
    ref, _ = ref_engine.generate(
        make_prompt(6), max_new_tokens=6, sampling=SamplingArgs(temp=0.0), seed=0
    )
    # weight-only int8 should track closely on a tiny model: first frame
    # usually identical under argmax
    assert res.semantic[0] == ref.semantic[0]
