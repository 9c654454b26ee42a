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


class TestInt8QualityParity:
    """Quantified accuracy bounds for weight-only int8 vs full precision
    (VERDICT r1 #7). Measured on a 6-layer dim-256 model: relative RMS
    logit error ~1.8%, softmax KL ~2e-5, 100% argmax agreement, 100%
    greedy token-stream agreement over 20 frames. The assertions below
    hold those with margin; the documented decision (BASELINE.md) is that
    int8 stays opt-in until real-weight listening tests are possible."""

    CFG_MID = None  # built lazily: a 6-layer dim-256 model

    @classmethod
    def _mid(cls):
        if cls.CFG_MID is None:
            from fish_speech_tpu.config import DualARConfig, TokenConfig

            cfg = DualARConfig(
                vocab_size=512, n_layer=6, n_fast_layer=2, n_head=8,
                dim=256, intermediate_size=768, n_local_heads=2,
                head_dim=32, rope_base=10000.0, norm_eps=1e-6,
                max_seq_len=128, codebook_size=32, num_codebooks=4,
            )
            tok = TokenConfig(
                im_end_id=40, pad_id=5, semantic_start_id=50,
                semantic_end_id=81,
            )
            params = init_dual_ar_params(jax.random.PRNGKey(0), cfg, jnp.float32)
            cls.CFG_MID = (cfg, tok, params)
        return cls.CFG_MID

    def test_prefill_logit_error_bounded(self):
        from fish_speech_tpu.models.dual_ar import KVCache, slow_prefill
        from fish_speech_tpu.ops.quant import quantize_lm_params

        cfg, tok, params = self._mid()
        qparams = quantize_lm_params(params)
        rng = np.random.default_rng(0)
        B, S = 4, 48
        sem = rng.integers(50, 82, size=(B, 1, S))
        cbs = rng.integers(0, 32, size=(B, cfg.num_codebooks, S))
        tokens = jnp.asarray(np.concatenate([sem, cbs], 1), jnp.int32)
        lens = jnp.full((B,), S, jnp.int32)

        def run(p):
            cache = KVCache.init(
                cfg.n_layer, B, cfg.n_local_heads, 64, cfg.head_dim,
                jnp.float32,
            )
            lo, _, _ = slow_prefill(p, cfg, tok, tokens, lens, cache, 0, 0)
            return np.asarray(lo)

        lo, lq = run(params), run(qparams)
        rel_rms = np.sqrt(np.mean((lo - lq) ** 2)) / np.std(lo)
        assert rel_rms < 0.04, f"relative RMS logit error {rel_rms:.4f}"
        assert (lo.argmax(-1) == lq.argmax(-1)).all(), "argmax flipped"
        p = np.exp(lo - lo.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        q = np.exp(lq - lq.max(-1, keepdims=True))
        q /= q.sum(-1, keepdims=True)
        kl = (p * (np.log(p + 1e-12) - np.log(q + 1e-12))).sum(-1)
        assert kl.mean() < 1e-4, f"mean softmax KL {kl.mean():.2e}"

    def test_teacher_forced_agreement_metric(self):
        """The int8 flip criterion's gating metric
        (utils/quality.py::teacher_forced_agreement): self-agreement is
        exactly 1, int8-vs-f32 agreement on a mid-size model holds the
        same bound the free-running/logit tests above measure, and the
        audio mask excludes text positions (whose codebook rows are
        zeros by construction and carry no prediction)."""
        from fish_speech_tpu.ops.quant import quantize_lm_params
        from fish_speech_tpu.utils.quality import (
            teacher_forced_agreement,
            teacher_forced_predictions,
        )

        cfg, tok, params = self._mid()
        rng = np.random.default_rng(2)
        S, C = 32, cfg.num_codebooks
        n_text = 8
        sem = np.concatenate(
            [rng.integers(1, 40, size=(1, n_text)),
             rng.integers(50, 82, size=(1, S - n_text))], axis=-1
        )
        cbs = np.concatenate(
            [np.zeros((C, n_text), np.int64),
             rng.integers(0, cfg.codebook_size, size=(C, S - n_text))],
            axis=-1,
        )
        seq = np.concatenate([sem, cbs], axis=0).astype(np.int32)

        p_f = teacher_forced_predictions(params, cfg, tok, seq)
        p_q = teacher_forced_predictions(
            quantize_lm_params(params), cfg, tok, seq
        )
        assert p_f[0].shape == (S - 1,)
        assert p_f[1].shape == (S - 1, C)
        # audio mask: position t targets frame t+1 — the first n_text-1
        # targets are text, the rest audio
        assert not p_f[2][: n_text - 1].any()
        assert p_f[2][n_text - 1 :].all()

        self_ag = teacher_forced_agreement(p_f, p_f)
        assert self_ag["combined"] == 1.0
        ag = teacher_forced_agreement(p_f, p_q)
        assert ag["n"] == (S - 1) + (S - n_text) * C
        assert ag["combined"] >= 0.95, f"tf agreement {ag['combined']:.3f}"

    def test_greedy_token_stream_agreement(self):
        """Greedy decode must produce the same token stream as full
        precision over a 20-frame generation."""
        params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, jnp.float32)
        k = dict(
            cache_len=64, max_frames=24, dtype=jnp.float32,
            prompt_buckets=(16,),
        )
        e_f = LMEngine(params, CFG, TOK, WhichLM.FISH_1_5, **k)
        e_q = LMEngine(
            params, CFG, TOK, WhichLM.FISH_1_5, quantize_int8=True, **k
        )
        sa = SamplingArgs(temp=0.0)
        rf, _ = e_f.generate(make_prompt(6), max_new_tokens=20, sampling=sa, seed=0)
        rq, _ = e_q.generate(make_prompt(6), max_new_tokens=20, sampling=sa, seed=0)
        assert rf.frames == rq.frames
        n = rf.frames
        sem_agree = (rf.semantic[:n] == rq.semantic[:n]).mean()
        cb_agree = (rf.tokens[:, :n] == rq.tokens[:, :n]).mean()
        assert sem_agree >= 0.95, f"semantic agreement {sem_agree:.2f}"
        assert cb_agree >= 0.95, f"codebook agreement {cb_agree:.2f}"


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


def test_batcher_inherits_quantization():
    """create_batcher / _get_batch_engine must carry the int8 flag: a
    server started with --quantize-int8 --continuous-batch N should not
    silently fall back to bf16 in the shared decode rows."""
    from fish_speech_tpu.pipeline import TTSPipeline
    from tests.test_server import CODEC_CFG, DummyTokenizer
    from fish_speech_tpu.models.codec.firefly import (
        FireflyCodec,
        init_firefly_params,
    )

    params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    engine = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        cache_len=64, max_frames=8, dtype=jnp.float32,
        prompt_buckets=(16,), quantize_int8=True,
    )
    codec = FireflyCodec(
        init_firefly_params(jax.random.PRNGKey(1), CODEC_CFG), CODEC_CFG,
        buckets=(8, 16),
    )
    pipe = TTSPipeline(engine, codec, DummyTokenizer(), WhichLM.FISH_1_5)
    batcher = pipe.create_batcher(rows=2, horizon=4)
    try:
        assert batcher.engine.quantize_int8
        req = batcher.submit([make_prompt(6)], cond_len=0, max_new=4)
        chunks = [c for c in req]
        assert len(chunks) == 1 and chunks[0].tokens.shape[1] >= 1
    finally:
        batcher.shutdown()
    assert pipe._get_batch_engine(2).quantize_int8
