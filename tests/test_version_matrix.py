"""Fish 1.2 / 1.4 version-branch coverage.

Exercises every version-dispatch branch that 1.5-only tests leave dead
(reference quirks: codec/utils/mod.rs:28-39,53-63 symmetric padding +
bare weight names; codec/config.rs:144-168 4-codebook ~43 Hz config;
prompt.rs:88 + speech.rs:63-68 the ±1 codebook-token shift;
single_batch.rs:103-124 the 2-way PAD/EOS slow head).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fish_speech_tpu.config import (
    DualARConfig,
    FireflyConfig,
    FishVersion,
    TokenConfig,
    WhichCodec,
    WhichLM,
    WhichModel,
)
from fish_speech_tpu.models.codec.conv import fish_conv1d, fish_conv_transpose1d
from fish_speech_tpu.models.codec.firefly import FireflyCodec, init_firefly_params


# --------------------------------------------------------------------------
# 1.2 conv semantics vs torch (symmetric padding, no trims)
# --------------------------------------------------------------------------


class TestV12ConvsVsTorch:
    def test_symmetric_conv_matches_torch(self):
        """1.2 FishConvNet = plain torch Conv1d with call-site padding
        (reference: mod.rs:56-61 — no extra pad for Fish1_2)."""
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 6, 20)).astype(np.float32)
        w = rng.normal(size=(8, 6, 7)).astype(np.float32)
        b = rng.normal(size=(8,)).astype(np.float32)
        pad = 3  # k // 2, the stem-conv call-site padding
        ours = fish_conv1d(
            jnp.asarray(x),
            {"w": jnp.asarray(w), "b": jnp.asarray(b)},
            version=FishVersion.V1_2,
            pad_1_2=pad,
        )
        theirs = F.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            padding=pad,
        )
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=1e-5, rtol=1e-5
        )

    def test_dilated_symmetric_conv_matches_torch(self):
        """ConvNeXt dwconv call site: pad = round(d*(k-1)/2), dilated,
        grouped."""
        rng = np.random.default_rng(1)
        c, k, d = 6, 7, 2
        x = rng.normal(size=(1, c, 24)).astype(np.float32)
        w = rng.normal(size=(c, 1, k)).astype(np.float32)
        b = rng.normal(size=(c,)).astype(np.float32)
        pad = round(d * (k - 1) / 2)
        ours = fish_conv1d(
            jnp.asarray(x),
            {"w": jnp.asarray(w), "b": jnp.asarray(b)},
            dilation=d,
            groups=c,
            version=FishVersion.V1_2,
            pad_1_2=pad,
        )
        theirs = F.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            padding=pad, dilation=d, groups=c,
        )
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=1e-5, rtol=1e-5
        )

    def test_symmetric_conv_transpose_matches_torch(self):
        """1.2 FishTransConvNet = torch ConvTranspose1d with call-site
        padding (k-u)//2 (reference: mod.rs:110-122 — no trim for 1.2,
        candle's ConvTranspose1d applies the config padding)."""
        rng = np.random.default_rng(2)
        k, u = 16, 8
        x = rng.normal(size=(1, 4, 10)).astype(np.float32)
        w = rng.normal(size=(4, 3, k)).astype(np.float32)  # (I, O, K)
        b = rng.normal(size=(3,)).astype(np.float32)
        pad = (k - u) // 2
        ours = fish_conv_transpose1d(
            jnp.asarray(x),
            {"w": jnp.asarray(w), "b": jnp.asarray(b)},
            stride=u,
            version=FishVersion.V1_2,
            pad_1_2=pad,
        )
        theirs = F.conv_transpose1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=u, padding=pad,
        )
        np.testing.assert_allclose(
            np.asarray(ours), theirs.numpy(), atol=1e-4, rtol=1e-4
        )

    def test_v12_differs_from_v15(self):
        """The symmetric (1.2) and causal (1.4+) paths must actually
        diverge — guards against the version arg being ignored."""
        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 4, 16)).astype(np.float32)
        w = rng.normal(size=(4, 4, 7)).astype(np.float32)
        p = {"w": jnp.asarray(w), "b": jnp.zeros((4,), jnp.float32)}
        a = fish_conv1d(jnp.asarray(x), p, version=FishVersion.V1_2, pad_1_2=3)
        c = fish_conv1d(jnp.asarray(x), p, version=FishVersion.V1_5)
        assert not np.allclose(np.asarray(a), np.asarray(c)[..., : a.shape[-1]])


# --------------------------------------------------------------------------
# Version registry / codec configs
# --------------------------------------------------------------------------


class TestVersionConfigs:
    def test_v12_codec_config(self):
        cfg = FireflyConfig.for_version(FishVersion.V1_2)
        q = cfg.quantizer
        # 4 groups x 1 quantizer, ds [2] (reference: config.rs:144-154)
        assert q.n_groups == 4 and q.n_codebooks == 1
        assert tuple(q.downsample_factor) == (2,)
        assert q.num_semantic_codebooks == 4
        assert abs(cfg.frame_rate - 43.07) < 0.01

    @pytest.mark.parametrize("v", [FishVersion.V1_4, FishVersion.V1_5])
    def test_v14_v15_codec_config(self, v):
        cfg = FireflyConfig.for_version(v)
        q = cfg.quantizer
        # 8 groups, ds [2, 2] (reference: config.rs:155-167)
        assert q.n_groups == 8 and q.n_codebooks == 1
        assert tuple(q.downsample_factor) == (2, 2)
        assert q.num_semantic_codebooks == 8
        assert abs(cfg.frame_rate - 21.53) < 0.01

    def test_model_version_mappings(self):
        assert WhichLM.from_model(WhichModel.FISH_1_2) == WhichLM.FISH_1_2
        assert WhichCodec.from_model(WhichModel.FISH_1_2) == WhichCodec.FIREFLY_1_2
        assert WhichLM.FISH_1_2.fish_version == FishVersion.V1_2
        assert not WhichLM.FISH_1_2.uses_explicit_semantic_ids
        assert not WhichLM.FISH_1_4.uses_explicit_semantic_ids
        assert WhichLM.FISH_1_5.uses_explicit_semantic_ids

    def test_hardcoded_12_lm_config(self):
        cfg = DualARConfig.fish_speech_1_2()
        # reference: dual_ar.rs:84-108
        assert (cfg.n_layer, cfg.n_fast_layer) == (24, 4)
        assert (cfg.n_head, cfg.n_local_heads, cfg.head_dim) == (16, 2, 64)
        assert cfg.num_codebooks == 4 and cfg.codebook_size == 1024
        assert cfg.vocab_size == 32000 and cfg.rope_base == 1_000_000.0


# --------------------------------------------------------------------------
# 1.2 codec end-to-end on a tiny config (symmetric branch everywhere)
# --------------------------------------------------------------------------

from tests.test_codec import TINY  # tiny 1.5 config; reuse shapes

TINY_1_2 = dataclasses.replace(
    TINY,
    quantizer=dataclasses.replace(TINY.quantizer, n_groups=4),
    version=FishVersion.V1_2,
)


@pytest.fixture(scope="module")
def tiny_codec_12():
    params = init_firefly_params(jax.random.PRNGKey(0), TINY_1_2)
    return FireflyCodec(params, TINY_1_2, buckets=(16,))


class TestV12Codec:
    def test_decode_shape(self, tiny_codec_12):
        codes = np.random.default_rng(0).integers(0, 1000, size=(4, 10))
        audio = tiny_codec_12.decode(codes)
        assert audio.shape == (1, 10 * 2 * TINY_1_2.spec_transform.hop_length)
        assert np.isfinite(np.asarray(audio)).all()

    def test_encode_shape(self, tiny_codec_12):
        audio = (
            np.random.default_rng(1)
            .normal(size=TINY_1_2.spec_transform.hop_length * 40)
            .astype(np.float32)
            * 0.1
        )
        codes = tiny_codec_12.encode(audio)
        assert codes.shape[1] == 4  # 4 codebooks for 1.2
        assert codes.min() >= 0 and codes.max() < 1000

    def test_bare_weight_names_roundtrip(self, tmp_path, tiny_codec_12):
        """1.2 checkpoints use bare conv weight names (no `conv.` prefix,
        reference: mod.rs:28-39); loader must find them and reproduce the
        same audio."""
        from safetensors.numpy import save_file

        from fish_speech_tpu.io.checkpoint import load_firefly_params
        from tests.test_firefly_loading import firefly_params_to_state_dict

        sd = firefly_params_to_state_dict(
            tiny_codec_12.params, TINY_1_2, fish_infix=""
        )
        assert not any(".conv.weight" in k for k in sd)
        path = tmp_path / "firefly-gan-vq-fsq-4x1024-42hz-generator.safetensors"
        save_file(sd, str(path))
        loaded = load_firefly_params(tmp_path, TINY_1_2, dtype=np.float32)
        codec = FireflyCodec(loaded, TINY_1_2, buckets=(16,))
        codes = np.random.default_rng(2).integers(0, 999, size=(4, 8))
        np.testing.assert_allclose(
            np.asarray(codec.decode(codes)),
            np.asarray(tiny_codec_12.decode(codes)),
            atol=1e-6,
        )


# --------------------------------------------------------------------------
# 1.2 LM path: 2-way PAD/EOS head, ±1 token shift, e2e pipeline
# --------------------------------------------------------------------------

from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.generate.frame import semantic_head_columns
from fish_speech_tpu.models.dual_ar import init_dual_ar_params
from fish_speech_tpu.ops.sampling import SamplingArgs
from tests.test_server import LM_CFG, DummyTokenizer

TOK_1_2 = TokenConfig(
    im_end_id=109, pad_id=5, semantic_start_id=5, semantic_end_id=None
)
LM_CFG_1_2 = dataclasses.replace(LM_CFG, num_codebooks=4)


@pytest.fixture(scope="module")
def engine_12():
    params = init_dual_ar_params(jax.random.PRNGKey(0), LM_CFG_1_2, jnp.float32)
    return LMEngine(
        params, LM_CFG_1_2, TOK_1_2, WhichLM.FISH_1_2,
        cache_len=128, max_frames=16, dtype=jnp.float32, prompt_buckets=(64,),
    )


class TestV12LM:
    def test_head_columns_are_pad_eos(self):
        cols = semantic_head_columns(WhichLM.FISH_1_2, TOK_1_2, LM_CFG_1_2)
        np.testing.assert_array_equal(cols, [5, 109])
        cols14 = semantic_head_columns(WhichLM.FISH_1_4, TOK_1_2, LM_CFG_1_2)
        np.testing.assert_array_equal(cols14, [5, 109])

    def test_generate_semantic_row_is_pad_or_eos(self, engine_12):
        """The 1.2 slow head must only ever emit PAD or <|im_end|>
        (reference: single_batch.rs:103-124)."""
        prompt = np.concatenate(
            [
                np.random.default_rng(0).integers(20, 100, size=(1, 9)),
                np.zeros((4, 9), np.int64),
            ],
            axis=0,
        )
        result, _ = engine_12.generate(
            prompt, max_new_tokens=16,
            sampling=SamplingArgs(temp=0.7, top_p=0.8, top_k=64), seed=3,
        )
        sem = result.semantic  # semantic row of the generated frames
        assert set(np.unique(sem)).issubset({TOK_1_2.pad_id, TOK_1_2.im_end_id})

    def test_prompt_vq_tokens_shifted_plus_one(self):
        """Prompt encoding stores codebook tokens +1 for <=1.4
        (reference: prompt.rs:88)."""
        from fish_speech_tpu.text.prompt import PromptEncoder

        enc = PromptEncoder(DummyTokenizer(), 4, WhichLM.FISH_1_2)
        codes = np.arange(8, dtype=np.int32).reshape(4, 2)
        seq = enc.encode_vq(codes)
        # the codebook rows of the VQ span must be codes + 1
        cb = seq[1:, :]
        span = [
            j for j in range(seq.shape[1]) if np.any(cb[:, j] != 0)
        ]
        np.testing.assert_array_equal(cb[:, span], codes + 1)

        enc15 = PromptEncoder(DummyTokenizer(), 4, WhichLM.FISH_1_5)
        seq15 = enc15.encode_vq(codes)
        cb15 = seq15[1:, :]
        span15 = [j for j in range(seq15.shape[1]) if np.any(cb15[:, j] != 0)]
        np.testing.assert_array_equal(cb15[:, span15][:, -2:], codes)

    def test_output_shift_minus_one(self):
        """Generated codebook tokens are shifted -1 (clamped at 0) for
        <=1.4, untouched for 1.5 (reference: speech.rs:63-68)."""
        from fish_speech_tpu.pipeline import TTSPipeline

        codes = np.array([[0, 1, 5], [2, 0, 7]], np.int32)
        p12 = TTSPipeline.__new__(TTSPipeline)
        p12.lm = WhichLM.FISH_1_2
        np.testing.assert_array_equal(
            p12._shift_output_tokens(codes), [[0, 0, 4], [1, 0, 6]]
        )
        p15 = TTSPipeline.__new__(TTSPipeline)
        p15.lm = WhichLM.FISH_1_5
        np.testing.assert_array_equal(p15._shift_output_tokens(codes), codes)

    def test_pipeline_e2e_1_2(self, engine_12):
        """Full 1.2-style text->PCM synthesis: legacy head + +1/-1 shift +
        4-codebook ~43 Hz codec."""
        from fish_speech_tpu.pipeline import TTSPipeline

        codec_params = init_firefly_params(jax.random.PRNGKey(1), TINY_1_2)
        codec = FireflyCodec(codec_params, TINY_1_2, buckets=(16,))
        pipe = TTSPipeline(
            engine_12, codec, DummyTokenizer(), WhichLM.FISH_1_2,
            max_new_tokens=12,
        )
        try:
            chunks = list(pipe.synthesize_streaming("hello world", seed=11))
        except RuntimeError as e:
            if "ran away" in str(e):
                pytest.skip("random-weight legacy generation ran away")
            raise
        assert chunks, "no synthesis chunks produced"
        pcm = np.concatenate([c.pcm for c in chunks])
        assert pcm.ndim == 1 and len(pcm) > 0
        assert np.isfinite(pcm).all()
        assert all(c.codes.shape[0] == 4 for c in chunks)

    def test_pipeline_lowlatency_1_2_fallback(self, engine_12):
        """1.2 lowlatency streaming goes through the full-prefix delta
        fallback (symmetric pads: can_stream False). Total sample count
        must match the codec rate; chunk boundaries are approximate by
        construction (future context) so only shape/finiteness assert."""
        from fish_speech_tpu.pipeline import TTSPipeline

        codec_params = init_firefly_params(jax.random.PRNGKey(1), TINY_1_2)
        codec = FireflyCodec(codec_params, TINY_1_2, buckets=(16,))
        assert not codec.can_stream
        pipe = TTSPipeline(
            engine_12, codec, DummyTokenizer(), WhichLM.FISH_1_2,
            max_new_tokens=12,
        )
        parts = list(
            pipe.synthesize_streaming_lowlatency(
                "hello world", frame_chunk=4,
                sampling=SamplingArgs(temp=0.0), seed=11,
            )
        )
        assert parts, "no streamed PCM produced"
        pcm = np.concatenate(parts)
        assert np.isfinite(pcm).all()
        blocking = pipe.synthesize(
            "hello world", sampling=SamplingArgs(temp=0.0), seed=11
        )
        assert pcm.shape == blocking.shape
