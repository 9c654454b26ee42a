"""Codec tests: FSQ math, conv semantics vs torch, firefly shapes/roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import (
    BackboneConfig,
    DownsampleFSQConfig,
    FireflyConfig,
    FishVersion,
    HiFiGANConfig,
    SpecTransformConfig,
)
from fish_speech_tpu.models.codec import fsq
from fish_speech_tpu.models.codec.conv import conv1d, conv_transpose1d, fish_conv1d
from fish_speech_tpu.models.codec.firefly import (
    FireflyCodec,
    firefly_decode,
    firefly_encode_mel,
    init_firefly_params,
)

LEVELS = (8, 5, 5, 5)


class TestFSQ:
    def test_codebook_size(self):
        assert fsq.codebook_size(LEVELS) == 1000

    def test_index_roundtrip(self):
        idx = jnp.arange(1000)
        codes = fsq.indices_to_codes(idx, LEVELS)
        back = fsq.codes_to_indices(codes, LEVELS)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))

    def test_quantize_lands_on_grid(self):
        rng = np.random.default_rng(0)
        z = jnp.asarray(rng.normal(size=(2, 7, 4)).astype(np.float32) * 3)
        codes, idx = fsq.fsq_forward(z, LEVELS)
        assert int(idx.min()) >= 0 and int(idx.max()) < 1000
        # quantized codes must decode back to themselves via their index
        np.testing.assert_allclose(
            np.asarray(fsq.indices_to_codes(idx, LEVELS)),
            np.asarray(codes),
            atol=1e-6,
        )

    def test_bound_range(self):
        z = jnp.linspace(-100, 100, 50)[:, None] * jnp.ones((1, 4))
        bounded = np.asarray(fsq.bound(z, LEVELS))
        lv = np.asarray(LEVELS, np.float32)
        half_l = (lv - 1) * 1.001 / 2
        offset = np.where(lv % 2 == 0, 0.5, 0.0)
        assert np.all(bounded <= half_l - offset + 1e-4)
        assert np.all(bounded >= -half_l - offset - 1e-4)


class TestConvVsTorch:
    def test_conv1d_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 6, 20)).astype(np.float32)
        w = rng.normal(size=(8, 6, 5)).astype(np.float32)
        b = rng.normal(size=(8,)).astype(np.float32)
        for stride, dil, pad in [(1, 1, 2), (2, 1, 0), (1, 3, 6)]:
            ours = np.asarray(
                conv1d(
                    jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                    stride=stride, dilation=dil, padding=(pad, pad),
                )
            )
            theirs = F.conv1d(
                torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                stride=stride, dilation=dil, padding=pad,
            ).numpy()
            np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_depthwise_conv_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 6, 16)).astype(np.float32)
        w = rng.normal(size=(6, 1, 7)).astype(np.float32)
        ours = np.asarray(
            conv1d(jnp.asarray(x), jnp.asarray(w), None, groups=6, padding=(6, 0))
        )
        theirs = F.conv1d(
            F.pad(torch.from_numpy(x), (6, 0)), torch.from_numpy(w), groups=6
        ).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_conv_transpose_matches_torch(self):
        import torch
        import torch.nn.functional as F

        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 4, 10)).astype(np.float32)
        w = rng.normal(size=(4, 3, 8)).astype(np.float32)  # (I, O, K)
        b = rng.normal(size=(3,)).astype(np.float32)
        for stride in (2, 4, 8):
            ours = np.asarray(
                conv_transpose1d(
                    jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride
                )
            )
            theirs = F.conv_transpose1d(
                torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                stride=stride,
            ).numpy()
            np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_causal_conv_is_causal(self):
        """Fish 1.4+ convs must not look ahead: changing x[t:] must not
        change y[:t] (reference: codec/utils/mod.rs:53-62)."""
        rng = np.random.default_rng(4)
        x1 = rng.normal(size=(1, 3, 20)).astype(np.float32)
        x2 = x1.copy()
        x2[:, :, 10:] += 1.0
        p = {
            "w": jnp.asarray(rng.normal(size=(3, 3, 5)).astype(np.float32)),
            "b": jnp.zeros((3,)),
        }
        y1 = np.asarray(fish_conv1d(jnp.asarray(x1), p, version=FishVersion.V1_5))
        y2 = np.asarray(fish_conv1d(jnp.asarray(x2), p, version=FishVersion.V1_5))
        assert y1.shape[-1] == 20  # length-preserving
        np.testing.assert_allclose(y1[:, :, :10], y2[:, :, :10], atol=1e-6)
        assert not np.allclose(y1[:, :, 10:], y2[:, :, 10:])


# Tiny codec config for fast tests
TINY = FireflyConfig(
    spec_transform=SpecTransformConfig(
        sample_rate=44100, n_mels=20, n_fft=256, hop_length=64, win_length=256
    ),
    backbone=BackboneConfig(
        input_channels=20, depths=(1, 1), dims=(16, 32), kernel_size=7
    ),
    head=HiFiGANConfig(
        hop_length=64,
        upsample_rates=(8, 8),
        upsample_kernel_sizes=(16, 16),
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        num_mels=32,
        upsample_initial_channel=32,
        pre_conv_kernel_size=7,
        post_conv_kernel_size=7,
    ),
    quantizer=DownsampleFSQConfig(
        input_dim=32, n_groups=4, n_codebooks=1, levels=(8, 5, 5, 5),
        downsample_factor=(2,),
    ),
    version=FishVersion.V1_5,
)


@pytest.fixture(scope="module")
def tiny_codec():
    params = init_firefly_params(jax.random.PRNGKey(0), TINY)
    return FireflyCodec(params, TINY, buckets=(8, 16, 32))


class TestFirefly:
    def test_decode_shape(self, tiny_codec):
        codes = np.random.default_rng(0).integers(0, 1000, size=(4, 10))
        audio = tiny_codec.decode(codes)
        # T * downsample * hop samples
        assert audio.shape == (1, 10 * 2 * 64)
        assert np.abs(audio).max() <= 1.0  # tanh output

    def test_encode_shape(self, tiny_codec):
        t_samples = 64 * 40  # 40 hops
        audio = np.random.default_rng(1).normal(size=t_samples).astype(np.float32) * 0.1
        codes = tiny_codec.encode(audio)
        assert codes.shape[0] == 1
        assert codes.shape[1] == TINY.quantizer.num_semantic_codebooks
        assert codes.min() >= 0 and codes.max() < 1000

    def test_encode_decode_roundtrip_runs(self, tiny_codec):
        audio = np.random.default_rng(2).normal(size=64 * 32).astype(np.float32) * 0.1
        codes = tiny_codec.encode(audio)
        out = tiny_codec.decode(codes[0])
        assert out.shape[-1] == codes.shape[-1] * 2 * 64

    def test_bf16_codec_decode_and_encode(self, tiny_codec):
        """bf16 codec params must run both directions and stay close to
        f32 — the reference's vocoder CLI loads the codec bf16
        (bin/vocoder.rs:44-48) and our --bf16 flag maps to this path
        (regression: the FSQ f32 lattice output used to crash the bf16
        conv stack with a dtype mismatch)."""
        p16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            tiny_codec.params,
        )
        c16 = FireflyCodec(p16, TINY, buckets=(8, 16, 32))
        codes = np.random.default_rng(3).integers(0, 1000, size=(4, 10))
        a32 = tiny_codec.decode(codes)
        a16 = c16.decode(codes)
        assert a16.shape == a32.shape
        # bf16 GAN stack: coarse agreement (tanh output is O(1))
        assert np.abs(a16.astype(np.float32) - a32).max() < 0.1

        audio = np.random.default_rng(4).normal(size=64 * 32).astype(np.float32) * 0.1
        codes16 = c16.encode(audio)
        codes32 = tiny_codec.encode(audio)
        assert codes16.shape == codes32.shape
        assert (codes16 == codes32).mean() > 0.8  # argmin flips only near cell edges

    def test_quantizer_encode_decode_consistency(self):
        """decode(encode(z)) must reproduce the quantized features the
        encoder saw (same FSQ codewords through the rearrange)."""
        from fish_speech_tpu.models.codec import grfsq
        from fish_speech_tpu.models.codec.quantizer import init_quantizer_params

        cfg = TINY.quantizer
        params = init_quantizer_params(jax.random.PRNGKey(3), cfg)
        z = jax.random.normal(jax.random.PRNGKey(4), (1, 12, cfg.input_dim))
        q_direct, indices = grfsq.grouped_forward(z, params["rvqs"], cfg)
        g, b, t, q = indices.shape
        flat = np.asarray(indices.transpose(1, 0, 3, 2).reshape(b, g * q, t))
        grouped_back = jnp.asarray(flat).reshape(b, g, q, t).transpose(1, 0, 3, 2)
        q_back = grfsq.grouped_decode(grouped_back, params["rvqs"], cfg)
        np.testing.assert_allclose(
            np.asarray(q_back), np.asarray(q_direct), rtol=1e-4, atol=1e-5
        )

    def test_bucketed_decode_matches_exact(self, tiny_codec):
        """Padding codes to a bucket must not change the audio."""
        codes = np.random.default_rng(5).integers(0, 1000, size=(4, 10))
        a = tiny_codec.decode(codes)
        big = FireflyCodec(tiny_codec.params, TINY, buckets=(10,))
        b = big.decode(codes)
        np.testing.assert_allclose(a, b, atol=2e-5)


class TestFireflyStreaming:
    """Carried-state streaming decode (models/codec/firefly_stream.py):
    stream == batch exactly, for any chunking. The reference has no
    Firefly streaming at all (it vocodes whole text chunks,
    handlers/speech.rs:94-110); this is the TPU build's TTFA machinery."""

    def test_stream_equals_batch_any_chunking(self, tiny_codec):
        codes = np.random.default_rng(7).integers(0, 1000, size=(4, 37))
        ref = tiny_codec.decode(codes)[0]
        for chunking in ([37], [5, 16, 16], [1] * 37, [2, 3, 32]):
            sess = tiny_codec.start_stream(max_step_frames=16)
            parts, s = [], 0
            for n in chunking:
                parts.append(sess.feed(codes[:, s : s + n])[0])
                s += n
            out = np.concatenate(parts)
            assert out.shape == ref.shape
            np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_session_reset_restarts_stream(self, tiny_codec):
        codes = np.random.default_rng(8).integers(0, 1000, size=(4, 12))
        sess = tiny_codec.start_stream(max_step_frames=8)
        first = sess.feed(codes)
        sess.reset()
        again = sess.feed(codes)
        np.testing.assert_allclose(first, again, atol=0)

    def test_fish_1_2_not_streamable(self, tiny_codec):
        import dataclasses

        cfg12 = dataclasses.replace(TINY, version=FishVersion.V1_2)
        c12 = FireflyCodec(tiny_codec.params, cfg12, buckets=(8, 16, 32))
        assert not c12.can_stream
        with pytest.raises(ValueError):
            c12.start_stream()

    def test_bf16_stream_runs_and_tracks_f32(self, tiny_codec):
        p16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            tiny_codec.params,
        )
        c16 = FireflyCodec(p16, TINY, buckets=(8, 16, 32))
        codes = np.random.default_rng(9).integers(0, 1000, size=(4, 20))
        sess = c16.start_stream(max_step_frames=16)
        out = sess.feed(codes)[0]
        ref = tiny_codec.decode(codes)[0]
        assert out.shape == ref.shape
        assert np.abs(out.astype(np.float32) - ref).max() < 0.1  # tanh O(1)
