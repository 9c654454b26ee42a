"""Golden-parity tests for the JAX Mimi codec vs transformers.MimiModel
(random weights, tiny config)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from fish_speech_tpu.models.codec.mimi import (  # noqa: E402
    MimiCodec,
    MimiConfig,
    convert_mimi_state_dict,
    mimi_decode,
    mimi_encode,
    mimi_transformer,
)

TINY = dict(
    sampling_rate=2000,
    frame_rate=12.5,
    audio_channels=1,
    hidden_size=32,
    num_filters=8,
    kernel_size=7,
    last_kernel_size=3,
    residual_kernel_size=3,
    dilation_growth_rate=2,
    num_residual_layers=1,
    upsampling_ratios=[5, 4, 2, 2],
    compress=2,
    trim_right_ratio=1.0,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=8,
    intermediate_size=64,
    norm_eps=1e-5,
    rope_theta=10000.0,
    sliding_window=6,
    layer_scale_initial_scale=0.01,
    num_quantizers=4,
    codebook_size=32,
    codebook_dim=16,
    vector_quantization_hidden_dimension=16,
    num_semantic_quantizers=1,
    upsample_groups=32,
    use_causal_conv=True,
    pad_mode="constant",
    use_conv_shortcut=False,
    use_cache=False,
)


@pytest.fixture(scope="module")
def models():
    from transformers import MimiConfig as HFMimiConfig
    from transformers import MimiModel

    torch.manual_seed(0)
    hf_cfg = HFMimiConfig(**TINY)
    hf = MimiModel(hf_cfg).eval()
    # randomize the codebooks (post_init leaves embed_sum at zero)
    with torch.no_grad():
        for q in (
            hf.quantizer.semantic_residual_vector_quantizer,
            hf.quantizer.acoustic_residual_vector_quantizer,
        ):
            for layer in q.layers:
                layer.codebook.embed_sum.normal_()
                layer.codebook.cluster_usage.uniform_(0.5, 2.0)

    cfg = MimiConfig(
        **{
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in TINY.items()
            if k in MimiConfig.__dataclass_fields__
        }
    )
    params = convert_mimi_state_dict(hf.state_dict(), cfg)
    return hf, cfg, params


def test_transformer_parity(models):
    hf, cfg, params = models
    torch.manual_seed(1)
    x = torch.randn(1, 20, cfg.hidden_size)  # T=20 > sliding_window=6
    with torch.no_grad():
        ref = hf.decoder_transformer(x.clone())[0].numpy()
    got = np.asarray(
        mimi_transformer(jnp.asarray(x.numpy()), params["decoder_transformer"], cfg)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_decode_parity(models):
    hf, cfg, params = models
    rng = np.random.default_rng(0)
    codes = rng.integers(0, cfg.codebook_size, size=(1, cfg.num_quantizers, 9))
    with torch.no_grad():
        ref = hf.decode(torch.from_numpy(codes))[0].numpy()
    got = np.asarray(mimi_decode(jnp.asarray(codes, jnp.int32), params, cfg))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_encode_parity(models):
    hf, cfg, params = models
    rng = np.random.default_rng(1)
    t = cfg.hop_length * 7 + 13  # deliberately not frame-aligned
    audio = rng.normal(size=(1, 1, t)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = hf.encode(torch.from_numpy(audio))[0].numpy()
    got = np.asarray(
        mimi_encode(jnp.asarray(audio), params, cfg, cfg.num_quantizers)
    )
    assert got.shape == ref.shape
    # nearest-centroid argmins can flip on float noise for a few frames
    agree = (got == ref).mean()
    assert agree > 0.97, f"only {agree:.2%} of codes agree"


def test_streaming_decode_matches_batch(models):
    """decode_step chunked feeding == whole-sequence decode, exactly the
    reference's streaming contract (mimi.rs:52-88): chunk boundaries must
    be inaudible. Exercises causal-conv state carry, transposed-conv
    overlap-add, and the sliding-window KV ring (T*2 transformer positions
    >> sliding_window=6, multiple ring wraps)."""
    _, cfg, params = models
    codec = MimiCodec(params, cfg)
    rng = np.random.default_rng(3)
    t = 20
    codes = rng.integers(0, cfg.codebook_size, size=(cfg.num_quantizers, t))
    ref = codec.decode(codes)  # (1, t*hop)

    session = codec.start_stream(max_step_frames=4)
    parts = []
    i = 0
    for step in (1, 3, 4, 2, 4, 1, 5):  # ragged chunking
        parts.append(session.feed(codes[:, i : i + step]))
        i += step
    assert i == t
    got = np.concatenate(parts, axis=-1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_streaming_reset_keeps_batch(models):
    """reset() preserves the session's batch size (a batch-2 session must
    stay batch-2 — regression: reset used to rebuild batch-1 state)."""
    _, cfg, params = models
    codec = MimiCodec(params, cfg)
    rng = np.random.default_rng(6)
    codes = rng.integers(0, cfg.codebook_size, size=(2, cfg.num_quantizers, 6))
    session = codec.start_stream(batch=2, max_step_frames=4)
    _ = session.feed(codes)
    session.reset()
    got = session.feed(codes)
    ref = codec.decode(codes)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_streaming_reset(models):
    """reset() starts an independent stream: the same codes decoded after
    reset equal a fresh batch decode (no state leakage across streams)."""
    _, cfg, params = models
    codec = MimiCodec(params, cfg)
    rng = np.random.default_rng(4)
    codes = rng.integers(0, cfg.codebook_size, size=(cfg.num_quantizers, 7))
    session = codec.start_stream(max_step_frames=4)
    _ = session.feed(codes)  # pollute state
    session.reset()
    got = session.feed(codes)
    ref = codec.decode(codes)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_encode_decode_roundtrip_shapes(models):
    _, cfg, params = models
    codec = MimiCodec(params, cfg)
    rng = np.random.default_rng(2)
    audio = rng.normal(size=(cfg.hop_length * 10,)).astype(np.float32) * 0.1
    codes = codec.encode(audio)
    assert codes.shape[0] == 1 and codes.shape[1] == cfg.num_quantizers
    pcm = codec.decode(codes[0])
    assert pcm.shape[0] == 1
    assert pcm.shape[1] >= cfg.hop_length * (codes.shape[2] - 1)
