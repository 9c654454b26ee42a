"""Offline audio-quality proxies (utils/quality.py): anchors for the
metrics themselves, plus the vocoder-dtype listen-proxy bound (the
bf16-vs-f32 codec decision is recorded in BASELINE.md against these
numbers). Methodology mirrors the reference's manual comparison scripts
(reference: tests/e2e/hello.py:5-36)."""

import jax
import numpy as np

from fish_speech_tpu.models.codec.firefly import (
    FireflyCodec,
    init_firefly_params,
)
from fish_speech_tpu.utils.quality import mel_l1_distance, pcm_metrics
from tests.test_server import CODEC_CFG, NUM_CODEBOOKS


def test_metric_anchors():
    rng = np.random.default_rng(0)
    a = rng.normal(size=16000).astype(np.float32) * 0.2
    # identical -> zero distance, infinite SNR
    m = pcm_metrics(a, a)
    assert m["mse"] == 0.0 and m["snr_db"] == np.inf
    assert mel_l1_distance(a, a, CODEC_CFG.spec_transform) == 0.0
    # small noise -> small but nonzero distance, finite SNR
    b = a + rng.normal(size=a.shape).astype(np.float32) * 2e-3
    m = pcm_metrics(a, b)
    assert 0 < m["mse"] < 1e-4 and 20 < m["snr_db"] < 80
    d_small = mel_l1_distance(a, b, CODEC_CFG.spec_transform)
    # unrelated signal -> large distance (orders above the noise case)
    c = rng.normal(size=a.shape).astype(np.float32) * 0.2
    d_large = mel_l1_distance(a, c, CODEC_CFG.spec_transform)
    assert 0 < d_small < d_large


def test_vocoder_bf16_listen_proxy():
    """bf16 vocoder output must stay mel-close to f32 (the serving
    default decision, BASELINE.md): the proxy bound here is what stands
    in for a listening test in this zero-egress image."""
    import jax.numpy as jnp

    params32 = init_firefly_params(jax.random.PRNGKey(3), CODEC_CFG)
    params16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params32
    )
    codec32 = FireflyCodec(params32, CODEC_CFG, buckets=(32,))
    codec16 = FireflyCodec(params16, CODEC_CFG, buckets=(32,))
    codes = np.random.default_rng(1).integers(
        0, 999, size=(NUM_CODEBOOKS, 30)
    ).astype(np.int32)
    p32 = codec32.decode(codes)[0]
    p16 = codec16.decode(codes)[0].astype(np.float32)
    mel = mel_l1_distance(p32, p16, CODEC_CFG.spec_transform)
    m = pcm_metrics(p32, p16)
    # anchor scale: unrelated signals measure O(1) mel-L1 (see
    # test_metric_anchors); bf16 rounding must sit orders below that
    assert mel < 0.1, f"bf16 vocoder mel-L1 {mel} vs f32"
    assert m["snr_db"] > 15, f"bf16 vocoder SNR {m['snr_db']} dB"
