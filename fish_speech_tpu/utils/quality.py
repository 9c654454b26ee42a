"""Offline audio-quality proxies: numeric listen-stand-ins for decisions
the zero-egress image cannot make by ear (BASELINE.md: the int8 default
flip, the bf16-vocoder default, real-checkpoint parity gates).

Methodology mirrors the reference's manual e2e comparison scripts
(reference: tests/e2e/hello.py:5-36 — MSE / max-err / SNR on PCM) and
adds the standard TTS listen-proxy: L1 distance in log-mel space, which
tracks perceptual differences far better than waveform error (phase
drift that is inaudible produces huge PCM MSE but near-zero mel
distance).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def pcm_metrics(a: np.ndarray, b: np.ndarray) -> Dict[str, float]:
    """Waveform-space metrics between two mono PCM arrays (the
    reference's hello.py set): mse, max_err, snr_db (a as signal,
    a-b as noise). Arrays are truncated to the common length."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    n = min(a.shape[0], b.shape[0])
    a, b = a[:n], b[:n]
    err = a - b
    mse = float(np.mean(err**2)) if n else 0.0
    sig = float(np.mean(a**2)) if n else 0.0
    snr = float(10.0 * np.log10(sig / mse)) if mse > 0 and sig > 0 else np.inf
    return {
        "mse": mse,
        "max_err": float(np.max(np.abs(err))) if n else 0.0,
        "snr_db": snr,
    }


def mel_l1_distance(a: np.ndarray, b: np.ndarray, spec_cfg) -> float:
    """Mean absolute log-mel difference between two mono PCM arrays at
    `spec_cfg`'s sample rate (the codec's own analysis front-end, so the
    proxy measures exactly what the encoder 'hears'). Typical anchors:
    identical audio -> 0; bf16-vs-f32 vocoder -> ~1e-3..1e-2; different
    utterances -> O(1)."""
    from fish_speech_tpu.audio.mel import LogMelSpectrogram

    spec = LogMelSpectrogram(spec_cfg)
    a = np.asarray(a, np.float32).ravel()
    b = np.asarray(b, np.float32).ravel()
    n = min(a.shape[0], b.shape[0])
    ma = np.asarray(spec(a[:n]))[0]
    mb = np.asarray(spec(b[:n]))[0]
    t = min(ma.shape[-1], mb.shape[-1])
    return float(np.mean(np.abs(ma[..., :t] - mb[..., :t])))
