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


def teacher_forced_predictions(params, cfg, token_cfg, tokens: np.ndarray):
    """Per-position argmax predictions of a DualAR parameter set scored
    on a GIVEN token sequence (teacher-forced).

    tokens: (C+1, S) int32 — semantic row + codebook rows, prompt and
    generated frames concatenated (the engine's raw LM-token space,
    BEFORE the fish-1.5 output shift).

    Returns (slow_pred (S-1,), fast_pred (S-1, C), audio_mask (S-1,)):
    slow_pred[t] is the model's next-semantic argmax at position t+1,
    fast_pred[t] the codebook argmaxes for frame t+1 given the TRUE
    previous codebooks, audio_mask[t] whether the target frame t+1 is an
    audio frame (the dual_ar_loss mask: codebook rows of text frames are
    zeros by construction and carry no prediction). The parameter set
    may be int8-quantized (ops/quant.py dicts): the training forwards
    route every matmul through ops/quant.matmul.
    """
    import jax.numpy as jnp

    from fish_speech_tpu.ops.norms import rms_norm
    from fish_speech_tpu.ops.quant import matmul as _mm
    from fish_speech_tpu.train.loss import (
        fast_forward_teacher,
        slow_forward_full,
    )

    tok = jnp.asarray(np.asarray(tokens, np.int32))[None]  # (1, C+1, S)
    b, cp1, s = tok.shape
    c = cp1 - 1
    seq_lens = jnp.full((b,), s, jnp.int32)

    hidden = slow_forward_full(
        params, cfg, token_cfg, tok, seq_lens, remat=False
    )  # (1, S, D)
    slow_out = rms_norm(hidden, params["norm"], cfg.norm_eps)
    slow_pred = jnp.argmax(
        _mm(slow_out[:, :-1, :], params["output"]).astype(jnp.float32),
        axis=-1,
    )  # (1, S-1)
    cb_targets = tok[:, 1:, 1:].transpose(0, 2, 1)  # (1, S-1, C)
    fast_logits = fast_forward_teacher(
        params,
        cfg,
        hidden[:, :-1, :].reshape(b * (s - 1), cfg.dim),
        cb_targets.reshape(b * (s - 1), c),
    )
    fast_pred = jnp.argmax(fast_logits, axis=-1).reshape(s - 1, c)

    sem_next = np.asarray(tok[0, 0, 1:])
    if token_cfg.semantic_end_id is not None:
        audio_mask = (sem_next >= token_cfg.semantic_start_id) & (
            sem_next <= token_cfg.semantic_end_id
        )
    else:
        audio_mask = sem_next == token_cfg.semantic_start_id
    return np.asarray(slow_pred[0]), np.asarray(fast_pred), audio_mask


def teacher_forced_agreement(
    preds_a, preds_b
) -> Dict[str, float]:
    """Argmax agreement between two teacher_forced_predictions results —
    the cascade-free form of the int8 flip criterion's "token agreement"
    (utils/int8_policy.py).

    Free-running greedy agreement measures the first-divergence
    position, not local decision quality: one flipped argmax at frame k
    zeroes agreement for every later frame (greedy decoding feeds its
    own output back), so even a perceptually perfect int8 model cannot
    reach 99% over a long generation. Teacher forcing compares the two
    models' next-token argmax at every position under the IDENTICAL
    context — the reference's own parity methodology
    (tests/e2e/backbone-allclose.py:63-92) compares per-position outputs
    of the two implementations the same way, never free-running
    trajectories.

    Returns {"slow": .., "fast": .., "combined": .., "n": ..}:
    slow-head agreement over every next-position prediction, fast-head
    agreement over audio-frame codebook predictions, and the combined
    fraction over all compared predictions.
    """
    slow_a, fast_a, mask = preds_a
    slow_b, fast_b, _ = preds_b
    slow_match = slow_a == slow_b  # (S-1,)
    fast_match = (fast_a == fast_b)[mask]  # (n_audio, C)
    n_slow = slow_match.size
    n_fast = fast_match.size
    slow_agree = float(slow_match.mean()) if n_slow else 1.0
    fast_agree = float(fast_match.mean()) if n_fast else 1.0
    n = n_slow + n_fast
    combined = (
        float((slow_match.sum() + fast_match.sum()) / n) if n else 1.0
    )
    return {
        "slow": slow_agree,
        "fast": fast_agree,
        "combined": combined,
        "n": float(n),
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
