"""Log-mel spectrogram, reproducing the reference's framing semantics.

The reference runs a streaming overlap-save FFT on the CPU in f64
(reference: fish_speech_core/lib/audio/stft.rs, audio/spectrogram.rs).
Unrolled, its framing is equivalent to:

  * reflect-pad the signal by (n_fft - hop) / 2 on each side
    (spectrogram.rs:36-38),
  * extract frames of n_fft samples at stride hop starting at offset 0,
    zero-padding the tail so num_frames = ceil(len_padded / hop) - 3
    (one frame per hop chunk once the overlap buffer fills,
    stft.rs:53-91),
  * periodic Hann window (denominator n_fft, stft.rs:33-36), rFFT,
    magnitude, + 1e-6 (spectrogram.rs:83),
  * mel filterbank matmul, clamp(1e-5, 100), log (spectrogram.rs:141-158).

NOTE this differs from upstream torch fish-speech (center=True pads by
n_fft/2): the reference's frames are shifted half a hop earlier. We match
the REFERENCE.

Here the whole pipeline is a jitted device computation in f32: framing is
a reshape+slice, the FFT is jnp.fft.rfft, and the mel projection is a
single (F, 1025) x (1025, 160) matmul on the MXU. The 160-bin mel
filterbank is generated at load (librosa-compatible slaney norm, verified
to 2e-7 against the reference's baked melfilters160.bytes blob).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.config import SpecTransformConfig


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """Slaney-scale, slaney-normed mel filterbank, (n_fft//2+1, n_mels).

    Matches the reference's melfilters160.bytes blob (librosa formula;
    verified max abs err 1.8e-7)."""
    if fmax is None:
        fmax = sr / 2.0

    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0

    def hz_to_mel(f):
        f = np.atleast_1d(np.asarray(f, dtype=np.float64))
        mel = f / f_sp
        log_t = f >= min_log_hz
        mel[log_t] = min_log_mel + np.log(f[log_t] / min_log_hz) / logstep
        return mel

    def mel_to_hz(m):
        m = np.atleast_1d(np.asarray(m, dtype=np.float64))
        f = m * f_sp
        log_t = m >= min_log_mel
        f[log_t] = min_log_hz * np.exp(logstep * (m[log_t] - min_log_mel))
        return f

    n_freqs = n_fft // 2 + 1
    fftfreqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = mel_to_hz(
        np.linspace(hz_to_mel(fmin)[0], hz_to_mel(fmax)[0], n_mels + 2)
    )
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (n_freqs, n_mels)


def num_frames(n_samples: int, n_fft: int, hop: int) -> int:
    """Frame count for the reference's streaming semantics."""
    padded = n_samples + 2 * ((n_fft - hop) // 2)
    return max(-(-padded // hop) - 3, 0)


@partial(jax.jit, static_argnames=("n_fft", "hop"))
def _frames_magnitude(signal: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """signal: (T,) already reflect-padded and tail-zero-padded to
    (F-1)*hop + n_fft. Returns (F, n_fft//2+1) magnitudes."""
    n = signal.shape[0]
    f = (n - n_fft) // hop + 1
    idx = jnp.arange(f)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = signal[idx]
    window = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(n_fft) / n_fft))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    return jnp.abs(spec).astype(jnp.float32) + 1e-6


class LogMelSpectrogram:
    """(reference: audio/spectrogram.rs:121-159)."""

    def __init__(self, cfg: SpecTransformConfig = SpecTransformConfig()) -> None:
        self.cfg = cfg
        self.sample_rate = cfg.sample_rate
        self.hop_length = cfg.hop_length
        self._mel = jnp.asarray(
            mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels)
        )

    def __call__(self, audio: np.ndarray) -> jnp.ndarray:
        """audio: (T,) or (1, T) f32 -> (1, n_mels, frames) log-mel."""
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        n_fft, hop = self.cfg.n_fft, self.cfg.hop_length
        pad = (n_fft - hop) // 2
        f = num_frames(audio.shape[0], n_fft, hop)
        if f == 0:
            return jnp.zeros((1, self.cfg.n_mels, 0), jnp.float32)
        padded = np.concatenate(
            [audio[:pad][::-1], audio, audio[-pad:][::-1]]
        )
        need = (f - 1) * hop + n_fft
        if padded.shape[0] < need:
            padded = np.pad(padded, (0, need - padded.shape[0]))
        else:
            padded = padded[:need]
        mags = _frames_magnitude(jnp.asarray(padded), n_fft, hop)  # (F, bins)
        mel = mags @ self._mel  # (F, n_mels)
        mel = jnp.log(jnp.clip(mel, 1e-5, 100.0))
        return mel.T[None]  # (1, n_mels, F)
