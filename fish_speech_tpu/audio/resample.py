"""Linear-interpolation resampler (reference: audio/functional.rs:3-37)."""

from __future__ import annotations

import numpy as np


def resample(pcm: np.ndarray, from_rate: int, to_rate: int) -> np.ndarray:
    """pcm: (C, T) or (T,) f32 -> same layout at to_rate.

    Gather-based linear interpolation, matching the reference's device
    implementation sample-for-sample."""
    if from_rate == to_rate:
        return pcm
    squeeze = pcm.ndim == 1
    x = np.atleast_2d(np.asarray(pcm, dtype=np.float32))
    c, n = x.shape
    ratio = to_rate / from_rate
    # exact integer ceil (the reference's f64 ceil can overshoot by 1
    # sample on exact ratios; integer math is deterministic)
    out_len = (n * to_rate + from_rate - 1) // from_rate
    pos = np.arange(out_len, dtype=np.float64) / ratio
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(np.ceil(pos).astype(np.int64), n - 1)
    t = (pos - lo).astype(np.float32)
    out = x[:, lo] * (1.0 - t) + x[:, hi] * t
    return out[0] if squeeze else out
