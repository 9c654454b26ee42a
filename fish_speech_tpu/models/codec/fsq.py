"""Finite Scalar Quantization (FSQ).

Functional JAX counterpart of the reference's FSQ module
(reference: fish_speech_core/lib/codec/fsq.rs). Levels are static config
so everything folds into constants under jit. With levels (8, 5, 5, 5)
the implicit codebook has 1000 entries — the "1024" codebook of Fish
Speech is this, zero-padded in vocab space.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _levels_arr(levels: Tuple[int, ...]) -> np.ndarray:
    return np.asarray(levels, dtype=np.float32)


def _basis_arr(levels: Tuple[int, ...]) -> np.ndarray:
    """Mixed-radix basis [1, l0, l0*l1, ...] (reference: fsq.rs:53-58)."""
    basis = np.ones(len(levels), dtype=np.float32)
    for i in range(1, len(levels)):
        basis[i] = basis[i - 1] * levels[i - 1]
    return basis


def codebook_size(levels: Tuple[int, ...]) -> int:
    out = 1
    for level in levels:
        out *= level
    return out


def bound(z: jnp.ndarray, levels: Tuple[int, ...]) -> jnp.ndarray:
    """tanh-bound z into the quantization range (reference: fsq.rs:68-85).

    half_l carries the reference's 1.001 widening; even levels get a 0.5
    offset with an atanh pre-shift so the rounding grid is centered.
    """
    lv = jnp.asarray(_levels_arr(levels))
    half_l = (lv - 1.0) * 1.001 / 2.0
    offset = jnp.where(lv % 2.0 == 0.0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    return jnp.tanh(z + shift) * half_l - offset


def quantize(z: jnp.ndarray, levels: Tuple[int, ...]) -> jnp.ndarray:
    """Round to the grid, normalized to [-1, 1] (reference: fsq.rs:87-92)."""
    lv = jnp.asarray(_levels_arr(levels))
    half_width = jnp.floor(lv / 2.0)
    return jnp.round(bound(z, levels)) / half_width


def codes_to_indices(codes: jnp.ndarray, levels: Tuple[int, ...]) -> jnp.ndarray:
    """(… , d) normalized codes -> (…,) integer indices (fsq.rs:124-130)."""
    lv = jnp.asarray(_levels_arr(levels))
    half_width = jnp.floor(lv / 2.0)
    zhat = codes * half_width + half_width
    return jnp.sum(zhat * jnp.asarray(_basis_arr(levels)), axis=-1).astype(jnp.int32)


def indices_to_codes(indices: jnp.ndarray, levels: Tuple[int, ...]) -> jnp.ndarray:
    """(…,) integer indices -> (…, d) normalized codes (fsq.rs:132-143)."""
    lv = jnp.asarray(_levels_arr(levels))
    basis = jnp.asarray(_basis_arr(levels))
    x = indices[..., None].astype(jnp.float32)
    noncentered = jnp.floor(x / basis)
    noncentered = noncentered - jnp.floor(noncentered / lv) * lv  # remainder
    half_width = jnp.floor(lv / 2.0)
    return (noncentered - half_width) / half_width


def implicit_codebook(levels: Tuple[int, ...]) -> np.ndarray:
    """All codewords, (codebook_size, d) (reference: fsq.rs:155-159)."""
    idx = np.arange(codebook_size(levels), dtype=np.float32)
    return np.asarray(indices_to_codes(jnp.asarray(idx), levels))


def fsq_forward(
    z: jnp.ndarray, levels: Tuple[int, ...]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize (B, T, d) -> (codes (B, T, d), indices (B, T) int32)."""
    codes = quantize(z, levels)
    return codes, codes_to_indices(codes, levels)
