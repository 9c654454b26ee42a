"""Grouped Residual FSQ.

Counterpart of the reference's ResidualFSQ / GroupedResidualFSQ
(reference: fish_speech_core/lib/codec/grouped_residual_fsq.rs).
Channels split into `groups` independent residual-FSQ stacks; each stage
quantizes the residual at scale (levels[0]-1)^-i. Fish 1.2 uses 4 groups
x 1 quantizer, 1.4/1.5 use 8 groups x 1 quantizer
(reference: codec/config.rs:144-168).

Params per group: {"project_in": {"w": (d_cb, dim_g) stored (in,out)...}}
— we store linear weights as (in, out) with optional "b".
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from fish_speech_tpu.config import DownsampleFSQConfig
from fish_speech_tpu.models.codec import fsq


def _linear(x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    out = x @ p["w"]
    if p.get("b") is not None:
        out = out + p["b"]
    return out


def _scales(levels: Tuple[int, ...], num_quantizers: int) -> List[float]:
    """(levels[0]-1)^-i per stage (reference: grouped_residual_fsq.rs:29-34)."""
    base = float(levels[0] - 1)
    return [base ** (-i) for i in range(num_quantizers)]


def residual_fsq_forward(
    x: jnp.ndarray,
    group_params: Dict,
    levels: Tuple[int, ...],
    num_quantizers: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (B, T, dim_g) -> (quantized (B, T, dim_g), indices (B, T, Q)).

    Matches the reference's forward (grouped_residual_fsq.rs:75-93)
    including the implicit first-stage bound of the input.
    """
    z = _linear(x, group_params["project_in"])  # (B, T, d_cb)
    quantized_out = jnp.zeros_like(z)
    residual = fsq.bound(z, levels)
    all_indices = []
    for scale in _scales(levels, num_quantizers):
        codes, indices = fsq.fsq_forward(residual / scale, levels)
        quantized = codes * scale
        residual = residual - quantized
        quantized_out = quantized_out + quantized
        all_indices.append(indices)
    out = _linear(quantized_out, group_params["project_out"])
    return out, jnp.stack(all_indices, axis=-1)


def residual_fsq_decode(
    indices: jnp.ndarray,
    group_params: Dict,
    levels: Tuple[int, ...],
    num_quantizers: int,
) -> jnp.ndarray:
    """indices: (B, T, Q) -> (B, T, dim_g)
    (reference: grouped_residual_fsq.rs:95-114).

    The codeword lookup is pure integer arithmetic (mixed-radix decode),
    so no gather/table is needed — it fuses into the surrounding ops.
    """
    scales = jnp.asarray(_scales(levels, num_quantizers), jnp.float32)
    codes = fsq.indices_to_codes(indices, levels)  # (B, T, Q, d_cb)
    summed = jnp.sum(codes * scales[None, None, :, None], axis=2)  # (B, T, d_cb)
    return _linear(summed, group_params["project_out"])


def grouped_forward(
    x: jnp.ndarray, params: List[Dict], cfg: DownsampleFSQConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (B, T, dim) -> (quantized (B, T, dim), indices (G, B, T, Q))
    (reference: grouped_residual_fsq.rs:154-173)."""
    chunks = jnp.split(x, cfg.n_groups, axis=-1)
    outs, idxs = [], []
    for chunk, gp in zip(chunks, params):
        q, i = residual_fsq_forward(chunk, gp, cfg.levels, cfg.n_codebooks)
        outs.append(q)
        idxs.append(i)
    return jnp.concatenate(outs, axis=-1), jnp.stack(idxs, axis=0)


def grouped_decode(
    indices: jnp.ndarray, params: List[Dict], cfg: DownsampleFSQConfig
) -> jnp.ndarray:
    """indices: (G, B, T, Q) -> (B, T, dim)
    (reference: grouped_residual_fsq.rs:175-185)."""
    outs = [
        residual_fsq_decode(indices[g], params[g], cfg.levels, cfg.n_codebooks)
        for g in range(cfg.n_groups)
    ]
    return jnp.concatenate(outs, axis=-1)


def init_group_params(
    rng: jax.Array, cfg: DownsampleFSQConfig, dtype=jnp.float32
) -> List[Dict]:
    dim_g = cfg.all_dims[-1] // cfg.n_groups
    d_cb = len(cfg.levels)
    params = []
    for g in range(cfg.n_groups):
        k1, k2, rng = jax.random.split(jax.random.fold_in(rng, g), 3)
        params.append(
            {
                "project_in": {
                    "w": jax.random.normal(k1, (dim_g, d_cb), dtype) * 0.02,
                    "b": jnp.zeros((d_cb,), dtype),
                },
                "project_out": {
                    "w": jax.random.normal(k2, (d_cb, dim_g), dtype) * 0.02,
                    "b": jnp.zeros((dim_g,), dtype),
                },
            }
        )
    return params
