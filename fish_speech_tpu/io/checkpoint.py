"""Checkpoint loading: Fish Speech safetensors / torch .pth -> JAX pytrees.

Counterpart of the reference's VarBuilder-based loading
(reference: server/lib/utils/load.rs:62-188, dual_ar.rs:460-529). Weight
names follow the upstream dumps in /root/reference/docs/llama-weight-dict.txt
and weight-dims-default.txt:

* LM: embeddings / codebook_embeddings / fast_embeddings, per-layer
  {layers,fast_layers}.N.{attention.{wqkv,wo},feed_forward.{w1,w2,w3},
  attention_norm,ffn_norm}.weight, norm / fast_norm / output / fast_output.
  Linear weights are transposed to (in, out) and layers are stacked into
  (L, ...) arrays for the lax.scan stack.
* Codec: backbone.downsample_layers / backbone.stages ConvNeXt weights,
  quantizer.{downsample,upsample}.N.{0,1}, quantizer.residual_fsq.rvqs.N
  projections, head.{conv_pre,ups,resblocks,conv_post}. Fish 1.4+ wraps
  every Fish conv in a `conv.` prefix (reference: codec/utils/mod.rs:28-39);
  Fish 1.2 .pth ships torch weight-norm parametrizations which we merge at
  load (the reference demands a pre-merged file instead,
  bin/vocoder.rs:60-66 — we handle it directly).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.config import DualARConfig, FireflyConfig, FishVersion


def _merge_weight_norm(raw: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fold torch weight_norm parametrizations:
    w = g * v / ||v|| with the norm over all dims except 0."""
    out: Dict[str, np.ndarray] = {}
    done = set()
    for name in raw:
        if name.endswith("parametrizations.weight.original0"):
            base = name[: -len("parametrizations.weight.original0")]
            g = raw[name].astype(np.float64)
            v = raw[base + "parametrizations.weight.original1"].astype(np.float64)
            norm = np.sqrt(
                np.sum(v**2, axis=tuple(range(1, v.ndim)), keepdims=True)
            )
            out[base + "weight"] = (g * v / norm).astype(np.float32)
            done.add(name)
            done.add(base + "parametrizations.weight.original1")
    for name, val in raw.items():
        if name not in done and "parametrizations" not in name:
            out[name] = val
    return out


def load_raw_checkpoint(path: str | Path) -> Dict[str, np.ndarray]:
    """Read one safetensors or torch .pth file into {name: np.ndarray}."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        try:
            return dict(load_file(str(path)))
        except Exception:
            # bf16 safetensors aren't numpy-native; go through torch
            from safetensors.torch import load_file as load_torch

            return {
                k: v.to(dtype=__import__("torch").float32).numpy()
                for k, v in load_torch(str(path)).items()
            }
    # torch pickle (.pth / .pt / .bin)
    import torch

    state = torch.load(str(path), map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    raw = {k: v.to(dtype=torch.float32).numpy() for k, v in state.items()}
    return _merge_weight_norm(raw)


def _find_weights_file(ckpt_dir: Path, names) -> Path:
    for name in names:
        p = ckpt_dir / name
        if p.exists():
            return p
    raise FileNotFoundError(f"No weights file in {ckpt_dir} (tried {names})")


# --------------------------------------------------------------------------
# LM
# --------------------------------------------------------------------------


def load_lm_params(
    checkpoint: str | Path,
    cfg: DualARConfig,
    dtype=jnp.bfloat16,
) -> Dict:
    """checkpoint: directory containing model.safetensors / model.pth, or a
    weights file directly. Returns the DualARParams pytree."""
    path = Path(checkpoint)
    if path.is_dir():
        path = _find_weights_file(
            path, ["model.safetensors", "model.pth", "pytorch_model.bin"]
        )
    raw = load_raw_checkpoint(path)

    def get(name: str) -> np.ndarray:
        if name not in raw:
            raise KeyError(f"Missing weight {name!r} in {path}")
        return raw[name]

    def linear_t(name: str) -> jnp.ndarray:
        return jnp.asarray(get(name).T, dtype)

    def stack(prefix: str, n: int) -> Dict[str, jnp.ndarray]:
        return {
            "wqkv": jnp.stack(
                [linear_t(f"{prefix}.{i}.attention.wqkv.weight") for i in range(n)]
            ),
            "wo": jnp.stack(
                [linear_t(f"{prefix}.{i}.attention.wo.weight") for i in range(n)]
            ),
            "w1": jnp.stack(
                [linear_t(f"{prefix}.{i}.feed_forward.w1.weight") for i in range(n)]
            ),
            "w3": jnp.stack(
                [linear_t(f"{prefix}.{i}.feed_forward.w3.weight") for i in range(n)]
            ),
            "w2": jnp.stack(
                [linear_t(f"{prefix}.{i}.feed_forward.w2.weight") for i in range(n)]
            ),
            "attention_norm": jnp.stack(
                [
                    jnp.asarray(get(f"{prefix}.{i}.attention_norm.weight"), dtype)
                    for i in range(n)
                ]
            ),
            "ffn_norm": jnp.stack(
                [
                    jnp.asarray(get(f"{prefix}.{i}.ffn_norm.weight"), dtype)
                    for i in range(n)
                ]
            ),
        }

    embeddings = jnp.asarray(get("embeddings.weight"), dtype)
    output = (
        embeddings.T
        if cfg.tie_word_embeddings
        else linear_t("output.weight")
    )
    return {
        "embeddings": embeddings,
        "codebook_embeddings": jnp.asarray(get("codebook_embeddings.weight"), dtype),
        "fast_embeddings": jnp.asarray(get("fast_embeddings.weight"), dtype),
        "norm": jnp.asarray(get("norm.weight"), dtype),
        "fast_norm": jnp.asarray(get("fast_norm.weight"), dtype),
        "output": output,
        "fast_output": linear_t("fast_output.weight"),
        "slow": stack("layers", cfg.n_layer),
        "fast": stack("fast_layers", cfg.n_fast_layer),
    }


# --------------------------------------------------------------------------
# Firefly codec
# --------------------------------------------------------------------------


def load_firefly_params(
    checkpoint: str | Path,
    cfg: FireflyConfig,
    dtype=jnp.float32,
) -> Dict:
    """checkpoint: firefly weights file (safetensors or merged/raw .pth)."""
    path = Path(checkpoint)
    if path.is_dir():
        path = _find_weights_file(
            path,
            [
                "firefly-gan-vq-fsq-8x1024-21hz-generator.safetensors",
                "firefly-gan-vq-fsq-4x1024-42hz-generator.safetensors",
                "firefly-gan-vq-fsq-4x1024-42hz-generator-merged.pth",
                "firefly-gan-base-generator.ckpt",
            ],
        )
    raw = load_raw_checkpoint(path)
    is_1_2 = cfg.version == FishVersion.V1_2
    fish_conv_infix = "" if is_1_2 else "conv."

    def get(name: str) -> np.ndarray:
        if name not in raw:
            raise KeyError(f"Missing weight {name!r} in {path}")
        return raw[name]

    def conv(name: str) -> Dict[str, jnp.ndarray]:
        return {
            "w": jnp.asarray(get(f"{name}.weight"), dtype),
            "b": jnp.asarray(get(f"{name}.bias"), dtype),
        }

    def fish_conv(name: str) -> Dict[str, jnp.ndarray]:
        return conv(f"{name}.{fish_conv_infix}".rstrip("."))

    def norm(name: str) -> Dict[str, jnp.ndarray]:
        return {
            "w": jnp.asarray(get(f"{name}.weight"), dtype),
            "b": jnp.asarray(get(f"{name}.bias"), dtype),
        }

    def linear_t(name: str) -> Dict[str, jnp.ndarray]:
        p = {"w": jnp.asarray(get(f"{name}.weight").T, dtype)}
        if f"{name}.bias" in raw:
            p["b"] = jnp.asarray(get(f"{name}.bias"), dtype)
        return p

    def convnext_block(name: str) -> Dict:
        p = {
            "dwconv": fish_conv(f"{name}.dwconv"),
            "norm": norm(f"{name}.norm"),
            "pwconv1": linear_t(f"{name}.pwconv1"),
            "pwconv2": linear_t(f"{name}.pwconv2"),
        }
        if f"{name}.gamma" in raw:
            p["gamma"] = jnp.asarray(get(f"{name}.gamma"), dtype)
        return p

    # backbone (encoder)
    bb = cfg.backbone
    backbone = {
        "stem": {
            "conv": fish_conv("backbone.downsample_layers.0.0"),
            "norm": norm("backbone.downsample_layers.0.1"),
            "blocks": [
                convnext_block(f"backbone.stages.0.{j}") for j in range(bb.depths[0])
            ],
        },
        "mid": [
            {
                "norm": norm(f"backbone.downsample_layers.{i}.0"),
                "conv": conv(f"backbone.downsample_layers.{i}.1"),
                "blocks": [
                    convnext_block(f"backbone.stages.{i}.{j}")
                    for j in range(bb.depths[i])
                ],
            }
            for i in range(1, len(bb.depths))
        ],
        "final_norm": norm("backbone.norm"),
    }

    # quantizer
    q = cfg.quantizer
    quantizer = {
        "downsample": [
            {
                "conv": fish_conv(f"quantizer.downsample.{i}.0"),
                "block": convnext_block(f"quantizer.downsample.{i}.1"),
            }
            for i in range(len(q.downsample_factor))
        ],
        "upsample": [
            {
                "conv": fish_conv(f"quantizer.upsample.{i}.0"),
                "block": convnext_block(f"quantizer.upsample.{i}.1"),
            }
            for i in range(len(q.downsample_factor))
        ],
        "rvqs": [
            {
                "project_in": linear_t(f"quantizer.residual_fsq.rvqs.{g}.project_in"),
                "project_out": linear_t(
                    f"quantizer.residual_fsq.rvqs.{g}.project_out"
                ),
            }
            for g in range(q.n_groups)
        ],
    }

    # HiFiGAN head
    h = cfg.head
    head = {
        "conv_pre": fish_conv("head.conv_pre"),
        "ups": [fish_conv(f"head.ups.{i}") for i in range(len(h.upsample_rates))],
        "resblocks": [
            [
                {
                    "convs1": [
                        fish_conv(f"head.resblocks.{i}.blocks.{j}.convs1.{t}")
                        for t in range(len(h.resblock_dilation_sizes[j]))
                    ],
                    "convs2": [
                        fish_conv(f"head.resblocks.{i}.blocks.{j}.convs2.{t}")
                        for t in range(len(h.resblock_dilation_sizes[j]))
                    ],
                }
                for j in range(len(h.resblock_kernel_sizes))
            ]
            for i in range(len(h.upsample_rates))
        ],
        "conv_post": fish_conv("head.conv_post"),
    }

    return {"backbone": backbone, "quantizer": quantizer, "head": head}
