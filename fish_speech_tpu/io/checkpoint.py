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


_SAFETENSORS_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "U32": np.uint32,
    "U64": np.uint64,
    "BOOL": np.bool_,
}


def _load_safetensors_mmap(path: Path) -> Dict[str, np.ndarray]:
    """Zero-copy safetensors reader: mmap the file and view each tensor's
    byte range directly — including BF16 via ml_dtypes (numpy has no
    native bfloat16, and Fish 1.5's flagship model.safetensors IS bf16).
    Torch-free by design, matching the reference's mmap'd VarBuilder load
    (reference: server/lib/utils/load.rs:93-98).

    Format: u64-LE header length, JSON header {name: {dtype, shape,
    data_offsets}}, raw little-endian tensor data.
    """
    import json
    import mmap

    import ml_dtypes

    dtypes = dict(_SAFETENSORS_DTYPES, BF16=ml_dtypes.bfloat16)
    with open(path, "rb") as f:
        header_len = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(header_len))
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    base = 8 + header_len
    out: Dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        if meta["dtype"] not in dtypes:
            # exotic dtype (e.g. F8_*): punt the whole file to the
            # safetensors library, which knows how to widen it
            return _load_safetensors_fallback(path)
        dt = np.dtype(dtypes[meta["dtype"]])
        begin, end = meta["data_offsets"]
        count = (end - begin) // dt.itemsize
        out[name] = np.frombuffer(
            mm, dtype=dt, count=count, offset=base + begin
        ).reshape(meta["shape"])
    return out


def _load_safetensors_fallback(path: Path) -> Dict[str, np.ndarray]:
    """Slow path for safetensors dtypes the mmap reader doesn't map
    (fp8 variants etc.): load via safetensors+torch, widened to f32."""
    try:
        import torch
        from safetensors.torch import load_file
    except ImportError as e:  # pragma: no cover — informative failure
        raise ValueError(
            f"{path} contains a tensor dtype the built-in reader does not "
            "support, and the torch fallback is unavailable"
        ) from e
    sd = load_file(str(path))
    return {
        k: (v.float().numpy() if v.is_floating_point() else v.numpy())
        for k, v in sd.items()
    }


_TORCH_STORAGE_DTYPES = {
    "DoubleStorage": np.dtype(np.float64),
    "FloatStorage": np.dtype(np.float32),
    "HalfStorage": np.dtype(np.float16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
}


class _TorchPickleError(ValueError):
    pass


def _load_torch_pth(path: Path) -> Dict[str, np.ndarray]:
    """Torch-free reader for modern (zip-format, torch>=1.6) .pth files.

    The reference reads Fish 1.2's .pth natively through candle's pth
    parser (server/lib/utils/load.rs:96-98) — no Python torch involved;
    this is the same move for JAX. A .pth zip holds `<archive>/data.pkl`
    (the pickled tensor graph) plus one raw little-endian blob per storage
    under `<archive>/data/<key>`. We unpickle with a restricted Unpickler:
    tensors come back through `persistent_load` as (storage bytes, dtype)
    and `torch._utils._rebuild_tensor_v2` is reimplemented as a numpy
    as_strided view, so non-contiguous saves load correctly. Anything
    outside the tensor/state-dict vocabulary raises (same stance as
    torch.load(weights_only=True)).
    """
    import pickle
    import zipfile

    import ml_dtypes

    dtypes = dict(_TORCH_STORAGE_DTYPES, BFloat16Storage=ml_dtypes.bfloat16)

    zf = zipfile.ZipFile(path)
    pkl_names = [n for n in zf.namelist() if n.endswith("data.pkl")]
    if not pkl_names:
        raise _TorchPickleError(f"{path}: no data.pkl (legacy torch format?)")
    pkl_name = min(pkl_names, key=len)
    prefix = pkl_name[: -len("data.pkl")]

    def rebuild_tensor_v2(
        storage, storage_offset, size, stride, requires_grad, hooks, *extra
    ):
        flat, dt = storage
        itemsize = np.dtype(dt).itemsize
        arr = np.frombuffer(flat, dtype=dt)
        if not size:
            return arr[storage_offset].copy()
        view = np.lib.stride_tricks.as_strided(
            arr[storage_offset:],
            shape=tuple(size),
            strides=tuple(s * itemsize for s in stride),
        )
        return np.ascontiguousarray(view)

    class StorageType:
        def __init__(self, name):
            self.name = name

    class AttrDict(dict):
        """OrderedDict stand-in: state_dicts pickle a `_metadata`
        attribute onto the mapping (pickle BUILD writes obj.__dict__)."""

    _ALLOWED = {
        ("torch._utils", "_rebuild_tensor_v2"): rebuild_tensor_v2,
        ("torch._utils", "_rebuild_parameter"): lambda data, *a: data,
        ("collections", "OrderedDict"): AttrDict,
        ("torch.serialization", "_get_layout"): lambda name: None,
    }

    class Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if (module, name) in _ALLOWED:
                return _ALLOWED[(module, name)]
            if module == "torch" and name in dtypes:
                return StorageType(name)
            raise _TorchPickleError(
                f"{path}: refusing to unpickle {module}.{name}"
            )

        def persistent_load(self, pid):
            if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
                raise _TorchPickleError(f"{path}: unexpected pid {pid!r}")
            storage_type, key = pid[1], pid[2]
            dt = dtypes[storage_type.name]
            return zf.read(f"{prefix}data/{key}"), dt

    with zf.open(pkl_name) as f:
        state = Unpickler(f).load()
    return state


def load_raw_checkpoint(path: str | Path) -> Dict[str, np.ndarray]:
    """Read one safetensors or torch .pth file into {name: np.ndarray}.

    Both formats load torch-free: safetensors (incl. bf16) via mmap,
    zip-format .pth via the restricted unpickler above. torch itself is
    only a last-resort fallback for pre-1.6 legacy pickle files."""
    import zipfile

    path = Path(path)
    if path.suffix == ".safetensors":
        return _load_safetensors_mmap(path)
    # torch pickle (.pth / .pt / .bin)
    if zipfile.is_zipfile(path):
        state = _load_torch_pth(path)
    else:  # legacy non-zip torch serialization: punt to torch
        import torch

        loaded = torch.load(str(path), map_location="cpu", weights_only=True)
        state = {
            k: (v.float().numpy() if v.is_floating_point() else v.numpy())
            for k, v in _unwrap_state_dict(loaded).items()
        }
    state = _unwrap_state_dict(state)
    raw = {
        k: (
            v.astype(np.float32)
            if v.dtype.kind == "f" or v.dtype.name == "bfloat16"
            else np.asarray(v)
        )
        for k, v in state.items()
        if hasattr(v, "dtype")
    }
    return _merge_weight_norm(raw)


def _unwrap_state_dict(state):
    if isinstance(state, dict) and "state_dict" in state:
        return state["state_dict"]
    return state


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


# --------------------------------------------------------------------------
# Saving (training output -> the same torch-key safetensors the loader reads)
# --------------------------------------------------------------------------


def save_safetensors(path: str | Path, tensors: Dict[str, np.ndarray]) -> None:
    """Hand-rolled safetensors writer (torch-free, mirrors the mmap
    reader above): 8-byte LE header length, JSON header
    {name: {dtype, shape, data_offsets}}, then raw LE tensor bytes."""
    import json

    import ml_dtypes

    names = {np.dtype(v): k for k, v in _SAFETENSORS_DTYPES.items()}
    names[np.dtype(ml_dtypes.bfloat16)] = "BF16"

    header: Dict[str, Dict] = {}
    blobs = []
    off = 0
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        if arr.dtype not in names:
            raise ValueError(f"unsupported dtype {arr.dtype} for {name!r}")
        data = arr.tobytes()
        header[name] = {
            "dtype": names[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [off, off + len(data)],
        }
        blobs.append(data)
        off += len(data)

    head = json.dumps(header, separators=(",", ":")).encode()
    with open(path, "wb") as f:
        f.write(len(head).to_bytes(8, "little"))
        f.write(head)
        for data in blobs:
            f.write(data)


def save_lm_params(
    path: str | Path, params: Dict, cfg: DualARConfig
) -> None:
    """Inverse of load_lm_params: write the DualARParams pytree as a
    safetensors file with the upstream torch weight names/layout
    (linears transposed back to (out, in), layer stacks unstacked), so
    a finetuned model drops into the serving loader — or the reference
    implementation — unchanged."""
    tensors: Dict[str, np.ndarray] = {}

    def put(name: str, value) -> None:
        tensors[name] = np.asarray(value)

    def unstack(prefix: str, stack: Dict) -> None:
        n = stack["wqkv"].shape[0]
        for i in range(n):
            put(f"{prefix}.{i}.attention.wqkv.weight", stack["wqkv"][i].T)
            put(f"{prefix}.{i}.attention.wo.weight", stack["wo"][i].T)
            put(f"{prefix}.{i}.feed_forward.w1.weight", stack["w1"][i].T)
            put(f"{prefix}.{i}.feed_forward.w3.weight", stack["w3"][i].T)
            put(f"{prefix}.{i}.feed_forward.w2.weight", stack["w2"][i].T)
            put(f"{prefix}.{i}.attention_norm.weight", stack["attention_norm"][i])
            put(f"{prefix}.{i}.ffn_norm.weight", stack["ffn_norm"][i])

    put("embeddings.weight", params["embeddings"])
    put("codebook_embeddings.weight", params["codebook_embeddings"])
    put("fast_embeddings.weight", params["fast_embeddings"])
    put("norm.weight", params["norm"])
    put("fast_norm.weight", params["fast_norm"])
    put("fast_output.weight", np.asarray(params["fast_output"]).T)
    if not cfg.tie_word_embeddings:
        put("output.weight", np.asarray(params["output"]).T)
    unstack("layers", params["slow"])
    unstack("fast_layers", params["fast"])
    save_safetensors(path, tensors)
