"""Hugging Face Hub checkpoint resolution.

Counterpart of the reference's hf-hub integration
(reference: server/lib/utils/load.rs:50-60,68-88,141-188): maps model
versions to their pinned Hub repos and fetches config/tokenizer/weights
into the local cache, falling back cleanly when the environment has no
network or no huggingface_hub package. A local directory always takes
precedence — pass it straight to TTSPipeline.load.
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple, Optional

from fish_speech_tpu.config import WhichModel

# Pinned repos, mirroring load.rs:50-60
HUB_REPOS = {
    WhichModel.FISH_1_2: "fishaudio/fish-speech-1.2-sft",
    WhichModel.FISH_1_4: "jkeisling/fish-speech-1.4",
    WhichModel.FISH_1_5: "jkeisling/fish-speech-1.5",
    WhichModel.DUAL_AR: "jkeisling/smoltts_v0",
}

# Firefly codec weight files live in the model repo; the name is
# model.pth-style merged weights for 1.2, safetensors for 1.4+
# (load.rs:74-75,152-155)
_CODEC_FILES = {
    WhichModel.FISH_1_2: "firefly-gan-vq-fsq-4x1024-42hz-generator-merged.pth",
    WhichModel.FISH_1_4: "firefly-gan-vq-fsq-8x1024-21hz-generator.safetensors",
    WhichModel.FISH_1_5: "firefly-gan-vq-fsq-8x1024-21hz-generator.safetensors",
}

# DualAR/smoltts checkpoints use the Mimi codec, which ships in a
# SEPARATE repo. The reference pulls kyutai/moshiko-mlx-bf16's moshi-MLX
# export (load.rs:176-186); our loader consumes the transformers-format
# export of the same weights instead (models/codec/mimi.py
# load_mimi_params), so we pin kyutai's canonical transformers repo.
MIMI_REPO = "kyutai/mimi"
MIMI_FILE = "model.safetensors"


class ResolvedCheckpoint(NamedTuple):
    """Local checkpoint location: the directory with config/tokenizer/LM
    weights, plus the codec weight path when it lives OUTSIDE that
    directory (DualAR's Mimi comes from its own repo; None means the
    codec file sits in `dir` under its standard name)."""

    dir: Path
    codec_file: Optional[Path] = None


def _download(repo: str, fname: str, revision: Optional[str]) -> Path:
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover - env without the package
        raise RuntimeError(
            "huggingface_hub is unavailable; download the checkpoint "
            "manually and pass its path"
        ) from e
    try:
        return Path(hf_hub_download(repo, fname, revision=revision))
    except Exception as e:  # noqa: BLE001 - network/file-missing
        raise RuntimeError(
            f"Could not fetch {fname} from {repo}: {e}. Download the "
            "checkpoint manually and pass a local directory."
        ) from e


def resolve_checkpoint(
    checkpoint: str | Path, model: WhichModel, revision: Optional[str] = None
) -> ResolvedCheckpoint:
    """Resolve `checkpoint` to local files.

    If `checkpoint` is an existing directory, use it as-is. Otherwise
    treat it as a Hub repo id (or use the version's pinned repo when
    empty) and download config/tokenizer/weights/codec into the HF cache.
    """
    p = Path(checkpoint) if checkpoint else None
    if p is not None and p.is_dir():
        return ResolvedCheckpoint(p)

    repo = str(checkpoint) if checkpoint else HUB_REPOS.get(model)
    if repo is None:
        raise ValueError(f"No pinned Hub repo for {model}; pass a local dir")

    weights = "model.pth" if model == WhichModel.FISH_1_2 else "model.safetensors"
    files = ["config.json", "tokenizer.json", weights]
    if model in _CODEC_FILES:
        files.append(_CODEC_FILES[model])
    local_dir = None
    for fname in files:
        local_dir = _download(repo, fname, revision).parent

    codec_file = None
    if model == WhichModel.DUAL_AR:
        codec_file = _download(MIMI_REPO, MIMI_FILE, revision=None)
    assert local_dir is not None
    return ResolvedCheckpoint(local_dir, codec_file)
