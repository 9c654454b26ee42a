"""Hugging Face Hub checkpoint resolution.

Counterpart of the reference's hf-hub integration
(reference: server/lib/utils/load.rs:50-60,68-88): maps model versions to
their pinned Hub repos and fetches config/tokenizer/weights into the
local cache, falling back cleanly when the environment has no network or
no huggingface_hub package. A local directory always takes precedence —
pass it straight to TTSPipeline.load.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

from fish_speech_tpu.config import WhichModel

# Pinned repos, mirroring load.rs:50-60
HUB_REPOS = {
    WhichModel.FISH_1_2: "fishaudio/fish-speech-1.2-sft",
    WhichModel.FISH_1_4: "jkeisling/fish-speech-1.4",
    WhichModel.FISH_1_5: "jkeisling/fish-speech-1.5",
    WhichModel.DUAL_AR: "jkeisling/smoltts_v0",
}

# weight file is model.pth for 1.2, model.safetensors otherwise
# (load.rs:74-75); codec generator names from load.rs:153-154
_CODEC_FILES = {
    WhichModel.FISH_1_2: "firefly-gan-vq-fsq-4x1024-42hz-generator-merged.pth",
    WhichModel.FISH_1_4: "firefly-gan-vq-fsq-8x1024-21hz-generator.safetensors",
    WhichModel.FISH_1_5: "firefly-gan-vq-fsq-8x1024-21hz-generator.safetensors",
    WhichModel.DUAL_AR: "firefly-gan-vq-fsq-8x1024-21hz-generator.safetensors",
}


def resolve_checkpoint(
    checkpoint: str | Path, model: WhichModel, revision: Optional[str] = None
) -> Path:
    """Return a local checkpoint directory for `checkpoint`.

    If `checkpoint` is an existing directory, use it as-is. Otherwise
    treat it as a Hub repo id (or use the version's pinned repo when
    empty) and download config/tokenizer/weights/codec into the HF cache.
    """
    p = Path(checkpoint) if checkpoint else None
    if p is not None and p.is_dir():
        return p

    repo = str(checkpoint) if checkpoint else HUB_REPOS.get(model)
    if repo is None:
        raise ValueError(f"No pinned Hub repo for {model}; pass a local dir")
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover - env without the package
        raise RuntimeError(
            f"'{checkpoint}' is not a local directory and huggingface_hub "
            "is unavailable; download the checkpoint manually and pass its "
            "path"
        ) from e

    weights = "model.pth" if model == WhichModel.FISH_1_2 else "model.safetensors"
    files = ("config.json", "tokenizer.json", weights, _CODEC_FILES[model])
    local_dir = None
    for fname in files:
        try:
            got = hf_hub_download(repo, fname, revision=revision)
        except Exception as e:  # noqa: BLE001 - network/file-missing
            raise RuntimeError(
                f"Could not fetch {fname} from {repo}: {e}. Download the "
                "checkpoint manually and pass a local directory."
            ) from e
        local_dir = Path(got).parent
    assert local_dir is not None
    return local_dir
