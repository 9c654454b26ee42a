"""Voice registry: speaker-conditioning prompts pre-encoded at startup.

Counterpart of reference: server/lib/utils/mod.rs:17-55 and the
voices-template format: a directory with index.json
({"speakers": {name: prompt_text}}) plus <name>.npy codec tokens per
speaker. Every voice is pre-encoded to a full conditioning token array;
a "default" voice is required.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from fish_speech_tpu.text.prompt import PromptEncoder, load_prompt_tokens


def load_speaker_prompts(
    voice_dir: str | Path,
    prompt_encoder: PromptEncoder,
    num_codebooks: int,
) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Returns (voices map name -> (C+1, N) conditioning tokens,
    default voice tokens)."""
    voice_dir = Path(voice_dir)
    with open(voice_dir / "index.json") as f:
        index = json.load(f)
    speakers: Dict[str, str] = index["speakers"]

    voices: Dict[str, np.ndarray] = {}
    for name, prompt_text in speakers.items():
        tokens = load_prompt_tokens(voice_dir / f"{name}.npy", num_codebooks)
        voices[name] = prompt_encoder.encode_conditioning_prompt(
            prompt_text, tokens
        )
    if "default" not in voices:
        raise ValueError(
            f"Voice directory {voice_dir} must contain a 'default' speaker"
        )
    return voices, voices["default"]


def save_voice(
    voice_dir: str | Path,
    name: str,
    prompt_text: str,
    codes: np.ndarray,
) -> None:
    """Persist a runtime-registered voice into the voices directory so it
    survives restarts: writes <name>.npy and adds the speaker to
    index.json (atomic rename). The reference leaves this manual — its
    README tells users to copy the returned .npy into the voices dir
    themselves ("Persisting cloned voices")."""
    voice_dir = Path(voice_dir)
    voice_dir.mkdir(parents=True, exist_ok=True)
    np.save(voice_dir / f"{name}.npy", np.asarray(codes, np.uint32))
    index_path = voice_dir / "index.json"
    index = {"speakers": {}}
    if index_path.exists():
        with open(index_path) as f:
            index = json.load(f)
    index.setdefault("speakers", {})[name] = prompt_text
    tmp = index_path.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(index, indent=2) + "\n")
    tmp.replace(index_path)
