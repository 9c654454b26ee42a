"""Locate the native audio runtime (libfishaudio.so) for both layouts:

- installed package: fish_speech_tpu/_native/libfishaudio.so, placed
  there by the wheel build (setup.py builds native/fishaudio.cpp into
  the package — counterpart of the reference's maturin wheels,
  .github/workflows/python-wheels.yaml:31-99);
- repo checkout: native/libfishaudio.so (built by `make -C native`,
  which callers may invoke lazily).

FISH_TPU_NATIVE_LIB overrides both (absolute path to the .so).
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)


def repo_native_dir() -> Path:
    """The checkout's native/ source dir (exists in repo layouts only)."""
    return Path(__file__).resolve().parents[2] / "native"


def find_lib() -> Optional[Path]:
    """First existing candidate, or None. Does NOT build."""
    override = os.environ.get("FISH_TPU_NATIVE_LIB")
    if override:
        p = Path(override)
        if p.exists():
            return p
        # A broken override must not permanently shadow a working
        # packaged/checkout lib (opus._load_lib re-checks find_lib after
        # building, and None here would discard the fresh build).
        logger.warning(
            "FISH_TPU_NATIVE_LIB=%s does not exist; falling back to the "
            "packaged/checkout library resolution", override,
        )
    packaged = Path(__file__).resolve().parents[1] / "_native" / "libfishaudio.so"
    if packaged.exists():
        return packaged
    checkout = repo_native_dir() / "libfishaudio.so"
    if checkout.exists():
        return checkout
    return None
