"""Package build: compile the native audio runtime into the wheel.

Counterpart of the reference's maturin wheel build
(reference: .github/workflows/python-wheels.yaml:31-99), at setuptools
altitude: `native/fishaudio.cpp` is built with the same Makefile the
repo uses and shipped as `fish_speech_tpu/_native/libfishaudio.so`, so
`pip install` from the wheel gets Opus/Ogg streaming encode and
MP3/Vorbis/Opus/FLAC/WebM decode without a manual `make -C native`
(fish_speech_tpu/audio/_natlib.py resolves the packaged location
first).

The native build is BEST-EFFORT: without a C++ toolchain or the system
codec libs the wheel is built pure-Python and every native-audio entry
point degrades exactly like the repo layout does (available() -> False,
WAV streaming fallback). With the lib built, the wheel is tagged
platform-specific (root_is_pure=False) since it carries a linux .so.
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py

ROOT = Path(__file__).resolve().parent

_native_lib: Path | None = None
_native_tried = False


def _build_native() -> Path | None:
    """Build (memoized) native/libfishaudio.so; None when impossible."""
    global _native_lib, _native_tried
    if _native_tried:
        return _native_lib
    _native_tried = True
    src = ROOT / "native"
    if not (src / "fishaudio.cpp").exists():
        return None
    try:
        subprocess.run(
            ["make", "-C", str(src)],
            check=True,
            capture_output=True,
            timeout=300,
        )
    except Exception as e:  # toolchain or codec libs absent
        print(f"warning: native audio runtime not built ({e}); "
              "the wheel will be pure-Python (WAV-only audio IO)")
        return None
    lib = src / "libfishaudio.so"
    _native_lib = lib if lib.exists() else None
    return _native_lib


class BuildPyWithNative(build_py):
    def run(self):
        super().run()
        lib = _build_native()
        if lib is None:
            return
        dest = Path(self.build_lib) / "fish_speech_tpu" / "_native"
        dest.mkdir(parents=True, exist_ok=True)
        shutil.copy2(lib, dest / "libfishaudio.so")


cmdclass = {"build_py": BuildPyWithNative}

try:  # tag wheels platform-specific when they carry the .so
    from setuptools.command.bdist_wheel import bdist_wheel

    class BDistWheelNative(bdist_wheel):
        def finalize_options(self):
            # the tag must be decided before build_py runs, so build
            # the lib now (memoized; build_py reuses the result).
            # setuptools >= 70 recomputes root_is_pure from
            # has_ext_modules() unconditionally, so patch THAT.
            if _build_native() is not None:
                self.distribution.has_ext_modules = lambda: True
            super().finalize_options()

    cmdclass["bdist_wheel"] = BDistWheelNative
except ImportError:  # very old setuptools: pure wheel, still works
    pass

setup(cmdclass=cmdclass)
