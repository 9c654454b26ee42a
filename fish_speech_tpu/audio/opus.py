"""Streaming Ogg/Opus encoding via the native C++ extension.

Python binding for native/libfishaudio.so (see native/fishaudio.cpp),
the counterpart of the reference's Rust opus/ogg encoder
(reference: server/lib/audio/opus.rs:12-93): 24 kHz mono VoIP Opus at
24 kbps, 20 ms frames, Ogg pages flushed per encode call.

If the shared library is missing we try to `make` it once; if that fails
(no toolchain / no libopus), `OggOpusEncoder.available()` is False and
the server streams WAV instead.
"""

from __future__ import annotations

import ctypes
import subprocess
from typing import Optional

import numpy as np

OPUS_SAMPLE_RATE = 24000
OPUS_BITRATE = 24000

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    from fish_speech_tpu.audio._natlib import find_lib, repo_native_dir

    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    path = find_lib()
    if path is None:
        # repo checkout: build lazily (installed wheels ship the lib)
        try:
            subprocess.run(
                ["make", "-C", str(repo_native_dir())],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
        path = find_lib()
        if path is None:
            return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    lib.fa_ogg_opus_create.restype = ctypes.c_void_p
    lib.fa_ogg_opus_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.fa_ogg_opus_encode.restype = ctypes.c_int
    lib.fa_ogg_opus_encode.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.fa_ogg_opus_pending.restype = ctypes.c_int
    lib.fa_ogg_opus_pending.argtypes = [ctypes.c_void_p]
    lib.fa_ogg_opus_read.restype = ctypes.c_int
    lib.fa_ogg_opus_read.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
    ]
    lib.fa_ogg_opus_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class OggOpusEncoder:
    """Stateful streaming encoder; feed f32 PCM at 24 kHz, read Ogg bytes."""

    def __init__(
        self, sample_rate: int = OPUS_SAMPLE_RATE, bitrate: int = OPUS_BITRATE
    ) -> None:
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native opus encoder unavailable (libfishaudio.so failed to "
                "build/load)"
            )
        self._lib = lib
        self._h = lib.fa_ogg_opus_create(sample_rate, bitrate)
        if not self._h:
            raise RuntimeError("opus_encoder_create failed")

    @staticmethod
    def available() -> bool:
        return _load_lib() is not None

    def _drain(self) -> bytes:
        n = self._lib.fa_ogg_opus_pending(self._h)
        if n <= 0:
            return b""
        buf = (ctypes.c_ubyte * n)()
        got = self._lib.fa_ogg_opus_read(self._h, buf, n)
        return bytes(buf[:got])

    def header(self) -> bytes:
        """OpusHead + OpusTags pages (available right after creation)."""
        return self._drain()

    def encode(self, pcm: np.ndarray, *, final: bool = False) -> bytes:
        """Encode f32 PCM in [-1, 1]; returns finished Ogg page bytes."""
        pcm = np.ascontiguousarray(pcm, dtype=np.float32)
        rc = self._lib.fa_ogg_opus_encode(
            self._h,
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pcm.shape[0],
            1 if final else 0,
        )
        if rc < 0:
            raise RuntimeError("opus_encode_float failed")
        return self._drain()

    def close(self) -> None:
        if self._h:
            self._lib.fa_ogg_opus_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
