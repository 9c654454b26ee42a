"""Any-container audio decode: WAV / MP3 / Ogg-Vorbis / Ogg-Opus / FLAC -> mono f32.

Counterpart of the reference's symphonia-based decoder
(reference: fish_speech_core/lib/audio/pcm_decode.rs:26-89,
audio/mod.rs:13-29): accepts whatever container the client uploads and
returns channel-averaged mono float32 plus the sample rate. WAV parses in
Python; compressed containers decode in the native C++ runtime
(native/fishaudio.cpp) through libmpg123 / libvorbisfile / libopus, plus
a hand-written FLAC decoder (no libFLAC in the image).
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from fish_speech_tpu.audio.wav import read_wav

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    from fish_speech_tpu.audio._natlib import find_lib

    global _lib
    path = find_lib() if _lib is None else None
    if _lib is None and path is not None:
        lib = ctypes.CDLL(str(path))
        lib.fa_decode_auto.restype = ctypes.c_int
        lib.fa_decode_auto.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.fa_free.restype = None
        lib.fa_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def decode_audio_bytes(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode an audio file's bytes -> (mono f32 (T,), sample_rate).

    Raises ValueError for unsupported/corrupt input.
    """
    data = bytes(data)  # multipart readers may hand back a bytearray
    if data[:4] == b"RIFF":
        return read_wav(data)
    if data[:4] == b"\x1a\x45\xdf\xa3":  # EBML: WebM / Matroska
        from fish_speech_tpu.audio.webm import decode_webm_bytes

        return decode_webm_bytes(data)

    lib = _load()
    if lib is None:
        raise ValueError(
            "Only WAV input is supported without the native decoder "
            "(build native/libfishaudio.so for MP3/Ogg support)"
        )
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_longlong()
    rate = ctypes.c_int()
    rc = lib.fa_decode_auto(
        data, len(data), ctypes.byref(out), ctypes.byref(n), ctypes.byref(rate)
    )
    if rc != 0 or n.value <= 0:
        raise ValueError(f"Could not decode audio (native rc={rc})")
    try:
        pcm = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.fa_free(out)
    return pcm.astype(np.float32), int(rate.value)
