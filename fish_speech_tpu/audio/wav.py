"""WAV container IO (reference: audio/wav.rs, audio/pcm_decode.rs).

Writing matches the reference byte-for-byte: 16-bit mono PCM with the
same header fields. Reading handles PCM/float WAV via the stdlib; other
containers (mp3/ogg/flac — the reference uses symphonia) are decoded by
the native extension when available and rejected with a clear error
otherwise.
"""

from __future__ import annotations

import io
import struct
from typing import Tuple, Union

import numpy as np


def write_pcm_as_wav(
    buf, samples: np.ndarray, sample_rate: int
) -> None:
    """16-bit mono PCM WAV (reference: wav.rs:27-58)."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        samples = (np.clip(samples, -1.0, 1.0) * 32767.0).astype(np.int16)
    data = samples.tobytes()
    n = len(samples)
    buf.write(b"RIFF")
    buf.write(struct.pack("<I", 12 + 24 + n * 2 + 8 - 8))
    buf.write(b"WAVE")
    buf.write(b"fmt ")
    buf.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16))
    buf.write(b"data")
    buf.write(struct.pack("<I", n * 2))
    buf.write(data)


def pcm_to_wav_bytes(samples: np.ndarray, sample_rate: int) -> bytes:
    out = io.BytesIO()
    write_pcm_as_wav(out, samples, sample_rate)
    return out.getvalue()


def read_wav(src: Union[str, bytes]) -> Tuple[np.ndarray, int]:
    """Decode a WAV file/bytes to (mono f32 (T,), sample_rate).

    Channel-averages to mono like the reference decoder
    (pcm_decode.rs:26-89)."""
    if isinstance(src, (bytes, bytearray)):
        fobj = io.BytesIO(bytes(src))
    else:
        fobj = open(src, "rb")
    try:
        header = fobj.read(12)
        fobj.seek(0)
        if len(header) < 12 or header[:4] != b"RIFF" or header[8:12] != b"WAVE":
            raise ValueError(
                "Unsupported audio container (only WAV is supported without "
                "the native decoder extension)"
            )
        # Parse fmt chunk manually so IEEE-float WAVs also work.
        fobj.seek(12)
        fmt = None
        data = None
        while True:
            head = fobj.read(8)
            if len(head) < 8:
                break
            cid, size = head[:4], struct.unpack("<I", head[4:])[0]
            payload_pos = fobj.tell()
            if cid == b"fmt ":
                fmt = fobj.read(size)
            elif cid == b"data":
                data = fobj.read(size)
            else:
                fobj.seek(size, 1)
            fobj.seek(payload_pos + size + (size & 1))
        if fmt is None or data is None:
            raise ValueError("Malformed WAV: missing fmt or data chunk")
        audio_format, channels, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
        if audio_format == 0xFFFE and len(fmt) >= 40:  # WAVE_FORMAT_EXTENSIBLE
            audio_format = struct.unpack("<H", fmt[24:26])[0]
        if audio_format == 1:  # PCM
            if bits == 16:
                x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
            elif bits == 32:
                x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
            elif bits == 8:
                x = (np.frombuffer(data, "u1").astype(np.float32) - 128.0) / 128.0
            elif bits == 24:
                raw = np.frombuffer(data, "u1").reshape(-1, 3)
                x = (
                    raw[:, 0].astype(np.int32)
                    | (raw[:, 1].astype(np.int32) << 8)
                    | (raw[:, 2].astype(np.int32) << 16)
                )
                x = (x - ((x & 0x800000) << 1)).astype(np.float32) / 8388608.0
            else:
                raise ValueError(f"Unsupported PCM bit depth: {bits}")
        elif audio_format == 3:  # IEEE float
            x = np.frombuffer(data, "<f4" if bits == 32 else "<f8").astype(np.float32)
        else:
            raise ValueError(f"Unsupported WAV format code: {audio_format}")
        if channels > 1:
            x = x.reshape(-1, channels).mean(axis=1)
        return x, rate
    finally:
        fobj.close()
