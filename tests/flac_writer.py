"""Minimal spec-driven FLAC encoder for test fixtures.

The image ships no FLAC tooling (no libFLAC, ffmpeg, or soundfile), so
round-trip tests for the native FLAC decoder (native/fishaudio.cpp
fa_decode_flac) build their own streams straight from the format spec
(RFC 9639). Supports: STREAMINFO, fixed-blocksize frames with correct
CRC-8/CRC-16, CONSTANT / VERBATIM / FIXED(order 2)+Rice subframes,
independent or mid-side stereo, 16-bit samples.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int) -> None:
        value &= (1 << nbits) - 1 if nbits else 0
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def put_signed(self, value: int, nbits: int) -> None:
        self.put(value & ((1 << nbits) - 1), nbits)

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.put(0, 8 - self.nbits)

    def data(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    if n < 0x800:
        return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])
    return bytes([0xE0 | (n >> 12), 0x80 | ((n >> 6) & 0x3F), 0x80 | (n & 0x3F)])


def _verbatim_subframe(w: BitWriter, x: np.ndarray, bps: int) -> None:
    w.put(0, 1)
    w.put(0b000001, 6)
    w.put(0, 1)  # no wasted bits
    for v in x:
        w.put_signed(int(v), bps)


def _constant_subframe(w: BitWriter, value: int, bps: int) -> None:
    w.put(0, 1)
    w.put(0b000000, 6)
    w.put(0, 1)
    w.put_signed(value, bps)


def _fixed2_rice_subframe(w: BitWriter, x: np.ndarray, bps: int) -> None:
    """FIXED order-2 predictor, one Rice partition (4-bit params)."""
    order = 2
    w.put(0, 1)
    w.put(0b001000 | order, 6)
    w.put(0, 1)
    for v in x[:order]:
        w.put_signed(int(v), bps)
    res = x[order:].astype(np.int64) - 2 * x[1:-1].astype(np.int64) + x[:-2]
    # zigzag, then pick the Rice parameter that fits the mean magnitude
    zz = (np.abs(res) * 2 - (res < 0)).astype(np.uint64)
    mean = float(zz.mean()) if zz.size else 0.0
    param = 0
    while param < 14 and (1 << param) < mean:
        param += 1
    w.put(0, 2)  # residual method 0: 4-bit Rice
    w.put(0, 4)  # partition order 0
    w.put(param, 4)
    for u in zz:
        u = int(u)
        w.put_unary(u >> param)
        if param:
            w.put(u & ((1 << param) - 1), param)


def write_flac(
    samples: np.ndarray,
    sample_rate: int,
    *,
    bps: int = 16,
    block_size: int = 1024,
    subframe: str = "verbatim",
    mid_side: bool = False,
) -> bytes:
    """samples: int array (T,) or (C, T) of bps-bit PCM -> FLAC bytes."""
    x = np.atleast_2d(np.asarray(samples))
    nch, total = x.shape
    assert 1 <= nch <= 2

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.put(block_size, 16)  # min block size
    si.put(block_size, 16)  # max block size
    si.put(0, 24)  # min frame size unknown
    si.put(0, 24)  # max frame size unknown
    si.put(sample_rate, 20)
    si.put(nch - 1, 3)
    si.put(bps - 1, 5)
    si.put(total, 36)
    for _ in range(16):
        si.put(0, 8)  # MD5 unset
    out += bytes([0x80, 0, 0, 34]) + si.data()

    for frame_idx, start in enumerate(range(0, total, block_size)):
        blk = x[:, start : start + block_size]
        bs = blk.shape[1]

        w = BitWriter()
        w.put(0b11111111111110, 14)
        w.put(0, 1)  # reserved
        w.put(0, 1)  # fixed blocksize stream
        w.put(0b0111, 4)  # blocksize: 16-bit value follows
        w.put(0b0000, 4)  # sample rate: from STREAMINFO
        if mid_side and nch == 2:
            w.put(10, 4)  # mid/side
        else:
            w.put(nch - 1, 4)
        w.put({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        w.put(0, 1)  # reserved
        for b in _utf8_number(frame_idx):
            w.put(b, 8)
        w.put(bs - 1, 16)
        w.align()
        w.put(_crc8(w.data()), 8)

        if mid_side and nch == 2:
            left = blk[0].astype(np.int64)
            right = blk[1].astype(np.int64)
            side = left - right
            mid = (left + right) >> 1
            _verbatim_subframe(w, mid, bps)
            _verbatim_subframe(w, side, bps + 1)  # side gets one extra bit
        else:
            for c in range(nch):
                if subframe == "verbatim":
                    _verbatim_subframe(w, blk[c], bps)
                elif subframe == "constant":
                    _constant_subframe(w, int(blk[c][0]), bps)
                elif subframe == "fixed":
                    _fixed2_rice_subframe(w, blk[c].astype(np.int64), bps)
                else:
                    raise ValueError(subframe)
        w.align()
        w.put(_crc16(w.data()), 16)
        out += w.data()

    return bytes(out)
