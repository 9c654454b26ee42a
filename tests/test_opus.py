"""Native Ogg/Opus encoder tests (skipped if libopus/toolchain missing)."""

import struct

import numpy as np
import pytest

from fish_speech_tpu.audio.opus import OggOpusEncoder

pytestmark = pytest.mark.skipif(
    not OggOpusEncoder.available(), reason="native opus encoder unavailable"
)


def ogg_pages(data: bytes):
    """Minimal Ogg page parser for validation."""
    pages = []
    off = 0
    while off < len(data):
        assert data[off : off + 4] == b"OggS", f"bad capture at {off}"
        header_type = data[off + 5]
        granule = struct.unpack("<q", data[off + 6 : off + 14])[0]
        nsegs = data[off + 26]
        lacing = data[off + 27 : off + 27 + nsegs]
        body_len = sum(lacing)
        total = 27 + nsegs + body_len
        pages.append(
            {
                "type": header_type,
                "granule": granule,
                "body": data[off + 27 + nsegs : off + total],
            }
        )
        off += total
    return pages


class TestOggOpus:
    def test_headers(self):
        enc = OggOpusEncoder()
        head = enc.header()
        pages = ogg_pages(head)
        assert len(pages) == 2
        assert pages[0]["type"] == 0x02  # BOS
        assert pages[0]["body"].startswith(b"OpusHead")
        assert pages[1]["body"].startswith(b"OpusTags")
        # OpusHead fields: version 1, mono, 24kHz input rate
        body = pages[0]["body"]
        assert body[8] == 1 and body[9] == 1
        assert struct.unpack("<I", body[12:16])[0] == 24000
        enc.close()

    def test_encode_stream(self):
        enc = OggOpusEncoder()
        enc.header()
        t = np.arange(24000) / 24000.0
        pcm = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        data = enc.encode(pcm[:12000])
        data += enc.encode(pcm[12000:], final=True)
        pages = ogg_pages(data)
        assert len(pages) >= 1
        assert pages[-1]["type"] & 0x04  # EOS flag
        # 1 s of audio => final granule ~ 48000 + preskip
        assert pages[-1]["granule"] >= 48000
        # pages contain real opus packets
        assert sum(len(p["body"]) for p in pages) > 500

    def test_partial_frame_flush(self):
        enc = OggOpusEncoder()
        enc.header()
        pcm = np.zeros(100, np.float32)  # < one 480-sample frame
        data = enc.encode(pcm, final=True)
        pages = ogg_pages(data)
        assert pages[-1]["type"] & 0x04
