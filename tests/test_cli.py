"""End-to-end CLI tests: the llama_generate / vocoder / encoder binaries
run in-process against synthetic on-disk checkpoints (reference:
fish_speech_core/src/bin/{llama_generate,vocoder,encoder}.rs).

The codec CLIs hardcode the full-size FireflyConfig per version exactly
like the reference (codec/config.rs); tests monkeypatch for_version to
the tiny test config so the flag parsing, checkpoint loading (reference
weight names), npy formats, and wav I/O are all exercised without
full-size weights."""

import sys

import jax
import numpy as np
import pytest
from safetensors.numpy import save_file

from fish_speech_tpu.audio.wav import read_wav, write_pcm_as_wav
from fish_speech_tpu.config import FireflyConfig
from fish_speech_tpu.models.codec.firefly import FireflyCodec, init_firefly_params
from tests.test_api import checkpoint_dir  # noqa: F401 — fixture
from tests.test_firefly_loading import firefly_params_to_state_dict
from tests.test_server import CODEC_CFG, NUM_CODEBOOKS


@pytest.fixture(scope="module")
def codec_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("codec_ckpt")
    params = init_firefly_params(jax.random.PRNGKey(0), CODEC_CFG)
    sd = firefly_params_to_state_dict(params, CODEC_CFG)
    save_file(
        sd, str(d / "firefly-gan-vq-fsq-8x1024-21hz-generator.safetensors")
    )
    return d


@pytest.fixture(autouse=True)
def tiny_codec_config(monkeypatch):
    monkeypatch.setattr(
        FireflyConfig, "for_version", staticmethod(lambda v: CODEC_CFG)
    )


def _run(module, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    module.main()


def test_vocoder_cli(codec_ckpt, tmp_path, monkeypatch):
    from fish_speech_tpu.cli import vocoder

    codes = np.random.default_rng(0).integers(
        0, 1000, size=(NUM_CODEBOOKS, 10)
    ).astype(np.uint32)
    np.save(tmp_path / "codes.npy", codes)
    out = tmp_path / "out.wav"
    _run(
        vocoder,
        ["--input", str(tmp_path / "codes.npy"), "--checkpoint", str(codec_ckpt),
         "--out-path", str(out)],
        monkeypatch,
    )
    audio, sr = read_wav(str(out))
    assert sr == CODEC_CFG.spec_transform.sample_rate
    # T * downsample * hop samples
    assert audio.shape[-1] == 10 * 2 * CODEC_CFG.spec_transform.hop_length


def test_vocoder_cli_bf16(codec_ckpt, tmp_path, monkeypatch):
    from fish_speech_tpu.cli import vocoder

    codes = np.random.default_rng(1).integers(
        0, 1000, size=(NUM_CODEBOOKS, 8)
    ).astype(np.uint32)
    np.save(tmp_path / "codes.npy", codes)
    out = tmp_path / "out16.wav"
    _run(
        vocoder,
        ["--input", str(tmp_path / "codes.npy"), "--checkpoint", str(codec_ckpt),
         "--out-path", str(out), "--bf16"],
        monkeypatch,
    )
    audio, _ = read_wav(str(out))
    assert audio.shape[-1] == 8 * 2 * CODEC_CFG.spec_transform.hop_length


def test_encoder_cli_roundtrips_with_vocoder(codec_ckpt, tmp_path, monkeypatch):
    from fish_speech_tpu.cli import encoder

    sr = CODEC_CFG.spec_transform.sample_rate
    t = CODEC_CFG.spec_transform.hop_length * 40
    rng = np.random.default_rng(2)
    pcm = (rng.normal(size=t) * 0.1).astype(np.float32)
    with open(tmp_path / "ref.wav", "wb") as f:
        write_pcm_as_wav(f, pcm, sr)
    out = tmp_path / "codes.npy"
    _run(
        encoder,
        ["--input", str(tmp_path / "ref.wav"), "--checkpoint", str(codec_ckpt),
         "--out-path", str(out)],
        monkeypatch,
    )
    codes = np.load(out)
    assert codes.dtype == np.uint32
    assert codes.shape[0] == NUM_CODEBOOKS
    assert codes.shape[1] >= 1


def test_llama_generate_cli(checkpoint_dir, tmp_path, monkeypatch):  # noqa: F811
    from fish_speech_tpu.cli import llama_generate
    from tests.test_checkpoint import CFG

    out = tmp_path / "out.npy"
    _run(
        llama_generate,
        ["--checkpoint", str(checkpoint_dir), "--text", "hello world .",
         "--out-path", str(out), "--max-new-tokens", "6", "--temp", "0"],
        monkeypatch,
    )
    codes = np.load(out)
    assert codes.dtype == np.uint32
    assert codes.shape[0] == CFG.num_codebooks
    assert 1 <= codes.shape[1] <= 6 * 2  # chunks may split
    assert codes.max() < CFG.codebook_size


def test_llama_generate_cli_with_speaker_prompt(
    checkpoint_dir, tmp_path, monkeypatch  # noqa: F811
):
    from fish_speech_tpu.cli import llama_generate
    from tests.test_checkpoint import CFG

    voice = np.random.default_rng(3).integers(
        0, CFG.codebook_size, size=(CFG.num_codebooks, 5)
    ).astype(np.uint32)
    np.save(tmp_path / "voice.npy", voice)
    out = tmp_path / "out.npy"
    _run(
        llama_generate,
        ["--checkpoint", str(checkpoint_dir), "--text", "hello world .",
         "--prompt-tokens", str(tmp_path / "voice.npy"),
         "--prompt-text", "hello", "--out-path", str(out),
         "--max-new-tokens", "6", "--temp", "0"],
        monkeypatch,
    )
    codes = np.load(out)
    assert codes.shape[0] == CFG.num_codebooks and codes.shape[1] >= 1
