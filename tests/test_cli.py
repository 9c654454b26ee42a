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


def test_server_main_startup_wiring(
    checkpoint_dir, codec_ckpt, tmp_path, monkeypatch  # noqa: F811
):
    """server.main() end to end minus the listen loop: pipeline.load from
    a full on-disk checkpoint (LM + codec in one dir), voice registry
    load, warmup with per-voice conditioning lengths, and continuous
    batcher creation — the reference's startup path
    (server/src/main.rs:21-78, utils/load.rs, utils/mod.rs:17-55)."""
    import json as _json
    import shutil

    from fish_speech_tpu.server import main as server_main
    from tests.test_checkpoint import CFG

    # assemble one checkpoint dir: LM files + codec weights file
    ckpt = tmp_path / "ckpt"
    shutil.copytree(checkpoint_dir, ckpt)
    shutil.copy(
        codec_ckpt / "firefly-gan-vq-fsq-8x1024-21hz-generator.safetensors",
        ckpt,
    )
    voices = tmp_path / "voices"
    voices.mkdir()
    (voices / "index.json").write_text(
        _json.dumps({"speakers": {"default": "hello world"}})
    )
    np.save(
        voices / "default.npy",
        np.random.default_rng(7)
        .integers(0, CFG.codebook_size, size=(CFG.num_codebooks, 4))
        .astype(np.uint32),
    )

    captured = {}
    monkeypatch.setattr(
        server_main, "serve", lambda state, port: captured.update(state=state)
    )
    monkeypatch.setattr(
        sys,
        "argv",
        ["prog", "--checkpoint", str(ckpt), "--voice-dir", str(voices),
         "--warmup", "--continuous-batch", "2"],
    )
    server_main.main()
    state = captured["state"]
    try:
        assert "default" in state.voices
        assert state.batcher is not None
        # the warmed batcher must serve immediately
        req = state.batcher.submit(
            [np.zeros((CFG.num_codebooks + 1, 4), np.int32)], 0, 3
        )
        chunks = [c for c in req]
        assert len(chunks) == 1
    finally:
        state.batcher.shutdown()


def test_benchmark_cli_checkpoint_branch(
    checkpoint_dir, codec_ckpt, tmp_path, monkeypatch  # noqa: F811
):
    """benchmark CLI (reference: server/src/bin/benchmark.rs) from a real
    on-disk checkpoint: runs the unbatched / batch_size=1 / batch_size=4
    scenarios through TTSPipeline.load."""
    import shutil

    from fish_speech_tpu.cli import benchmark

    ckpt = tmp_path / "ckpt"
    shutil.copytree(checkpoint_dir, ckpt)
    shutil.copy(
        codec_ckpt / "firefly-gan-vq-fsq-8x1024-21hz-generator.safetensors",
        ckpt,
    )
    _run(
        benchmark,
        ["--checkpoint", str(ckpt), "--text", "hello world .",
         "--max-new-tokens", "4"],
        monkeypatch,
    )


def test_api_firefly_codec_class(codec_ckpt):
    """api.FireflyCodec with the PyO3 binding's ctor/shape contract
    (reference: fish_speech_python/src/codec.rs:18-115): encode f32
    (B, 1, T) -> uint32 (B, C, T'), decode -> f32 (B, 1, T*up)."""
    from fish_speech_tpu.api import FireflyCodec as ApiCodec

    codec = ApiCodec(str(codec_ckpt), version="1.5")
    assert codec.sample_rate == CODEC_CFG.spec_transform.sample_rate
    t = CODEC_CFG.spec_transform.hop_length * 40
    audio = (np.random.default_rng(5).normal(size=(1, 1, t)) * 0.1).astype(
        np.float32
    )
    codes = codec.encode(audio)
    assert codes.dtype == np.uint32
    assert codes.shape[0] == 1 and codes.shape[1] == NUM_CODEBOOKS
    pcm = codec.decode(codes)
    assert pcm.ndim == 3 and pcm.shape[:2] == (1, 1)
    assert pcm.shape[-1] == codes.shape[-1] * 2 * CODEC_CFG.spec_transform.hop_length


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


def test_pipeline_load_resolves_hub_repo_id(
    checkpoint_dir, codec_ckpt, tmp_path, monkeypatch  # noqa: F811
):
    """TTSPipeline.load with a non-local checkpoint string resolves it
    through io/hub.py (reference auto-fetches from the Hub when no local
    dir is given, load.rs:62-88)."""
    import shutil

    from fish_speech_tpu.config import WhichModel
    from fish_speech_tpu.io import hub
    from fish_speech_tpu.pipeline import TTSPipeline

    ckpt = tmp_path / "resolved"
    shutil.copytree(checkpoint_dir, ckpt)
    shutil.copy(
        codec_ckpt / "firefly-gan-vq-fsq-8x1024-21hz-generator.safetensors",
        ckpt,
    )
    calls = []

    def fake_resolve(checkpoint, model, revision=None):
        calls.append((str(checkpoint), model))
        return hub.ResolvedCheckpoint(ckpt, None)

    monkeypatch.setattr(hub, "resolve_checkpoint", fake_resolve)
    import jax.numpy as jnp

    pipe = TTSPipeline.load(
        "someone/some-repo", WhichModel.FISH_1_5, lm_dtype=jnp.float32
    )
    assert calls == [("someone/some-repo", WhichModel.FISH_1_5)]
    assert pipe.codec is not None


def test_finetune_cli(checkpoint_dir, tmp_path, monkeypatch):  # noqa: F811
    """End-to-end finetune: .txt/.npy pairs -> trained checkpoint that
    load_lm_params reads back and that differs from the input weights."""
    from fish_speech_tpu.cli import finetune
    from fish_speech_tpu.io.checkpoint import load_lm_params
    from tests.test_checkpoint import CFG

    rng = np.random.default_rng(3)
    data = tmp_path / "data"
    data.mkdir()
    for i in range(3):
        codes = rng.integers(
            0, CFG.codebook_size, size=(CFG.num_codebooks, 6), dtype=np.uint32
        )
        np.save(data / f"s{i}.npy", codes)
        (data / f"s{i}.txt").write_text(f"hello sample {i} .")

    out = tmp_path / "finetuned"
    _run(
        finetune,
        ["--checkpoint", str(checkpoint_dir), "--data", str(data),
         "--out", str(out), "--steps", "4", "--batch-size", "2",
         "--seq-len", "48", "--lr", "1e-3", "--warmup", "1"],
        monkeypatch,
    )
    assert (out / "model.safetensors").exists()
    assert (out / "config.json").exists() and (out / "tokenizer.json").exists()
    import jax.numpy as jnp

    before = load_lm_params(checkpoint_dir, CFG, dtype=jnp.float32)
    after = load_lm_params(out, CFG, dtype=jnp.float32)
    # training moved the weights, and the file round-trips structurally
    assert not np.allclose(
        np.asarray(before["slow"]["wqkv"]), np.asarray(after["slow"]["wqkv"])
    )
    assert np.asarray(after["slow"]["wqkv"]).shape == np.asarray(
        before["slow"]["wqkv"]
    ).shape


def test_finetune_cli_resume_bit_exact(checkpoint_dir, tmp_path, monkeypatch):  # noqa: F811
    """--save-every + --resume: interrupt after 2 of 4 steps, resume, and
    the final checkpoint is BITWISE identical to an uninterrupted run
    (optimizer moments, LR schedule and data order all snapshot)."""
    from safetensors import safe_open

    from fish_speech_tpu.cli import finetune
    from tests.test_checkpoint import CFG

    rng = np.random.default_rng(4)
    data = tmp_path / "data"
    data.mkdir()
    for i in range(3):
        codes = rng.integers(
            0, CFG.codebook_size, size=(CFG.num_codebooks, 6), dtype=np.uint32
        )
        np.save(data / f"s{i}.npy", codes)
        (data / f"s{i}.txt").write_text(f"resume sample {i} .")

    common = ["--checkpoint", str(checkpoint_dir), "--data", str(data),
              "--batch-size", "2", "--seq-len", "48", "--lr", "1e-3",
              "--warmup", "1", "--seed", "11"]

    straight = tmp_path / "straight"
    _run(finetune, common + ["--out", str(straight), "--steps", "4"],
         monkeypatch)

    resumed = tmp_path / "resumed"
    _run(finetune, common + ["--out", str(resumed), "--steps", "2",
                             "--save-every", "1"], monkeypatch)
    assert (resumed / "train_state.npz").exists()
    _run(finetune, common + ["--out", str(resumed), "--steps", "4",
                             "--resume"], monkeypatch)

    def tensors(path):
        with safe_open(path / "model.safetensors", framework="np") as f:
            return {k: f.get_tensor(k) for k in f.keys()}

    a, b = tensors(straight), tensors(resumed)
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
