"""Hub checkpoint resolution (io/hub.py) — offline, huggingface_hub mocked.

The reference pins exact repo ids per version (server/lib/utils/load.rs:
50-60) and file names (load.rs:74-75,153-154); these tests freeze those
tables and the resolution behavior without touching the network."""

import sys
import types
from pathlib import Path

import pytest

from fish_speech_tpu.config import WhichModel
from fish_speech_tpu.io.hub import (
    HUB_REPOS,
    MIMI_FILE,
    MIMI_REPO,
    _CODEC_FILES,
    resolve_checkpoint,
)


def test_pinned_repos_match_reference_table():
    assert HUB_REPOS[WhichModel.FISH_1_2] == "fishaudio/fish-speech-1.2-sft"
    assert HUB_REPOS[WhichModel.FISH_1_4] == "jkeisling/fish-speech-1.4"
    assert HUB_REPOS[WhichModel.FISH_1_5] == "jkeisling/fish-speech-1.5"
    assert HUB_REPOS[WhichModel.DUAL_AR] == "jkeisling/smoltts_v0"
    # 1.2 ships .pth (merged weight norm), 1.4+ safetensors (load.rs:74-75)
    assert _CODEC_FILES[WhichModel.FISH_1_2].endswith(".pth")
    for m in (WhichModel.FISH_1_4, WhichModel.FISH_1_5):
        assert _CODEC_FILES[m].endswith(".safetensors")
    # DualAR's Mimi codec comes from its own repo (load.rs:176-186;
    # transformers-format export — see io/hub.py)
    assert WhichModel.DUAL_AR not in _CODEC_FILES
    assert MIMI_REPO == "kyutai/mimi" and MIMI_FILE == "model.safetensors"


def test_local_directory_short_circuits(tmp_path):
    """An existing local dir is returned as-is — no hub involvement."""
    res = resolve_checkpoint(tmp_path, WhichModel.FISH_1_5)
    assert res.dir == tmp_path and res.codec_file is None


def test_hub_download_requests_expected_files(tmp_path, monkeypatch):
    requested = []

    def fake_download(repo, fname, revision=None):
        requested.append((repo, fname, revision))
        f = tmp_path / fname
        f.write_bytes(b"")
        return str(f)

    fake = types.ModuleType("huggingface_hub")
    fake.hf_hub_download = fake_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)

    out = resolve_checkpoint("", WhichModel.FISH_1_5, revision="abc123")
    assert out.dir == tmp_path and out.codec_file is None
    repos = {r for r, _, _ in requested}
    assert repos == {"jkeisling/fish-speech-1.5"}
    assert {f for _, f, _ in requested} == {
        "config.json",
        "tokenizer.json",
        "model.safetensors",
        "firefly-gan-vq-fsq-8x1024-21hz-generator.safetensors",
    }
    assert all(rev == "abc123" for _, _, rev in requested)


def test_explicit_repo_id_overrides_pin(tmp_path, monkeypatch):
    requested = []

    def fake_download(repo, fname, revision=None):
        requested.append(repo)
        f = tmp_path / fname
        f.write_bytes(b"")
        return str(f)

    fake = types.ModuleType("huggingface_hub")
    fake.hf_hub_download = fake_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)

    resolve_checkpoint("someone/custom-repo", WhichModel.FISH_1_2)
    assert set(requested) == {"someone/custom-repo"}


def test_fetch_failure_raises_actionable_error(monkeypatch):
    def fake_download(repo, fname, revision=None):
        raise OSError("no network")

    fake = types.ModuleType("huggingface_hub")
    fake.hf_hub_download = fake_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)

    with pytest.raises(RuntimeError, match="Download the"):
        resolve_checkpoint("", WhichModel.FISH_1_5)


def test_dual_ar_codec_resolves_from_mimi_repo(tmp_path, monkeypatch):
    """DualAR LM files come from the smoltts repo but the Mimi codec from
    its own pinned repo (reference: load.rs:176-186) — the resolved
    codec_file must point at the Mimi download, not into the LM dir."""
    requested = []

    def fake_download(repo, fname, revision=None):
        requested.append((repo, fname))
        d = tmp_path / repo.replace("/", "_")
        d.mkdir(exist_ok=True)
        f = d / fname
        f.write_bytes(b"")
        return str(f)

    fake = types.ModuleType("huggingface_hub")
    fake.hf_hub_download = fake_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)

    res = resolve_checkpoint("", WhichModel.DUAL_AR)
    assert ("jkeisling/smoltts_v0", "model.safetensors") in requested
    assert (MIMI_REPO, MIMI_FILE) in requested
    assert res.codec_file is not None
    assert res.codec_file.parent != res.dir
