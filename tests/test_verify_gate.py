"""The real-checkpoint gate, proven end-to-end before its first real run
(VERDICT r4 next-round #5).

scripts/verify_real_checkpoint.py is the one command that runs between
"network appears" and "parity proven" — so it must not fail on its
maiden run. These tests drive the REAL flow (hub resolve -> download ->
load -> generate -> int8 listen-proxy -> fixture record -> drift gate)
against a local fake hub: `huggingface_hub.hf_hub_download` is replaced
by a stub serving a synthetic Fish-1.5-shaped checkpoint, so the only
line of the script left untested is the literal HTTP fetch.
Methodology being automated: reference tests/e2e/backbone-allclose.py.

Fast-tier tests cover utils/int8_policy.py (the mechanical serving-
default flip, VERDICT r4 #4); the e2e drive is slow-tier.
"""

import importlib.util
import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from fish_speech_tpu.utils import int8_policy

REPO = Path(__file__).resolve().parents[1]


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "verify_real_checkpoint",
        REPO / "scripts" / "verify_real_checkpoint.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# -- int8_policy unit tests (fast tier) ---------------------------------


class TestInt8Policy:
    def test_evaluate_pre_registered_criteria(self):
        # the BASELINE.md criteria, exactly
        assert int8_policy.evaluate(0.99, 0.29, 0.1, 15.1)
        assert not int8_policy.evaluate(0.989, 0.0, 0.1, 99.0)  # agreement
        assert not int8_policy.evaluate(1.0, 0.31, 0.1, 99.0)  # mel vs floor
        assert not int8_policy.evaluate(1.0, 0.0, 0.1, 15.0)  # snr
        # zero floor: the epsilon keeps a perfect run passing
        assert int8_policy.evaluate(1.0, 0.0, 0.0, 99.0)

    def test_synthetic_runs_never_flip(self, tmp_path):
        p = tmp_path / "decision.json"
        d = int8_policy.record_decision(
            {"token_agreement": 1.0}, True, real_weights=False,
            evidence="unit", path=p,
        )
        assert d["default"] == "bf16"
        assert not d.get("decided_on_real_weights")
        assert not int8_policy.serving_default_int8(p)

    def test_real_pass_flips_and_real_fail_unflips(self, tmp_path):
        p = tmp_path / "decision.json"
        d = int8_policy.record_decision(
            {"snr_db": 30.0}, True, real_weights=True,
            evidence="unit-real", path=p,
        )
        assert d["default"] == "int8"
        assert int8_policy.serving_default_int8(p)
        # a later failing real-weight run must un-flip (regression gate)
        d = int8_policy.record_decision(
            {"snr_db": 3.0}, False, real_weights=True,
            evidence="unit-regress", path=p,
        )
        assert d["default"] == "bf16"
        assert not int8_policy.serving_default_int8(p)
        # history is retained for the audit trail
        assert [r["passed"] for r in d["runs"]] == [True, False]

    def test_env_override_beats_file(self, tmp_path, monkeypatch):
        p = tmp_path / "decision.json"
        int8_policy.record_decision(
            {}, True, real_weights=True, evidence="unit", path=p
        )
        monkeypatch.setenv("FISH_TPU_INT8", "0")
        assert not int8_policy.serving_default_int8(p)
        monkeypatch.setenv("FISH_TPU_INT8", "1")
        assert int8_policy.serving_default_int8(Path("/nonexistent"))

    def test_missing_file_defaults_bf16(self, tmp_path):
        assert not int8_policy.serving_default_int8(tmp_path / "nope.json")

    def test_criteria_recorded_with_decision(self, tmp_path):
        p = tmp_path / "decision.json"
        int8_policy.record_decision(
            {}, False, real_weights=False, evidence="unit", path=p
        )
        d = json.loads(p.read_text())
        assert d["criteria"] == int8_policy.criteria_dict()


# -- the fake-hub end-to-end drive (slow tier) ---------------------------


@pytest.mark.slow
def test_verify_gate_end_to_end_via_fake_hub(tmp_path, monkeypatch):
    vrc = _load_script()

    # a synthetic Fish-1.5-shaped checkpoint is "the hub"
    ckpt = tmp_path / "hub_repo"
    ckpt.mkdir()
    codec_cfg = vrc.build_synthetic_checkpoint(ckpt)

    from fish_speech_tpu.config import FireflyConfig
    from fish_speech_tpu.io.hub import HUB_REPOS, WhichModel

    monkeypatch.setattr(
        FireflyConfig, "for_version", staticmethod(lambda v: codec_cfg)
    )

    requested = []

    def fake_download(repo, fname, revision=None):
        assert repo == HUB_REPOS[WhichModel.FISH_1_5], (
            f"gate must fetch the PINNED repo (load.rs:50-60), got {repo}"
        )
        requested.append(fname)
        p = ckpt / fname
        assert p.exists(), f"gate requested a file the repo lacks: {fname}"
        return str(p)

    monkeypatch.setitem(
        sys.modules, "huggingface_hub",
        types.SimpleNamespace(hf_hub_download=fake_download),
    )
    # the decision file must not touch the packaged one from a test
    monkeypatch.setattr(
        int8_policy, "DECISION_FILE", tmp_path / "decision.json"
    )

    # hub-resolution path: empty checkpoint means "pinned repo"
    codes, pcm, sr, enc, extras, timings = vrc.run_pipeline(
        "", "1.5", vrc.TEXT, vrc.SEED
    )
    assert codes.size and pcm.size and sr > 0
    for fname in (
        "config.json", "tokenizer.json", "model.safetensors",
        "firefly-gan-vq-fsq-8x1024-21hz-generator.safetensors",
    ):
        assert fname in requested, f"{fname} never fetched from the hub"

    # int8 listen-proxy runs (real_weights=True exercises the flip path;
    # DECISION_FILE is redirected so nothing packaged changes)
    passed = vrc._report_int8_proxy("", "1.5", codes, pcm, extras,
                                    real_weights=True)
    decision = json.loads((tmp_path / "decision.json").read_text())
    assert decision["default"] == ("int8" if passed else "bf16")
    assert decision["runs"][-1]["passed"] == passed
    assert decision["decided_on_real_weights"] is True
    # the gating agreement is the teacher-forced one; the free-running
    # number rides along as evidence
    m = decision["runs"][-1]["metrics"]
    assert "token_agreement_free_running" in m
    assert 0.0 <= m["token_agreement"] <= 1.0
    assert m["predictions_compared"] > 0

    # fixture record -> identical rerun passes -> corruption trips
    fix = tmp_path / "fixtures" / "1.5"
    assert vrc.verify_or_record(fix, "1.5", codes, pcm, sr, enc,
                                timings, 1e-3) == 0
    assert (fix / "codes.npy").exists() and (fix / "audio.wav").exists()
    assert vrc.verify_or_record(fix, "1.5", codes, pcm, sr, enc,
                                timings, 1e-3) == 0
    bad = codes.copy()
    bad[0, 0] = (bad[0, 0] + 1) % 8
    assert vrc.verify_or_record(fix, "1.5", bad, pcm, sr, enc,
                                timings, 1e-3) != 0
    meta = json.loads((fix / "meta.json").read_text())
    assert meta["codes_sha256"] == vrc._sha(codes)


@pytest.mark.slow
def test_verify_gate_synthetic_mode_cli(tmp_path, monkeypatch):
    """The script's own --synthetic CLI path stays green (the CI job's
    command), including that it never touches the packaged decision."""
    vrc = _load_script()
    monkeypatch.setattr(
        int8_policy, "DECISION_FILE", tmp_path / "decision.json"
    )
    # _report_int8_proxy resolves int8_policy freshly inside the script
    # module's import scope — patch the module object it sees too
    monkeypatch.setattr(
        sys.modules["fish_speech_tpu.utils.int8_policy"], "DECISION_FILE",
        tmp_path / "decision.json",
    )
    monkeypatch.setattr(sys, "argv", ["verify_real_checkpoint.py",
                                      "--synthetic"])
    assert vrc.main() == 0
    d = json.loads((tmp_path / "decision.json").read_text())
    assert d["default"] == "bf16"  # synthetic evidence never flips
