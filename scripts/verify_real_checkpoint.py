#!/usr/bin/env python
"""Real-checkpoint parity runbook: one command between "network appears"
and "quality parity proven".

This image has zero egress, so the pinned Fish checkpoints
(reference: server/lib/utils/load.rs:50-60, mirrored in io/hub.py) cannot
be fetched here; cross-implementation golden tests against an in-repo
torch mirror are the stand-in evidence (BASELINE.md). On the FIRST
machine with network access, run:

    python scripts/verify_real_checkpoint.py                # Fish 1.5
    python scripts/verify_real_checkpoint.py --model 1.2    # .pth path
    python scripts/verify_real_checkpoint.py --checkpoint DIR  # local dir

First run per model: fetches the pinned repo, runs the full serving path
(text -> clean/chunk -> prompt encode -> DualAR generate -> Firefly
vocode -> PCM, plus the encode/voice-clone path on the produced audio),
writes golden fixtures (codes.npy + audio.wav + meta.json) under
scripts/fixtures/<model>/, and prints the BASELINE.md row to record.
Subsequent runs: re-generate and EXIT NONZERO on drift (codes not
token-exact, or PCM beyond tolerance) — a standing regression gate on
real weights.

--synthetic: offline dry-run of this exact flow (CI: the
checkpoint-runbook-dryrun job) against a freshly built synthetic
checkpoint, including a deliberate-corruption check that the drift gate
actually trips. Uses a scaled codec config (real mode uses the exact
per-version config, codec/config.rs parity in config.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import hashlib
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:  # runnable without pip-install
    sys.path.insert(0, str(REPO_ROOT))
FIXTURES = REPO_ROOT / "scripts" / "fixtures"

TEXT = "The quick brown fox jumps over the lazy dog."
SEED = 1234


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sha(arr: np.ndarray) -> str:
    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()


def run_pipeline(checkpoint: str, model_str: str, text: str, seed: int,
                 quantize_int8: bool = False):
    """The serving path, end to end; returns (codes, pcm, sample_rate,
    encode_codes, timings, extras). extras carries the live pipeline and
    the first synthesis chunk (its encoded prompt + raw generation) for
    the teacher-forced int8 proxy (_report_int8_proxy)."""
    import jax.numpy as jnp

    from fish_speech_tpu.config import WhichModel
    from fish_speech_tpu.ops.sampling import SamplingArgs
    from fish_speech_tpu.pipeline import TTSPipeline

    model = WhichModel(model_str)
    t0 = time.perf_counter()
    pipe = TTSPipeline.load(
        checkpoint or "", model, lm_dtype=jnp.bfloat16,
        codec_dtype=jnp.float32, quantize_int8=quantize_int8,
    )
    t_load = time.perf_counter() - t0

    # temp=0: greedy decode is deterministic given weights + prompt, so
    # the recorded codes are an exact cross-run/cross-machine invariant
    sampling = SamplingArgs(temp=0.0, top_p=1.0, top_k=1, repetition_penalty=1.0)

    t0 = time.perf_counter()
    chunks = list(
        pipe.synthesize_streaming(text, sampling=sampling, seed=seed)
    )
    t_gen = time.perf_counter() - t0
    codes = np.concatenate([c.codes for c in chunks], axis=-1)
    pcm = np.concatenate([c.pcm for c in chunks])
    sr = pipe.codec.cfg.spec_transform.sample_rate

    # voice-clone path on our own output (encoder parity: the codes we
    # get back should be dominated by the codes we vocoded)
    t0 = time.perf_counter()
    enc = pipe.codec.encode(pcm)
    t_enc = time.perf_counter() - t0
    enc = np.asarray(enc)
    if enc.ndim == 3:
        enc = enc[0]
    extras = {"pipe": pipe, "first_chunk": chunks[0]}
    return codes, pcm, sr, enc, extras, {
        "load_s": round(t_load, 2),
        "generate_s": round(t_gen, 2),
        "encode_s": round(t_enc, 2),
        "audio_s": round(len(pcm) / sr, 2),
    }


def verify_or_record(fix_dir: Path, model_str: str, codes, pcm, sr, enc,
                     timings, pcm_tol: float) -> int:
    from fish_speech_tpu.audio.wav import read_wav, write_pcm_as_wav

    meta_path = fix_dir / "meta.json"
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
        ref_codes = np.load(fix_dir / "codes.npy")
        ref_pcm, ref_sr = read_wav(str(fix_dir / "audio.wav"))
        ok = True
        if ref_sr != sr:
            log(f"DRIFT: sample rate {sr} != recorded {ref_sr}")
            ok = False
        if ref_codes.shape != codes.shape or not np.array_equal(ref_codes, codes):
            n = (
                int((ref_codes != codes).sum())
                if ref_codes.shape == codes.shape else -1
            )
            log(
                f"DRIFT: generated codes differ from recorded fixture "
                f"(shape {codes.shape} vs {ref_codes.shape}, "
                f"{n} mismatched positions)"
            )
            ok = False
        # fixture wav is int16-quantized; compare at that resolution
        q = np.clip(np.round(pcm * 32767.0), -32768, 32767) / 32767.0
        m = min(len(q), len(ref_pcm))
        max_err = (
            float(np.abs(q[:m] - ref_pcm[:m]).max()) if m else float("inf")
        )
        if len(q) != len(ref_pcm) or max_err > pcm_tol:
            log(
                f"DRIFT: PCM differs (len {len(q)} vs {len(ref_pcm)}, "
                f"max err {max_err:.2e} > {pcm_tol:.0e})"
            )
            ok = False
        if ok:
            log(
                f"OK: {model_str} matches fixtures recorded "
                f"{meta.get('recorded_at_utc', '?')} "
                f"({codes.shape[-1]} frames, PCM max err {max_err:.2e})"
            )
            return 0
        return 2

    fix_dir.mkdir(parents=True, exist_ok=True)
    np.save(fix_dir / "codes.npy", codes)
    with open(fix_dir / "audio.wav", "wb") as f:
        write_pcm_as_wav(f, pcm, sr)
    match = (
        float((enc[:, : codes.shape[-1]] == codes[:, : enc.shape[-1]]).mean())
        if enc.size and codes.size else 0.0
    )
    meta = {
        "model": model_str,
        "text": TEXT,
        "seed": SEED,
        "sampling": "greedy (temp=0)",
        "frames": int(codes.shape[-1]),
        "codes_sha256": _sha(codes),
        "sample_rate": int(sr),
        "encode_roundtrip_code_match": round(match, 4),
        "recorded_at_utc": time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
        ),
        **timings,
    }
    meta_path.write_text(json.dumps(meta, indent=2) + "\n")
    log(f"RECORDED fixtures in {fix_dir}")
    log("Add this row to BASELINE.md (Real-checkpoint parity):")
    log(
        f"| {model_str} | {meta['frames']} frames / {timings['audio_s']} s "
        f"| generate {timings['generate_s']} s | encode round-trip code "
        f"match {match:.1%} | codes sha {meta['codes_sha256'][:12]} |"
    )
    return 0


def build_synthetic_checkpoint(d: Path):
    """Tiny Fish-1.5-shaped checkpoint on disk, reference weight names
    (docs/WEIGHT_MAP.md), built through the repo's own test helpers."""
    sys.path.insert(0, str(REPO_ROOT))
    from safetensors.numpy import save_file

    from tests.test_api import _write_tokenizer
    from tests.test_checkpoint import make_lm_state_dict
    from tests.test_dual_ar import CFG
    from tests.test_firefly_loading import firefly_params_to_state_dict
    from tests.test_server import CODEC_CFG

    import jax

    from fish_speech_tpu.models.codec.firefly import init_firefly_params

    rng = np.random.default_rng(0)
    sd = make_lm_state_dict(CFG, rng)
    sd["output.weight"][4] *= 50.0  # strengthen im_end: generations stop
    save_file(sd, str(d / "model.safetensors"))
    cfg_json = {f.name: getattr(CFG, f.name) for f in dataclasses.fields(CFG)}
    (d / "config.json").write_text(json.dumps(cfg_json))
    _write_tokenizer(d / "tokenizer.json", CFG)

    cparams = init_firefly_params(jax.random.PRNGKey(0), CODEC_CFG)
    save_file(
        firefly_params_to_state_dict(cparams, CODEC_CFG),
        str(d / "firefly-gan-vq-fsq-8x1024-21hz-generator.safetensors"),
    )
    return CODEC_CFG


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="1.5", choices=["1.2", "1.4", "1.5"])
    ap.add_argument(
        "--checkpoint", default="",
        help="local checkpoint dir (default: fetch the pinned Hub repo)",
    )
    ap.add_argument(
        "--fixtures", default=str(FIXTURES),
        help="fixture root (default scripts/fixtures/)",
    )
    ap.add_argument(
        "--pcm-tol", type=float, default=1e-3,
        help="max abs PCM error vs fixture (int16 resolution is 3e-5; "
        "default leaves headroom for cross-hardware bf16 accumulation)",
    )
    ap.add_argument(
        "--synthetic", action="store_true",
        help="offline dry-run with a synthetic checkpoint (CI)",
    )
    args = ap.parse_args()

    if args.synthetic:
        from fish_speech_tpu.config import FireflyConfig

        tmp = Path(tempfile.mkdtemp(prefix="fish_synth_"))
        codec_cfg = build_synthetic_checkpoint(tmp)
        # scaled codec for the dry-run; real mode uses the exact
        # per-version config
        FireflyConfig.for_version = staticmethod(lambda v: codec_cfg)
        fix_root = Path(tempfile.mkdtemp(prefix="fish_synth_fix_"))

        codes, pcm, sr, enc, ex, t = run_pipeline(str(tmp), "1.5", TEXT, SEED)
        # int8 listen-proxy must run in the dry-run too (the gate below);
        # synthetic evidence never flips the packaged default
        _report_int8_proxy(str(tmp), "1.5", codes, pcm, ex,
                           real_weights=False)
        fix_dir = fix_root / "1.5"
        rc = verify_or_record(fix_dir, "1.5", codes, pcm, sr, enc, t,
                              args.pcm_tol)
        assert rc == 0, "recording fixtures must succeed"
        rc = verify_or_record(fix_dir, "1.5", codes, pcm, sr, enc, t,
                              args.pcm_tol)
        assert rc == 0, f"identical rerun flagged as drift (rc={rc})"
        # the gate must actually trip: corrupt one code token
        bad = codes.copy()
        bad[0, 0] = (bad[0, 0] + 1) % 8
        rc = verify_or_record(fix_dir, "1.5", bad, pcm, sr, enc, t,
                              args.pcm_tol)
        assert rc != 0, "corrupted codes were NOT flagged as drift"
        log("SYNTHETIC DRY-RUN OK: record, verify, and drift-trip all work")
        return 0

    codes, pcm, sr, enc, ex, t = run_pipeline(
        args.checkpoint, args.model, TEXT, SEED
    )
    _report_int8_proxy(
        args.checkpoint, args.model, codes, pcm, ex, real_weights=True
    )
    return verify_or_record(
        Path(args.fixtures) / args.model, args.model, codes, pcm, sr, enc,
        t, args.pcm_tol,
    )


def _mel_floor(checkpoint: str, model_str: str, ref_codes,
               ref_pcm) -> float:
    """The bf16-vs-f32 VOCODER floor on THESE codes: decode the bf16
    generation's codes through a bf16 codec and mel-compare against the
    f32-codec PCM the pipeline produced. This is the dtype noise a
    listener already accepts in the serving default — the pre-registered
    mel criterion is relative to it (BASELINE.md)."""
    import jax.numpy as jnp

    from fish_speech_tpu.config import FireflyConfig, FishVersion, WhichModel
    from fish_speech_tpu.io.checkpoint import load_firefly_params
    from fish_speech_tpu.models.codec.firefly import FireflyCodec
    from fish_speech_tpu.utils.quality import mel_l1_distance

    model = WhichModel(model_str)
    p = Path(checkpoint) if checkpoint else None
    if p is None or not p.is_dir():
        from fish_speech_tpu.io.hub import resolve_checkpoint

        p = resolve_checkpoint(checkpoint, model).dir
    cfg = FireflyConfig.for_version(model.fish_version or FishVersion.V1_5)
    codec = FireflyCodec(
        load_firefly_params(p, cfg, dtype=jnp.bfloat16),
        cfg, buckets=(ref_codes.shape[-1],),
    )
    pcm_bf16 = np.asarray(codec.decode(ref_codes))
    if pcm_bf16.ndim == 2:
        pcm_bf16 = pcm_bf16[0]
    m = min(len(ref_pcm), len(pcm_bf16))
    return mel_l1_distance(ref_pcm[:m], pcm_bf16[:m], cfg.spec_transform)


def _report_int8_proxy(checkpoint: str, model_str: str,
                       ref_codes, ref_pcm, ref_extras, *,
                       real_weights: bool) -> bool:
    """The int8 go/no-go listen-proxy (VERDICT r3 #6, r4 #4): score the
    bf16 and the int8-quantized LM TEACHER-FORCED on the bf16
    generation's exact context (prompt + trajectory), vocode both
    models' positionally-aligned per-position predictions, and compare
    token agreement + mel-space distance + PCM SNR against the
    pre-registered criteria (utils/int8_policy.py — the docstring there
    explains why free-running comparison would measure divergence
    position, not quality; methodology: reference
    tests/e2e/backbone-allclose.py per-position outputs). The int8
    serving path additionally runs end-to-end for a free-running
    evidence number. A PASSING run on real weights flips the packaged
    serving default to int8 automatically; a failing one pins bf16.
    Returns pass/fail."""
    from fish_speech_tpu.config import FireflyConfig, FishVersion, WhichModel
    from fish_speech_tpu.ops.quant import quantize_lm_params
    from fish_speech_tpu.utils import int8_policy
    from fish_speech_tpu.utils.quality import (
        mel_l1_distance,
        pcm_metrics,
        teacher_forced_agreement,
        teacher_forced_predictions,
    )

    # --- teacher-forced scoring on the bf16 pipeline's first chunk
    pipe = ref_extras["pipe"]
    chunk = ref_extras["first_chunk"]
    seq = np.concatenate(
        [
            chunk.prompt,
            np.concatenate(
                [chunk.result.semantic[None], chunk.result.tokens], axis=0
            ),
        ],
        axis=1,
    )  # (C+1, S) raw LM token space
    engine = pipe.engine
    preds_bf16 = teacher_forced_predictions(
        engine.params, engine.cfg, engine.token_cfg, seq
    )
    preds_int8 = teacher_forced_predictions(
        quantize_lm_params(engine.params), engine.cfg, engine.token_cfg, seq
    )
    tf = teacher_forced_agreement(preds_bf16, preds_int8)
    # audio impact of exactly the disagreeing decisions: vocode the
    # aligned predictions of both models through the SAME codec
    mask = preds_bf16[2]
    codes_tf_ref = pipe._shift_output_tokens(preds_bf16[1][mask].T)
    codes_tf_q = pipe._shift_output_tokens(preds_int8[1][mask].T)
    pcm_tf_ref = np.asarray(pipe.codec.decode(codes_tf_ref))
    pcm_tf_q = np.asarray(pipe.codec.decode(codes_tf_q))
    if pcm_tf_ref.ndim == 2:
        pcm_tf_ref, pcm_tf_q = pcm_tf_ref[0], pcm_tf_q[0]

    # --- free-running int8 serving path, end to end (evidence; also
    # proves the quantized pipeline actually serves)
    codes_q, pcm_q, sr_q, _enc_q, _ex_q, _t = run_pipeline(
        checkpoint, model_str, TEXT, SEED, quantize_int8=True
    )
    n = min(ref_codes.shape[-1], codes_q.shape[-1])
    free_agree = (
        float((ref_codes[:, :n] == codes_q[:, :n]).mean()) if n else 0.0
    )

    spec_cfg = FireflyConfig.for_version(
        WhichModel(model_str).fish_version or FishVersion.V1_5
    ).spec_transform
    m = min(len(pcm_tf_ref), len(pcm_tf_q))
    mel = mel_l1_distance(pcm_tf_ref[:m], pcm_tf_q[:m], spec_cfg)
    wave = pcm_metrics(pcm_tf_ref[:m], pcm_tf_q[:m])
    floor = _mel_floor(checkpoint, model_str, ref_codes, ref_pcm)
    tok_agree = tf["combined"]
    passed = int8_policy.evaluate(tok_agree, mel, floor, wave["snr_db"])
    metrics = {
        "token_agreement": tok_agree,
        "token_agreement_slow": tf["slow"],
        "token_agreement_fast": tf["fast"],
        "token_agreement_free_running": free_agree,
        "predictions_compared": tf["n"],
        "frames_compared": n,
        "mel_l1": mel,
        "mel_floor_bf16_vs_f32": floor,
        "snr_db": wave["snr_db"],
    }
    decision = int8_policy.record_decision(
        metrics, passed, real_weights=real_weights,
        evidence=f"verify_real_checkpoint.py model={model_str} "
        f"checkpoint={'<hub>' if not checkpoint else checkpoint} "
        "(teacher-forced)",
    )
    log(
        f"INT8 LISTEN-PROXY ({model_str}): teacher-forced agreement "
        f"{tok_agree:.1%} over {tf['n']:.0f} predictions "
        f"(slow {tf['slow']:.1%} fast {tf['fast']:.1%}; free-running "
        f"{free_agree:.1%} over {n} frames), mel-L1 {mel:.4f} "
        f"(floor {floor:.4f}, 3x = {3 * floor:.4f}), "
        f"PCM SNR {wave['snr_db']:.1f} dB -> criteria "
        f"{'PASS' if passed else 'FAIL'}; serving default now "
        f"{decision['default']}"
        + ("" if real_weights else " (synthetic run: default unchanged)")
    )
    return passed


if __name__ == "__main__":
    sys.exit(main())
