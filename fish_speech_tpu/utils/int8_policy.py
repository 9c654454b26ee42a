"""The int8 serving-default decision, made mechanical.

BASELINE.md pre-registers the flip criteria (written down in round 4 so
no judgement call is needed at decision time):

    token agreement >= 99% — measured TEACHER-FORCED
        (utils/quality.py::teacher_forced_agreement): both parameter
        sets score the same bf16-generated sequence and their argmax is
        compared per position. Free-running greedy agreement is a
        first-divergence detector, not a quality metric — one flipped
        argmax at frame k zeroes every later frame because greedy
        decoding feeds its own output back, so the 99% bar would be
        unreachable for ANY quantization on a long generation. The
        reference's parity methodology compares per-position outputs
        the same way (tests/e2e/backbone-allclose.py:63-92). Runs also
        record the free-running number as evidence.
    mel-L1 <= 3x the bf16-vs-f32 VOCODER floor (the dtype noise a
        listener already accepts in the serving default)
    PCM SNR > 15 dB

`evaluate()` applies them; `record_decision()` persists the outcome to
the packaged decision file; `serving_default_int8()` is what the server
entrypoint consults when `--quantize-int8/--no-quantize-int8` is not
forced. `scripts/verify_real_checkpoint.py` calls record_decision with
real_weights=True the first time it runs on the published Fish
checkpoints — that run flips the default automatically (VERDICT r4 #4);
synthetic-checkpoint runs record evidence but never flip (the remaining
risk the criteria guard against is precisely trained-weight
quantization sensitivity, which random weights cannot exhibit).

Reference counterpart: dtype selection is hardcoded bf16 at
server/src/main.rs:38-42 — int8 (ops/quant.py, +29% measured 16-way
aggregate) is a capability the reference does not have.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, Optional

# Packaged next to the code so an installed wheel carries the decision.
DECISION_FILE = Path(__file__).resolve().parents[1] / "int8_decision.json"

# The pre-registered criteria (BASELINE.md "Flip criteria"). Constants,
# not config: changing them is a decision-process change and should look
# like one in the diff.
MIN_TOKEN_AGREEMENT = 0.99
MAX_MEL_L1_VS_FLOOR = 3.0
MIN_SNR_DB = 15.0


def evaluate(token_agreement: float, mel_l1: float, mel_floor: float,
             snr_db: float) -> bool:
    """True iff the proxy passes every pre-registered criterion."""
    return bool(
        token_agreement >= MIN_TOKEN_AGREEMENT
        and mel_l1 <= MAX_MEL_L1_VS_FLOOR * max(mel_floor, 1e-6)
        and snr_db > MIN_SNR_DB
    )


def criteria_dict() -> Dict[str, float]:
    return {
        "min_token_agreement": MIN_TOKEN_AGREEMENT,
        "max_mel_l1_vs_floor": MAX_MEL_L1_VS_FLOOR,
        "min_snr_db": MIN_SNR_DB,
    }


def read_decision(path: Optional[Path] = None) -> Optional[dict]:
    try:
        with open(path or DECISION_FILE) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def record_decision(metrics: Dict[str, float], passed: bool, *,
                    real_weights: bool, evidence: str,
                    path: Optional[Path] = None) -> dict:
    """Persist a proxy run's outcome. Only a PASSING run on REAL weights
    flips the serving default to int8; a failing real-weight run pins it
    to bf16 (overriding any earlier flip — regressions un-flip);
    synthetic runs only append evidence, never change the default."""
    path = path or DECISION_FILE
    prev = read_decision(path) or {"default": "bf16"}
    decision = dict(prev)
    decision["criteria"] = criteria_dict()
    runs = list(decision.get("runs", []))
    runs.append({
        "metrics": {k: round(float(v), 5) for k, v in metrics.items()},
        "passed": bool(passed),
        "real_weights": bool(real_weights),
        "evidence": evidence,
    })
    decision["runs"] = runs[-8:]  # keep the recent history, bounded
    if real_weights:
        decision["default"] = "int8" if passed else "bf16"
        decision["decided_on_real_weights"] = True
    with open(path, "w") as f:
        json.dump(decision, f, indent=1, sort_keys=True)
        f.write("\n")
    return decision


def serving_default_int8(path: Optional[Path] = None) -> bool:
    """What the server uses when the operator doesn't force a dtype.
    FISH_TPU_INT8={0,1} overrides the file (operational escape hatch)."""
    env = os.environ.get("FISH_TPU_INT8")
    if env is not None and env != "":
        return env not in ("0", "false", "no")
    d = read_decision(path)
    return bool(d and d.get("default") == "int8")
