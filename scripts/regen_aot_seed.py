#!/usr/bin/env python
"""Regenerate aot_seed/ — the serialized jax.export artifacts that let a
cold process skip Python tracing + MLIR/Mosaic lowering for the
bench/serving-path programs (fish_speech_tpu/utils/aot.py).

THE regen ritual (one command, run ON TPU HARDWARE as the LAST commit of
any change that touches generate/, models/, ops/, or config.py):

    python scripts/regen_aot_seed.py --with-cache-seed

The seed key fingerprints every compute-path source file, so ANY edit
strands every old seed; tests/test_seed_freshness.py fails CI until this
script has been re-run (it writes aot_seed/MANIFEST.json recording the
fingerprint the committed artifacts match). --with-cache-seed chains
scripts/regen_cache_seed.py, which MUST run after the AOT seeds exist:
the programs the benchmark then compiles are the spliced
`jax.export.deserialize(...).call` modules, whose HLO hash differs from
the directly-traced programs' — without fresh cache entries the driver's
cold start pays the XLA compile again.

Covered program sets (VERDICT r4 missing #3 — the serving path):
1. `python bench.py`                  — single-stream decode_loop,
                                        prefill, codec_step session
2. `python bench.py --continuous 16`  — B=16 decode chunks, pow2 burst
                                        prefill_rows, single prefill_row,
                                        bucket-128 codec_decode
3. `python bench.py --ttfa-burst 16`  — horizon-4 admission chunks + the
                                        pow2 streaming-vocode session
                                        shapes a cold 16-way burst hits

Each mode runs once with FISH_TPU_AOT_EXPORT=1 (every aot.wrap call site
exports its program at first call), stale artifacts are pruned (keys
change with any source edit, so stale files can never hit again), the
manifest is written, and a verify pass re-runs mode 1 against the new
seeds reporting the seeded warmup.

Usage: python scripts/regen_aot_seed.py [--skip-verify] [--with-cache-seed]
       [--bench-only]   (skip the serving modes; not for shipping)
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AOT_DIR = os.environ.get(
    "FISH_TPU_AOT_DIR", os.path.join(REPO, "aot_seed")
)

MODES = (
    [],                     # single-stream bench (the driver's command)
    ["--continuous", "16"],  # 16-way serving shapes
    ["--ttfa-burst", "16"],  # cold-burst admission + vocode sessions
)


def _run_bench(args, extra_env=None) -> tuple:
    env = dict(os.environ)
    env.update(extra_env or {})
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *args],
        cwd=REPO, capture_output=True, text=True, timeout=5400, env=env,
    )
    wall = time.time() - t0
    sys.stdout.write(proc.stdout[-2000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-8000:])
        raise SystemExit(
            f"bench.py {' '.join(args)} failed (rc={proc.returncode})"
        )
    log = proc.stderr + proc.stdout
    m = re.search(r"warmup LM \(compile\): ([0-9.]+)s", log)
    warm = m.group(1) if m else "?"
    print(f"-- bench {' '.join(args) or '(default)'}: wall {wall:.0f}s, "
          f"LM warmup {warm}s")
    return log, warm


def main() -> None:
    t_start = time.time()
    os.makedirs(AOT_DIR, exist_ok=True)
    modes = MODES[:1] if "--bench-only" in sys.argv else MODES

    for args in modes:
        print(f"-- export run (FISH_TPU_AOT_EXPORT=1): bench.py "
              f"{' '.join(args) or '(default)'} -> {AOT_DIR}")
        _run_bench(args, {"FISH_TPU_AOT_EXPORT": "1"})

    fresh, stale = [], []
    for f in os.listdir(AOT_DIR):
        if not f.endswith(".jaxexport"):
            continue
        if os.path.getmtime(os.path.join(AOT_DIR, f)) >= t_start:
            fresh.append(f)
        else:
            stale.append(f)
    if not fresh:
        raise SystemExit(
            "no fresh aot_seed artifacts written — check that the bench "
            "engine paths reach aot.wrap (single-device engines only) and "
            "that export didn't fail (warnings in the bench stderr)."
        )
    for f in stale:
        os.remove(os.path.join(AOT_DIR, f))
        print(f"-- dropped stale seed {f}")
    total_kib = 0
    for f in sorted(fresh):
        sz = os.path.getsize(os.path.join(AOT_DIR, f)) // 1024
        total_kib += sz
        print(f"-- exported {f} ({sz} KiB)")
    print(f"-- {len(fresh)} artifacts, {total_kib // 1024} MiB total")

    # The freshness manifest CI checks against (utils/aot.py,
    # tests/test_seed_freshness.py). Written in-process: jax here runs
    # on the same backend/device the subprocesses exported for.
    from fish_speech_tpu.utils import aot

    manifest = aot.write_manifest([f[: f.rindex("-")] for f in fresh])
    print(f"-- manifest written: fingerprint "
          f"{manifest['source_fingerprint'][:16]}..., "
          f"{manifest['backend']}/{manifest['device_kind']}, "
          f"jax {manifest['jax']}")

    if "--skip-verify" not in sys.argv:
        print("-- verify: re-running the default bench against the new "
              "seeds")
        log, warm = _run_bench([], {"FISH_TPU_AOT_VERBOSE": "1"})
        hits = len(re.findall(r"AOT seed hit", log))
        print(f"-- verify done: {hits} seed hits, seeded LM warmup {warm}s")
        if hits == 0:
            raise SystemExit(
                "verify pass loaded ZERO programs from seeds — the keys "
                "the bench computes do not match the exported ones."
            )

    if "--with-cache-seed" in sys.argv:
        print("-- chaining scripts/regen_cache_seed.py (the spliced "
              "modules need their own persistent-cache entries)")
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "regen_cache_seed.py")],
            cwd=REPO, check=True,
        )
    else:
        print("-- done. NOW RUN scripts/regen_cache_seed.py and commit "
              "both aot_seed/ and cache_seed/ (or use --with-cache-seed "
              "next time — it is the documented one-command ritual).")


if __name__ == "__main__":
    main()
