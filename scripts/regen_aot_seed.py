#!/usr/bin/env python
"""Regenerate aot_seed/ — the serialized jax.export artifacts that let a
cold process skip Python tracing + MLIR/Mosaic lowering for the
bench/serving-path programs (fish_speech_tpu/utils/aot.py).

Run this ON TPU HARDWARE after any change to compute-path source (the
seed key fingerprints config.py + generate/ + models/ + ops/, so ANY
edit strands every old seed), THEN run scripts/regen_cache_seed.py: once
AOT seeds exist, the program the benchmark actually compiles is the
spliced `jax.export.deserialize(...).call` module, whose HLO hash
differs from the directly-traced program's — the persistent-cache seeds
must be regenerated against it or the driver's cold start pays the XLA
compile again.

Procedure (what this script does):
1. Run `python bench.py` (the exact command the driver runs) with
   FISH_TPU_AOT_EXPORT=1: every aot.wrap call site exports its program
   at first call and writes aot_seed/<name>-<key>.jaxexport.
2. Prune stale artifacts (any .jaxexport not freshly written — keys
   change with any source edit, so stale files can never hit again).
3. Verify: re-run bench normally and assert every program loaded from a
   seed (the log line "AOT seed hit" appears per program), reporting the
   seeded warmup time.

Usage: python scripts/regen_aot_seed.py [--skip-verify] [--with-cache-seed]
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


def _run_bench(extra_env=None) -> tuple:
    env = dict(os.environ)
    env.update(extra_env or {})
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, capture_output=True, text=True, timeout=3600, env=env,
    )
    wall = time.time() - t0
    sys.stdout.write(proc.stdout[-2000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-6000:])
        raise SystemExit(f"bench.py failed (rc={proc.returncode})")
    log = proc.stderr + proc.stdout
    m = re.search(r"warmup LM \(compile\): ([0-9.]+)s", log)
    warm = m.group(1) if m else "?"
    print(f"-- bench wall {wall:.0f}s, LM warmup {warm}s")
    return log, warm


def main() -> None:
    t_start = time.time()
    os.makedirs(AOT_DIR, exist_ok=True)

    print(f"-- export run (FISH_TPU_AOT_EXPORT=1) -> {AOT_DIR}")
    _run_bench({"FISH_TPU_AOT_EXPORT": "1"})

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
    for f in sorted(fresh):
        sz = os.path.getsize(os.path.join(AOT_DIR, f)) // 1024
        print(f"-- exported {f} ({sz} KiB)")

    if "--skip-verify" not in sys.argv:
        print("-- verify: re-running bench against the new seeds")
        log, warm = _run_bench({"FISH_TPU_AOT_VERBOSE": "1"})
        hits = len(re.findall(r"AOT seed hit", log))
        print(f"-- verify done: {hits} seed hits, seeded LM warmup {warm}s")
        if hits < len(fresh):
            print(
                f"-- WARNING: only {hits}/{len(fresh)} programs loaded "
                "from seeds; the rest re-traced (check key parts)."
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
              "both aot_seed/ and cache_seed/.")


if __name__ == "__main__":
    main()
