#!/usr/bin/env python
"""Regenerate cache_seed/ from fresh default-path compilation runs.

Run ON TPU HARDWARE — normally not directly but via the one-command
ritual `python scripts/regen_aot_seed.py --with-cache-seed`, AFTER the
AOT seeds exist: the programs the benchmark compiles are then the
spliced `jax.export.deserialize(...).call` modules, whose HLO hash
differs from the directly-traced programs' (docs/TPU_NOTES.md #19: the
persistent-cache key hashes the lowered HLO, so ANY change to what gets
traced strands the old seed). Procedure:

1. Move the default runtime cache dir aside (keys embed this exact
   path — seeds generated under any other dir never hit, README in
   cache_seed/).
2. Run the three seeded bench modes (the exact commands
   scripts/regen_aot_seed.py exports for; #19: keys are
   call-site-specific, so a scratch harness would seed nothing):
   `bench.py`, `bench.py --continuous 16`, `bench.py --ttfa-burst 16`.
3. Copy every freshly written cache entry into cache_seed/ and delete
   stale entries.
4. Verify: move the cache dir aside again, re-run the default bench,
   and report the seeded cold-start warmup.

Usage: python scripts/regen_cache_seed.py [--skip-verify] [--bench-only]
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from fish_speech_tpu.utils.cache import DEFAULT_CACHE_DIR  # noqa: E402

CACHE = os.environ.get("FISH_TPU_CACHE_DIR", DEFAULT_CACHE_DIR)
SEED_DIR = os.path.join(REPO, "cache_seed")
MODES = ([], ["--continuous", "16"], ["--ttfa-burst", "16"])


def _run_bench(args, no_seed: bool = False) -> str:
    env = dict(os.environ)
    if no_seed:
        # disable the cache_seed pre-copy so EVERY program recompiles and
        # the fresh-entry set below is complete (a partial fresh set
        # cannot distinguish a still-valid hit seed from a stale one)
        env["FISH_TPU_SEED_DIR"] = ""
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *args],
        cwd=REPO, capture_output=True, text=True, timeout=5400, env=env,
    )
    wall = time.time() - t0
    sys.stdout.write(proc.stdout[-2000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(
            f"bench.py {' '.join(args)} failed (rc={proc.returncode})"
        )
    # bench's log() lines (incl. the warmup split) go to stderr; only the
    # JSON result line is on stdout
    m = re.search(
        r"warmup LM \(compile\): ([0-9.]+)s", proc.stderr + proc.stdout
    )
    warm = m.group(1) if m else "?"
    print(f"-- bench {' '.join(args) or '(default)'}: wall {wall:.0f}s, "
          f"LM warmup {warm}s")
    return proc.stdout


def main() -> None:
    stamp = int(time.time())
    modes = MODES[:1] if "--bench-only" in sys.argv else MODES
    if os.path.isdir(CACHE):
        bak = f"{CACHE}.bak.{stamp}"
        print(f"-- moving {CACHE} -> {bak}")
        shutil.move(CACHE, bak)

    print("-- cold bench runs (fresh default-path cache, seed pre-copy "
          "DISABLED so every program recompiles) ...")
    t_start = time.time()
    for args in modes:
        _run_bench(args, no_seed=True)

    # Every fresh entry is worth committing: jax's own
    # persistent_cache_min_compile_time_secs already filters trivial
    # programs, and a prefix allowlist silently missed the biggest
    # entries once (r4: spliced modules compile under jit_call-, not the
    # original fn names — found via JAX_LOG_COMPILES).
    fresh = [
        f for f in os.listdir(CACHE)
        if os.path.getmtime(os.path.join(CACHE, f)) >= t_start
    ]
    if not fresh:
        raise SystemExit(
            "no fresh cache entries written — seeding was disabled, so "
            "the bench runs should have recompiled everything; check that "
            "jax_persistent_cache_min_compile_time_secs didn't filter the "
            "programs or that the run really used this cache dir."
        )

    fresh_set = set(fresh)
    for old in os.listdir(SEED_DIR):
        if old != "README.md" and old not in fresh_set:
            os.remove(os.path.join(SEED_DIR, old))
            print(f"-- dropped stale seed {old}")
    total_kib = 0
    for f in sorted(fresh):
        shutil.copy2(os.path.join(CACHE, f), os.path.join(SEED_DIR, f))
        sz = os.path.getsize(os.path.join(SEED_DIR, f)) // 1024
        total_kib += sz
        print(f"-- seeded {f} ({sz} KiB)")
    print(f"-- {len(fresh)} entries, {total_kib // 1024} MiB total")

    if "--skip-verify" not in sys.argv:
        bak2 = f"{CACHE}.bak.verify.{stamp}"
        print(f"-- verify: moving {CACHE} -> {bak2}, re-running bench "
              "against the new seed")
        shutil.move(CACHE, bak2)
        _run_bench([])
        print("-- verify done: the LM warmup above is the seeded "
              "cold-start a fresh driver environment will see")

    print("-- done. Commit cache_seed/ (and update its README numbers).")


if __name__ == "__main__":
    main()
