#!/usr/bin/env python
"""Regenerate cache_seed/ from a fresh default-path compilation run.

Run this ON TPU HARDWARE as the LAST step before shipping any change to
kernel/engine source (docs/TPU_NOTES.md #19: the persistent-cache key
hashes source locations, so ANY edit strands the old seed). Procedure:

1. Move the default runtime cache dir aside (keys embed this exact
   path — seeds generated under any other dir never hit, README in
   cache_seed/).
2. Run `python bench.py` (the exact command the driver runs; #19: keys
   are call-site-specific, so a scratch harness would seed nothing).
3. Copy the freshly written jit_build / jit_prefill_fn /
   jit_decode_loop / jit__decode_fn entries into cache_seed/ and delete
   the stale same-prefix entries.
4. Verify: move the cache dir aside again, re-run bench, and report the
   seeded cold-start warmup (expect ~32-57 s; a stale seed costs
   76-138 s and a cold driver environment 342 s).

Usage: python scripts/regen_cache_seed.py [--skip-verify]
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.environ.get("FISH_TPU_CACHE_DIR", "/root/.cache/jax_fishtpu")
SEED_DIR = os.path.join(REPO, "cache_seed")
# the five bench-path programs worth committing (see cache_seed/README.md)
PREFIXES = ("jit_build-", "jit_prefill_fn-", "jit_decode_loop-",
            "jit__decode_fn-")


def _run_bench() -> str:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    wall = time.time() - t0
    sys.stdout.write(proc.stdout[-2000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"bench.py failed (rc={proc.returncode})")
    m = re.search(r"warmup LM \(compile\): ([0-9.]+)s", proc.stdout)
    warm = m.group(1) if m else "?"
    print(f"-- bench wall {wall:.0f}s, LM warmup {warm}s")
    return proc.stdout


def main() -> None:
    stamp = int(time.time())
    if os.path.isdir(CACHE):
        bak = f"{CACHE}.bak.{stamp}"
        print(f"-- moving {CACHE} -> {bak}")
        shutil.move(CACHE, bak)

    print("-- cold bench run (fresh default-path cache; the committed "
          "seed still pre-copies, stale keys are ignored) ...")
    t_start = time.time()
    _run_bench()

    fresh = []
    for f in os.listdir(CACHE):
        p = os.path.join(CACHE, f)
        if any(f.startswith(pre) for pre in PREFIXES) and (
            os.path.getmtime(p) >= t_start
        ):
            fresh.append(f)
    if not fresh:
        raise SystemExit(
            "no fresh cache entries written — did every program hit the "
            "(supposedly stale) committed seed? Nothing to regenerate."
        )

    for f in sorted(fresh):
        pre = next(p for p in PREFIXES if f.startswith(p))
        for old in os.listdir(SEED_DIR):
            if old.startswith(pre) and old != f:
                os.remove(os.path.join(SEED_DIR, old))
                print(f"-- dropped stale seed {old}")
        shutil.copy2(os.path.join(CACHE, f), os.path.join(SEED_DIR, f))
        sz = os.path.getsize(os.path.join(SEED_DIR, f)) // 1024
        print(f"-- seeded {f} ({sz} KiB)")

    if "--skip-verify" not in sys.argv:
        bak2 = f"{CACHE}.bak.verify.{stamp}"
        print(f"-- verify: moving {CACHE} -> {bak2}, re-running bench "
              "against the new seed")
        shutil.move(CACHE, bak2)
        _run_bench()
        print("-- verify done: the LM warmup above is the seeded "
              "cold-start a fresh driver environment will see")

    print("-- done. Commit cache_seed/ (and update its README numbers).")


if __name__ == "__main__":
    main()
