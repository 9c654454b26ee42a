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
sys.path.insert(0, REPO)
from fish_speech_tpu.utils.cache import DEFAULT_CACHE_DIR  # noqa: E402

CACHE = os.environ.get("FISH_TPU_CACHE_DIR", DEFAULT_CACHE_DIR)
SEED_DIR = os.path.join(REPO, "cache_seed")
# the five bench-path programs worth committing (see cache_seed/README.md)
# jit_call-: programs spliced from aot_seed/ exports compile under
# jax.export's `call` name, not the original fn names — without this
# prefix the BIGGEST entries (decode loop, prefill: ~60 s of XLA compile
# on 1 vCPU) were silently never seeded (found r4 via JAX_LOG_COMPILES).
PREFIXES = ("jit_build-", "jit_prefill_fn-", "jit_decode_loop-",
            "jit__decode_fn-", "jit_call-")


def _run_bench(no_seed: bool = False) -> str:
    env = dict(os.environ)
    if no_seed:
        # disable the cache_seed pre-copy so EVERY program recompiles and
        # the fresh-entry set below is complete (a partial fresh set
        # cannot distinguish a still-valid hit seed from a stale one)
        env["FISH_TPU_SEED_DIR"] = ""
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, capture_output=True, text=True, timeout=3600, env=env,
    )
    wall = time.time() - t0
    sys.stdout.write(proc.stdout[-2000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"bench.py failed (rc={proc.returncode})")
    # bench's log() lines (incl. the warmup split) go to stderr; only the
    # JSON result line is on stdout
    m = re.search(
        r"warmup LM \(compile\): ([0-9.]+)s", proc.stderr + proc.stdout
    )
    warm = m.group(1) if m else "?"
    print(f"-- bench wall {wall:.0f}s, LM warmup {warm}s")
    return proc.stdout


def main() -> None:
    stamp = int(time.time())
    if os.path.isdir(CACHE):
        bak = f"{CACHE}.bak.{stamp}"
        print(f"-- moving {CACHE} -> {bak}")
        shutil.move(CACHE, bak)

    print("-- cold bench run (fresh default-path cache, seed pre-copy "
          "DISABLED so every program recompiles) ...")
    t_start = time.time()
    _run_bench(no_seed=True)

    fresh = []
    for f in os.listdir(CACHE):
        p = os.path.join(CACHE, f)
        if any(f.startswith(pre) for pre in PREFIXES) and (
            os.path.getmtime(p) >= t_start
        ):
            fresh.append(f)
    if not fresh:
        raise SystemExit(
            "no fresh cache entries written — seeding was disabled, so "
            "the bench run should have recompiled everything; check that "
            "jax_persistent_cache_min_compile_time_secs didn't filter the "
            "programs or that the run really used this cache dir."
        )

    # Drop stale same-prefix entries FIRST, as a set-difference against
    # ALL fresh names: several fresh entries legitimately share a prefix
    # (two jit_build-* programs: LM init + codec init) and a per-file
    # "delete every sibling" loop would delete fresh seeds it just wrote.
    fresh_set = set(fresh)
    for old in os.listdir(SEED_DIR):
        if any(old.startswith(p) for p in PREFIXES) and old not in fresh_set:
            os.remove(os.path.join(SEED_DIR, old))
            print(f"-- dropped stale seed {old}")
    for f in sorted(fresh):
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
