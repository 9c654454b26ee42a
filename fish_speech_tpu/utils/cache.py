"""Persistent compilation-cache setup shared by every entry point.

Cold-starting a server costs minutes of XLA/Mosaic compiles (measured
cold-start budget: docs/TPU_NOTES.md #16); the persistent cache makes
restarts near-instant, and a repo-committed seed (cache_seed/) covers
even a first-ever boot for the benchmarked engine shapes. Keys hash the
serialized HLO + jaxlib/backend versions + compile options, so stale or
mismatched seeds are ignored, never wrongly reused. NOTE: compile
options embed the autotune-cache path derived from the cache dir, so
seed artifacts only hit under the same cache-dir path they were
generated with (the default below).
"""

from __future__ import annotations

import logging
import os
import shutil

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = "/root/.cache/jax_fishtpu"


def setup_compilation_cache(
    cache_dir: str | None = None, seed_dir: str | None = None
) -> str:
    """Point JAX's persistent compilation cache at `cache_dir` (default:
    $FISH_TPU_CACHE_DIR or /root/.cache/jax_fishtpu) and pre-populate it
    from the repo's cache_seed/ if present. Returns the cache dir."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "FISH_TPU_CACHE_DIR", DEFAULT_CACHE_DIR
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Only persist genuinely slow compiles: caching every tiny eager op
    # pollutes the cache with host-specific AOT artifacts.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    if seed_dir is None:
        # FISH_TPU_SEED_DIR="" disables seeding (scripts/regen_cache_seed.py
        # uses it so its cold run recompiles EVERY program and the fresh
        # entry set is complete)
        seed_dir = os.environ.get(
            "FISH_TPU_SEED_DIR",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))),
                "cache_seed",
            ),
        )
    if seed_dir and os.path.isdir(seed_dir):
        copied = 0
        for root, _dirs, files in os.walk(seed_dir):
            rel = os.path.relpath(root, seed_dir)
            dst_root = (
                os.path.join(cache_dir, rel) if rel != "." else cache_dir
            )
            os.makedirs(dst_root, exist_ok=True)
            for f in files:
                dst = os.path.join(dst_root, f)
                if not os.path.exists(dst):
                    shutil.copy2(os.path.join(root, f), dst)
                    copied += 1
        if copied:
            logger.info(
                "seeded compilation cache: %d entries from %s",
                copied, seed_dir,
            )
    return cache_dir
