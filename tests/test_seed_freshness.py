"""Seed-freshness gate (VERDICT r4 next-round #1).

The committed aot_seed/ + cache_seed/ artifacts are keyed on a
fingerprint of every compute-path source file (utils/aot.py). Round 4
shipped them stale: generate/continuous.py was edited AFTER the regen,
every committed key missed, and the driver's cold start paid 782 s
instead of the claimed 28.6 s. Nothing failed, because only the
MECHANISM was tested (tests/test_aot.py) — not the ARTIFACTS.

This fast-tier test closes that hole: it recomputes the source
fingerprint at HEAD and fails the moment it differs from what
aot_seed/MANIFEST.json records, with the exact command to run. Any
compute-path edit turns CI red until the seeds are regenerated —
the regen ritual (`python scripts/regen_aot_seed.py --with-cache-seed`
ON TPU, as the LAST commit of the change) is now enforced, not advisory.
"""

import os

from fish_speech_tpu.utils import aot

REGEN_CMD = "python scripts/regen_aot_seed.py --with-cache-seed  (on TPU)"


def read_manifest():
    """Always the repo-committed manifest (not a test-redirected
    FISH_TPU_AOT_DIR): the gate is about what is CHECKED IN."""
    import json

    try:
        with open(os.path.join(aot.DEFAULT_AOT_DIR, aot.MANIFEST_NAME)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _fresh_fingerprint() -> str:
    """The fingerprint of the working tree, bypassing aot's process-wide
    cache (another test may have computed it before an edit... and the
    gate must read the files as they are NOW)."""
    old = aot._source_fp_cache
    aot._source_fp_cache = None
    try:
        return aot._source_fingerprint()
    finally:
        aot._source_fp_cache = old


def test_committed_seeds_match_head():
    manifest = read_manifest()
    assert manifest is not None, (
        f"aot_seed/{aot.MANIFEST_NAME} is missing — the committed seeds "
        f"have no recorded provenance. Run: {REGEN_CMD}"
    )
    fp = _fresh_fingerprint()
    assert manifest["source_fingerprint"] == fp, (
        "compute-path source (config.py / generate/ / models/ / ops/) has "
        "changed since the committed AOT + cache seeds were generated — "
        "every seed key now misses and a cold start pays full "
        f"trace+lower+compile (r4 measured 782 s). Run: {REGEN_CMD}"
    )


def test_committed_seeds_match_runtime_versions():
    """jax/jaxlib are part of every seed key: an image upgrade strands
    the seeds exactly like a source edit does."""
    import jax
    import jaxlib.version

    manifest = read_manifest()
    assert manifest is not None, f"no manifest; run: {REGEN_CMD}"
    assert (manifest["jax"], manifest["jaxlib"]) == (
        jax.__version__, jaxlib.version.__version__,
    ), (
        f"seeds were generated under jax {manifest['jax']} / jaxlib "
        f"{manifest['jaxlib']} but this runtime is {jax.__version__} / "
        f"{jaxlib.version.__version__} — every key misses. Run: {REGEN_CMD}"
    )


def test_manifest_lists_serving_programs():
    """The serving path must stay seeded (VERDICT r4 missing #3): a cold
    SERVER's first 16-way burst rides prefill_rows + short-horizon decode
    chunks + the streaming vocoder session, not just the single-stream
    bench programs."""
    manifest = read_manifest()
    assert manifest is not None, f"no manifest; run: {REGEN_CMD}"
    names = set(manifest["programs"])
    for required in ("decode_loop", "prefill", "prefill_rows", "codec_step"):
        assert required in names, (
            f"committed seeds lack the '{required}' program — the regen "
            f"script must run the serving bench modes too. Run: {REGEN_CMD}"
        )


def test_every_committed_artifact_is_in_manifest():
    """No orphan artifacts: every .jaxexport on disk must be accounted
    for by the manifest's program list (stale files can never hit and
    only bloat the checkout)."""
    manifest = read_manifest()
    assert manifest is not None, f"no manifest; run: {REGEN_CMD}"
    names = set(manifest["programs"])
    d = aot.DEFAULT_AOT_DIR
    for f in os.listdir(d):
        if f.endswith(".jaxexport"):
            assert f[: f.rindex("-")] in names, (
                f"aot_seed/{f} is not in the manifest — stale artifact? "
                f"Run: {REGEN_CMD}"
            )
