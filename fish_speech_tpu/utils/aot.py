"""AOT program seeds: serialized `jax.export` artifacts that let a cold
process skip Python tracing + MLIR/Mosaic lowering entirely.

Why this exists (measured, docs/TPU_NOTES.md #16): on a 1-vCPU host the
bench engine's first `generate()` costs ~4-5 minutes even when every
persistent-compilation-cache key HITS, because the cache key is the hash
of the *already-lowered* HLO — the trace+lower phase (~285 s there) runs
in full before the first cache lookup, and only the XLA compile (~15 s)
is skipped. The only lever below that floor is to not trace at all:
serialize the lowered module once (`scripts/regen_aot_seed.py` on any
machine with the target backend) and splice it back in with
`jax.export.deserialize(...).call`, whose own wrapper trace is trivial.
The XLA compile of the spliced module is still persistent-cache-covered
(cache_seed/ — regenerate it AFTER the AOT seeds, the spliced module's
HLO hash differs from the directly-traced program's), so a fully seeded
cold start pays neither trace nor compile.

Safety model (mirrors cache_seed/): the artifact filename key hashes
- jax + jaxlib versions, backend platform, and device kind,
- a fingerprint of every compute-path source file, auto-derived from the
  package's config.py + generate/ + models/ + ops/ trees plus this file
  (any edit invalidates every seed — conservative by design: a stale
  module must never run silently),
- the per-program identity parts the caller passes (engine config repr,
  sampling args, bucket/horizon/unroll variants).
A missing or mismatched key silently falls back to the normal traced
path; `jax.export.deserialize` additionally enforces its own
StableHLO/jaxlib compatibility checks, and a seed whose program fails on
FIRST CALL (e.g. an aval drift the key missed) also falls back to the
traced fn instead of crashing the engine.

Reference counterpart: none — the reference (Rust/candle, eager) has no
compile step to amortize. This is TPU/XLA-specific serving
infrastructure, same category as the persistent-cache seed.
"""

from __future__ import annotations

import hashlib
import logging
import os
from typing import Optional, Sequence

logger = logging.getLogger(__name__)
if os.environ.get("FISH_TPU_AOT_VERBOSE", "") == "1":
    # scripts/regen_aot_seed.py's verify pass greps for the hit lines
    logger.setLevel(logging.INFO)
    logger.addHandler(logging.StreamHandler())

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
DEFAULT_AOT_DIR = os.path.join(_REPO_ROOT, "aot_seed")

# Compute-path sources whose bytes feed every program key, auto-derived:
# every .py under these package trees is hashed, so a new op/model file
# can never be silently missing from the fingerprint (the failure mode a
# hand-maintained list had: ops/norms.py and ops/rope.py were absent).
# parallel/ is deliberately excluded — sharded engines never use seeds
# (aot.wrap is called with enabled=False when a mesh is present).
_FINGERPRINT_DIRS = ("generate", "models", "ops")
_FINGERPRINT_FILES = ("config.py", os.path.join("utils", "aot.py"))

_source_fp_cache: Optional[str] = None


def aot_dir() -> str:
    """Seed directory: $FISH_TPU_AOT_DIR, or the repo's aot_seed/.
    Read per call so tests can redirect it."""
    return os.environ.get("FISH_TPU_AOT_DIR", DEFAULT_AOT_DIR)


MANIFEST_NAME = "MANIFEST.json"


def manifest_path() -> str:
    return os.path.join(aot_dir(), MANIFEST_NAME)


def write_manifest(programs) -> dict:
    """Record what the committed seeds were generated against. The
    freshness gate (tests/test_seed_freshness.py) recomputes the source
    fingerprint at HEAD and fails CI the moment a compute-path edit
    strands the seeds — the round-4 failure mode, where an edit two
    hours after regen silently killed every committed seed and the
    driver's cold start paid 782 s (VERDICT r4 weak #1)."""
    import json

    import jax
    import jaxlib.version

    devices = jax.devices()
    manifest = {
        "source_fingerprint": _source_fingerprint(),
        "jax": jax.__version__,
        "jaxlib": jaxlib.version.__version__,
        "backend": jax.default_backend(),
        "device_kind": (
            getattr(devices[0], "device_kind", "?") if devices else "?"
        ),
        "programs": sorted(programs),
    }
    os.makedirs(aot_dir(), exist_ok=True)
    with open(manifest_path(), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    return manifest


def read_manifest():
    """The committed manifest, or None if absent/unreadable."""
    import json

    try:
        with open(manifest_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def export_mode() -> bool:
    """FISH_TPU_AOT_EXPORT=1 turns first calls of wrapped programs into
    export+save (scripts/regen_aot_seed.py sets it)."""
    return os.environ.get("FISH_TPU_AOT_EXPORT", "") == "1"


def _fingerprint_paths() -> list:
    pkg = os.path.join(_REPO_ROOT, "fish_speech_tpu")
    paths = [os.path.join(pkg, f) for f in _FINGERPRINT_FILES]
    for d in _FINGERPRINT_DIRS:
        for root, _dirs, files in os.walk(os.path.join(pkg, d)):
            for f in files:
                if f.endswith(".py"):
                    paths.append(os.path.join(root, f))
    return sorted(paths)


def _source_fingerprint() -> str:
    global _source_fp_cache
    if _source_fp_cache is None:
        h = hashlib.sha256()
        for path in _fingerprint_paths():
            h.update(os.path.relpath(path, _REPO_ROOT).encode())
            try:
                with open(path, "rb") as f:
                    h.update(f.read())
            except OSError:
                h.update(b"<missing>")
        _source_fp_cache = h.hexdigest()
    return _source_fp_cache


def program_key(name: str, parts: Sequence[object]) -> str:
    import jax
    import jaxlib.version

    # jax and jaxlib can legitimately differ, and save() disables
    # jax.export's custom-call stability checks on the strength of this
    # key — so the key must pin BOTH versions plus the physical device
    # kind (a Mosaic payload built for one TPU generation must not be
    # spliced into a program for another).
    devices = jax.devices()
    device_kind = getattr(devices[0], "device_kind", "?") if devices else "?"
    ident = "\x1f".join(
        [
            jax.__version__,
            jaxlib.version.__version__,
            jax.default_backend(),
            device_kind,
            _source_fingerprint(),
            *[repr(p) for p in parts],
        ]
    )
    return f"{name}-{hashlib.sha256(ident.encode()).hexdigest()[:24]}"


def _path_for(key: str) -> str:
    return os.path.join(aot_dir(), key + ".jaxexport")


_registered_pytrees: set = set()


def _register_pytree_serialization() -> None:
    """jax.export (de)serializes PyTreeDefs by NAME; every custom pytree
    node crossing an exported program's boundary must be registered once
    per process, identically on the writer and the reader (the fq class
    names below are that contract)."""
    from jax import export as jax_export

    from fish_speech_tpu.generate.engine import GenState
    from fish_speech_tpu.generate.frame import FrameResult
    from fish_speech_tpu.models.dual_ar import KVCache
    from fish_speech_tpu.ops.sampling import RepPenWindow, RowSampling

    for cls in (GenState, FrameResult, KVCache, RepPenWindow, RowSampling):
        if cls in _registered_pytrees:
            continue
        name = f"{cls.__module__}.{cls.__qualname__}"
        try:
            jax_export.register_namedtuple_serialization(
                cls, serialized_name=name
            )
            _registered_pytrees.add(cls)
        except ValueError as e:
            # Only the benign double-registration of the SAME class is
            # silent; anything else (e.g. a serialized-name collision
            # with a different class) would surface later as a confusing
            # deserialize failure, so say it now.
            if "already registered" in str(e).lower():
                _registered_pytrees.add(cls)
            else:
                logger.warning(
                    "pytree serialization registration of %s failed: %s",
                    name, e,
                )


def load(key: str, donate_argnums: Sequence[int] = ()):
    """Return a jitted callable built from a serialized export, or None
    if no artifact matches `key` (or it fails jax.export's own
    compatibility checks). Donation must be re-stated on the outer jit —
    it is an outer-program property, applied to the spliced module the
    same way it was to the original."""
    path = _path_for(key)
    if not os.path.exists(path):
        return None
    import jax
    from jax import export as jax_export

    _register_pytree_serialization()
    try:
        with open(path, "rb") as f:
            exp = jax_export.deserialize(bytearray(f.read()))
        fn = jax.jit(exp.call, donate_argnums=tuple(donate_argnums))
        logger.info("AOT seed hit: %s", key)
        return fn
    except Exception as e:  # stale/incompatible artifact: trace instead
        logger.warning("AOT seed %s unusable (%s); falling back", key, e)
        return None


def save(key: str, jit_fn, args) -> str:
    """Export `jit_fn` at the avals of `args` and write the artifact.
    Mosaic kernels lower to the `tpu_custom_call` custom call, which is
    outside jax.export's forward-compatibility guarantee — fine here:
    seeds are consumed by the SAME jax+jaxlib+device that wrote them
    (program_key pins all three), so the stability allowlist check is
    disabled for it."""
    from jax import export as jax_export

    _register_pytree_serialization()
    disabled = [
        jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        jax_export.DisabledSafetyCheck.custom_call("Sharding"),
    ]
    exp = jax_export.export(jit_fn, disabled_checks=disabled)(*args)
    os.makedirs(aot_dir(), exist_ok=True)
    path = _path_for(key)
    blob = exp.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    logger.info("AOT seed written: %s (%d bytes)", path, len(blob))
    return path


class _ExportOnFirstCall:
    """Wraps a jitted fn so its first invocation also exports+saves the
    program at the concrete call's avals, then delegates. Export sees
    only abstract values, so donated buffers are untouched before the
    real call."""

    def __init__(self, key: str, jit_fn):
        self._key = key
        self._jit_fn = jit_fn
        self._exported = False

    def __call__(self, *args):
        if not self._exported:
            self._exported = True
            try:
                save(self._key, self._jit_fn, args)
            except Exception as e:
                logger.warning("AOT export of %s failed: %s", self._key, e)
        return self._jit_fn(*args)


class _SeedWithFallback:
    """Routes calls to a deserialized seed, permanently falling back to
    the traced fn if the seed's program fails — e.g. the caller's
    argument avals drifted from export time under an unchanged key (a
    params-dict structure change not reflected in the identity parts).
    The failure surfaces at TRACE time of the spliced wrapper, before
    any donated buffer is consumed, so the fallback call is safe."""

    def __init__(self, key: str, seed_fn, jit_fn):
        self._key = key
        self._fn = seed_fn
        self._jit_fn = jit_fn
        self._validated = False

    def __call__(self, *args):
        if self._validated:
            return self._fn(*args)
        try:
            out = self._fn(*args)
            self._validated = True
            return out
        except Exception as e:
            logger.warning(
                "AOT seed %s failed on first call (%s); falling back to "
                "the traced path", self._key, e,
            )
            self._fn = self._jit_fn
            self._validated = True
            return self._fn(*args)


def wrap(name: str, parts: Sequence[object], jit_fn, donate_argnums=(),
         enabled: bool = True):
    """The one engine-facing entry point: given a freshly-jitted program
    and its identity, return (in order of preference) a deserialized
    seed (guarded by a first-call fallback), an exporting wrapper
    (export mode only), or the fn unchanged."""
    if not enabled:
        return jit_fn
    key = program_key(name, parts)
    loaded = load(key, donate_argnums)
    if loaded is not None:
        return _SeedWithFallback(key, loaded, jit_fn)
    if export_mode():
        return _ExportOnFirstCall(key, jit_fn)
    return jit_fn
