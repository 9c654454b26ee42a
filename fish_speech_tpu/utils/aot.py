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
(cache_seed/), so a fully seeded cold start pays neither trace nor
compile.

Safety model (mirrors cache_seed/): the artifact filename key hashes
- jax version + backend platform,
- a fingerprint of every compute-path source file (any edit to the
  engine/model/ops invalidates every seed — conservative by design:
  a stale module must never run silently),
- the per-program identity parts the caller passes (engine config repr,
  sampling args, bucket/horizon/unroll variants).
A missing or mismatched key silently falls back to the normal traced
path; `jax.export.deserialize` additionally enforces its own
StableHLO/jaxlib compatibility checks.

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

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
DEFAULT_AOT_DIR = os.path.join(_REPO_ROOT, "aot_seed")

# Compute-path sources whose bytes feed every program key. Keep this
# list wide: missing a file risks a silently-stale artifact, while an
# extra file merely costs a regeneration.
_FINGERPRINT_SOURCES = (
    "fish_speech_tpu/config.py",
    "fish_speech_tpu/generate/engine.py",
    "fish_speech_tpu/generate/frame.py",
    "fish_speech_tpu/models/dual_ar.py",
    "fish_speech_tpu/ops/attention.py",
    "fish_speech_tpu/ops/attention_pallas.py",
    "fish_speech_tpu/ops/fast_frame_pallas.py",
    "fish_speech_tpu/ops/prefill_pallas.py",
    "fish_speech_tpu/ops/slow_step_pallas.py",
    "fish_speech_tpu/ops/sampling.py",
    "fish_speech_tpu/ops/quant.py",
)

_source_fp_cache: Optional[str] = None


def aot_dir() -> str:
    """Seed directory: $FISH_TPU_AOT_DIR, or the repo's aot_seed/.
    Read per call so tests can redirect it."""
    return os.environ.get("FISH_TPU_AOT_DIR", DEFAULT_AOT_DIR)


def export_mode() -> bool:
    """FISH_TPU_AOT_EXPORT=1 turns first calls of wrapped programs into
    export+save (scripts/regen_aot_seed.py sets it)."""
    return os.environ.get("FISH_TPU_AOT_EXPORT", "") == "1"


def _source_fingerprint() -> str:
    global _source_fp_cache
    if _source_fp_cache is None:
        h = hashlib.sha256()
        for rel in _FINGERPRINT_SOURCES:
            path = os.path.join(_REPO_ROOT, rel)
            h.update(rel.encode())
            try:
                with open(path, "rb") as f:
                    h.update(f.read())
            except OSError:
                h.update(b"<missing>")
        _source_fp_cache = h.hexdigest()
    return _source_fp_cache


def program_key(name: str, parts: Sequence[object]) -> str:
    import jax

    ident = "\x1f".join(
        [
            jax.__version__,
            jax.default_backend(),
            _source_fingerprint(),
            *[repr(p) for p in parts],
        ]
    )
    return f"{name}-{hashlib.sha256(ident.encode()).hexdigest()[:24]}"


def _path_for(key: str) -> str:
    return os.path.join(aot_dir(), key + ".jaxexport")


_pytrees_registered = False


def _register_pytree_serialization() -> None:
    """jax.export (de)serializes PyTreeDefs by NAME; every custom pytree
    node crossing an exported program's boundary must be registered once
    per process, identically on the writer and the reader (the fq class
    names below are that contract)."""
    global _pytrees_registered
    if _pytrees_registered:
        return
    _pytrees_registered = True
    from jax import export as jax_export

    from fish_speech_tpu.generate.engine import GenState
    from fish_speech_tpu.generate.frame import FrameResult
    from fish_speech_tpu.models.dual_ar import KVCache
    from fish_speech_tpu.ops.sampling import RepPenWindow

    for cls in (GenState, FrameResult, KVCache, RepPenWindow):
        name = f"{cls.__module__}.{cls.__qualname__}"
        try:
            jax_export.register_namedtuple_serialization(
                cls, serialized_name=name
            )
        except ValueError:
            pass  # already registered (e.g. two engines in one process)


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
    seeds are consumed by the SAME jaxlib that wrote them (the key pins
    the version), so the stability allowlist check is disabled for it."""
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


def wrap(name: str, parts: Sequence[object], jit_fn, donate_argnums=(),
         enabled: bool = True):
    """The one engine-facing entry point: given a freshly-jitted program
    and its identity, return (in order of preference) a deserialized
    seed, an exporting wrapper (export mode only), or the fn unchanged."""
    if not enabled:
        return jit_fn
    key = program_key(name, parts)
    loaded = load(key, donate_argnums)
    if loaded is not None:
        return loaded
    if export_mode():
        return _ExportOnFirstCall(key, jit_fn)
    return jit_fn
