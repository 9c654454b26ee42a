"""Device profiling helpers: jax.profiler wrappers for the decode path.

The framework-level replacement for "no tracing framework in the hot
path" in the reference (SURVEY §5 — its performance introspection is
Instant+println). Usage:

    with device_trace("/tmp/fish_trace"):
        pipeline.synthesize("hello")          # view in XProf/TensorBoard

    with annotate("prefill"):
        engine.prefill(...)                   # named region in the trace

Traces capture XLA executable timelines on TPU (and host events on CPU);
`annotate` adds named TraceMe regions so engine phases are attributable.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def device_trace(log_dir: str, *, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace of the enclosed block into log_dir."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name: str):
    """Named region (TraceMe) inside an active trace."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:  # noqa: BLE001 — backend may not support it
            out[str(d)] = None
    return out
