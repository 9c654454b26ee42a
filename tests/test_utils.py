"""utils/: structured timing and jax.profiler wrappers (the framework's
replacement for the reference's Instant+println instrumentation,
SURVEY §5)."""

import glob
import time

import jax
import jax.numpy as jnp
import numpy as np

from fish_speech_tpu.utils.profiling import annotate, device_trace, memory_stats
from fish_speech_tpu.utils.timing import Timer


class TestTimer:
    def test_spans_accumulate_by_name(self):
        t = Timer()
        with t.span("a"):
            time.sleep(0.01)
        with t.span("b"):
            pass
        with t.span("a"):
            time.sleep(0.01)
        rep = t.report()
        assert set(rep) == {"a", "b"}
        assert rep["a"] >= 0.02
        assert t.total("a") == rep["a"]
        assert t.total("missing") == 0.0

    def test_span_recorded_on_exception(self):
        t = Timer()
        try:
            with t.span("x"):
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert t.total("x") >= 0.0 and len(t.spans) == 1


class TestProfiling:
    def test_device_trace_writes_artifacts(self, tmp_path):
        with device_trace(str(tmp_path)):
            with annotate("tiny-matmul"):
                x = jnp.ones((8, 8))
                np.asarray(x @ x)
        produced = glob.glob(str(tmp_path / "**" / "*"), recursive=True)
        assert produced, "trace produced no files"

    def test_memory_stats_covers_all_devices(self):
        stats = memory_stats()
        assert set(stats) == {str(d) for d in jax.local_devices()}


class TestCompilationCacheSetup:
    def test_seeds_and_points_config(self, tmp_path, monkeypatch):
        """setup_compilation_cache points jax at the dir and copies seed
        entries in without overwriting newer runtime entries."""
        import jax

        from fish_speech_tpu.utils.cache import setup_compilation_cache

        seed = tmp_path / "seed"
        seed.mkdir()
        (seed / "jit_x-abc-cache").write_bytes(b"seeded")
        cache = tmp_path / "cache"
        cache.mkdir()
        (cache / "jit_y-def-cache").write_bytes(b"runtime")

        out = setup_compilation_cache(str(cache), seed_dir=str(seed))
        assert out == str(cache)
        assert jax.config.jax_compilation_cache_dir == str(cache)
        assert (cache / "jit_x-abc-cache").read_bytes() == b"seeded"
        assert (cache / "jit_y-def-cache").read_bytes() == b"runtime"

        # existing entries are never clobbered by a re-seed
        (cache / "jit_x-abc-cache").write_bytes(b"newer")
        setup_compilation_cache(str(cache), seed_dir=str(seed))
        assert (cache / "jit_x-abc-cache").read_bytes() == b"newer"

    def test_env_var_override(self, tmp_path, monkeypatch):
        from fish_speech_tpu.utils.cache import setup_compilation_cache

        monkeypatch.setenv("FISH_TPU_CACHE_DIR", str(tmp_path / "envdir"))
        out = setup_compilation_cache(seed_dir=str(tmp_path / "missing"))
        assert out == str(tmp_path / "envdir")
