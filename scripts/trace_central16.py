"""Per-tick phase timing of the central-vocode 16-way wave: where does
wall time go between decode dispatch, decode fetch, vocode dispatch,
and the delivery thread's PCM fetch?  Monkeypatches timers around the
scheduler's phases on the REAL benchmarked configuration."""

import faulthandler
import sys
import threading
import time

faulthandler.dump_traceback_later(240, repeat=True)

sys.path.insert(0, ".")
import numpy as np  # noqa: E402

from bench import _serving_setup, _setup_fish15, log  # noqa: E402
from fish_speech_tpu.generate import continuous as C  # noqa: E402


def main() -> None:
    s = _setup_fish15()
    rows = 16
    n_frames, engine, codec, batcher = _serving_setup(
        s, rows, codec_buckets=(128,), int8=False
    )
    rec = []
    lock = threading.Lock()

    orig_dispatch = batcher._dispatch
    orig_process = batcher._process
    orig_tick = batcher._central.tick
    orig_deliver_get = C.jax.device_get

    def timed_dispatch():
        t0 = time.perf_counter()
        out = orig_dispatch()
        with lock:
            rec.append(("dispatch", time.perf_counter() - t0))
        return out

    def timed_process(flight):
        t0 = time.perf_counter()
        out = orig_process(flight)
        with lock:
            rec.append(("process", time.perf_counter() - t0))
        return out

    def timed_tick():
        t0 = time.perf_counter()
        out = orig_tick()
        with lock:
            rec.append(("vtick", time.perf_counter() - t0))
        return out

    batcher._dispatch = timed_dispatch
    batcher._process = timed_process
    batcher._central.tick = timed_tick

    # wrap the delivery thread's fetch
    central = batcher._central
    orig_loop_get = C.jax.device_get

    def traced_get(x):
        t0 = time.perf_counter()
        out = orig_loop_get(x)
        if threading.current_thread() is central._thread:
            with lock:
                rec.append(("pcm_fetch", time.perf_counter() - t0))
        return out

    C.jax.device_get = traced_get

    make_prompt = s.make_prompt

    def run_request(i, out):
        t0 = time.perf_counter()
        req = batcher.submit(
            [make_prompt()], cond_len=0, max_new=n_frames,
            deliver_pcm=True, low_latency=False,
        )
        audio = 0.0
        for ev in req.iter_events():
            if isinstance(ev, C._PartialPCM):
                audio += ev.pcm.shape[-1] / codec.sample_rate
        out[i] = (time.perf_counter() - t0, audio)

    log("warmup...")
    batcher.warmup()

    def wave(label):
        with lock:
            rec.clear()
        out = [None] * rows
        t0 = time.perf_counter()
        ts = [
            threading.Thread(target=run_request, args=(i, out))
            for i in range(rows)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        wall = time.perf_counter() - t0
        rtfs = sorted(w / a for w, a in out)
        with lock:
            phases = {}
            for k, v in rec:
                phases.setdefault(k, []).append(v)
        log(f"{label}: wall {wall:.2f}s p50 RTF {rtfs[rows // 2]:.3f}")
        for k, vs in sorted(phases.items()):
            log(
                f"  {k:10s}: n={len(vs):3d} total {sum(vs):6.3f}s "
                f"mean {np.mean(vs) * 1e3:6.1f} ms max {max(vs) * 1e3:6.1f} ms"
            )

    wave("wave1")
    wave("wave2")
    batcher.shutdown()


if __name__ == "__main__":
    main()
