"""Attribute the 16-way blocking p50 between device program time and
host/scheduler overhead (VERDICT r4 weak #2 follow-up).

Builds the EXACT benchmarked serving engine (bench._serving_setup:
B=16, cache 512, horizon 16, dynamic sampling, bf16 or --int8), then
times the steady-state decode_chunk program back-to-back on-device.
The device floor for one 128-frame request is

    8 ticks x tick_time + prefill + vocode

and the gap between the measured per-request wall (bench.py
--continuous 16 --blocking) and this floor is what the scheduler/host
can still recover. Also times horizon 32/64 variants to size the
per-tick fixed cost (the case for latency-class-aware tick horizons).
"""

import sys
import time

sys.path.insert(0, ".")
import numpy as np  # noqa: E402

from bench import _serving_setup, _setup_fish15, log  # noqa: E402


def main() -> None:
    import jax

    s = _setup_fish15()
    rows = 16
    n_frames, engine, codec, batcher = _serving_setup(
        s, rows, codec_buckets=(128,), int8="--int8" in sys.argv
    )
    sampling = batcher.sampling
    state = batcher.state

    for horizon in (16, 32, 64):
        if 128 % horizon:
            continue
        # compile
        st, out, valid, steps = engine.decode_chunk(state, sampling, horizon)
        jax.block_until_ready(out)
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            st, out, valid, steps = engine.decode_chunk(st, sampling, horizon)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        tick = float(np.median(times))
        per_step = tick / horizon
        floor_128 = tick * (128 // horizon)
        log(
            f"horizon {horizon:3d}: tick {tick * 1e3:7.2f} ms "
            f"({per_step * 1e3:5.2f} ms/step) -> 128-frame decode floor "
            f"{floor_128 * 1e3:6.1f} ms"
        )

    # prefill floor: the grouped 16-row admission program
    prompts = [np.asarray(s.make_prompt()) for _ in range(rows)]
    t0 = time.perf_counter()
    batcher.warmup(conditioning_lens=(0,))
    log(f"(warmup wall {time.perf_counter() - t0:.1f}s)")
    batcher.shutdown()


if __name__ == "__main__":
    main()
