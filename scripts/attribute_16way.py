"""Attribute the 16-way blocking p50 between device program time and
host/scheduler overhead (VERDICT r4 weak #2 follow-up).

Builds the EXACT benchmarked serving engine (bench._serving_setup:
B=16, cache 512, horizon 16, dynamic sampling, bf16 or --int8), makes
all 16 rows ACTIVE via the real grouped admission program, then times
steady-state decode_chunk programs back-to-back. The device floor for
one 128-frame request is

    (128 / horizon) ticks x tick_time + prefill + vocode

and the gap between the measured per-request wall (bench.py
--continuous 16 --blocking) and this floor is what the scheduler/host
can still recover. Also times horizon 32/64 variants to size the
per-tick fixed cost (the case for latency-class-aware tick horizons).

Tunnel rules (docs/TPU_NOTES.md:249-251): block_until_ready can return
early — sync via a tiny np.asarray readback; two loop lengths cancel
fixed overheads. Tick counts are sized so prompt + timed steps stay
inside the 512-position cache.
"""

import sys
import time

sys.path.insert(0, ".")
import numpy as np  # noqa: E402

from bench import _serving_setup, _setup_fish15, log  # noqa: E402


def main() -> None:
    s = _setup_fish15()
    rows = 16
    n_frames, engine, codec, batcher = _serving_setup(
        s, rows, codec_buckets=(128,), int8="--int8" in sys.argv
    )
    sampling = batcher.sampling
    prompt = np.asarray(s.make_prompt())

    # (loops sized so prompt 40 + ticks*horizon < cache 512)
    for horizon, loops in ((16, (8, 16)), (32, (4, 8)), (64, (2, 4))):
        st = engine.init_state(seed=0)
        st, frames, _ = engine.prefill_rows(st, [prompt] * rows, sampling, 0)
        np.asarray(frames)
        # compile this horizon's chunk program
        st, out, valid, steps = engine.decode_chunk(st, sampling, horizon)
        np.asarray(steps)
        walls = {}
        steps_run = {}
        for n in loops:
            # chain dispatches WITHOUT per-tick syncs (the batcher's
            # pipelined loop never syncs mid-stream either); steps
            # executed = cache-position advance at the single final sync
            p0 = int(np.asarray(st.pos).max())
            t0 = time.perf_counter()
            for _ in range(n):
                st, out, valid, steps = engine.decode_chunk(
                    st, sampling, horizon
                )
            total = int(np.asarray(st.pos).max()) - p0
            walls[n] = time.perf_counter() - t0
            steps_run[n] = total
        d_steps = steps_run[loops[1]] - steps_run[loops[0]]
        per_step = (walls[loops[1]] - walls[loops[0]]) / max(d_steps, 1)
        tick = per_step * horizon
        floor_128 = per_step * 128
        log(
            f"horizon {horizon:3d}: tick {tick * 1e3:7.2f} ms "
            f"({per_step * 1e3:5.2f} ms/step over {d_steps} steps) -> "
            f"128-frame decode floor {floor_128 * 1e3:6.1f} ms"
        )

    # prefill floor: one grouped 16-row admission program, steady state
    st = engine.init_state(seed=0)
    st, frames, _ = engine.prefill_rows(st, [prompt] * rows, sampling, 0)
    np.asarray(frames)
    t0 = time.perf_counter()
    for _ in range(4):
        st = engine.init_state(seed=0)
        st, frames, _ = engine.prefill_rows(st, [prompt] * rows, sampling, 0)
        np.asarray(frames)
    log(f"prefill_rows(16): {(time.perf_counter() - t0) / 4 * 1e3:.1f} ms "
        "(incl. init_state)")
    batcher.shutdown()


if __name__ == "__main__":
    main()
