"""Device-time probe for the 16-way vocode strategy decision:

  a) streaming decode_step at (1, C, 16)   -- per-request session feed
  b) streaming decode_step at (16, C, 16)  -- central batched feed
  c) whole bucketed decode  at (1, C, 128) -- blocking per-request vocode
  d) whole bucketed decode  at (16, C, 128)-- grouped blocking vocode
  e) per-tick PCM fetch: device_get of FRESH (16, 16*spf) f32 arrays

Timing: each config dispatches a chain of n dependent steps and syncs
ONCE at the end via a host fetch of the last output (docs/TPU_NOTES.md:
block_until_ready can return early through the tunnel; jax arrays cache
their host copy, so fetch timing must use fresh arrays). Reported
number = wall / n, i.e. includes amortized dispatch — exactly what the
scheduler pays per tick.
"""

import sys
import time

sys.path.insert(0, ".")
import numpy as np  # noqa: E402

from bench import _setup_fish15, log  # noqa: E402


def main() -> None:
    s = _setup_fish15()
    from fish_speech_tpu.models.codec.firefly import FireflyCodec

    codec = FireflyCodec(s.codec_params, s.codec_cfg, buckets=(16, 128))
    C = codec.cfg.quantizer.num_semantic_codebooks
    rng = np.random.default_rng(0)
    n = 12

    for b, t, label in ((1, 16, "a"), (16, 16, "b"), (16, 4, "b4")):
        sess = codec.start_stream(batch=b, max_step_frames=t)
        codes = rng.integers(0, 1000, size=(b, C, t)).astype(np.int32)
        st = sess.state
        audio, st = codec.decode_step_async(codes, st)  # compile
        np.asarray(audio)
        t0 = time.perf_counter()
        for _ in range(n):
            audio, st = codec.decode_step_async(codes, st)
        np.asarray(audio)
        dt = (time.perf_counter() - t0) / n
        log(f"({label}) stream step B={b} t={t}: {dt * 1e3:7.2f} ms "
            f"({dt * 1e3 / (b * t):.3f} ms/frame-row)")

    for b, t, label in ((1, 128, "c"), (16, 128, "d")):
        codes = rng.integers(0, 1000, size=(b, C, t)).astype(np.int32)
        codec.decode(codes)  # compile + sync (decode returns np)
        t0 = time.perf_counter()
        for _ in range(4):
            codec.decode(codes)
        dt = (time.perf_counter() - t0) / 4
        log(f"({label}) whole decode B={b} T={t} (sync each): "
            f"{dt * 1e3:7.2f} ms ({dt * 1e3 / (b * t):.3f} ms/frame-row)")

    # (e) tunnel fetch of one tick's batched PCM — fresh arrays each time
    import jax
    import jax.numpy as jnp

    spf = codec.samples_per_frame
    mk = jax.jit(lambda i: jnp.full((16, 16 * spf), i, jnp.float32))
    arrs = [mk(i) for i in range(8)]
    jax.block_until_ready(arrs)
    np.asarray(arrs[0])
    t0 = time.perf_counter()
    for a in arrs[1:]:
        np.asarray(a)
    dt = (time.perf_counter() - t0) / (len(arrs) - 1)
    log(f"(e) device_get (16, {16 * spf}) f32 "
        f"({16 * 16 * spf * 4 / 1e6:.1f} MB): {dt * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
