"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import WhichLM
from fish_speech_tpu.generate.engine import LMEngine
from fish_speech_tpu.models.dual_ar import init_dual_ar_params
from fish_speech_tpu.ops.sampling import SamplingArgs
from fish_speech_tpu.parallel.mesh import make_mesh, shard_gen_state, shard_lm_params
from tests.test_engine import CFG, TOK


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_sharded_decode_matches_unsharded():
    """dp=4, tp=2 sharded generation must produce the same tokens as the
    single-device run (sharding never changes semantics)."""
    params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    sampling = SamplingArgs(temp=0.0)

    rng = np.random.default_rng(1)
    prompt = np.concatenate(
        [
            rng.integers(18, 30, size=(4, 1, 6)),
            np.zeros((4, CFG.num_codebooks, 6), np.int64),
        ],
        axis=1,
    )

    def make_engine(p):
        return LMEngine(
            p, CFG, TOK, WhichLM.FISH_1_5,
            batch_size=4, cache_len=32, max_frames=4,
            dtype=jnp.float32, prompt_buckets=(8,),
        )

    def run(shard: bool):
        if shard:
            mesh = make_mesh(8, tp=2)
            with mesh:
                engine = make_engine(shard_lm_params(params, mesh, CFG))
                state = shard_gen_state(engine.init_state(seed=7), mesh, CFG)
                state, frame, _ = engine.prefill(state, prompt, sampling)
                state, frame2 = engine._get_step(sampling)(state)
                return np.asarray(frame), np.asarray(frame2)
        engine = make_engine(params)
        state = engine.init_state(seed=7)
        state, frame, _ = engine.prefill(state, prompt, sampling)
        state, frame2 = engine._get_step(sampling)(state)
        return np.asarray(frame), np.asarray(frame2)

    f1, f2 = run(False)
    g1, g2 = run(True)
    np.testing.assert_array_equal(f1, g1)
    np.testing.assert_array_equal(f2, g2)


@pytest.mark.parametrize("tp", [1, 2])
def test_sharded_decode_pallas_matches_xla(tp):
    """The fused Pallas decode kernel under dp x tp sharding (shard_map,
    interpret mode on CPU) must produce the same tokens as the unsharded
    XLA attention — the multi-chip serving path no longer silently drops
    the kernel (round-2 verdict: use_pallas required device_count()==1)."""
    params = init_dual_ar_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    sampling = SamplingArgs(temp=0.0)

    rng = np.random.default_rng(3)
    prompt = np.concatenate(
        [
            rng.integers(18, 30, size=(4, 1, 6)),
            np.zeros((4, CFG.num_codebooks, 6), np.int64),
        ],
        axis=1,
    )

    def run(mesh=None, impl="xla"):
        def make_engine(p):
            return LMEngine(
                p, CFG, TOK, WhichLM.FISH_1_5,
                batch_size=4, cache_len=32, max_frames=4,
                dtype=jnp.float32, prompt_buckets=(8,),
                attention_impl=impl, mesh=mesh,
            )

        if mesh is not None:
            with mesh:
                engine = make_engine(shard_lm_params(params, mesh, CFG))
                assert engine.use_pallas == (impl == "pallas")
                state = shard_gen_state(engine.init_state(seed=7), mesh, CFG)
                state, frame, _ = engine.prefill(state, prompt, sampling)
                frames = [np.asarray(frame)]
                step = engine._get_step(sampling)
                for _ in range(3):
                    state, f = step(state)
                    frames.append(np.asarray(f))
                return frames
        engine = make_engine(params)
        state = engine.init_state(seed=7)
        state, frame, _ = engine.prefill(state, prompt, sampling)
        frames = [np.asarray(frame)]
        step = engine._get_step(sampling)
        for _ in range(3):
            state, f = step(state)
            frames.append(np.asarray(f))
        return frames

    ref = run()  # unsharded XLA
    # batch 4: dp=4 in both cases (dp must divide the row count)
    got = run(mesh=make_mesh(4 * tp, tp=tp), impl="pallas")
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)


def test_sharded_continuous_batcher_matches_serial():
    """The SERVING path sharded: a continuous batcher whose params/state
    are dp=4 x tp=2 sharded (BASELINE configs[4] scale-out shape) must
    produce exactly the serial single-device engine's argmax tokens —
    admission prefill at a traced row index, the horizon decode chunk,
    and the pipelined scheduler all run through GSPMD collectives."""
    from fish_speech_tpu.generate.continuous import ContinuousBatcher
    from tests.test_engine import make_prompt

    params = init_dual_ar_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)
    sampling = SamplingArgs(temp=0.0)
    prompt = make_prompt(6)

    serial = LMEngine(
        params, CFG, TOK, WhichLM.FISH_1_5,
        cache_len=32, max_frames=8, dtype=jnp.float32, prompt_buckets=(8,),
    )
    ref, _ = serial.generate(prompt, max_new_tokens=5, sampling=sampling, seed=0)

    mesh = make_mesh(8, tp=2)
    sharded_params = shard_lm_params(params, mesh, CFG)
    engine = LMEngine(
        sharded_params, CFG, TOK, WhichLM.FISH_1_5,
        batch_size=4, cache_len=32, max_frames=8,
        dtype=jnp.float32, prompt_buckets=(8,),
    )
    b = ContinuousBatcher(
        engine, sampling, horizon=3,
        shard_state=lambda s: shard_gen_state(s, mesh, CFG),
    )
    try:
        req = b.submit([prompt], cond_len=0, max_new=5)
        chunks = [c for c in req]
    finally:
        b.shutdown()
    assert len(chunks) == 1
    np.testing.assert_array_equal(chunks[0].semantic, ref.semantic)
    np.testing.assert_array_equal(chunks[0].tokens, ref.tokens)


def test_sharded_decode_matches_unsharded_tp4():
    """tp=4 (dp=2) on a 4-KV-head config: the head/FFN shardings must
    generalize beyond the stock Fish tp=2 bound (mesh.py: tp is limited
    by the checkpoint's KV-head count, not by the implementation)."""
    import dataclasses

    cfg4 = dataclasses.replace(CFG, n_head=8, n_local_heads=4, dim=64, head_dim=8,
                               intermediate_size=128)
    params = init_dual_ar_params(jax.random.PRNGKey(2), cfg4, dtype=jnp.float32)
    sampling = SamplingArgs(temp=0.0)

    rng = np.random.default_rng(3)
    prompt = np.concatenate(
        [
            rng.integers(18, 30, size=(2, 1, 6)),
            np.zeros((2, cfg4.num_codebooks, 6), np.int64),
        ],
        axis=1,
    )

    def make_engine(p):
        return LMEngine(
            p, cfg4, TOK, WhichLM.FISH_1_5,
            batch_size=2, cache_len=32, max_frames=4,
            dtype=jnp.float32, prompt_buckets=(8,),
        )

    def run(shard: bool):
        if shard:
            mesh = make_mesh(8, tp=4)
            with mesh:
                engine = make_engine(shard_lm_params(params, mesh, cfg4))
                state = shard_gen_state(engine.init_state(seed=9), mesh, cfg4)
                state, frame, _ = engine.prefill(state, prompt, sampling)
                state, frame2 = engine._get_step(sampling)(state)
                return np.asarray(frame), np.asarray(frame2)
        engine = make_engine(params)
        state = engine.init_state(seed=9)
        state, frame, _ = engine.prefill(state, prompt, sampling)
        state, frame2 = engine._get_step(sampling)(state)
        return np.asarray(frame), np.asarray(frame2)

    f1, f2 = run(False)
    g1, g2 = run(True)
    np.testing.assert_array_equal(f1, g1)
    np.testing.assert_array_equal(f2, g2)


def test_sharded_burst_prefill_matches_unsharded():
    """Burst admission (engine.prefill_rows) under a dp=4 x tp=2 mesh:
    GSPMD must partition the multi-row prefill + state splices without
    changing semantics (the sharded continuous batcher forms bursts)."""
    params = init_dual_ar_params(jax.random.PRNGKey(4), CFG, dtype=jnp.float32)
    sampling = SamplingArgs(temp=0.0)
    rng = np.random.default_rng(5)
    prompts = [
        np.concatenate(
            [
                rng.integers(18, 30, size=(1, 4 + i)),
                np.zeros((CFG.num_codebooks, 4 + i), np.int64),
            ],
            axis=0,
        )
        for i in range(3)
    ]

    def make_engine(p):
        return LMEngine(
            p, CFG, TOK, WhichLM.FISH_1_5,
            batch_size=4, cache_len=32, max_frames=4,
            dtype=jnp.float32, prompt_buckets=(8,),
        )

    def run(shard: bool):
        if shard:
            mesh = make_mesh(8, tp=2)
            with mesh:
                engine = make_engine(shard_lm_params(params, mesh, CFG))
                state = shard_gen_state(engine.init_state(seed=7), mesh, CFG)
                state, frames, eos = engine.prefill_rows(
                    state, prompts, sampling, row0=1
                )
                return (
                    np.asarray(frames),
                    np.asarray(state.pos),
                    np.asarray(state.done),
                )
        engine = make_engine(params)
        state = engine.init_state(seed=7)
        state, frames, eos = engine.prefill_rows(state, prompts, sampling, row0=1)
        return np.asarray(frames), np.asarray(state.pos), np.asarray(state.done)

    f_a, pos_a, done_a = run(False)
    f_b, pos_b, done_b = run(True)
    np.testing.assert_array_equal(f_a, f_b)
    np.testing.assert_array_equal(pos_a, pos_b)
    np.testing.assert_array_equal(done_a, done_b)
