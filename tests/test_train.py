"""Training subsystem: teacher-forced loss, sharded train step, save.

Parity anchors: the training forwards must match the SERVING code paths
exactly (slow_forward_full vs slow_prefill; fast_forward_teacher vs the
incremental fast_step/fast_embed schedule) — a finetuned checkpoint is
only useful if training optimized the same function serving runs. Then
optimization sanity (loss decreases), distributed correctness (dp x tp
sharded step == single-device step), and the torch-layout safetensors
round-trip.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fish_speech_tpu.config import DualARConfig, TokenConfig
from fish_speech_tpu.models.dual_ar import (
    KVCache,
    fast_embed,
    fast_hist_init,
    fast_step,
    init_dual_ar_params,
    slow_prefill,
)
from fish_speech_tpu.train import (
    TrainConfig,
    dual_ar_loss,
    fast_forward_teacher,
    init_train_state,
    make_train_step,
    slow_forward_full,
)
from fish_speech_tpu.train.step import shard_batch

CFG = DualARConfig(
    vocab_size=96,
    n_layer=2,
    n_fast_layer=2,
    n_head=4,
    dim=32,
    intermediate_size=64,
    n_local_heads=2,
    head_dim=8,
    rope_base=10000.0,
    norm_eps=1e-6,
    max_seq_len=64,
    codebook_size=16,
    num_codebooks=4,
)
TOK = TokenConfig(im_end_id=9, pad_id=5, semantic_start_id=32, semantic_end_id=47)


def _params(seed=0, cfg=CFG):
    return init_dual_ar_params(jax.random.PRNGKey(seed), cfg, dtype=jnp.float32)


def _batch(seed=0, b=4, s=24, cfg=CFG):
    """Synthetic prompts: a text prefix (tokens below the semantic range,
    zero codebooks) followed by audio frames (semantic-range token +
    random codebooks), right-padded."""
    rng = np.random.default_rng(seed)
    tokens = np.zeros((b, cfg.num_codebooks + 1, s), np.int32)
    seq_lens = rng.integers(s - 6, s + 1, size=(b,)).astype(np.int32)
    for i in range(b):
        text_len = int(rng.integers(3, 7))
        tokens[i, 0, :text_len] = rng.integers(10, 30, size=text_len)
        n_audio = seq_lens[i] - text_len
        tokens[i, 0, text_len : seq_lens[i]] = rng.integers(
            TOK.semantic_start_id, TOK.semantic_end_id + 1, size=n_audio
        )
        tokens[i, 1:, text_len : seq_lens[i]] = rng.integers(
            0, cfg.codebook_size, size=(cfg.num_codebooks, n_audio)
        )
        tokens[i, 0, seq_lens[i] :] = TOK.pad_id
    return {
        "tokens": jnp.asarray(tokens),
        "seq_lens": jnp.asarray(seq_lens),
    }


def test_slow_forward_matches_prefill():
    """The training slow forward and the serving prefill compute the same
    function: hidden at each row's last real position must agree."""
    params = _params()
    batch = _batch(1)
    tokens, seq_lens = batch["tokens"], batch["seq_lens"]
    b, _, s = tokens.shape

    hidden_all = slow_forward_full(params, CFG, TOK, tokens, seq_lens, remat=False)
    last = jnp.take_along_axis(
        hidden_all, (seq_lens - 1)[:, None, None], axis=1
    )[:, 0, :]

    cache = KVCache.init(CFG.n_layer, b, CFG.n_local_heads, s, CFG.head_dim, jnp.float32)
    _, hidden_prefill, _ = slow_prefill(
        params, CFG, TOK, tokens, seq_lens, cache, 0, 0
    )
    np.testing.assert_allclose(
        np.asarray(last), np.asarray(hidden_prefill), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("depthwise", [False, True], ids=["std", "depthwise"])
def test_fast_teacher_matches_incremental(depthwise):
    """fast_forward_teacher == the serving fast_step/fast_embed schedule,
    step by step, for every codebook position."""
    cfg = (
        dataclasses.replace(CFG, depthwise_wte=True, depthwise_output=True)
        if depthwise
        else CFG
    )
    params = _params(3, cfg)
    n, c = 5, cfg.num_codebooks
    rng = np.random.default_rng(7)
    hidden = jnp.asarray(rng.normal(size=(n, cfg.dim)) * 0.3, jnp.float32)
    codebooks = jnp.asarray(
        rng.integers(0, cfg.codebook_size, size=(n, c)), jnp.int32
    )

    got = fast_forward_teacher(params, cfg, hidden, codebooks)  # (N, C, cb)

    x = hidden[:, None, :]
    hist = fast_hist_init(cfg, n, jnp.float32)
    for i in range(c):
        logits, hist = fast_step(params, cfg, x, hist, i)
        np.testing.assert_allclose(
            np.asarray(got[:, i, :]),
            np.asarray(logits),
            atol=2e-5,
            rtol=2e-5,
            err_msg=f"codebook step {i}",
        )
        if i + 1 < c:
            x = fast_embed(params, cfg, codebooks[:, i], i)


def test_loss_decreases():
    params = _params()
    tcfg = TrainConfig(
        learning_rate=3e-3, warmup_steps=2, total_steps=60, grad_clip=1.0,
        remat=True,
    )
    params, opt_state = init_train_state(params, tcfg)
    step = make_train_step(CFG, TOK, tcfg)
    batch = _batch(2)

    first = None
    for i in range(40):
        params, opt_state, metrics = step(params, opt_state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < 0.5 * first, (first, last)
    # masked counts: slow counts real next positions, fast counts
    # codebook targets (C per position) at AUDIO positions only — the
    # text prefixes must make fast strictly less than slow * C.
    assert (
        int(metrics["fast_tokens"])
        < int(metrics["slow_tokens"]) * CFG.num_codebooks
    )


def test_sharded_step_matches_unsharded():
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    from fish_speech_tpu.parallel.mesh import make_mesh

    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10, remat=False)
    batch = _batch(5, b=4)

    # single-device reference
    p1, s1 = init_train_state(_params(11), tcfg)
    step1 = make_train_step(CFG, TOK, tcfg, donate=False)
    for _ in range(2):
        p1, s1, m1 = step1(p1, s1, batch)

    # dp=2 x tp=2 sharded
    mesh = make_mesh(4, tp=2)
    with mesh:
        p2, s2 = init_train_state(_params(11), tcfg, mesh=mesh, cfg=CFG)
        step2 = make_train_step(CFG, TOK, tcfg, donate=False)
        sb = shard_batch(batch, mesh)
        for _ in range(2):
            p2, s2, m2 = step2(p2, s2, sb)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), atol=1e-5, rtol=1e-5
    )
    flat1 = jax.tree.leaves(p1)
    flat2 = jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        )


def test_save_load_roundtrip(tmp_path):
    from fish_speech_tpu.io.checkpoint import load_lm_params, save_lm_params

    params = _params(21)
    path = tmp_path / "model.safetensors"
    save_lm_params(path, params, CFG)
    loaded = load_lm_params(path, CFG, dtype=jnp.float32)
    leaves1, tree1 = jax.tree.flatten(params)
    leaves2, tree2 = jax.tree.flatten(loaded)
    assert tree1 == tree2
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume_bit_exact(tmp_path):
    """Mid-run snapshot -> load into FRESH state -> continue: every
    parameter and optimizer leaf must equal the uninterrupted run
    bitwise (the LR-schedule count rides in the optimizer state, so a
    wrong resume step would show up as a different update scale)."""
    from fish_speech_tpu.train.checkpoint import (
        load_train_state,
        save_train_state,
    )

    tcfg = TrainConfig(
        learning_rate=1e-3, warmup_steps=2, total_steps=8, remat=False
    )
    batches = [_batch(100 + i) for i in range(6)]
    step = make_train_step(CFG, TOK, tcfg, donate=False)

    # uninterrupted: 6 steps
    pa, sa = init_train_state(_params(7), tcfg)
    for b in batches:
        pa, sa, _ = step(pa, sa, b)

    # interrupted: 3 steps, snapshot, reload into a DIFFERENT init
    pb, sb = init_train_state(_params(7), tcfg)
    for b in batches[:3]:
        pb, sb, _ = step(pb, sb, b)
    rng = np.random.default_rng(42)
    rng.integers(0, 1000, size=5)  # advance so the state is nontrivial
    save_train_state(
        tmp_path / "st.npz", step=3, params=pb, opt_state=sb, rng=rng,
        extra={"order": [3, 1, 2]},
    )

    pc, sc = init_train_state(_params(8), tcfg)  # different seed
    got_step, pc, sc, rng2, extra = load_train_state(
        tmp_path / "st.npz", pc, sc
    )
    assert got_step == 3
    assert extra["order"] == [3, 1, 2]
    # restored rng continues the saved stream exactly
    np.testing.assert_array_equal(
        rng.integers(0, 1000, size=8), rng2.integers(0, 1000, size=8)
    )
    for b in batches[3:]:
        pc, sc, _ = step(pc, sc, b)

    for a, c in zip(jax.tree.leaves(pa), jax.tree.leaves(pc)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    for a, c in zip(jax.tree.leaves(sa), jax.tree.leaves(sc)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_checkpoint_resume_across_mesh(tmp_path):
    """Save from a single-device run, resume under a dp x tp mesh: the
    loader re-places every leaf with the sharded template's sharding and
    the continued step matches the unsharded continuation."""
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    from fish_speech_tpu.parallel.mesh import make_mesh
    from fish_speech_tpu.train.checkpoint import (
        load_train_state,
        save_train_state,
    )

    tcfg = TrainConfig(
        learning_rate=1e-3, warmup_steps=1, total_steps=6, remat=False
    )
    batch = _batch(55, b=4)
    step = make_train_step(CFG, TOK, tcfg, donate=False)

    p1, s1 = init_train_state(_params(13), tcfg)
    p1, s1, _ = step(p1, s1, batch)
    save_train_state(tmp_path / "st.npz", step=1, params=p1, opt_state=s1)

    # unsharded continuation (reference)
    p1, s1, m1 = step(p1, s1, batch)

    mesh = make_mesh(4, tp=2)
    with mesh:
        p2, s2 = init_train_state(_params(14), tcfg, mesh=mesh, cfg=CFG)
        _, p2, s2, _, _ = load_train_state(tmp_path / "st.npz", p2, s2)
        p2, s2, m2 = step(p2, s2, shard_batch(batch, mesh))

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), atol=1e-5, rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        )


def test_checkpoint_rejects_mismatched_state(tmp_path):
    """A snapshot from a different model/optimizer shape must raise, not
    silently mis-zip leaves."""
    from fish_speech_tpu.train.checkpoint import (
        load_train_state,
        save_train_state,
    )

    tcfg = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=4)
    p, s = init_train_state(_params(1), tcfg)
    save_train_state(tmp_path / "st.npz", step=1, params=p, opt_state=s)

    small = dataclasses.replace(CFG, dim=16, head_dim=4, intermediate_size=32)
    p2 = init_dual_ar_params(jax.random.PRNGKey(0), small, dtype=jnp.float32)
    p2, s2 = init_train_state(p2, tcfg)
    with pytest.raises(ValueError):
        load_train_state(tmp_path / "st.npz", p2, s2)
