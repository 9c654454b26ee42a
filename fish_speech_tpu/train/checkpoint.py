"""Mid-run training checkpoint/resume: preemption-safe finetuning.

TPU pods are routinely preempted (spot/maintenance events), so a
training subsystem that can only save at the END of a run loses every
step since launch. This module snapshots the EXACT optimization state —
parameter pytree, optimizer state (AdamW moments + the LR-schedule step
count), the data-order RNG, and the epoch-permutation cursor — so a
resumed run continues bit-identically to the uninterrupted one
(tests/test_train.py::test_checkpoint_resume_bit_exact).

The reference framework is inference-only (SURVEY §2.6) and has no
counterpart; this closes the checkpoint/resume aux subsystem
(SURVEY §5) on the training side the way io/checkpoint.py does for
serving weights.

Format: a single .npz written atomically (tmp + os.replace). Leaves are
stored flat in pytree order; the treedef strings are stored alongside
and VERIFIED at load against templates built by the caller
(init_train_state), so a checkpoint from a different optimizer config
or model shape is rejected instead of silently mis-zipped. Sharded
arrays gather to host on save; on load each leaf is device_put with the
template leaf's sharding, so save/restore round-trips across different
mesh shapes (save unsharded, resume dp×tp, or vice versa).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

MAGIC = "fish_tpu_train_state_v1"


def _flat(tree) -> Tuple[list, str]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, str(treedef)


def _rng_state(rng: Optional[np.random.Generator]) -> Optional[dict]:
    if rng is None:
        return None
    # bit_generator.state is a plain dict of ints/str (PCG64: a 128-bit
    # int — JSON handles arbitrary-precision ints natively).
    return rng.bit_generator.state


def _restore_rng(state: Optional[dict]) -> Optional[np.random.Generator]:
    if state is None:
        return None
    bitgen = getattr(np.random, state["bit_generator"])()
    bitgen.state = state
    return np.random.Generator(bitgen)


def save_train_state(
    path: str | Path,
    *,
    step: int,
    params,
    opt_state,
    rng: Optional[np.random.Generator] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Atomically write {params, opt_state, step, rng, extra} to `path`.

    `extra` must be JSON-serializable (the finetune CLI stores its epoch
    permutation cursor there). Device arrays are gathered to host; call
    between train steps (the returned pytrees are fresh buffers, safe to
    read before the next donating step call).
    """
    path = Path(path)
    p_leaves, p_def = _flat(params)
    o_leaves, o_def = _flat(opt_state)
    arrays: Dict[str, np.ndarray] = {}
    for i, leaf in enumerate(p_leaves):
        arrays[f"p{i}"] = np.asarray(leaf)
    for i, leaf in enumerate(o_leaves):
        arrays[f"o{i}"] = np.asarray(leaf)
    meta = {
        "magic": MAGIC,
        "step": int(step),
        "n_params": len(p_leaves),
        "n_opt": len(o_leaves),
        "params_treedef": p_def,
        "opt_treedef": o_def,
        "rng_state": _rng_state(rng),
        "extra": extra or {},
    }
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, __meta__=np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8), **arrays)
    os.replace(tmp, path)


def load_train_state(
    path: str | Path,
    params_template,
    opt_state_template,
) -> Tuple[int, Any, Any, Optional[np.random.Generator], Dict[str, Any]]:
    """Load a snapshot written by save_train_state.

    `params_template` / `opt_state_template` define the expected pytree
    structure AND the target placement: each loaded leaf is device_put
    with the template leaf's sharding (so resuming under a different
    mesh re-shards transparently). Returns
    (step, params, opt_state, rng_or_None, extra).
    """
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta.get("magic") != MAGIC:
            raise ValueError(f"{path}: not a fish_tpu train state")
        p_arrays = [z[f"p{i}"] for i in range(meta["n_params"])]
        o_arrays = [z[f"o{i}"] for i in range(meta["n_opt"])]

    p_tmpl_leaves, p_tmpl_def = _flat(params_template)
    o_tmpl_leaves, o_tmpl_def = _flat(opt_state_template)
    if meta["params_treedef"] != p_tmpl_def:
        raise ValueError(
            f"{path}: params tree mismatch (checkpoint from a different "
            f"model config?)\n saved: {meta['params_treedef'][:200]}\n "
            f"template: {p_tmpl_def[:200]}"
        )
    if meta["opt_treedef"] != o_tmpl_def:
        raise ValueError(
            f"{path}: optimizer-state tree mismatch (different optimizer "
            f"config?)"
        )

    def _place(arr: np.ndarray, t):
        if arr.shape != tuple(t.shape) or arr.dtype != np.dtype(t.dtype):
            raise ValueError(
                f"{path}: leaf shape/dtype mismatch: saved "
                f"{arr.shape}/{arr.dtype} vs template {t.shape}/{t.dtype}"
            )
        # Match the template's placement AND its commitment: device_put
        # with a sharding produces a COMMITTED array, but e.g. the
        # opt_state built by jit(opt.init) under a mesh leaves scalar /
        # moment leaves uncommitted on the default device, and jit
        # rejects mixing committed single-device args with committed
        # mesh-sharded ones ("incompatible devices"). So only commit
        # leaves whose template is committed (mesh-sharded params);
        # everything else loads uncommitted like the template.
        import jax.numpy as jnp

        if getattr(t, "_committed", True):
            return jax.device_put(arr, getattr(t, "sharding", None))
        return jnp.asarray(arr)

    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params_template),
        [_place(a, t) for a, t in zip(p_arrays, p_tmpl_leaves)],
    )
    opt_state = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(opt_state_template),
        [_place(a, t) for a, t in zip(o_arrays, o_tmpl_leaves)],
    )
    rng = _restore_rng(meta.get("rng_state"))
    return meta["step"], params, opt_state, rng, meta.get("extra", {})
