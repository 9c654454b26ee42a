"""Sharded DualAR training step (finetuning).

One jitted program: loss -> grads -> global-norm clip -> AdamW with
linear-warmup cosine decay -> param update. Parallelism is the same
(dp, tp) GSPMD recipe the serving path uses (parallel/mesh.py): params
carry Megatron-style tp shardings, the batch shards its row axis over
dp, and XLA inserts the grad all-reduces (psum over dp; the tp
collectives fall out of the column/row-parallel layout). No explicit
collective calls, no separate optimizer sharding machinery — the AdamW
moments inherit the parameter shardings through jit.

The reference has no training path (SURVEY §2.6); this subsystem is
TPU-native surplus so served checkpoints can also be finetuned here.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fish_speech_tpu.config import DualARConfig, TokenConfig
from fish_speech_tpu.parallel.mesh import lm_param_specs, shard_lm_params
from fish_speech_tpu.train.loss import dual_ar_loss


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    beta1: float = 0.9
    beta2: float = 0.95
    grad_clip: float = 1.0
    warmup_steps: int = 100
    total_steps: int = 10_000
    min_lr_ratio: float = 0.1
    fast_weight: float = 1.0
    remat: bool = True


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tcfg.learning_rate,
        warmup_steps=tcfg.warmup_steps,
        decay_steps=max(tcfg.total_steps, tcfg.warmup_steps + 1),
        end_value=tcfg.learning_rate * tcfg.min_lr_ratio,
    )
    return optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.adamw(
            schedule,
            b1=tcfg.beta1,
            b2=tcfg.beta2,
            weight_decay=tcfg.weight_decay,
            # keep first-moment accumulation in f32 even for bf16 params;
            # finetuning from a served bf16 checkpoint should still load
            # with dtype=f32 (io/checkpoint.py) for exact AdamW math
            mu_dtype=jnp.float32,
            # norm scales and embeddings follow the usual no-decay rule
            mask=lambda params: jax.tree.map_with_path(
                lambda path, _: not any(
                    getattr(k, "key", None) in ("norm", "fast_norm",
                                                "attention_norm", "ffn_norm")
                    for k in path
                ),
                params,
            ),
        ),
    )


def init_train_state(
    params: Dict,
    tcfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    cfg: Optional[DualARConfig] = None,
):
    """Returns (params, opt_state), sharded over the mesh when given.

    The optimizer moments are initialized INSIDE jit so GSPMD lays them
    out with the parameters' shardings (a host-side optax.init would
    replicate them, then every step would pay a reshard).
    """
    opt = make_optimizer(tcfg)
    if mesh is not None:
        assert cfg is not None, "mesh sharding needs the model config"
        params = shard_lm_params(params, mesh, cfg)
    opt_state = jax.jit(opt.init)(params)
    return params, opt_state


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a {\"tokens\": (B, C+1, S), \"seq_lens\": (B,)} batch with its
    row axis over dp. B must be a multiple of mesh.shape[\"dp\"].

    Multi-process (pod-slice) semantics: each process passes its OWN
    local rows — B is the per-host batch and the global batch is
    B * process_count (parallel.distributed.host_local_to_global
    assembles the global array from per-host shards). Single-process:
    a plain device_put of the full batch."""
    from fish_speech_tpu.parallel.distributed import host_local_to_global

    import numpy as _np

    nproc = jax.process_count()
    tokens = _np.asarray(batch["tokens"])
    seq_lens = _np.asarray(batch["seq_lens"])
    return {
        "tokens": host_local_to_global(
            NamedSharding(mesh, P("dp", None, None)),
            tokens,
            global_shape=(tokens.shape[0] * nproc,) + tokens.shape[1:],
        ),
        "seq_lens": host_local_to_global(
            NamedSharding(mesh, P("dp")),
            seq_lens,
            global_shape=(seq_lens.shape[0] * nproc,),
        ),
    }


def make_train_step(
    cfg: DualARConfig,
    token_cfg: TokenConfig,
    tcfg: TrainConfig,
    donate: bool = True,
):
    """Returns jitted step(params, opt_state, batch) ->
    (params, opt_state, metrics). Works identically unsharded (single
    device) and under a (dp, tp) mesh — shard the inputs (shard_lm_params
    / init_train_state / shard_batch) and GSPMD partitions the program;
    there is no separate multi-chip code path to diverge.
    """
    opt = make_optimizer(tcfg)

    def step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            dual_ar_loss, has_aux=True
        )(
            params,
            cfg,
            token_cfg,
            batch,
            fast_weight=tcfg.fast_weight,
            remat=tcfg.remat,
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())
