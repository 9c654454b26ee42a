"""Device mesh + sharding specs for the DualAR LM.

Design (scaling-book recipe): pick a mesh, annotate parameter and
activation shardings, let XLA's SPMD partitioner insert the collectives
over ICI.

Axes:
  "dp" — data parallel: batch rows of the KV cache / decode state.
  "tp" — tensor parallel: attention heads and FFN hidden. The GQA KV-head
         count (2 for Fish models) bounds useful tp without KV
         duplication, so tp in {1, 2} for the stock checkpoints; larger
         DualAR models with more KV heads can raise it.

Because weights are stacked (L, in, out), sharding the out/in axes of the
per-layer matmuls is a single PartitionSpec per stack entry. Under jit,
GSPMD propagates these through the scan body: wqkv column-parallel ->
heads split across tp -> wo row-parallel with a psum on exit, and
likewise w1/w3 -> w2. The KV cache shards over ("dp", None_heads...) so
decode rows scale across dp.

Deliberately absent (design stance, SURVEY §2.6): pipeline, sequence,
and expert parallelism. This is an inference server for a ~500 M-param
dense LM with max_seq_len 4096 — the model fits one chip with room to
spare, prompts are short (text chunks + conditioning), and there are no
experts. dp scales concurrent requests, tp covers larger DualAR
checkpoints; pp/sp would add pipeline bubbles / ring-attention
complexity with nothing to amortize them. The reference itself has no
distributed support at all (single CUDA ordinal, state.rs mutex).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fish_speech_tpu.config import DualARConfig


def make_mesh(
    n_devices: Optional[int] = None,
    tp: int = 1,
    devices=None,
) -> Mesh:
    """Mesh of shape (dp, tp) over the first n_devices devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    assert n_devices % tp == 0, (n_devices, tp)
    arr = np.asarray(devices).reshape(n_devices // tp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def lm_param_specs(cfg: DualARConfig) -> Dict:
    """PartitionSpecs matching the DualARParams pytree layout.

    Megatron-style: QKV/FFN-in column-parallel (shard out axis), WO/FFN-out
    row-parallel (shard in axis); embeddings and heads shard the vocab
    axis. Norm scales are replicated.
    """
    stack = {
        "wqkv": P(None, None, "tp"),
        "wo": P(None, "tp", None),
        "w1": P(None, None, "tp"),
        "w3": P(None, None, "tp"),
        "w2": P(None, "tp", None),
        "attention_norm": P(None, None),
        "ffn_norm": P(None, None),
    }
    return {
        "embeddings": P("tp", None),
        "codebook_embeddings": P("tp", None),
        "fast_embeddings": P("tp", None),
        "norm": P(None),
        "fast_norm": P(None),
        "output": P(None, "tp"),
        "fast_output": P(None, "tp"),
        "slow": dict(stack),
        "fast": dict(stack),
    }


def _place_tree(tree, specs, mesh: Mesh):
    if isinstance(specs, dict):
        return {k: _place_tree(tree[k], specs[k], mesh) for k in specs}
    return jax.device_put(tree, NamedSharding(mesh, specs))


def shard_lm_params(params: Dict, mesh: Mesh, cfg: DualARConfig) -> Dict:
    return _place_tree(params, lm_param_specs(cfg), mesh)


def gen_state_specs(cfg: DualARConfig, per_row_rng: bool = False):
    """Shardings for the GenState pytree: batch rows over dp, KV cache
    heads over tp (cache layout (L, B, KV, S, hd)).

    per_row_rng: dynamic-sampling engines carry (B, 2) per-row key
    chains (sharded over dp) instead of one replicated key."""
    from fish_speech_tpu.generate.engine import GenState
    from fish_speech_tpu.models.dual_ar import KVCache
    from fish_speech_tpu.ops.sampling import RepPenWindow, RowSampling

    return GenState(
        cache=KVCache(
            k=P(None, "dp", "tp", None, None),
            v=P(None, "dp", "tp", None, None),
        ),
        pos=P("dp"),
        prev=P("dp", None),
        rep_pen=RepPenWindow(tokens=P("dp", None, None), ptr=P()),
        rng=P("dp", None) if per_row_rng else P(),
        done=P("dp"),
        samp=RowSampling(
            temp=P("dp"), top_p=P("dp"), top_k=P("dp"), rep_pen=P("dp")
        ),
    )


def shard_gen_state(state, mesh: Mesh, cfg: DualARConfig):
    from fish_speech_tpu.generate.engine import GenState
    from fish_speech_tpu.models.dual_ar import KVCache
    from fish_speech_tpu.ops.sampling import RepPenWindow, RowSampling

    specs = gen_state_specs(cfg, per_row_rng=state.rng.ndim == 2)

    def place(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return GenState(
        cache=KVCache(
            k=place(state.cache.k, specs.cache.k),
            v=place(state.cache.v, specs.cache.v),
        ),
        pos=place(state.pos, specs.pos),
        prev=place(state.prev, specs.prev),
        rep_pen=RepPenWindow(
            tokens=place(state.rep_pen.tokens, specs.rep_pen.tokens),
            ptr=place(state.rep_pen.ptr, specs.rep_pen.ptr),
        ),
        rng=place(state.rng, specs.rng),
        done=place(state.done, specs.done),
        samp=RowSampling(
            temp=place(state.samp.temp, specs.samp.temp),
            top_p=place(state.samp.top_p, specs.samp.top_p),
            top_k=place(state.samp.top_k, specs.samp.top_k),
            rep_pen=place(state.samp.rep_pen, specs.samp.rep_pen),
        ),
    )
