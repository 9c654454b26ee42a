"""Multi-chip scale-out: mesh construction and parameter/state shardings.

The reference is strictly single-device (SURVEY §2.6: one CUDA ordinal, a
tokio mutex serializing requests). Here parallelism is a first-class
component: a `jax.sharding.Mesh` over ICI with NamedSharding annotations —
tensor-parallel matmuls along heads/FFN, data-parallel batched decode —
and XLA inserts the collectives.
"""

from fish_speech_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    lm_param_specs,
    shard_lm_params,
    shard_gen_state,
)
