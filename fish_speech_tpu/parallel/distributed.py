"""Multi-host (multi-process) runtime plumbing: `jax.distributed`
initialization, global mesh construction over processes, and host-local
<-> global array conversion for data feeding.

SURVEY §2.6 mandate (the reference has no distributed support at all —
single CUDA ordinal, server/src/main.rs:24-31 — this is the blueprint's
TPU-native requirement, not parity): dp/tp shard over ICI within a
slice; multi-host pods coordinate over DCN via `jax.distributed`.

Pod-slice recipe (e.g. v5e-16, 4 hosts x 4 chips):

    # identical on every host — TPU coordinates are auto-detected
    from fish_speech_tpu.parallel import distributed as dist
    dist.initialize_distributed()            # no args on TPU pods
    mesh = dist.global_mesh(tp=2)            # (dp=8, tp=2) over 16 chips
    params = shard_lm_params(params, mesh, cfg)   # same as single-host
    ...                                      # engine/train exactly as is

Every process runs the SAME program on the SAME global shapes (SPMD);
jit inserts ICI collectives within hosts and DCN collectives across
them. Data feeding differs per process: each host contributes its local
rows via `host_local_to_global`, and replicated results come back with
`fetch_replicated`.

On CPU (tests, the 2-process dryrun) the same entry points work with
`jax_cpu_collectives_implementation=gloo`; see
tests/test_distributed.py and __graft_entry__.dryrun_multichip(
processes=2).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np

logger = logging.getLogger(__name__)

_initialized = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Idempotent wrapper around `jax.distributed.initialize`.

    With no arguments: on TPU pod slices every parameter is auto-detected
    from the TPU metadata (the standard jax.distributed contract); on
    other platforms, falls back to the FISH_TPU_COORDINATOR /
    FISH_TPU_NUM_PROCESSES / FISH_TPU_PROCESS_ID environment variables,
    and is a NO-OP (returns False) when none are set — single-process
    servers never need to think about this module.

    Returns True when running multi-process after the call.
    """
    global _initialized
    # NB: jax.distributed.initialize must run before ANYTHING that
    # initializes the XLA backend (jax.devices/process_count/
    # default_backend included), so every pre-check here is
    # backend-free.
    if _initialized:
        return jax.process_count() > 1
    from jax._src import distributed as _jd

    if getattr(_jd.global_state, "client", None) is not None:
        _initialized = True  # someone already initialized it
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get(
        "FISH_TPU_COORDINATOR"
    )
    if num_processes is None and "FISH_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["FISH_TPU_NUM_PROCESSES"])
    if process_id is None and "FISH_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["FISH_TPU_PROCESS_ID"])

    # Pod detection must not fire on single-host fakes: some TPU runtime
    # plugins (e.g. the axon tunnel) export TPU_WORKER_HOSTNAMES=localhost
    # at import time for a single-chip session. A real pod slice lists
    # MULTIPLE worker hostnames (comma-separated) or sets the megascale
    # coordinator; one hostname means one process — nothing to do.
    worker_hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_tpu_pod = (
        coordinator_address is None
        and num_processes is None
        and (
            "," in worker_hosts
            or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
        )
    )
    if coordinator_address is None and not on_tpu_pod:
        return False  # single-process: nothing to do

    # CPU multi-process needs a cross-process collectives backend; gloo
    # ships in jaxlib. Decide from the CONFIGURED platform, not
    # jax.default_backend() (which would initialize the backend and make
    # the distributed init below illegal). Setting it is harmless on TPU
    # (ICI/DCN collectives are native and ignore this option).
    platforms = str(
        jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    )
    if "tpu" not in platforms:
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older jaxlib without the option
            pass

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except (ValueError, RuntimeError) as e:
        if coordinator_address is not None:
            raise  # explicit multi-process config: a failure is real
        # auto-detected pod metadata turned out incomplete (single-host
        # plugin fakes) — serve single-process rather than crash startup
        logger.warning(
            "TPU pod auto-detect failed (%s); continuing single-process", e
        )
        return False
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global "
        "devices",
        jax.process_index(),
        jax.process_count(),
        len(jax.local_devices()),
        len(jax.devices()),
    )
    return jax.process_count() > 1


def global_mesh(tp: int = 1, n_devices: Optional[int] = None):
    """(dp, tp) Mesh over the GLOBAL device set, topology-aware.

    Uses `mesh_utils.create_device_mesh` so the tp axis lands on the
    fastest (innermost ICI) dimension and dp spans hosts — tp collectives
    (per-layer psum) ride ICI, dp needs no per-step communication at all
    for serving and one gradient reduce for training, which is the only
    traffic that should ever touch DCN.
    """
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % tp == 0, (n, tp)
    if n == 1:
        arr = np.asarray(devices).reshape(1, 1)
    else:
        try:
            arr = mesh_utils.create_device_mesh(
                (n // tp, tp), devices=devices
            )
        except Exception:  # virtual/CPU platforms without topology info
            arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def host_local_to_global(sharding, local_data: np.ndarray,
                         global_shape: Optional[tuple] = None):
    """Assemble a globally-sharded array from this process's local rows
    (each host feeds only the data its shards own — the multi-host data
    path for batches and prompts). Single-process: a plain device_put."""
    if jax.process_count() == 1:
        return jax.device_put(local_data, sharding)
    return jax.make_array_from_process_local_data(
        sharding, local_data, global_shape=global_shape
    )


def fetch_replicated(x) -> np.ndarray:
    """Fetch a value to the host. Replicated arrays (loss, metrics) read
    directly; dp-sharded arrays are allgathered across processes first
    (multihost_utils) so every host sees the full result."""
    if jax.process_count() == 1 or x.is_fully_addressable:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
