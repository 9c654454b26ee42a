"""Multi-host plumbing (SURVEY §2.6 DCN mandate; no reference
counterpart — the reference is single-ordinal, server/src/main.rs:24-31).

The heavyweight check is the REAL thing: two coordinated OS processes
(gloo collectives over localhost), each owning half the virtual devices,
running the full sharded serve step (Pallas decode via shard_map) and
the full sharded train step with per-host batch feeding —
__graft_entry__.dryrun_multichip(processes=2).
"""

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from fish_speech_tpu.parallel import distributed as dist
from fish_speech_tpu.parallel.mesh import make_mesh


def test_initialize_is_noop_without_coordinator(monkeypatch):
    """Single-process servers never configure anything: with no
    coordinator/env, initialize_distributed returns False and leaves
    the runtime untouched."""
    for var in (
        "FISH_TPU_COORDINATOR",
        "FISH_TPU_NUM_PROCESSES",
        "FISH_TPU_PROCESS_ID",
        "TPU_WORKER_HOSTNAMES",
        "MEGASCALE_COORDINATOR_ADDRESS",
    ):
        monkeypatch.delenv(var, raising=False)
    assert dist.initialize_distributed() is False
    assert jax.process_count() == 1


def test_initialize_is_noop_with_single_worker_hostname(monkeypatch):
    """Single-chip runtime plugins (the axon tunnel) export
    TPU_WORKER_HOSTNAMES=localhost at import time; ONE hostname is not a
    pod and must not trigger jax.distributed auto-detection (which would
    crash server startup: no coordinator exists)."""
    for var in (
        "FISH_TPU_COORDINATOR",
        "FISH_TPU_NUM_PROCESSES",
        "FISH_TPU_PROCESS_ID",
        "MEGASCALE_COORDINATOR_ADDRESS",
    ):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert dist.initialize_distributed() is False
    assert jax.process_count() == 1


def test_global_mesh_shape_single_process():
    mesh = dist.global_mesh(tp=2)
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.shape["tp"] == 2
    assert mesh.shape["dp"] * 2 == len(jax.devices())


def test_host_local_to_global_single_process_is_device_put():
    mesh = make_mesh(tp=1)
    sh = NamedSharding(mesh, P("dp"))
    x = np.arange(len(jax.devices()), dtype=np.float32)
    arr = dist.host_local_to_global(sh, x, global_shape=x.shape)
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert arr.sharding == sh


def test_fetch_replicated_single_process():
    x = jax.numpy.arange(4.0)
    np.testing.assert_array_equal(dist.fetch_replicated(x), np.arange(4.0))


@pytest.mark.slow
def test_two_process_dryrun():
    """The pod-slice recipe end-to-end on this host: 2 coordinated
    processes x 2 virtual CPU devices = one global (dp=2, tp=2) mesh;
    sharded serve + train steps execute with gloo standing in for DCN.
    Exercises jax.distributed init, global_mesh, per-host shard_batch
    (host_local_to_global), and fetch_replicated."""
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(4, processes=2)
