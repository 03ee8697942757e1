"""Device mesh and sharding helpers.

The reference scales with DDP only (SURVEY §2.9): gradients all-reduced
by NCCL, per-rank batch samplers, val metrics synced.  The TPU-native
equivalent is a 1-D ``data`` mesh over ICI: parameters replicated, the
batch sharded on its leading axis, gradient reduction inserted by XLA's
SPMD partitioner inside the jitted train step (no explicit collectives
needed), and ``process_index`` standing in for the DDP rank in the
deterministic samplers.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)


def init_distributed() -> bool:
    """Initialize JAX's multi-process runtime for multi-HOST training
    (beyond the reference's single-machine DDP).

    Two launch modes, both env-gated (no-op when neither is set):

    * explicit single-controller launch — ``VAE_GSLM_COORDINATOR``
      (host:port), ``VAE_GSLM_NUM_PROCESSES``, ``VAE_GSLM_PROCESS_ID``;
      used by the 2-process CPU integration test
      (``tests/test_multihost.py``) and any manual pod launch;
    * ``VAE_GSLM_AUTO_DISTRIBUTED=1`` — ``jax.distributed.initialize()``
      auto-detects coordinator/rank from the TPU pod metadata.

    CPU processes use the gloo collectives backend so the virtual-mesh
    tests exercise real cross-process collectives.  Must run before
    first device use."""
    coord = os.environ.get("VAE_GSLM_COORDINATOR")
    auto = os.environ.get("VAE_GSLM_AUTO_DISTRIBUTED")
    if not coord and not auto:
        return False
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:          # knob name varies across jax versions
        pass
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["VAE_GSLM_NUM_PROCESSES"]),
            process_id=int(os.environ["VAE_GSLM_PROCESS_ID"]))
    else:
        jax.distributed.initialize()
    log.info("jax.distributed initialized: process %d/%d, "
             "%d local / %d global devices", jax.process_index(),
             jax.process_count(), jax.local_device_count(),
             jax.device_count())
    return True


def create_mesh(n_devices: Optional[int] = None,
                axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: Any, mesh: Mesh,
                axis_name: str = "data", axis: int = 0) -> Any:
    """Device-put a host batch with dimension ``axis`` sharded over the
    mesh's data axis — 0 for plain ``(B, ...)`` batches, 1 for
    grad-accum-stacked ``(accum, B, ...)`` micro-batches (sharding the
    tiny accum axis would be wrong: ``lax.scan`` slices it
    sequentially).  Leaves too small or indivisible on ``axis`` are
    replicated (scalars, odd eval batches).

    Multi-process (the mesh spans hosts): this process's leaves are its
    LOCAL rows of the global batch — the per-rank samplers yield
    disjoint data, exactly like the reference's DDP per-rank loaders —
    and ``jax.make_array_from_process_local_data`` assembles the
    global sharded array.  Indivisible leaves raise here rather than
    silently replicating PER-PROCESS data that differs across ranks."""
    repl = replicated(mesh)
    n_data = dict(mesh.shape).get(axis_name, mesh.devices.size)
    nproc = jax.process_count()
    multiproc = nproc > 1 and len(
        {d.process_index for d in mesh.devices.flat}) > 1

    def put(x):
        x = np.asarray(x)
        if not multiproc:
            if x.ndim <= axis or x.shape[axis] % n_data != 0:
                return jax.device_put(x, repl)
            spec = [None] * x.ndim
            spec[axis] = axis_name
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        if x.ndim <= axis:
            # Replicated leaf: every rank must pass identical data
            # (true for the deterministic samplers' metadata).
            return jax.make_array_from_process_local_data(repl, x)
        g = list(x.shape)
        g[axis] = x.shape[axis] * nproc
        if g[axis] % n_data != 0 or x.shape[axis] % (n_data // nproc):
            raise ValueError(
                f"local batch dim {x.shape[axis]} (global {g[axis]}) "
                f"not divisible over the {n_data}-device {axis_name} "
                f"axis across {nproc} processes")
        spec = [None] * x.ndim
        spec[axis] = axis_name
        sh = NamedSharding(mesh, P(*spec))
        return jax.make_array_from_process_local_data(sh, x, tuple(g))

    return jax.tree_util.tree_map(put, batch)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    repl = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), tree)


def has_model_axis(mesh: Mesh) -> bool:
    return "model" in mesh.axis_names and dict(mesh.shape)["model"] > 1


def place_params(params: Any, mesh: Mesh) -> Any:
    """Replicate params on a data mesh; apply tensor-parallel specs on
    a (data, model) mesh (see ``parallel/tp.py``)."""
    from . import tp
    return tp.shard_params(params, mesh)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def local_device_count() -> int:
    return jax.local_device_count()
