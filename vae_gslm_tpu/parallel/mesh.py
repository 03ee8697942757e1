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

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
    replicated (scalars, odd eval batches)."""
    repl = replicated(mesh)
    n_data = dict(mesh.shape).get(axis_name, mesh.devices.size)

    def put(x):
        x = np.asarray(x)
        if x.ndim <= axis or x.shape[axis] % n_data != 0:
            return jax.device_put(x, repl)
        spec = [None] * x.ndim
        spec[axis] = axis_name
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

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
