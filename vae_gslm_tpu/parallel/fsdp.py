"""ZeRO/FSDP-style parameter + optimizer-state sharding (beyond-reference).

The reference's only scale lever is DDP (SURVEY §2.9,
``/root/reference/scripts/train.py:93-95``): every rank holds a full
replica of the parameters, gradients, and Adam moments.  On a TPU mesh
the same replication can be sharded away with annotations alone — the
GSPMD "fully-sharded data parallel" recipe:

  * each sufficiently large parameter is device_put with ``data`` on
    its largest evenly-divisible axis;
  * Adam moments inherit the sharding through ``zeros_like`` at
    ``tx.init`` (and through a sharded template on restore);
  * inside the jitted train step XLA's SPMD partitioner inserts an
    all-gather before each parameter use, turns the gradient
    all-reduce into a reduce-scatter, and runs the optimizer update on
    1/n of every parameter.

Per-device memory for params+grads+moments drops ~n_data-fold for the
sharded tensors at the cost of re-gathering weights each microbatch —
the standard trade once a model outgrows replication (the flagship
trunk is ~200 M params ≈ 2.4 GB of fp32 param+moment state, so this is
headroom for models beyond the reference's scale).

Composes with tensor parallelism: on a ``(data, model)`` mesh the TP
spec (``parallel/tp.py``) is applied first and ``data`` is placed on
the largest *remaining* replicated axis.

Enable via ``hp.trainer.fsdp: true`` (optional
``hp.trainer.fsdp_min_size``: parameters with fewer elements stay
replicated — gathering tiny tensors costs more in collective latency
than it saves in HBM; default 4096).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DEFAULT_MIN_SIZE = 4096


def fsdp_spec(shape: Sequence[int], n_data: int,
              base: Optional[Sequence] = None,
              min_size: int = DEFAULT_MIN_SIZE) -> P:
    """PartitionSpec that adds ``data`` on the largest axis of
    ``shape`` that is still unsharded in ``base`` and divides evenly
    by ``n_data``.  Tensors smaller than ``min_size`` elements (or
    with no divisible axis) keep ``base`` unchanged."""
    base_t = tuple(base) if base is not None else ()
    base_t = base_t + (None,) * (len(shape) - len(base_t))
    if n_data <= 1 or int(np.prod(shape, dtype=np.int64)) < min_size:
        return P(*base_t)
    best = None
    for i, d in enumerate(shape):
        if base_t[i] is None and d >= n_data and d % n_data == 0:
            if best is None or d > shape[best]:
                best = i
    if best is None:
        return P(*base_t)
    spec = list(base_t)
    spec[best] = "data"
    return P(*spec)


def _tp_base_spec(path, leaf, mesh: Mesh):
    """The TP spec for this leaf when the mesh has a model axis
    (validated for divisibility exactly as tp.shard_params does),
    else fully replicated."""
    from . import tp

    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        return (None,) * leaf.ndim
    spec = tp.param_spec(path, leaf)
    n_model = mesh.shape["model"]
    for dim_idx, axis in enumerate(spec):
        if axis is not None and leaf.shape[dim_idx] % n_model != 0:
            return (None,) * leaf.ndim
    return tuple(spec) + (None,) * (leaf.ndim - len(spec))


def shard_params(params: Any, mesh: Mesh,
                 min_size: int = DEFAULT_MIN_SIZE) -> Any:
    """Device_put a parameter pytree with FSDP (+TP, if the mesh has a
    model axis) shardings."""
    n_data = dict(mesh.shape).get("data", mesh.devices.size)

    def put(path, x):
        base = _tp_base_spec(path, x, mesh)
        spec = fsdp_spec(np.shape(x), n_data, base, min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


