"""GPipe-style pipeline parallelism for the transformer trunk
(beyond-reference; the reference's only scale lever is DDP, SURVEY
§2.9).

The trunk's layers are split into ``S = mesh.shape["pipe"]``
contiguous stages; each pipe rank holds its stage's weights (the
stacked per-layer tensors from ``build_stacked_decode``, sharded
``P("pipe")`` on the layer axis) and the batch is cut into ``M``
microbatches.  One ``lax.scan`` over ``M + S - 1`` ticks runs the
classic GPipe schedule inside ``shard_map``: at tick ``t`` stage ``s``
processes microbatch ``t - s`` and ``ppermute``s its activations to
stage ``s + 1`` over ICI.  Bubble fraction ``(S-1)/(M+S-1)`` — the
usual trade; per-device weight memory drops ``S``-fold.  Gradients
flow through the scan/ppermute transpose, so ``jax.grad`` of the full
loss works unchanged.

Composes with data parallelism: on a ``("data", "pipe")`` mesh the
microbatches are additionally sharded over ``data`` and XLA inserts
the gradient all-reduce as usual.

Same eligibility as the fused decode paths
(``supports_stacked_decode``): pre-LN, RMSNorm, ALiBi/no RPE, no
cross-attention.  Enable via ``trainer.pipeline_parallel: S``
(optional ``trainer.pipeline_microbatches``, default ``S``).
"""
from __future__ import annotations

import contextlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def create_mesh_pipe(n_pipe: int, n_data: Optional[int] = None) -> Mesh:
    """("data", "pipe") mesh; pipe innermost so stage hops ride
    adjacent-chip ICI links."""
    devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_pipe
    devices = np.asarray(devices[: n_data * n_pipe]).reshape(
        n_data, n_pipe)
    return Mesh(devices, ("data", "pipe"))


# ------------------------------------------------------------- ambient
_ACTIVE: Optional[Tuple[Mesh, int]] = None


@contextlib.contextmanager
def pipeline(mesh: Optional[Mesh], n_micro: int):
    """Activate pipelined trunk execution for ``mesh`` (no-op unless
    the mesh has a pipe axis with size > 1)."""
    global _ACTIVE
    prev = _ACTIVE
    if (mesh is not None and "pipe" in mesh.axis_names
            and dict(mesh.shape)["pipe"] > 1):
        _ACTIVE = (mesh, n_micro)
    else:
        _ACTIVE = None
    try:
        yield
    finally:
        _ACTIVE = prev


def active_pipeline() -> Optional[Tuple[Mesh, int]]:
    return _ACTIVE


# ----------------------------------------------------------- execution
def _rms(x, scale, eps):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps) * scale).astype(x.dtype)


def _matmul(x, entry):
    y = x @ entry["w"]
    if "b" in entry:
        y = y + entry["b"]
    return y


def _block(w, x, lengths, slopes, act, eps, nheads):
    """One pre-LN transformer block, full-sequence causal training
    forward, from stacked weights — the same math as
    ``TransformerLayer.__call__`` on the fused-path-eligible configs
    (RMSNorm, ALiBi; parity tested in tests/test_pp.py).  Padded query
    rows carry garbage exactly like the flash path; padded KEYS are
    masked by ``lengths``."""
    from ..ops.flash_attention import flash_attention

    b, t, d = x.shape
    dh = d // nheads
    h = _rms(x, w["n1"], eps)
    qkv = _matmul(h, w["qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(z):
        return jnp.transpose(z.reshape(b, t, nheads, dh), (0, 2, 1, 3))

    attn = flash_attention(heads(q), heads(k), heads(v), lengths,
                           slopes, True)
    attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(b, t, d)
    x = x + _matmul(attn, w["out"])
    h = _rms(x, w["n3"], eps)
    return x + _matmul(act(_matmul(h, w["ffn1"])), w["ffn2"])


def pipeline_apply(stack, value, lengths, mesh: Mesh,
                   n_micro: int):
    """Run ``stack``'s layers over ``value`` (B, T, D) with the GPipe
    schedule on ``mesh``.  Returns the residual-stream output (before
    the stack's final norm / out projection)."""
    S = dict(mesh.shape)["pipe"]
    n_data = dict(mesh.shape).get("data", 1)
    L = stack.num_layers
    if L % S:
        raise ValueError(f"{L} layers not divisible into {S} stages")
    per = L // S
    b, t, d = value.shape
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible into {n_micro} "
                         "microbatches")
    bm = b // n_micro
    if bm % n_data:
        raise ValueError(f"microbatch {bm} not divisible over the "
                         f"{n_data}-device data axis")

    stacked = stack.build_stacked_decode()
    if stacked is None:
        raise ValueError("stack config not eligible for the stacked "
                         "path (needs pre-LN + RMSNorm + ALiBi/none)")
    # (L, ...) -> (S, per, ...): stage-major layer grouping.
    staged = jax.tree_util.tree_map(
        lambda a: a.reshape((S, per) + a.shape[1:]), stacked)
    la0 = stack.layers[0]
    act, eps = la0.activation, la0.norm1.eps
    nheads = la0.self_attn.nheads
    slopes = (stack.rpe.slopes[...].astype(jnp.float32)
              if stack.rpe_id == "ALiBi" else None)

    x_mb = value.reshape(n_micro, bm, t, d)
    len_mb = lengths.reshape(n_micro, bm)

    wspec = jax.tree_util.tree_map(
        lambda a: P("pipe"), staged)
    data_ax = "data" if n_data > 1 else None
    xspec = P(None, data_ax, None, None)
    lspec = P(None, data_ax)

    has_slopes = slopes is not None

    def stage_fn(w, x_all, l_all, slopes_):
        # local shards: w leaves (1, per, ...); x (M, bm/n_data, T, D)
        w = jax.tree_util.tree_map(lambda a: a[0], w)
        sl = slopes_ if has_slopes else None
        idx = jax.lax.axis_index("pipe")
        M = n_micro
        bl = x_all.shape[1]

        def apply_stage(x, lens):
            for i in range(per):
                wl = jax.tree_util.tree_map(lambda a: a[i], w)
                x = _block(wl, x, lens, sl, act, eps, nheads)
            return x

        def tick(carry, tk):
            recv, outs = carry
            m = jnp.clip(tk - idx, 0, M - 1)
            x0 = jax.lax.dynamic_index_in_dim(x_all, m, 0,
                                              keepdims=False)
            lens = jax.lax.dynamic_index_in_dim(l_all, m, 0,
                                                keepdims=False)
            cur = jnp.where(idx == 0, x0, recv)
            y = apply_stage(cur, lens)
            send = jax.lax.ppermute(
                y, "pipe", [(i, i + 1) for i in range(S - 1)])
            valid = (idx == S - 1) & (tk - idx >= 0) & (tk - idx < M)
            upd = jax.lax.dynamic_update_index_in_dim(
                outs, y, m, 0)
            outs = jnp.where(valid, upd, outs)
            return (send, outs), None

        # The carry is device-varying over `pipe` (ppermute result) and
        # over `data` when the batch is sharded; the initial zeros must
        # carry the same varying-manual-axes type or scan rejects the
        # carry as type-mismatched under replication checking.
        vary = ("pipe",) + (("data",) if data_ax else ())
        zeros_in = jax.lax.pvary(jnp.zeros((bl, t, d), value.dtype),
                                 vary)
        zeros_out = jax.lax.pvary(
            jnp.zeros((M, bl, t, d), value.dtype), vary)
        (_, outs), _ = jax.lax.scan(
            tick, (zeros_in, zeros_out), jnp.arange(M + S - 1))
        # replicate the last stage's result onto every pipe rank
        outs = jax.lax.psum(
            jnp.where(idx == S - 1, outs, jnp.zeros_like(outs)),
            "pipe")
        return outs

    from jax.experimental.shard_map import shard_map

    # check_rep True (the default) matters for correctness, not just
    # hygiene: the output really is pipe-replicated (psum), and with
    # the check disabled JAX treats it as unreduced over `pipe`, which
    # 4x-overcounts the cotangents of everything UPSTREAM of the trunk
    # (encoder/decoder grads) in the transpose.
    out = shard_map(
        stage_fn, mesh=mesh,
        in_specs=(wspec, xspec, lspec, P(None)),
        out_specs=xspec)(
        staged, x_mb, len_mb,
        slopes if slopes is not None
        else jnp.zeros((0,), jnp.float32))
    return out.reshape(b, t, d)
