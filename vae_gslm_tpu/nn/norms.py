"""Normalisation layers, dispatched by config ``identifier``.

Parity targets (``/root/reference/modules/norm.py:6-47``):
  - ``RMSNorm``: fp32 compute, mean-square over the feature axis.
  - ``InstanceNorm``: the reference applies it to BCT tensors and
    normalises over ``dim=1`` (the channel axis) with *unbiased*
    variance — i.e. per-frame channel statistics.  Our canonical layout
    is B T C, so the same op normalises over the last axis.
  - ``LayerNorm`` / ``GroupNorm`` / ``Identity``.

All stats are computed in fp32 and the result is cast back to the input
dtype (the bf16-mixed policy equivalent of the reference's
``.float()`` + autocast recast).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..hparams.hp import Hparams

Array = jax.Array


class RMSNorm(nnx.Module):
    def __init__(self, dim: int, eps: float = 1e-5, *, rngs: nnx.Rngs):
        del rngs
        self.eps = eps
        self.scale = nnx.Param(jnp.ones((dim,), jnp.float32))

    def __call__(self, x: Array) -> Array:
        dt = x.dtype
        xf = x.astype(jnp.float32)
        ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(ms + self.eps) * self.scale[...]
        return y.astype(dt)


class InstanceNorm(nnx.Module):
    """Per-frame channel normalisation (B T C layout, feature axis last).

    Matches reference semantics on BCT input with ``dim=1`` reduction and
    unbiased variance (``modules/norm.py:35-47``).
    """

    def __init__(self, dim: int, eps: float = 1e-5, *, rngs: nnx.Rngs):
        del rngs
        self.eps = eps
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((dim,), jnp.float32))

    def __call__(self, x: Array) -> Array:
        dt = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        # Unbiased variance (torch var_mean default).
        n = xf.shape[-1]
        var = jnp.sum(jnp.square(xf - mean), axis=-1, keepdims=True) / max(
            n - 1, 1)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = self.weight[...] * y + self.bias[...]
        return y.astype(dt)


class LayerNorm(nnx.Module):
    def __init__(self, dim: int, eps: float = 1e-5, *, rngs: nnx.Rngs):
        del rngs
        self.eps = eps
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((dim,), jnp.float32))

    def __call__(self, x: Array) -> Array:
        dt = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = self.weight[...] * y + self.bias[...]
        return y.astype(dt)


class GroupNorm(nnx.Module):
    """Group norm over the feature axis of B T C (stats per example)."""

    def __init__(self, num_groups: int, dim: int, eps: float = 1e-5,
                 *, rngs: nnx.Rngs):
        del rngs
        assert dim % num_groups == 0
        self.num_groups = num_groups
        self.eps = eps
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((dim,), jnp.float32))

    def __call__(self, x: Array) -> Array:
        # torch GroupNorm on (B, C, T): stats over (C//G, T) per group.
        # Our layout is (B, T, C): compute over (T, C//G) per group.
        dt = x.dtype
        xf = x.astype(jnp.float32)
        b, t, c = xf.shape
        g = self.num_groups
        xg = xf.reshape(b, t, g, c // g)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
        y = ((xg - mean) * jax.lax.rsqrt(var + self.eps)).reshape(b, t, c)
        y = self.weight[...] * y + self.bias[...]
        return y.astype(dt)


class Identity(nnx.Module):
    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, x: Array) -> Array:
        return x


def get_norm(dim: int, hp: Hparams, *, rngs: nnx.Rngs):
    """Factory mirroring ``modules/norm.py:6-19``."""
    ident = hp.identifier
    if ident == "LayerNorm":
        return LayerNorm(dim, eps=hp.eps, rngs=rngs)
    if ident == "GroupNorm":
        return GroupNorm(hp.num_groups, dim, eps=hp.eps, rngs=rngs)
    if ident == "RMSNorm":
        return RMSNorm(dim, eps=hp.eps, rngs=rngs)
    if ident == "InstanceNorm":
        return InstanceNorm(dim, eps=hp.eps, rngs=rngs)
    if ident == "Identity":
        return Identity()
    raise ValueError(f"{ident} is not a known normalization")
