"""Positional encodings: SinCos, ALiBi, T5 relative bias, Rotary.

Parity targets: ``/root/reference/modules/position/*``.

TPU-first notes:
  * ALiBi bias is a closed-form function of (head, |q_pos - k_pos|); we
    synthesise it from ``broadcasted_iota`` at trace time instead of
    storing a (H, maxpos, maxpos) buffer — XLA fuses it into the
    attention logits, and the decode path gets a per-step row for free.
  * The reference's ALiBi is **symmetric** (|distance|,
    ``modules/position/alibi.py:12-15``) — preserved here.
  * The reference factory has a ``"Rotery"`` key typo making Rotary
    unreachable from configs (``modules/position/embedding.py:19``); we
    accept both spellings and document the quirk.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..hparams.hp import Hparams

Array = jax.Array


# ------------------------------------------------------------------ SinCos
class SinCos(nnx.Module):
    """Absolute sinusoidal embedding (``position/absolute.py:6-36``).

    ``__call__`` adds to the input; ``get(t)`` indexes rows (used as the
    diffusion time embedding).
    """

    def __init__(self, ndim: int, maxpos: int = 10000,
                 fixed_pos: bool = False, scaled: bool = False,
                 *, rngs: Optional[nnx.Rngs] = None):
        del rngs
        p = sincos_table(ndim, maxpos)
        self.p = nnx.Variable(p)
        self.scalar = nnx.Param(jnp.ones((1,), jnp.float32)) if scaled \
            else None
        self.fixed_pos = fixed_pos

    def __call__(self, x: Array, offset=0) -> Array:
        """offset: absolute position of x[:, 0] — may be a traced
        scalar (KV-cache decode)."""
        t = x.shape[1]
        if isinstance(offset, int) and offset == 0:
            p = self.p[...] if self.fixed_pos else self.p[...][:t]
        else:
            p = jax.lax.dynamic_slice_in_dim(self.p[...], offset, t)
        s = self.scalar[...] if self.scalar is not None else 1.0
        return x + (s * p[None]).astype(x.dtype)

    def get(self, t: Array) -> Array:
        return self.p[...][t]


def sincos_table(ndim: int, maxpos: int) -> Array:
    pos = jnp.arange(maxpos, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, ndim, 2, dtype=jnp.float32)
                  * (-math.log(10000.0) / ndim))
    angles = pos * div
    p = jnp.zeros((maxpos, ndim), jnp.float32)
    p = p.at[:, 0::2].set(jnp.sin(angles))
    p = p.at[:, 1::2].set(jnp.cos(angles))
    return p


# ------------------------------------------------------------------ ALiBi
def alibi_slopes(nheads: int) -> list:
    """Slope schedule (``position/alibi.py:19-29``)."""

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(nheads).is_integer():
        return pow2_slopes(nheads)
    closest = 2 ** math.floor(math.log2(nheads))
    return (pow2_slopes(closest)
            + alibi_slopes(2 * closest)[0::2][: nheads - closest])


class ALiBi(nnx.Module):
    """Symmetric-|distance| ALiBi bias (``position/alibi.py:6-33``).

    Returns ``(H, Tq, Tk)``; computed on the fly from iota so nothing is
    stored and XLA fuses it into the logits.
    """

    def __init__(self, nheads: int, maxpos: int = 10000,
                 *, rngs: Optional[nnx.Rngs] = None):
        del rngs
        self.slopes = nnx.Variable(
            -jnp.asarray(alibi_slopes(nheads), jnp.float32))
        self.nheads = nheads
        self.maxpos = maxpos

    def bias(self, q_pos: Array, k_pos: Array) -> Array:
        """(H, Tq, Tk) from absolute position vectors."""
        dist = jnp.abs(k_pos[None, :] - q_pos[:, None]).astype(jnp.float32)
        return self.slopes[...][:, None, None] * dist[None]

    def __call__(self, tq: int, tk: int) -> Array:
        q_pos = jnp.arange(tq)
        k_pos = jnp.arange(tk)
        return self.bias(q_pos, k_pos)


# ------------------------------------------------------------------ T5
class T5RPE(nnx.Module):
    """Bucketed learned relative bias (``position/t5.py:7-67``)."""

    def __init__(self, nheads: int, bidirectional: bool,
                 num_buckets: int = 32, max_distance: int = 128,
                 *, rngs: nnx.Rngs):
        self.bidirectional = bidirectional
        self.num_buckets = num_buckets
        self.max_distance = max_distance
        self.table = nnx.Param(jax.random.normal(
            rngs.params(), (num_buckets, nheads), jnp.float32))
        self.nheads = nheads

    def _bucket(self, rel: Array) -> Array:
        num_buckets = self.num_buckets
        ret = jnp.zeros_like(rel)
        if self.bidirectional:
            num_buckets //= 2
            ret = ret + (rel > 0).astype(jnp.int32) * num_buckets
            rel = jnp.abs(rel)
        else:
            rel = -jnp.minimum(rel, 0)
        max_exact = num_buckets // 2
        is_small = rel < max_exact
        rel_large = max_exact + (
            jnp.log(rel.astype(jnp.float32) / max_exact + 1e-20)
            / math.log(self.max_distance / max_exact)
            * (num_buckets - max_exact)
        ).astype(jnp.int32)
        rel_large = jnp.minimum(rel_large, num_buckets - 1)
        return ret + jnp.where(is_small, rel, rel_large)

    def __call__(self, tq: int, tk: int) -> Array:
        q_pos = jnp.arange(tq)[:, None]
        k_pos = jnp.arange(tk)[None, :]
        buckets = self._bucket(k_pos - q_pos)
        values = self.table[...][buckets]          # (Tq, Tk, H)
        return jnp.transpose(values, (2, 0, 1))    # (H, Tq, Tk)

    def set_uniform(self, std: float, *, key: jax.Array) -> None:
        self.table[...] = jax.random.uniform(
            key, self.table[...].shape, jnp.float32, -std, std)


# ------------------------------------------------------------------ Rotary
class Rotary(nnx.Module):
    """Rotary embedding (interleaved pairs, lucidrains convention,
    ``position/rotary.py:59-165``): NTK ``theta_rescale_factor``,
    position ``interpolate_factor``, and xpos length-extrapolation
    scaling (q scaled by ``s^power``, k by ``s^-power`` with
    ``power = (pos - T/2)/scale_base``).

    NOTE: config-unreachable in the reference due to the ``"Rotery"``
    factory-key typo (``position/embedding.py:19`` vs the attention check
    for ``"Rotary"``); provided for completeness.
    """

    def __init__(self, dim: int, theta: float = 10000.0,
                 use_xpos: bool = False, xpos_scale_base: float = 512.0,
                 interpolate_factor: float = 1.0,
                 theta_rescale_factor: float = 1.0,
                 *, rngs: Optional[nnx.Rngs] = None):
        del rngs
        theta = theta * theta_rescale_factor ** (dim / (dim - 2))
        freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2,
                                            dtype=jnp.float32) / dim))
        self.freqs = nnx.Variable(freqs)
        self.dim = dim
        self.use_xpos = use_xpos
        self.scale_base = xpos_scale_base
        assert interpolate_factor >= 1.0
        self.interpolate_factor = interpolate_factor
        if use_xpos:
            self.scale = nnx.Variable(
                (jnp.arange(0, dim, 2, dtype=jnp.float32) + 0.4 * dim)
                / (1.4 * dim))
        else:
            self.scale = None

    def __call__(self, x: Array, offset=0, scale_power: int = 0
                 ) -> Array:
        """x: (B, T, C) — rotate the full feature dim.  ``offset`` is
        the absolute position of x[:, 0]; may be a traced scalar.
        ``scale_power``: +1 for queries / -1 for keys under xpos
        (``rotate_queries_and_keys``, ``position/rotary.py:121-130``);
        ignored when xpos is off."""
        t = x.shape[1]
        pos = (jnp.arange(t, dtype=jnp.float32)
               + offset) / self.interpolate_factor
        ang = pos[:, None] * self.freqs[...][None, :]      # (T, C/2)
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        if self.use_xpos and scale_power != 0:
            power = (pos - t // 2) / self.scale_base       # (T,)
            s = self.scale[...][None, :] ** (scale_power
                                             * power[:, None])
            cos, sin = cos * s, sin * s
        x1 = x[..., 0::2]
        x2 = x[..., 1::2]
        y1 = x1 * cos - x2 * sin
        y2 = x1 * sin + x2 * cos
        y = jnp.stack([y1, y2], axis=-1).reshape(x.shape)
        return y.astype(x.dtype)


# ------------------------------------------------------------------ factory
def get_positional_encoding(name: str, hp: Hparams,
                            ndim: Optional[int] = None,
                            nheads: Optional[int] = None,
                            *, rngs: nnx.Rngs):
    """Mirrors ``position/embedding.py:9-40`` (incl. the Rotery quirk)."""
    if name == "SinCos":
        assert ndim is not None
        return SinCos(ndim, hp.get("maxpos", 10000),
                      hp.get("fixed_pos", False), hp.get("scaled", False))
    if name in ("Rotary", "Rotery"):
        assert ndim is not None
        return Rotary(ndim, theta=hp.get("theta", 10000),
                      use_xpos=hp.get("use_xpos", False),
                      xpos_scale_base=hp.get("xpos_scale_base", 512),
                      interpolate_factor=hp.get("interpolate_factor",
                                                1.0),
                      theta_rescale_factor=hp.get(
                          "theta_rescale_factor", 1.0))
    if name == "ALiBi":
        assert nheads is not None
        return ALiBi(nheads, hp.get("maxpos", 10000))
    if name == "T5RPE":
        assert nheads is not None
        hp.check_arg_in_hparams("bidirectional", "num_buckets",
                                "max_distance")
        return T5RPE(nheads, hp.bidirectional, hp.num_buckets,
                     hp.max_distance, rngs=rngs)
    raise ValueError(f"{name} is not a valid PE type.")
