"""Normalizing-flow coupling layers with exact log-determinants.

Parity targets: ``/root/reference/modules/flow/layers.py`` and
``flow/spline.py``:
  * ``LinearCoupling`` — affine half-split coupling, optional FiLM
    conditioning, sigmoid-bounded ``scale_range`` (NOTE the reference
    unpacks ``_max, _min = scale_range`` in that order — preserved),
    ``detach_coupling``.
  * ``ConvCoupling`` — conv variant; the reference's ``reverse`` calls
    undefined ``self.linear1`` (``flow/layers.py:179``) and would crash;
    here ``reverse`` is implemented correctly with the conv path.
  * ``RationalQuadraticSplineCoupling`` — full RQS forward+inverse.  The
    reference reshapes stats via a 4-value unpack that cannot work on
    B T C inputs (``flow/spline.py:70-74``); we reshape to
    ``(B, T, dim/2, 3*bins-1)`` which is the intended layout.  Spline
    math runs fp32 for bf16 stability.
  * ``CouplingStack`` — all layers ``flip=True``; forward accumulates
    logdet, reverse iterates backwards.

All couplings are stateless functions of their parameters, so the
reverse pass jits into the AR sampling `lax.scan` directly.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.masked import Masked
from ..hparams.hp import Hparams
from .activations import get_activation
from .conv import Conv1d, get_padding
from .linear import Dense, FiLM
from .norms import get_norm

Array = jax.Array


class TensorLogdet(NamedTuple):
    tensor: Union[Masked, Array]
    logdet: Union[float, Array]


def _bounded_logscale(logs: Array, scale_range) -> Array:
    """sigmoid-bounded log-scale; preserves reference unpack order
    ``_max, _min = scale_range`` (``flow/layers.py:63-66``)."""
    _max, _min = scale_range
    std = jax.nn.sigmoid(logs) * (_max - _min) + _min
    return jnp.log(std)


class LinearCoupling(nnx.Module):
    def __init__(self, dim: int, flip: bool, hp: Hparams,
                 condition_dim: Optional[int] = None, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("hidden_dim", "activation", "mean_only",
                                "norm")
        self.mean_only = hp.mean_only
        self.condition_dim = condition_dim
        self.film = (FiLM(hp.hidden_dim, in_dim=condition_dim, rngs=rngs)
                     if condition_dim is not None else None)
        bias = hp.get("bias", True)
        self.linear1 = Dense(dim // 2, hp.hidden_dim, bias=bias, rngs=rngs)
        self.linear2 = Dense(hp.hidden_dim,
                             dim // 2 if hp.mean_only else dim,
                             bias=bias, rngs=rngs)
        self.norm = get_norm(hp.hidden_dim, hp.norm, rngs=rngs)
        self.activation = get_activation(hp.activation)
        self.flip = flip
        self.scale_range = hp.get("scale_range", None)
        self.detach_coupling = hp.get("detach_coupling", False)
        self.half = dim // 2

    def _stats(self, x0: Array, c: Optional[Array]) -> Tuple[Array, Array]:
        h = self.norm(self.linear1(x0))
        if c is not None and self.film is not None:
            h = self.film(h, c)
        stats = self.linear2(self.activation(h)).astype(jnp.float32)
        if self.mean_only:
            return stats, jnp.zeros_like(stats)
        m, logs = stats[..., : self.half], stats[..., self.half:]
        if self.scale_range is not None:
            logs = _bounded_logscale(logs, self.scale_range)
        return m, logs

    def forward(self, x: TensorLogdet,
                c: Optional[Masked] = None) -> TensorLogdet:
        xm: Masked = x.tensor
        x0 = xm.value[..., : self.half]
        x1 = xm.value[..., self.half:]
        if self.flip:
            x0, x1 = x1, x0
        inp = jax.lax.stop_gradient(x0) if self.detach_coupling else x0
        m, logs = self._stats(inp, c.value if c is not None else None)
        x1 = m + x1.astype(jnp.float32) * jnp.exp(logs)
        ret = jnp.concatenate([x0.astype(jnp.float32), x1], axis=-1)
        logs_masked = jnp.where(xm.expanded_mask(), logs, 0.0)
        return TensorLogdet(
            Masked(ret, xm.lengths, xm.time_axis),
            x.logdet + logs_masked,
        )

    def reverse(self, x: Masked, c: Optional[Masked] = None) -> Masked:
        x0 = x.value[..., : self.half]
        x1 = x.value[..., self.half:]
        m, logs = self._stats(x0, c.value if c is not None else None)
        x1 = (x1.astype(jnp.float32) - m) * jnp.exp(-logs)
        if self.flip:
            x0, x1 = x1, x0
        ret = jnp.concatenate([x0.astype(jnp.float32), x1], axis=-1)
        return Masked(ret, x.lengths, x.time_axis)


class ConvCoupling(nnx.Module):
    """Conv-conditioned coupling in B T C (``flow/layers.py:102-196``).

    The reference operates BCT and its ``reverse`` references undefined
    layers (a latent crash); here both directions share the same conv
    path.  The reference concatenates the condition onto the coupling
    input rather than FiLM.
    """

    def __init__(self, dim: int, flip: bool, hp: Hparams,
                 condition_dim: Optional[int] = None, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("hidden_dim", "activation", "mean_only",
                                "norm", "kernel_size")
        self.mean_only = hp.mean_only
        self.condition_dim = condition_dim
        cdim = condition_dim or 0
        padding = get_padding(hp.kernel_size,
                              causal=hp.get("causal_padding", False),
                              future=hp.get("future_padding", False))
        self.conv1 = Conv1d(dim // 2 + cdim, hp.hidden_dim,
                            hp.kernel_size, padding=padding,
                            bias=bool(hp.get("bias", False)), rngs=rngs)
        self.conv2 = Conv1d(hp.hidden_dim,
                            dim // 2 if hp.mean_only else dim, 1,
                            bias=bool(hp.get("bias", True)), rngs=rngs)
        self.norm = get_norm(hp.hidden_dim, hp.norm, rngs=rngs)
        self.activation = get_activation(hp.activation)
        self.flip = flip
        self.scale_range = hp.get("scale_range", None)
        self.detach_coupling = hp.get("detach_coupling", False)
        self.half = dim // 2

    def _stats(self, x0: Array, c: Optional[Array]):
        inp = x0
        if c is not None and self.condition_dim is not None:
            inp = jnp.concatenate([x0, c.astype(x0.dtype)], axis=-1)
        stats = self.conv2(self.activation(self.norm(self.conv1(inp))))
        stats = stats.astype(jnp.float32)
        if self.mean_only:
            return stats, jnp.zeros_like(stats)
        m, logs = stats[..., : self.half], stats[..., self.half:]
        if self.scale_range is not None:
            logs = _bounded_logscale(logs, self.scale_range)
        return m, logs

    def forward(self, x: TensorLogdet,
                c: Optional[Masked] = None) -> TensorLogdet:
        xm: Masked = x.tensor
        x0 = xm.value[..., : self.half]
        x1 = xm.value[..., self.half:]
        if self.flip:
            x0, x1 = x1, x0
        inp = jax.lax.stop_gradient(x0) if self.detach_coupling else x0
        m, logs = self._stats(inp, c.value if c is not None else None)
        x1 = m + x1.astype(jnp.float32) * jnp.exp(logs)
        ret = jnp.concatenate([x0.astype(jnp.float32), x1], axis=-1)
        logs_masked = jnp.where(xm.expanded_mask(), logs, 0.0)
        return TensorLogdet(Masked(ret, xm.lengths, xm.time_axis),
                            x.logdet + logs_masked)

    def reverse(self, x: Masked, c: Optional[Masked] = None) -> Masked:
        x0 = x.value[..., : self.half]
        x1 = x.value[..., self.half:]
        m, logs = self._stats(x0, c.value if c is not None else None)
        x1 = (x1.astype(jnp.float32) - m) * jnp.exp(-logs)
        if self.flip:
            x0, x1 = x1, x0
        ret = jnp.concatenate([x0.astype(jnp.float32), x1], axis=-1)
        return Masked(ret, x.lengths, x.time_axis)


class RationalQuadraticSplineCoupling(nnx.Module):
    """Monotonic RQS coupling (``flow/spline.py:21-218``), fp32 math."""

    def __init__(self, dim: int, flip: bool, hp: Hparams,
                 condition_dim: Optional[int] = None, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("hidden_dim", "activation", "num_bins",
                                "tail_bound", "norm")
        self.min_bin_width = hp.get("min_bin_width", 1e-3)
        self.min_bin_height = hp.get("min_bin_height", 1e-3)
        self.min_bin_derivative = hp.get("min_bin_derivative", 1e-3)
        self.condition_dim = condition_dim
        self.num_bins = hp.num_bins
        self.hidden_dim = hp.hidden_dim
        cdim = condition_dim or 0
        self.linear1 = Dense(dim // 2 + cdim, hp.hidden_dim,
                             bias=bool(hp.get("bias", False)), rngs=rngs)
        self.linear2 = Dense(hp.hidden_dim,
                             (self.num_bins * 3 - 1) * (dim // 2),
                             bias=bool(hp.get("bias", True)), rngs=rngs)
        self.norm = get_norm(hp.hidden_dim, hp.norm, rngs=rngs)
        self.activation = get_activation(hp.activation)
        self.flip = flip
        self.tail_bound = hp.tail_bound
        self.half = dim // 2

    def _stats(self, x0: Array, c: Optional[Array]):
        inp = x0
        if c is not None and self.condition_dim is not None:
            inp = jnp.concatenate([x0, c.astype(x0.dtype)], axis=-1)
        stats = self.linear2(self.activation(self.norm(self.linear1(inp))))
        stats = stats.astype(jnp.float32)
        shape = stats.shape[:-1] + (self.half, self.num_bins * 3 - 1)
        stats = stats.reshape(shape)
        w = stats[..., : self.num_bins]
        h = stats[..., self.num_bins: 2 * self.num_bins]
        d = stats[..., 2 * self.num_bins:]
        return w, h, d

    def _spline(self, inputs: Array, uw: Array, uh: Array, ud: Array,
                inverse: bool) -> Tuple[Array, Array]:
        tb = self.tail_bound
        left, bottom, right, top = -tb, -tb, tb, tb
        sqrt_dim = math.sqrt(self.hidden_dim)
        uw = uw / sqrt_dim
        uh = uh / sqrt_dim
        constant = math.log(math.exp(1 - self.min_bin_derivative) - 1)
        pad_shape = ud.shape[:-1] + (1,)
        const = jnp.full(pad_shape, constant, ud.dtype)
        ud = jnp.concatenate([const, ud, const], axis=-1)

        widths = jax.nn.softmax(uw, axis=-1)
        widths = self.min_bin_width + (
            1 - self.min_bin_width * self.num_bins) * widths
        cumw = jnp.cumsum(widths, axis=-1)
        cumw = jnp.concatenate(
            [jnp.zeros(pad_shape, cumw.dtype), cumw], axis=-1)
        cumw = (right - left) * cumw + left
        cumw = cumw.at[..., 0].set(left).at[..., -1].set(right)
        widths = cumw[..., 1:] - cumw[..., :-1]

        derivs = self.min_bin_derivative + jax.nn.softplus(ud)

        heights = jax.nn.softmax(uh, axis=-1)
        heights = self.min_bin_height + (
            1 - self.min_bin_height * self.num_bins) * heights
        cumh = jnp.cumsum(heights, axis=-1)
        cumh = jnp.concatenate(
            [jnp.zeros(pad_shape, cumh.dtype), cumh], axis=-1)
        cumh = (top - bottom) * cumh + bottom
        cumh = cumh.at[..., 0].set(bottom).at[..., -1].set(top)
        heights = cumh[..., 1:] - cumh[..., :-1]

        def searchsorted(bins, x):
            bins = bins.at[..., -1].add(1e-6)
            return jnp.sum(x[..., None] >= bins, axis=-1) - 1

        bin_idx = searchsorted(cumh if inverse else cumw, inputs)
        bin_idx = jnp.clip(bin_idx, 0, self.num_bins - 1)[..., None]

        def take(a, idx):
            return jnp.take_along_axis(a, idx, axis=-1)[..., 0]

        in_cumw = take(cumw, bin_idx)
        in_w = take(widths, bin_idx)
        in_cumh = take(cumh, bin_idx)
        delta = heights / widths
        in_delta = take(delta, bin_idx)
        in_d = take(derivs, bin_idx)
        in_d1 = take(derivs[..., 1:], bin_idx)
        in_h = take(heights, bin_idx)

        if inverse:
            y = inputs - in_cumh
            common = in_d + in_d1 - 2 * in_delta
            a = y * common + in_h * (in_delta - in_d)
            b = in_h * in_d - y * common
            c = -in_delta * y
            disc = jnp.square(b) - 4 * a * c
            root = (2 * c) / (-b - jnp.sqrt(jnp.maximum(disc, 0.0)))
            outputs = root * in_w + in_cumw
            t1m = root * (1 - root)
            denom = in_delta + common * t1m
            dnum = jnp.square(in_delta) * (
                in_d1 * jnp.square(root) + 2 * in_delta * t1m
                + in_d * jnp.square(1 - root))
            logabsdet = -(jnp.log(dnum) - 2 * jnp.log(denom))
        else:
            theta = (inputs - in_cumw) / in_w
            t1m = theta * (1 - theta)
            common = in_d + in_d1 - 2 * in_delta
            num = in_h * (in_delta * jnp.square(theta) + in_d * t1m)
            denom = in_delta + common * t1m
            outputs = in_cumh + num / denom
            dnum = jnp.square(in_delta) * (
                in_d1 * jnp.square(theta) + 2 * in_delta * t1m
                + in_d * jnp.square(1 - theta))
            logabsdet = jnp.log(dnum) - 2 * jnp.log(denom)
        interior = (inputs >= -tb) & (inputs <= tb)
        outputs = jnp.where(interior, outputs, inputs)
        logabsdet = jnp.where(interior, logabsdet, 0.0)
        return outputs, logabsdet

    def forward(self, x: TensorLogdet,
                c: Optional[Masked] = None) -> TensorLogdet:
        xm: Masked = x.tensor
        x0 = xm.value[..., : self.half].astype(jnp.float32)
        x1 = xm.value[..., self.half:].astype(jnp.float32)
        if self.flip:
            x0, x1 = x1, x0
        w, h, d = self._stats(x0, c.value if c is not None else None)
        x1, logdet = self._spline(x1, w, h, d, inverse=False)
        ret = jnp.concatenate([x0, x1], axis=-1)
        logdet = jnp.where(xm.expanded_mask(), logdet, 0.0)
        return TensorLogdet(Masked(ret, xm.lengths, xm.time_axis),
                            x.logdet + logdet)

    def reverse(self, x: Masked, c: Optional[Masked] = None) -> Masked:
        x0 = x.value[..., : self.half].astype(jnp.float32)
        x1 = x.value[..., self.half:].astype(jnp.float32)
        w, h, d = self._stats(x0, c.value if c is not None else None)
        x1, _ = self._spline(x1, w, h, d, inverse=True)
        if self.flip:
            x0, x1 = x1, x0
        return Masked(jnp.concatenate([x0, x1], axis=-1), x.lengths,
                      x.time_axis)


class CouplingStack(nnx.Module):
    """Stack of couplings, all flipped (``flow/layers.py:199-245``)."""

    def __init__(self, dim: int, hp: Hparams,
                 condition_dim: Optional[int] = None, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("num_layers", "layer")
        assert hp.num_layers % 2 == 0
        identifier = hp.get("identifier", "LinearCoupling")
        module = {
            "RationalQuadraticSplineCoupling":
                RationalQuadraticSplineCoupling,
            "LinearCoupling": LinearCoupling,
            "ConvCoupling": ConvCoupling,
        }.get(identifier)
        if module is None:
            raise ValueError(f"{identifier} is not supported")
        self.layers = nnx.List([
            module(dim, True, hp.layer, condition_dim=condition_dim,
                   rngs=rngs)
            for _ in range(hp.num_layers)
        ])
        self.identifier = identifier
        self.dim = dim

    def forward(self, x: TensorLogdet,
                c: Optional[Masked] = None) -> TensorLogdet:
        for layer in self.layers:
            x = layer.forward(x, c=c)
        return x

    def reverse(self, x: Masked, c: Optional[Masked] = None) -> Masked:
        for layer in reversed(list(self.layers)):
            x = layer.reverse(x, c=c)
        return x
