"""1-D convolution stacks in TPU-native B T C (NWC) layout.

Parity targets: ``/root/reference/modules/conv/layers.py`` — ResidualBlock
family (depthwise k-conv → norm → 1×1 expand → act → 1×1 project with
optional FiLM/concat conditioning and diffusion-time injection),
Up/Downsample via (transposed) conv with mask-length resize,
``ResNet`` / ``BottleNeckResNet`` (UNet-style skip connections,
``upward_layer`` future-padding boundary) and ``CNNStack``.

TPU-first notes:
  * NWC layout end-to-end — XLA's native TPU conv layout; the BCT
    transposes of the reference disappear entirely.
  * Asymmetric causal/future padding becomes a per-spatial-dim
    ``(left, right)`` padding tuple on ``conv_general_dilated`` — no
    explicit pad op is materialised.
  * Transposed conv = ``lax.conv_transpose`` VALID + static slice,
    reproducing the reference's pad-then-crop semantics
    (``conv/layers.py:34-55``).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.masked import Masked, resize_length
from ..core.precision import get_policy
from ..hparams.hp import Hparams
from .activations import get_activation
from .linear import Dense, FiLM, _uniform_init
from .norms import get_norm

Array = jax.Array
Padding = Union[int, Tuple[int, int]]


def get_padding(kernel_size: int, dilation: int = 1, stride: int = 1,
                causal: bool = False, future: bool = False) -> Padding:
    """Same formula as reference ``utils/helpers.py:138-145``."""
    padding = int(((kernel_size - 1) * dilation + 1 - stride) / 2)
    if causal:
        return (padding * 2, 0)
    if future:
        return (0, padding * 2)
    return padding


def _pad_pair(padding: Padding) -> Tuple[int, int]:
    if isinstance(padding, (tuple, list)):
        return tuple(padding)
    return (padding, padding)


@functools.lru_cache(maxsize=None)
def _depthwise_fn(k: int, stride: int, pad: Tuple[int, int],
                  dilation: int):
    """Pure-depthwise conv with a split lowering.

    Forward: the grouped-conv primitive — XLA fuses it into adjacent
    elementwise chains (measured: relowering the forward as k shifted
    multiplies cost +2.6 ms/UNet-step at the B=128 DDIM operating
    point).  Backward: the VJP of the k-shifted-multiply formulation —
    XLA's SPMD partitioner mis-reduces the grouped-conv WEIGHT
    gradient on multi-axis meshes (dW scaled by the size of every mesh
    axis the batch is not sharded over; repro
    ``tests/test_pp.py::test_depthwise_grad_correct_on_2d_mesh``),
    while the elementwise formulation's grads are plain reduces that
    partition correctly."""

    def elementwise(x, kernel):
        xp = jnp.pad(x, ((0, 0), pad, (0, 0)))
        span = (k - 1) * dilation + 1
        t_out = (xp.shape[1] - span) // stride + 1
        y = None
        for j in range(k):
            lo = j * dilation
            xs = xp[:, lo:lo + (t_out - 1) * stride + 1:stride]
            term = xs * kernel[j, 0]
            y = term if y is None else y + term
        return y

    def grouped(x, kernel):
        return jax.lax.conv_general_dilated(
            x, kernel, (stride,), [pad], rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=kernel.shape[2])

    @jax.custom_vjp
    def f(x, kernel):
        return grouped(x, kernel)

    def fwd(x, kernel):
        return grouped(x, kernel), (x, kernel)

    def bwd(res, g):
        x, kernel = res
        _, vjp = jax.vjp(elementwise, x, kernel)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


class Conv1d(nnx.Module):
    """NWC conv with torch-style init and (left, right) padding."""

    def __init__(self, in_ch: int, out_ch: int, kernel_size: int,
                 stride: int = 1, padding: Padding = 0, groups: int = 1,
                 dilation: int = 1, bias: bool = True, *, rngs: nnx.Rngs):
        bound = 1.0 / math.sqrt(in_ch // groups * kernel_size)
        # (k, in/groups, out) for ('NWC','WIO','NWC').
        self.kernel = nnx.Param(_uniform_init(
            rngs.params(), (kernel_size, in_ch // groups, out_ch), bound))
        self.bias = (nnx.Param(_uniform_init(rngs.params(), (out_ch,),
                                             bound)) if bias else None)
        self.stride = stride
        self.padding = _pad_pair(padding)
        self.groups = groups
        self.dilation = dilation

    def __call__(self, x: Array) -> Array:
        dt = get_policy().compute_dtype
        kernel = self.kernel[...].astype(dt)
        if self.groups > 1 and kernel.shape[1] == 1 \
                and kernel.shape[2] == self.groups:
            # Pure depthwise: grouped-conv forward + elementwise-
            # formulation backward (see _depthwise_fn).
            y = _depthwise_fn(kernel.shape[0], self.stride,
                              self.padding, self.dilation)(
                x.astype(dt), kernel)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(dt), kernel,
                window_strides=(self.stride,),
                padding=[self.padding],
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=self.groups,
            )
        if self.bias is not None:
            y = y + self.bias[...].astype(dt)
        return y


class ConvTranspose1d(nnx.Module):
    """NWC transposed conv reproducing torch pad-then-crop semantics.

    Full VALID transposed conv gives length ``(T-1)*stride + k``; the
    reference then crops ``[left: -right]`` (``conv/layers.py:34-55``).
    """

    def __init__(self, in_ch: int, out_ch: int, kernel_size: int,
                 stride: int = 1, padding: Padding = 0, bias: bool = True,
                 *, rngs: nnx.Rngs):
        bound = 1.0 / math.sqrt(out_ch * kernel_size)  # torch: in=out roles
        # torch ConvTranspose1d weight (in, out, k): bound uses
        # fan_in = out_ch * k... actually torch uses weight.size(1)*k =
        # out_ch*k. Kernel here: (k, out_ch, in_ch) for conv_transpose
        # with transpose_kernel=True mirrors torch exactly.
        self.kernel = nnx.Param(_uniform_init(
            rngs.params(), (kernel_size, out_ch, in_ch), bound))
        self.bias = (nnx.Param(_uniform_init(rngs.params(), (out_ch,),
                                             bound)) if bias else None)
        self.stride = stride
        self.crop = _pad_pair(padding)

    def __call__(self, x: Array) -> Array:
        dt = get_policy().compute_dtype
        y = jax.lax.conv_transpose(
            x.astype(dt), self.kernel[...].astype(dt),
            strides=(self.stride,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            transpose_kernel=True,
        )
        left, right = self.crop
        if left or right:
            y = y[:, left: y.shape[1] - right if right else None]
        if self.bias is not None:
            y = y + self.bias[...].astype(dt)
        return y


class LayerScale(nnx.Module):
    """Per-channel learnable scale (``conv/layers.py:58-67``)."""

    def __init__(self, dim: int, eps: float, *, rngs: nnx.Rngs):
        del rngs
        self.gamma = nnx.Param(eps * jnp.ones((dim,), jnp.float32))

    def __call__(self, x: Array) -> Array:
        return self.gamma[...].astype(x.dtype) * x


class Dropout(nnx.Module):
    def __init__(self, rate: float, *, rngs: Optional[nnx.Rngs] = None):
        self.rate = rate
        self._rngs = rngs if rate > 0 else None

    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.rate <= 0.0 or deterministic:
            return x
        key = self._rngs.dropout()
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class ResidualBlock(nnx.Module):
    """Depthwise-separable residual block (``conv/layers.py:70-135``).

    h = layer_scale(conv3(act(conv2(norm(conv1(x)))))) + shortcut(x)
    """

    def __init__(self, hp: Hparams, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("in_channels", "hidden_channels",
                                "kernel_size", "norm", "activation")
        aux = hp.get("aux_in_channels", 0) or 0
        padding = get_padding(hp.kernel_size,
                              causal=hp.get("causal_padding", False),
                              future=hp.get("future_padding", False))
        cin, chid = hp.in_channels, hp.hidden_channels
        self.norm = get_norm(cin, hp.norm, rngs=rngs)
        self.act = get_activation(hp.activation)
        self.conv1 = Conv1d(cin, cin, hp.kernel_size, padding=padding,
                            groups=cin, rngs=rngs)
        self.conv2 = Conv1d(cin + aux, chid, 1, rngs=rngs)
        self.conv3 = Conv1d(chid, cin, 1, rngs=rngs)
        self.dropout = Dropout(hp.get("dropout", 0.0), rngs=rngs)
        if hp.get("shortcut", False):
            self.shortcut_conv = Conv1d(cin, cin, 1, rngs=rngs)
            self.shortcut_act = get_activation(hp.activation)
        else:
            self.shortcut_conv = None
        if hp.has("layer_scale"):
            hp.layer_scale.check_arg_in_hparams("eps")
            self.layer_scale = LayerScale(cin, hp.layer_scale.eps, rngs=rngs)
        else:
            self.layer_scale = None

    def _shortcut(self, xv: Array) -> Array:
        if self.shortcut_conv is None:
            return xv
        return self.shortcut_act(self.shortcut_conv(xv))

    def _tail(self, h: Array, xv: Array) -> Array:
        h = self.dropout(self.conv3(h))
        if self.layer_scale is not None:
            h = self.layer_scale(h)
        return h + self._shortcut(xv)

    def __call__(self, x: Masked) -> Masked:
        h = self.act(self.conv2(self.norm(self.conv1(x.value))))
        return dataclasses.replace(x, value=self._tail(h, x.value))


def _concat_conv2(conv2: "Conv1d", n_main: int, h: Array,
                  c: Array) -> Array:
    """``conv2(concat([h, c]))`` computed as two 1×1 matmuls summed.

    The checkpoint keeps ONE ``(1, cin+aux, chid)`` kernel (reference
    layout, ``conv/layers.py:196-228``), but splitting the contraction
    pays twice on TPU: (a) inside the DDIM sampling scan the condition
    ``c`` is step-invariant, so XLA hoists the aux matmul out of the
    100-step loop entirely; (b) the main GEMM's contraction dim drops
    from cin+aux (e.g. 544 → pads to 640 on the MXU, 15% wasted
    cycles) to the exact-tile cin (512).  Bitwise: two partial K-sums
    added in fp32 — within float ulp of the fused contraction."""
    dt = get_policy().compute_dtype
    w = conv2.kernel[...].astype(dt)[0]            # (cin+aux, chid)
    y = jnp.matmul(h.astype(dt), w[:n_main],
                   preferred_element_type=jnp.float32)
    y = y + jnp.matmul(c.astype(dt), w[n_main:],
                       preferred_element_type=jnp.float32)
    y = y.astype(dt)
    if conv2.bias is not None:
        y = y + conv2.bias[...].astype(dt)
    return y


class ConditionalResidualBlock(ResidualBlock):
    """FiLM- or concat-conditioned variant (``conv/layers.py:196-228``)."""

    def __init__(self, hp: Hparams, *, rngs: nnx.Rngs):
        self.condition_type = hp.get("condition_type", "film")
        if self.condition_type == "film":
            super().__init__(hp, rngs=rngs)
            self.film = FiLM(hp.in_channels, in_dim=hp.get("in_dim", None),
                             rngs=rngs)
        else:
            hp.aux_in_channels = hp.get("in_dim", hp.in_channels)
            super().__init__(hp, rngs=rngs)
        self.in_channels = hp.in_channels

    def __call__(self, x: Masked, c: Masked) -> Masked:
        if self.condition_type == "film":
            h = self.film(self.norm(self.conv1(x.value)), c.value)
            h = self.act(self.conv2(h))
        else:
            h = self.norm(self.conv1(x.value))
            h = self.act(_concat_conv2(self.conv2, self.in_channels,
                                       h, c.value))
        return dataclasses.replace(x, value=self._tail(h, x.value))


class TemporalResidualBlock(ResidualBlock):
    """Diffusion-time conditioned variant (``conv/layers.py:231-256``)."""

    def __init__(self, hp: Hparams, *, rngs: nnx.Rngs):
        super().__init__(hp, rngs=rngs)
        hp.check_arg_in_hparams("time_dim")
        self.time_emb = Dense(hp.time_dim, hp.in_channels, rngs=rngs)

    def __call__(self, x: Masked, t: Array) -> Masked:
        te = self.time_emb(self.act(t))[:, None, :]
        h = self.act(self.conv2(self.norm(self.conv1(x.value) + te)))
        return dataclasses.replace(x, value=self._tail(h, x.value))


class TCResidualBlock(ResidualBlock):
    """Time + condition variant (``conv/layers.py:259-295``)."""

    def __init__(self, hp: Hparams, *, rngs: nnx.Rngs):
        self.condition_type = hp.get("condition_type", "film")
        if self.condition_type == "film":
            super().__init__(hp, rngs=rngs)
            self.film = FiLM(hp.in_channels, in_dim=hp.get("in_dim", None),
                             rngs=rngs)
        else:
            hp.aux_in_channels = hp.get("in_dim", hp.in_channels)
            super().__init__(hp, rngs=rngs)
        hp.check_arg_in_hparams("time_dim")
        self.time_emb = Dense(hp.time_dim, hp.in_channels, rngs=rngs)
        self.in_channels = hp.in_channels

    def __call__(self, x: Masked, c: Masked, t: Array) -> Masked:
        te = self.time_emb(self.act(t))[:, None, :]
        if self.condition_type == "film":
            h = self.film(self.norm(self.conv1(x.value) + te), c.value)
            h = self.act(self.conv2(h))
        else:
            h = self.norm(self.conv1(x.value) + te)
            # split contraction: condition matmul hoists out of the
            # DDIM scan; main GEMM keeps an exact-tile K (see
            # _concat_conv2)
            h = self.act(_concat_conv2(self.conv2, self.in_channels,
                                       h, c.value))
        return dataclasses.replace(x, value=self._tail(h, x.value))


class Upsample(nnx.Module):
    """norm → transposed conv, ×stride lengths (``conv/layers.py:138-165``)."""

    def __init__(self, n_channels: int, kernel_size: int, stride: int,
                 norm_hp: Hparams, causal_padding: bool = False,
                 future_padding: bool = False,
                 out_channels: Optional[int] = None, *, rngs: nnx.Rngs):
        out_channels = out_channels or n_channels
        padding = get_padding(kernel_size, stride=stride,
                              causal=causal_padding, future=future_padding)
        self.norm = get_norm(n_channels, norm_hp, rngs=rngs)
        self.conv = ConvTranspose1d(n_channels, out_channels, kernel_size,
                                    stride, padding=padding, rngs=rngs)
        self.stride = stride

    def __call__(self, x: Masked) -> Masked:
        lengths = resize_length(x.lengths, float(self.stride))
        return Masked(self.conv(self.norm(x.value)), lengths, 1)


class Downsample(nnx.Module):
    """norm → strided conv, ÷stride lengths (``conv/layers.py:168-193``)."""

    def __init__(self, n_channels: int, kernel_size: int, stride: int,
                 norm_hp: Hparams, causal_padding: bool = False,
                 future_padding: bool = False,
                 out_channels: Optional[int] = None, *, rngs: nnx.Rngs):
        out_channels = out_channels or n_channels
        padding = get_padding(kernel_size, stride=stride,
                              causal=causal_padding, future=future_padding)
        self.norm = get_norm(n_channels, norm_hp, rngs=rngs)
        self.conv = Conv1d(n_channels, out_channels, kernel_size,
                           stride=stride, padding=padding, rngs=rngs)
        self.stride = stride

    def __call__(self, x: Masked) -> Masked:
        lengths = resize_length(x.lengths, 1.0 / float(self.stride))
        return Masked(self.conv(self.norm(x.value)), lengths, 1)


def _sample_ratio(resample_rates: Sequence[int]) -> float:
    ret = 1.0
    for rate in resample_rates:
        ret = ret * rate if rate > 0 else ret / -rate
    return ret


class ResNet(nnx.Module):
    """Uniform-width residual conv stack (``conv/layers.py:298-383``)."""

    def __init__(self, hp: Hparams, input_dim: Optional[int] = None,
                 output_dim: Optional[int] = None, conditional: bool = False,
                 *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("num_layers", "layer")
        self.hp = hp
        n = hp.num_layers
        causal_padding = hp.layer.get("causal_padding", False)
        rates = hp.get("resample_rates", [1] * n)
        ksizes = hp.get("resample_ksize", [3] * n)
        assert len(rates) == n
        block = ConditionalResidualBlock if conditional else ResidualBlock
        self.layers = nnx.List([block(hp.layer, rngs=rngs)
                                for _ in range(n)])
        samples = []
        for rk, rate in zip(ksizes, rates):
            assert isinstance(rate, int) and rate != 0
            if rate in (1, -1):
                samples.append(None)
            elif rate > 1:
                samples.append(Upsample(hp.layer.in_channels, rk, rate,
                                        hp.layer.norm,
                                        causal_padding=causal_padding,
                                        rngs=rngs))
            else:
                samples.append(Downsample(hp.layer.in_channels, rk, -rate,
                                          hp.layer.norm,
                                          causal_padding=causal_padding,
                                          rngs=rngs))
        self.samples = nnx.List(samples)
        self.linear = (Dense(input_dim, hp.layer.in_channels, rngs=rngs)
                       if input_dim is not None else None)
        self.out_linear = (Dense(hp.layer.in_channels, output_dim, rngs=rngs)
                           if output_dim is not None else None)
        self.final_norm = (get_norm(hp.layer.in_channels, hp.layer.norm,
                                    rngs=rngs)
                           if hp.get("final_norm", False) else None)
        self.first_norm = (get_norm(hp.layer.in_channels, hp.layer.norm,
                                    rngs=rngs)
                           if hp.get("first_norm", False) else None)
        self.conditional = conditional

    def __call__(self, x: Masked, c: Optional[Masked] = None) -> Masked:
        if self.linear is not None:
            x = Masked(self.linear(x.value), x.lengths, 1).apply_mask()
        if self.first_norm is not None:
            x = dataclasses.replace(x, value=self.first_norm(x.value))
        for sample, layer in zip(self.samples, self.layers):
            x = layer(x, c) if self.conditional else layer(x)
            if sample is not None:
                x = sample(x)
        if self.final_norm is not None:
            x = dataclasses.replace(x, value=self.final_norm(x.value))
        if self.out_linear is not None:
            x = Masked(self.out_linear(x.value), x.lengths, 1)
        return x.apply_mask()

    @property
    def sample_ratio(self) -> float:
        return _sample_ratio(self.hp.get(
            "resample_rates", [1] * self.hp.num_layers))


class BottleNeckResNet(nnx.Module):
    """Variable-width bottleneck stack with UNet skips
    (``conv/layers.py:386-540``).

    Per-layer: in/out/hidden channel schedules, optional per-layer
    conditioning (FiLM/concat) and diffusion-time injection, skip
    connections (add or concat+1×1) back to recorded activations, and an
    ``upward_layer`` boundary after which future-padding layer hp applies
    (UNet decoder half).
    """

    def __init__(self, hp: Hparams, input_dim: Optional[int] = None,
                 output_dim: Optional[int] = None, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("num_layers", "layer", "init_channel",
                                "out_channels", "hidden_channels",
                                "resample_rates", "resample_ksize")
        self.hp = hp
        n = hp.num_layers
        upward_boundary = 10 ** 12
        if hp.has("upward_layer"):
            upward_boundary = hp.upward_layer.boundary
            assert upward_boundary < n
        out_channels = hp.out_channels
        in_channels = ([hp.init_channel] + list(out_channels))[:-1]
        hidden_channels = hp.hidden_channels
        if hp.has("conditional"):
            hp.check_arg_in_hparams("condition_dim")
            hp.layer.in_dim = hp.condition_dim
            if hp.has("upward_layer"):
                hp.upward_layer.in_dim = hp.condition_dim
        conditional = hp.get("conditional", [False] * n)
        self.time_dim = hp.get("time_dim", None)
        assert len(hp.resample_rates) == n
        assert len(out_channels) == n and len(hidden_channels) == n
        self.skip_connection = hp.get("skip_connection", [None] * n)
        self.skip_concat = hp.get("connection_type", None) == "concat"
        assert len(self.skip_connection) == n
        layers, samples, skip_conv = [], [], []
        for i in range(n):
            c_layer = hp.layer if i < upward_boundary else hp.upward_layer
            causal_padding = c_layer.get("causal_padding", False)
            future_padding = c_layer.get("future_padding", False)
            c_layer.in_channels = in_channels[i]
            c_layer.hidden_channels = hidden_channels[i]
            c_layer.aux_in_channels = 0
            if self.skip_connection[i] is not None and self.skip_concat:
                skip_conv.append(Conv1d(in_channels[i] * 2, in_channels[i],
                                        1, rngs=rngs))
            else:
                skip_conv.append(None)
            if conditional[i] and self.time_dim is not None:
                c_layer.time_dim = self.time_dim
                layers.append(TCResidualBlock(c_layer, rngs=rngs))
            elif conditional[i]:
                layers.append(ConditionalResidualBlock(c_layer, rngs=rngs))
            elif self.time_dim is not None:
                c_layer.time_dim = self.time_dim
                layers.append(TemporalResidualBlock(c_layer, rngs=rngs))
            else:
                layers.append(ResidualBlock(c_layer, rngs=rngs))
            rk, rate = hp.resample_ksize[i], hp.resample_rates[i]
            assert isinstance(rate, int) and rate != 0
            if rate in (1, -1):
                assert in_channels[i] == out_channels[i]
                samples.append(None)
            elif rate > 1:
                samples.append(Upsample(in_channels[i], rk, rate,
                                        c_layer.norm,
                                        causal_padding=causal_padding,
                                        future_padding=future_padding,
                                        out_channels=out_channels[i],
                                        rngs=rngs))
            else:
                samples.append(Downsample(in_channels[i], rk, -rate,
                                          c_layer.norm,
                                          causal_padding=causal_padding,
                                          future_padding=future_padding,
                                          out_channels=out_channels[i],
                                          rngs=rngs))
        self.layers = nnx.List(layers)
        self.samples = nnx.List(samples)
        self.skip_conv = nnx.List(skip_conv)
        self.conditional = conditional
        self.linear = (Dense(input_dim, hp.init_channel, rngs=rngs)
                       if input_dim is not None else None)
        self.out_linear = (Dense(out_channels[-1], output_dim, rngs=rngs)
                           if output_dim is not None else None)
        self.final_norm = (get_norm(out_channels[-1], hp.layer.norm,
                                    rngs=rngs)
                           if hp.get("final_norm", False) else None)
        self.first_norm = (get_norm(hp.layer.in_channels, hp.layer.norm,
                                    rngs=rngs)
                           if hp.get("first_norm", False) else None)

    def __call__(self, x: Masked, c: Optional[Masked] = None,
                 t: Optional[Array] = None) -> Masked:
        if self.linear is not None:
            x = Masked(self.linear(x.value), x.lengths, 1).apply_mask()
        if self.first_norm is not None:
            x = dataclasses.replace(x, value=self.first_norm(x.value))
        records = [x]
        for sample, layer, cond, skip, skp in zip(
                self.samples, self.layers, self.conditional,
                self.skip_connection, self.skip_conv):
            if cond and self.time_dim is not None:
                x = layer(x, c, t)
            elif cond:
                x = layer(x, c)
            elif self.time_dim is not None:
                x = layer(x, t)
            else:
                x = layer(x)
            if sample is not None:
                x = sample(x)
            if skip is not None:
                if not self.skip_concat:
                    x = x + records[skip]
                else:
                    x = x.cat(records[skip])
                    x = dataclasses.replace(x, value=skp(x.value))
            records.append(x)
        if self.final_norm is not None:
            x = dataclasses.replace(x, value=self.final_norm(x.value))
        if self.out_linear is not None:
            x = Masked(self.out_linear(x.value), x.lengths, 1)
        return x.apply_mask()

    @property
    def sample_ratio(self) -> float:
        return _sample_ratio(self.hp.resample_rates)


class ConvNormAct(nnx.Module):
    """conv|convT → norm → act (``conv/layers.py:543-607``).

    ``stride < 0``: strided conv downsample; ``stride > 1``: transposed
    conv upsample; ``stride == 1``: plain conv.
    """

    def __init__(self, hp: Hparams, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("in_channels", "out_channels", "kernel_size",
                                "stride", "norm", "activation")
        padding = get_padding(hp.kernel_size,
                              causal=hp.get("causal_padding", False),
                              future=hp.get("future_padding", False))
        self.norm = get_norm(hp.out_channels, hp.norm, rngs=rngs)
        self.act = get_activation(hp.activation)
        if hp.stride < 0 or hp.stride == 1:
            stride = -hp.stride if hp.stride < 0 else hp.stride
            self.conv = Conv1d(hp.in_channels, hp.out_channels,
                               hp.kernel_size, stride=stride,
                               padding=padding, rngs=rngs)
            self.stride_ratio = 1.0 / float(stride)
        else:
            self.conv = ConvTranspose1d(hp.in_channels, hp.out_channels,
                                        hp.kernel_size, stride=hp.stride,
                                        padding=padding, rngs=rngs)
            self.stride_ratio = float(hp.stride)
        self.dropout = Dropout(hp.get("dropout", 0.0), rngs=rngs)

    def __call__(self, x: Masked) -> Masked:
        h = self.dropout(self.act(self.norm(self.conv(x.value))))
        if self.stride_ratio != 1.0:
            lengths = resize_length(x.lengths, self.stride_ratio)
            return Masked(h, lengths, 1)
        return dataclasses.replace(x, value=h)


class CNNStack(nnx.Module):
    """Conv-norm-act pyramid (``conv/layers.py:610-652``)."""

    def __init__(self, hp: Hparams, input_dim: Optional[int] = None,
                 output_dim: Optional[int] = None, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("num_layers", "layer", "init_channel",
                                "out_channels", "resample_rates",
                                "resample_ksize")
        self.hp = hp
        n = hp.num_layers
        in_channels = ([hp.init_channel] + list(hp.out_channels))[:-1]
        assert len(hp.resample_rates) == n
        layers = []
        for i in range(n):
            c_layer = hp.layer
            c_layer.in_channels = in_channels[i]
            c_layer.out_channels = hp.out_channels[i]
            c_layer.kernel_size = hp.resample_ksize[i]
            c_layer.stride = hp.resample_rates[i]
            layers.append(ConvNormAct(c_layer, rngs=rngs))
        self.layers = nnx.List(layers)
        self.linear = (Dense(input_dim, hp.init_channel, rngs=rngs)
                       if input_dim is not None else None)
        self.out_linear = (Dense(hp.out_channels[-1], output_dim, rngs=rngs)
                           if output_dim is not None else None)

    def __call__(self, x: Masked) -> Masked:
        if self.linear is not None:
            x = Masked(self.linear(x.value), x.lengths, 1).apply_mask()
        for layer in self.layers:
            x = layer(x)
        if self.out_linear is not None:
            x = Masked(self.out_linear(x.value), x.lengths, 1)
        return x.apply_mask()

    @property
    def sample_ratio(self) -> float:
        return _sample_ratio(self.hp.resample_rates)
