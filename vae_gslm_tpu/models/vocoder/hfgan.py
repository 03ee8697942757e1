"""HiFi-GAN generator and discriminators, TPU-native (NWC/NHWC).

Parity target: ``/root/reference/models/vocoder/hfgan.py``:
weight-normed conv_pre → 6× [leaky_relu → ConvT upsample → mean of
3-kernel MRF resblocks] → conv_post → tanh (320× upsampling);
MultiPeriod (2-D convs over period-folded waves), MultiScale (raw +
avg-pooled), MultiResolution (STFT-magnitude 2-D convs) discriminators;
feature-matching ×2 and LSGAN losses.

Weight-norm semantics follow torch (`dim=0` of the torch weight layout):
per-out-channel for Conv, per-in-channel for ConvTranspose; in our
layouts that is always the LAST kernel axis, so
``w = g * v / ||v||_{axes≠last}``.  ``remove_weight_norm`` folds g into
the kernel for inference (matching ``hfgan.py:154-163``).
"""
from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...core.masked import Masked, resize_length
from ...core.precision import get_policy
from ...data.features import hann_window
from ...hparams.hp import Hparams
from ...nn.conv import get_padding

Array = jax.Array
LRELU_SLOPE = 0.1


def _normal_init(key, shape, std=0.01):
    return jax.random.normal(key, shape, jnp.float32) * std


def _vnorm(v: Array) -> Array:
    axes = tuple(range(v.ndim - 1))
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True)
                    + 1e-12)


class WNConv1d(nnx.Module):
    """Weight-normed NWC conv, kernel (k, in/groups, out), g per-out."""

    def __init__(self, in_ch, out_ch, kernel_size, stride=1, padding=0,
                 dilation=1, groups=1, init_std=0.01, *, rngs: nnx.Rngs):
        v = _normal_init(rngs.params(), (kernel_size, in_ch // groups,
                                         out_ch), init_std)
        self.v = nnx.Param(v)
        self.g = nnx.Param(_vnorm(v)[0, 0])  # (out,)
        bound = 1.0 / math.sqrt(in_ch // groups * kernel_size)
        self.bias = nnx.Param(jax.random.uniform(
            rngs.params(), (out_ch,), jnp.float32, -bound, bound))
        self.stride, self.dilation, self.groups = stride, dilation, groups
        self.padding = (padding if isinstance(padding, (tuple, list))
                        else (padding, padding))
        self.weight_norm = True

    def kernel(self) -> Array:
        if not self.weight_norm:
            return self.v[...]
        return self.g[...] * self.v[...] / _vnorm(self.v[...])

    def remove_weight_norm(self):
        self.v[...] = self.kernel()
        self.weight_norm = False

    def __call__(self, x: Array) -> Array:
        dt = get_policy().compute_dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt), self.kernel().astype(dt), (self.stride,),
            [tuple(self.padding)], rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups)
        return y + self.bias[...].astype(dt)

    def packed_call(self, xp: Array, r: int) -> Array:
        """The same conv on space-to-depth input (B, T/r, r*C).

        Only for stride-1, group-1, SAME-padded convs (all the MRF
        resblock convs and conv_post)."""
        assert self.stride == 1 and self.groups == 1
        dt = get_policy().compute_dtype
        wp, pl, pr = _packed_kernel(self.kernel().astype(dt), r,
                                    self.dilation)
        y = jax.lax.conv_general_dilated(
            xp.astype(dt), wp, (1,), [(pl, pr)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        return y + jnp.tile(self.bias[...].astype(dt), r)


class WNConvT1d(nnx.Module):
    """Weight-normed NWC transposed conv; kernel (k, out, in), g per-in
    (torch ConvTranspose weight-norm dim=0 == in-channels)."""

    def __init__(self, in_ch, out_ch, kernel_size, stride, padding=0,
                 output_padding=0, init_std=0.01, *, rngs: nnx.Rngs):
        v = _normal_init(rngs.params(), (kernel_size, out_ch, in_ch),
                         init_std)
        self.v = nnx.Param(v)
        self.g = nnx.Param(_vnorm(v)[0, 0])  # (in,)
        bound = 1.0 / math.sqrt(out_ch * kernel_size)
        self.bias = nnx.Param(jax.random.uniform(
            rngs.params(), (out_ch,), jnp.float32, -bound, bound))
        self.stride = stride
        # torch ConvT(pad=p, output_padding=op) == VALID + crop (p, p-op)
        self.crop = (padding, padding - output_padding)
        self.weight_norm = True

    def kernel(self) -> Array:
        if not self.weight_norm:
            return self.v[...]
        return self.g[...] * self.v[...] / _vnorm(self.v[...])

    def remove_weight_norm(self):
        self.v[...] = self.kernel()
        self.weight_norm = False

    def __call__(self, x: Array) -> Array:
        dt = get_policy().compute_dtype
        y = jax.lax.conv_transpose(
            x.astype(dt), self.kernel().astype(dt), (self.stride,),
            "VALID", dimension_numbers=("NWC", "WIO", "NWC"),
            transpose_kernel=True)
        left, right = self.crop
        y = y[:, left: y.shape[1] - right if right else None]
        return y + self.bias[...].astype(dt)


class WNConv2d(nnx.Module):
    """Weight-normed NHWC conv, kernel (kh, kw, in, out), g per-out."""

    def __init__(self, in_ch, out_ch, kernel_size, stride=(1, 1),
                 padding=(0, 0), *, rngs: nnx.Rngs):
        kh, kw = kernel_size
        fan_in = in_ch * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        v = jax.random.uniform(rngs.params(), (kh, kw, in_ch, out_ch),
                               jnp.float32, -bound, bound)
        self.v = nnx.Param(v)
        self.g = nnx.Param(_vnorm(v)[0, 0, 0])
        self.bias = nnx.Param(jax.random.uniform(
            rngs.params(), (out_ch,), jnp.float32, -bound, bound))
        self.stride = stride
        self.padding = padding
        self.weight_norm = True

    def kernel(self) -> Array:
        if not self.weight_norm:
            return self.v[...]
        return self.g[...] * self.v[...] / _vnorm(self.v[...])

    def remove_weight_norm(self):
        self.v[...] = self.kernel()
        self.weight_norm = False

    def __call__(self, x: Array) -> Array:
        dt = get_policy().compute_dtype
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(dt), self.kernel().astype(dt), self.stride,
            [(ph, ph), (pw, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + self.bias[...].astype(dt)


def leaky_relu(x, slope=LRELU_SLOPE):
    return jax.nn.leaky_relu(x, negative_slope=slope)


# ------------------------------------------------- packed small-C convs
#
# The generator's late stages have 8-32 channels: on TPU the channel
# (lane) dim pads to 128, so XLA's conv runs at <10% utilisation and
# the last three stages cost 85% of the vocoder (measured 49 of 57 ms
# device time at B=8).  A space-to-depth transform fixes this exactly:
# pack r = 128/C consecutive time steps into channels, (B, T, C) ->
# (B, T/r, r*C), and scatter the original (k, C, Co) kernel into a
# block kernel (k', r*C, r*Co) so the packed dense conv computes the
# SAME contraction (two partial sums within float ulp).  Measured
# 5.5x on the C=8 stage-5 resblock chain (PERFORMANCE.md round 3).


@functools.lru_cache(maxsize=None)
def _pack_maps(k: int, d: int, r: int):
    """Static scatter maps for packing a stride-1 SAME conv.

    For output slot i in [0, r) and tap j in [0, k), the read offset
    s = i + (j - (k-1)/2)*d lands in packed frame q = s // r at slot
    m = s % r.  Returns (q_idx, m_idx, i_idx, j_idx, k', pad_l, pad_r)
    with q_idx shifted to start at 0."""
    c0 = (k - 1) // 2
    ents = [(i, j, *divmod(i + (j - c0) * d, r))
            for i in range(r) for j in range(k)]
    qmin = min(q for _, _, q, _ in ents)
    qmax = max(q for _, _, q, _ in ents)
    q_idx = np.array([q - qmin for _, _, q, _ in ents])
    m_idx = np.array([m for _, _, _, m in ents])
    i_idx = np.array([i for i, _, _, _ in ents])
    j_idx = np.array([j for _, j, _, _ in ents])
    return q_idx, m_idx, i_idx, j_idx, qmax - qmin + 1, -qmin, qmax


def _packed_kernel(w: Array, r: int, d: int):
    """Scatter (k, C, Co) into the packed (k', r*C, r*Co) kernel."""
    k, cin, cout = w.shape
    q_idx, m_idx, i_idx, j_idx, kp, pl, pr = _pack_maps(k, d, r)
    wp = jnp.zeros((kp, r, r, cin, cout), w.dtype)
    wp = wp.at[q_idx, m_idx, i_idx].add(w[j_idx])
    wp = wp.transpose(0, 1, 3, 2, 4).reshape(kp, r * cin, r * cout)
    return wp, pl, pr


def _pad_to_multiple(x: Array, r: int) -> Array:
    t = x.shape[1]
    pad = (-t) % r
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x


class ResBlock(nnx.Module):
    """MRF residual block (``hfgan.py:43-88``)."""

    def __init__(self, channels: int, kernel_size: int = 3,
                 dilation: Sequence[int] = (1, 3, 5), *, rngs: nnx.Rngs):
        self.convs1 = nnx.List([
            WNConv1d(channels, channels, kernel_size, 1,
                     padding=get_padding(kernel_size, d), dilation=d,
                     rngs=rngs)
            for d in dilation])
        self.convs2 = nnx.List([
            WNConv1d(channels, channels, kernel_size, 1,
                     padding=get_padding(kernel_size, 1), rngs=rngs)
            for _ in dilation])

    def __call__(self, x: Array) -> Array:
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c2(leaky_relu(c1(leaky_relu(x))))
            x = xt + x
        return x

    def packed_call(self, xp: Array, r: int, mask) -> Array:
        """__call__ on space-to-depth input; ``mask`` (or None) zeroes
        the tail positions beyond the true length after each conv so
        edge outputs match the unpacked SAME-padding zeros."""
        for c1, c2 in zip(self.convs1, self.convs2):
            h = c1.packed_call(leaky_relu(xp), r)
            if mask is not None:
                h = h * mask
            h = c2.packed_call(leaky_relu(h), r)
            if mask is not None:
                h = h * mask
            xp = h + xp
        return xp

    def remove_weight_norm(self):
        for c in list(self.convs1) + list(self.convs2):
            c.remove_weight_norm()


class Generator(nnx.Module):
    """HiFi-GAN generator (``hfgan.py:91-163``), mel (B,T,80) → wave."""

    def __init__(self, hp: Hparams, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("weight_norm", "resblock_kernel_sizes",
                                "upsample_rates", "in_channels",
                                "upsample_initial_channel", "kernel_size",
                                "upsample_kernel_sizes",
                                "resblock_dilation_sizes")
        self.hp = hp
        self.num_kernels = len(hp.resblock_kernel_sizes)
        self.num_upsamples = len(hp.upsample_rates)
        uic = hp.upsample_initial_channel
        self.conv_pre = WNConv1d(hp.in_channels, uic, hp.kernel_size, 1,
                                 padding=get_padding(hp.kernel_size),
                                 rngs=rngs)
        ups, resblocks = [], []
        for i, (u, k) in enumerate(zip(hp.upsample_rates,
                                       hp.upsample_kernel_sizes)):
            ups.append(WNConvT1d(uic // (2 ** i), uic // (2 ** (i + 1)),
                                 k, u, padding=(u // 2 + u % 2),
                                 output_padding=u % 2, rngs=rngs))
            ch = uic // (2 ** (i + 1))
            for kk, dd in zip(hp.resblock_kernel_sizes,
                              hp.resblock_dilation_sizes):
                resblocks.append(ResBlock(ch, kk, dd, rngs=rngs))
        self.ups = nnx.List(ups)
        self.resblocks = nnx.List(resblocks)
        self.conv_post = WNConv1d(ch, 1, hp.kernel_size, 1,
                                  padding=get_padding(hp.kernel_size),
                                  rngs=rngs)

    def __call__(self, mel: Masked) -> Masked:
        total = int(np.prod(self.hp.upsample_rates))
        lengths = resize_length(mel.lengths, float(total))
        # Space-to-depth fast path for the small-channel late stages
        # (measured 5.5x on the C=8 stage at B=8; see _pack_maps).
        # Enabled for inference only — gated on remove_weight_norm(),
        # the from_pretrained/inference contract — so training keeps
        # the reference-shaped graph.
        # Crossover measured on v5e (PERFORMANCE.md round 3): the
        # unpacked small-C conv time is FLAT in batch (fixed-cost
        # bound, ~12 ms for the C=8 chain at B=8..64) while the packed
        # path scales linearly (2.2 ms at B=8, 9.5 ms at B=64), so
        # packing wins below B~80 and loses at B=128.
        pack_max_b = int(os.environ.get(
            "VAE_GSLM_PACK_VOCODER_MAX_BATCH", "64"))
        use_packed = (not self.conv_pre.weight_norm
                      and mel.value.shape[0] <= pack_max_b
                      and os.environ.get(
                          "VAE_GSLM_NO_PACKED_VOCODER", "0") != "1")
        x = self.conv_pre(mel.value)
        packed_tail = None  # (pack_r, t_true, t_pad) when x is packed
        for i in range(self.num_upsamples):
            x = self.ups[i](leaky_relu(x))
            ch = x.shape[-1]
            pack_r = 128 // ch if use_packed and ch < 128 else 1
            if pack_r > 1:
                t_true = x.shape[1]
                xp = _pad_to_multiple(x, pack_r)
                t_pad = xp.shape[1]
                mask = None
                if t_pad != t_true:
                    # zero the tail slots so edge outputs see the
                    # unpacked SAME-padding zeros
                    m = np.ones((1, t_pad // pack_r, pack_r * ch),
                                np.float32)
                    slot = np.arange(pack_r).repeat(ch)
                    m[:, -1] = (slot < (t_true % pack_r))
                    mask = jnp.asarray(m, x.dtype)
                xp = xp.reshape(xp.shape[0], t_pad // pack_r,
                                pack_r * ch)
                xs = None
                for j in range(self.num_kernels):
                    rb = self.resblocks[i * self.num_kernels + j]
                    r = rb.packed_call(xp, pack_r, mask)
                    xs = r if xs is None else xs + r
                x = xs / self.num_kernels
                if i < self.num_upsamples - 1:
                    x = x.reshape(x.shape[0], t_pad, ch)[:, :t_true]
                else:
                    packed_tail = (pack_r, t_true, t_pad)
            else:
                xs = None
                for j in range(self.num_kernels):
                    r = self.resblocks[i * self.num_kernels + j](x)
                    xs = r if xs is None else xs + r
                x = xs / self.num_kernels
        if packed_tail is not None:
            pack_r, t_true, t_pad = packed_tail
            x = self.conv_post.packed_call(leaky_relu(x, 0.01), pack_r)
            x = x.reshape(x.shape[0], t_pad, 1)[:, :t_true]
        else:
            x = self.conv_post(leaky_relu(x, 0.01))
        wave = jnp.tanh(x.astype(jnp.float32))[..., 0]
        return Masked(wave, lengths, 1)

    def remove_weight_norm(self):
        for u in self.ups:
            u.remove_weight_norm()
        for r in self.resblocks:
            r.remove_weight_norm()
        self.conv_pre.remove_weight_norm()
        self.conv_post.remove_weight_norm()


# ---------------------------------------------------------------- disc
class DiscriminatorP(nnx.Module):
    """Period discriminator: 2-D convs on (T/p, p) folds
    (``hfgan.py:166-205``)."""

    def __init__(self, period: int, kernel_size: int = 5, stride: int = 3,
                 *, rngs: nnx.Rngs):
        self.period = period
        chans = [(1, 64), (64, 128), (128, 256), (256, 512)]
        convs = [WNConv2d(i, o, (kernel_size, 1), (stride, 1),
                          (get_padding(kernel_size), 0), rngs=rngs)
                 for i, o in chans]
        convs.append(WNConv2d(512, 1024, (kernel_size, 1), (1, 1),
                              (get_padding(kernel_size), 0), rngs=rngs))
        self.convs = nnx.List(convs)
        self.conv_post = WNConv2d(1024, 1, (3, 1), (1, 1), (1, 0),
                                  rngs=rngs)

    def __call__(self, wave: Array) -> Tuple[Array, List[Array]]:
        b, t = wave.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            wave = jnp.pad(wave, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        x = wave.reshape(b, t // self.period, self.period, 1)  # NHWC
        fmap = []
        for layer in self.convs:
            x = leaky_relu(layer(x))
            fmap.append(x)
        x = self.conv_post(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nnx.Module):
    def __init__(self, hp: Hparams, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("periods", "weight_norm")
        self.discriminators = nnx.List([
            DiscriminatorP(p, rngs=rngs) for p in hp.periods])

    def __call__(self, wave: Array):
        outs, fmaps = [], []
        for d in self.discriminators:
            o, f = d(wave)
            outs.append(o)
            fmaps.append(f)
        return outs, fmaps


class DiscriminatorS(nnx.Module):
    """Scale discriminator: 1-D grouped convs (``hfgan.py:229-256``)."""

    def __init__(self, *, rngs: nnx.Rngs):
        spec = [(1, 128, 15, 1, 7, 1), (128, 128, 41, 2, 20, 4),
                (128, 256, 41, 2, 20, 16), (256, 512, 41, 4, 20, 16),
                (512, 1024, 41, 4, 20, 16), (1024, 1024, 41, 1, 20, 16),
                (1024, 1024, 5, 1, 2, 1)]
        self.convs = nnx.List([
            WNConv1d(i, o, k, s, padding=p, groups=g, rngs=rngs)
            for i, o, k, s, p, g in spec])
        self.conv_post = WNConv1d(1024, 1, 3, 1, padding=1, rngs=rngs)

    def __call__(self, wave: Array):
        x = wave[..., None]  # (B, T, 1)
        fmap = []
        for layer in self.convs:
            x = leaky_relu(layer(x))
            fmap.append(x)
        x = self.conv_post(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


def avg_pool1d(x: Array, window: int = 4, stride: int = 2,
               padding: int = 2) -> Array:
    """torch AvgPool1d(count_include_pad=True) on (B, T)."""
    xp = jnp.pad(x, ((0, 0), (padding, padding)))
    s = jax.lax.reduce_window(xp, 0.0, jax.lax.add, (1, window),
                              (1, stride), "VALID")
    return s / window


class MultiScaleDiscriminator(nnx.Module):
    def __init__(self, hp: Hparams, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("num_scales", "weight_norm")
        self.discriminators = nnx.List([
            DiscriminatorS(rngs=rngs) for _ in range(hp.num_scales)])

    def __call__(self, wave: Array):
        outs, fmaps = [], []
        for i, d in enumerate(self.discriminators):
            if i != 0:
                wave = avg_pool1d(wave)
            o, f = d(wave)
            outs.append(o)
            fmaps.append(f)
        return outs, fmaps


class DiscriminatorR(nnx.Module):
    """Resolution discriminator: STFT-magnitude 2-D convs
    (``hfgan.py:284-348``)."""

    def __init__(self, resolution: Tuple[int, int, int], *, rngs: nnx.Rngs):
        self.resolution = tuple(resolution)
        self.convs = nnx.List([
            WNConv2d(1, 32, (3, 9), (1, 1), (1, 4), rngs=rngs),
            WNConv2d(32, 32, (3, 9), (1, 2), (1, 4), rngs=rngs),
            WNConv2d(32, 32, (3, 9), (1, 2), (1, 4), rngs=rngs),
            WNConv2d(32, 32, (3, 9), (1, 2), (1, 4), rngs=rngs),
            WNConv2d(32, 32, (3, 3), (1, 1), (1, 1), rngs=rngs),
        ])
        self.conv_post = WNConv2d(32, 1, (3, 3), (1, 1), (1, 1), rngs=rngs)

    def _spectrogram(self, wave: Array) -> Array:
        n_fft, hop, win = self.resolution
        pad = int((n_fft - hop) / 2)
        x = jnp.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = 1 + (x.shape[1] - n_fft) // hop
        idx = (np.arange(n_frames)[:, None] * hop
               + np.arange(n_fft)[None, :])
        frames = x[:, idx]
        window = np.zeros(n_fft, np.float32)
        left = (n_fft - win) // 2
        window[left: left + win] = hann_window(win)
        spec = jnp.fft.rfft(frames * jnp.asarray(window), n=n_fft)
        return jnp.abs(spec)  # (B, frames, bins)

    def __call__(self, wave: Array):
        x = self._spectrogram(wave.astype(jnp.float32))
        # torch layout (B, 1, bins... ) uses (freq=frames?) — the
        # reference feeds (B, 1, frames, bins); NHWC equivalent:
        x = x[..., None]
        fmap = []
        for layer in self.convs:
            x = leaky_relu(layer(x))
            fmap.append(x)
        x = self.conv_post(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiResolutionDiscriminator(nnx.Module):
    def __init__(self, hp: Hparams, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("resolutions", "weight_norm")
        self.discriminators = nnx.List([
            DiscriminatorR(tuple(r), rngs=rngs) for r in hp.resolutions])

    def __call__(self, wave: Array):
        outs, fmaps = [], []
        for d in self.discriminators:
            o, f = d(wave)
            outs.append(o)
            fmaps.append(f)
        return outs, fmaps


# ---------------------------------------------------------------- losses
def feature_loss(fmap_r, fmap_g) -> Array:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl.astype(jnp.float32)
                                     - gl.astype(jnp.float32)))
    return loss * 2.0


def discriminator_loss(real_outs, gen_outs) -> Array:
    loss = 0.0
    for dr, dg in zip(real_outs, gen_outs):
        loss += jnp.mean(jnp.square(1.0 - dr.astype(jnp.float32)))
        loss += jnp.mean(jnp.square(dg.astype(jnp.float32)))
    return loss


def generator_loss(disc_outs) -> Array:
    loss = 0.0
    for dg in disc_outs:
        loss += jnp.mean(jnp.square(1.0 - dg.astype(jnp.float32)))
    return loss
