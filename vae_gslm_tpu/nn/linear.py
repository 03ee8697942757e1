"""Dense layers, embeddings, FiLM and the Gaussian reparameterisation head.

Parity targets: ``/root/reference/modules/linear/layers.py`` (see
individual docstrings).  Layout is B T C throughout.  Matmuls run in the
active compute dtype (bf16 on TPU); distribution math (logstd, sampling)
runs fp32.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.masked import Masked
from ..core.precision import get_policy
from ..hparams.hp import Hparams
from .activations import identity
from .norms import get_norm

Array = jax.Array


def _uniform_init(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Dense(nnx.Module):
    """Linear layer with torch-style default init and policy-aware compute.

    Kernel stored (in_dim, out_dim) fp32; cast to compute dtype at use.
    ``quantize_int8()`` converts the kernel in place to int8 with
    per-output-channel scales — an inference-only mode that halves the
    weight HBM traffic of the AR decode step (weights dominate at small
    serving batches); the matmul dequantizes on-chip after the
    (half-size) read.
    """

    def __init__(self, in_dim: int, out_dim: int, bias: bool = True,
                 *, rngs: nnx.Rngs):
        bound = 1.0 / math.sqrt(in_dim)
        self.kernel = nnx.Param(
            _uniform_init(rngs.params(), (in_dim, out_dim), bound))
        self.bias = (nnx.Param(_uniform_init(rngs.params(), (out_dim,),
                                             bound))
                     if bias else None)
        self.kernel_scale = None
        self.in_dim, self.out_dim = in_dim, out_dim

    def quantize_int8(self) -> None:
        """In-place weight-only int8 (symmetric, per out column)."""
        w = self.kernel[...]
        if w.dtype == jnp.int8:
            return
        amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        self.kernel = nnx.Param(
            jnp.round(w / scale).astype(jnp.int8))
        # kernel_scale starts as (static) None; nnx requires an
        # explicit data() wrap when upgrading it to a Variable.
        self.kernel_scale = nnx.data(
            nnx.Variable(scale.astype(jnp.float32)))

    def __call__(self, x: Array) -> Array:
        dt = get_policy().compute_dtype
        w = self.kernel[...]
        if w.dtype == jnp.int8:
            w = w.astype(dt) * self.kernel_scale[...].astype(dt)
        else:
            w = w.astype(dt)
        y = jnp.matmul(x.astype(dt), w)
        if self.bias is not None:
            y = y + self.bias[...].astype(dt)
        return y

    def set_uniform(self, std: float, *, key: jax.Array) -> None:
        """Custom uniform re-init used by attention projections."""
        self.kernel[...] = _uniform_init(key, self.kernel[...].shape, std)


class Linear(nnx.Module):
    """Masked Linear with fused activation (``linear/layers.py:184-193``)."""

    def __init__(self, in_dim: int, out_dim: int, bias: bool = True,
                 activation: Callable = identity, *, rngs: nnx.Rngs):
        self.dense = Dense(in_dim, out_dim, bias=bias, rngs=rngs)
        self.activation = activation

    def __call__(self, x: Masked) -> Masked:
        return dataclasses.replace(
            x, value=self.activation(self.dense(x.value)))


class Embedding(nnx.Module):
    """Token embedding that zeroes padded positions
    (``linear/layers.py:150-157``)."""

    def __init__(self, vocab_size: int, dim: int, *, rngs: nnx.Rngs):
        self.table = nnx.Param(
            jax.random.normal(rngs.params(), (vocab_size, dim), jnp.float32))
        self.vocab_size, self.dim = vocab_size, dim

    def __call__(self, ids: Masked) -> Masked:
        dt = get_policy().compute_dtype
        emb = self.table[...].astype(dt)[ids.value.astype(jnp.int32)]
        return Masked(emb, ids.lengths, 1).apply_mask()

    def lookup(self, ids: Array) -> Array:
        dt = get_policy().compute_dtype
        return self.table[...].astype(dt)[ids.astype(jnp.int32)]


class RVQEmbedding(nnx.Module):
    """Sum of per-quantizer codebook embeddings
    (``linear/layers.py:160-181``)."""

    def __init__(self, num_quantizers: int, codebook_size: int, dim: int,
                 *, rngs: nnx.Rngs):
        self.tables = nnx.Param(jax.random.normal(
            rngs.params(), (num_quantizers, codebook_size, dim),
            jnp.float32))
        self.num_quantizers = num_quantizers

    def __call__(self, ids: Masked) -> Masked:
        # ids: (B, T, n) int
        dt = get_policy().compute_dtype
        idx = ids.value.astype(jnp.int32)
        tabs = self.tables[...].astype(dt)
        out = 0.0
        for i in range(self.num_quantizers):
            out = out + tabs[i][idx[..., i]]
        return Masked(out, ids.lengths, 1).apply_mask()


class LinearBlock(nnx.Module):
    """Residual MLP block (``linear/layers.py:196-234``)."""

    def __init__(self, hp: Hparams, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("hidden_dim", "activation", "norm")
        bias = hp.get("bias", True)
        from .activations import get_activation
        d = hp.hidden_dim
        self.linear1 = Dense(d, d, bias=bias, rngs=rngs)
        self.linear2 = Dense(d, d, bias=bias, rngs=rngs)
        self.norm1 = get_norm(d, hp.norm, rngs=rngs)
        self.norm2 = get_norm(d, hp.norm, rngs=rngs)
        self.activation = get_activation(hp.activation)

    def __call__(self, x: Masked) -> Masked:
        r = self.linear1(self.activation(self.norm1(x.value)))
        r = self.linear2(self.activation(self.norm2(r)))
        return Masked(x.value + r, x.lengths, 1).apply_mask()


class LinearLayerStack(nnx.Module):
    """Stack of LinearBlocks with optional in/out projections
    (``linear/layers.py:237-257``)."""

    def __init__(self, hp: Hparams, input_dim: Optional[int] = None,
                 output_dim: Optional[int] = None, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("num_layers", "layer")
        self.layers = nnx.List([
            LinearBlock(hp.layer, rngs=rngs) for _ in range(hp.num_layers)
        ])
        self.linear = (Dense(input_dim, hp.layer.hidden_dim, rngs=rngs)
                       if input_dim is not None else None)
        self.out_linear = (Dense(hp.layer.hidden_dim, output_dim, rngs=rngs)
                           if output_dim is not None else None)

    def __call__(self, x: Masked) -> Masked:
        if self.linear is not None:
            x = Masked(self.linear(x.value), x.lengths, 1).apply_mask()
        for layer in self.layers:
            x = layer(x)
        if self.out_linear is not None:
            x = Masked(self.out_linear(x.value), x.lengths, 1).apply_mask()
        return x


class TimeAggregation(nnx.Module):
    """Masked mean-pool over time (``linear/layers.py:260-262``)."""

    def __call__(self, x: Masked) -> Array:
        return x.time_mean()


class FiLM(nnx.Module):
    """Feature-wise linear modulation (``linear/layers.py:265-292``).

    ``time_first`` kept for API parity; with B T C canonical layout both
    variants are a Dense over the last axis.
    """

    def __init__(self, dim: int, bias: bool = True, time_first: bool = True,
                 in_dim: Optional[int] = None, *, rngs: nnx.Rngs):
        if in_dim is None:
            in_dim = dim
        self.linear = Dense(in_dim, dim * 2, bias=bias, rngs=rngs)
        self.dim = dim

    def __call__(self, x, c):
        xv = x.value if isinstance(x, Masked) else x
        cv = c.value if isinstance(c, Masked) else c
        wb = self.linear(cv)
        weight, bias = wb[..., : self.dim], wb[..., self.dim:]
        y = weight * xv + bias
        if isinstance(x, Masked):
            return dataclasses.replace(x, value=y)
        return y


@dataclasses.dataclass
class GaussianOutput:
    mean: Masked
    logstd: Masked
    sample: Masked


class GaussianParameterize(nnx.Module):
    """Mean/logstd heads + reparameterised sampling
    (``linear/layers.py:54-147``).

    Used both as the VAE posterior head q(z|x) and the AR prior head
    p(z_t|z_<t).  Options: fixed ``std``, sigmoid-bounded ``std_range``,
    ``total_std`` renormalisation, truncated-normal noise, L2-normalised
    or fixed ``mean``, relu/tanh mean squashing.
    """

    def __init__(self, in_dim: int, dim: int, bias: bool = True,
                 std: Optional[float] = None,
                 std_range: Optional[Tuple[float, float]] = None,
                 truncated_norm: Optional[Tuple[float, float]] = None,
                 total_std: Optional[float] = None,
                 use_tanh: bool = False, use_relu: bool = False,
                 normalization: bool = False,
                 mean: Optional[float] = None, *, rngs: nnx.Rngs):
        self._mean = mean
        self.dim = dim
        self.mean_head = (Dense(in_dim, dim, bias=bias, rngs=rngs)
                          if mean is None else None)
        self.std = std
        self.logstd_head = (Dense(in_dim, dim, bias=bias, rngs=rngs)
                            if std is None else None)
        if std_range is not None:
            assert std is None and len(std_range) == 2
        self.std_range = std_range
        self.total_std = total_std
        if total_std is not None:
            assert std is None and std_range is None
        self.truncated_norm = truncated_norm
        self.use_tanh = use_tanh
        self.use_relu = use_relu
        self.normalization = normalization

    def _stats(self, xv: Array):
        if self.mean_head is not None:
            mean = self.mean_head(xv).astype(jnp.float32)
        else:
            mean = jnp.full(xv.shape[:-1] + (self.dim,), self._mean,
                            jnp.float32)
        if self.normalization:
            mean = mean / jnp.maximum(
                jnp.linalg.norm(mean, axis=-1, keepdims=True), 1e-12)
        if self.use_relu:
            mean = jax.nn.relu(mean)
        if self.use_tanh:
            mean = jnp.tanh(mean) * 0.5
        if self.logstd_head is not None:
            logstd = self.logstd_head(xv).astype(jnp.float32)
            if self.std_range is not None:
                _max, _min = self.std_range
                std = jax.nn.sigmoid(logstd) * (_max - _min) + _min
                logstd = jnp.log(std)
        else:
            logstd = jnp.full_like(mean, math.log(self.std))
        if self.total_std is not None:
            std = jnp.exp(logstd)
            std = std / std.sum(-1, keepdims=True)
            std = std * self.total_std * std.shape[-1]
            logstd = jnp.log(std)
        return mean, logstd

    def __call__(self, x: Masked, key: jax.Array,
                 temperature: float = 1.0,
                 truncated_norm: Optional[Tuple[float, float]] = None
                 ) -> GaussianOutput:
        mean, logstd = self._stats(x.value)
        tn = truncated_norm if truncated_norm is not None \
            else self.truncated_norm
        if tn is not None:
            noise = jax.random.truncated_normal(
                key, tn[0], tn[1], mean.shape, jnp.float32)
        else:
            noise = jax.random.normal(key, mean.shape, jnp.float32)
        std = jnp.exp(logstd)
        sample = mean + noise * std * temperature
        return GaussianOutput(
            mean=Masked(mean, x.lengths, 1),
            logstd=Masked(logstd, x.lengths, 1),
            sample=Masked(sample, x.lengths, 1),
        )


class GumbelSoftMaxParameterize(nnx.Module):
    """Straight-through Gumbel-softmax head (``linear/layers.py:13-51``)."""

    def __init__(self, in_dim: int, num_codebooks: int, codebook_dim: int,
                 temperature: float = 1.0, *, rngs: nnx.Rngs):
        self.in_dim = in_dim
        self.in_linear = Dense(in_dim, num_codebooks, bias=False, rngs=rngs)
        self.encode_linear = Dense(num_codebooks, codebook_dim, bias=False,
                                   rngs=rngs)
        self.temperature = temperature

    def __call__(self, x: Masked, key: jax.Array,
                 temperature: Optional[float] = None):
        logits = self.in_linear(x.value).astype(jnp.float32)
        logits = logits / math.sqrt(self.in_dim)
        if temperature is None:
            temperature = self.temperature
        u = jax.random.uniform(key, logits.shape, jnp.float32)
        eps = 1e-20
        gumbel = -jnp.log(-jnp.log(u + eps) + eps)
        y = jax.nn.softmax((logits + gumbel) / temperature, axis=-1)
        ind = jnp.argmax(y, axis=-1)
        y_hard = jax.nn.one_hot(ind, y.shape[-1], dtype=y.dtype)
        y_st = y + jax.lax.stop_gradient(y_hard - y)
        output = self.encode_linear(y_st)
        return dict(
            logits=Masked(logits, x.lengths, 1).apply_mask(-1000.0),
            output=Masked(output, x.lengths, 1).apply_mask(),
            gumbel_prob=Masked(y, x.lengths, 1).apply_mask(),
        )
