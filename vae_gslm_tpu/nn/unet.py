"""Conditional denoiser networks for the diffusion decoder.

Parity target: ``/root/reference/modules/diffusion/unet.py``:
  * ``TimeEmbedding``: SinCos table lookup → MLP.
  * ``ConditionalUNet``: cond ResNet over [cond, time] + noise linear +
    FiLM/concat-conditional ResNet.
  * ``ConditionalBottleNeckUNet``: linear cond projection +
    ``BottleNeckResNet(x, c, t)`` — the variant used by the vae-gslm
    config (``configs/train/speech/vae-gslm.yaml:71``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.masked import Masked
from ..hparams.hp import Hparams
from .activations import get_activation
from .conv import BottleNeckResNet, ResNet
from .linear import Dense
from .positions import SinCos

Array = jax.Array


class TimeEmbedding(nnx.Module):
    """SinCos(t) → Linear → act → Linear (``unet.py:10-26``)."""

    def __init__(self, hp: Hparams, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("activation", "maxpos", "dim")
        bias = hp.get("bias", True)
        self.lin1 = Dense(hp.dim, hp.dim, bias=bias, rngs=rngs)
        self.lin2 = Dense(hp.dim, hp.dim, bias=bias, rngs=rngs)
        self.act = get_activation(hp.activation)
        self.embedding = SinCos(hp.dim, maxpos=hp.maxpos)
        self.dim = hp.dim

    def __call__(self, t: Array) -> Array:
        emb = self.embedding.get(t)
        return self.lin2(self.act(self.lin1(emb)))


class ConditionalUNet(nnx.Module):
    """cond ResNet + conditional ResNet denoiser (``unet.py:29-64``)."""

    def __init__(self, cond_dim: int, noise_dim: int, hp: Hparams,
                 *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("cond_net", "unet", "time_embedding")
        assert not hp.unet.has("resample_rates")
        self.cond_net = ResNet(hp.cond_net,
                               input_dim=cond_dim + hp.time_embedding.dim,
                               output_dim=hp.unet.layer.hidden_channels,
                               rngs=rngs)
        self.time_embedding = TimeEmbedding(hp.time_embedding, rngs=rngs)
        self.noise_linear = Dense(noise_dim, hp.unet.layer.in_channels,
                                  rngs=rngs)
        self.unet = ResNet(hp.unet, output_dim=noise_dim, conditional=True,
                           rngs=rngs)

    def __call__(self, noise: Masked, t: Array, cond: Masked) -> Masked:
        te = self.time_embedding(t)[:, None]
        te = jnp.broadcast_to(te, (cond.value.shape[0],
                                   cond.value.shape[1], te.shape[-1]))
        c = Masked(
            jnp.concatenate([cond.value, te.astype(cond.value.dtype)], -1),
            cond.lengths, 1).apply_mask()
        c = self.cond_net(c)
        n = Masked(self.noise_linear(noise.value), noise.lengths,
                   1).apply_mask()
        return self.unet(n, c)

    @property
    def sample_ratio(self) -> float:
        return self.cond_net.sample_ratio


class ConditionalBottleNeckUNet(nnx.Module):
    """Linear cond proj + BottleNeckResNet(x, c, t) (``unet.py:67-93``)."""

    def __init__(self, cond_dim: int, noise_dim: int, hp: Hparams,
                 *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("unet", "time_embedding")
        hp.unet.check_arg_in_hparams("conditional")
        hp.unet.time_dim = hp.time_embedding.dim
        self.cond_net = Dense(cond_dim, hp.unet.condition_dim, rngs=rngs)
        self.time_embedding = TimeEmbedding(hp.time_embedding, rngs=rngs)
        self.unet = BottleNeckResNet(hp.unet, input_dim=noise_dim,
                                     output_dim=noise_dim, rngs=rngs)

    def __call__(self, noise: Masked, t: Array, cond: Masked) -> Masked:
        te = self.time_embedding(t)
        c = Masked(self.cond_net(cond.value), cond.lengths, 1).apply_mask()
        return self.unet(noise, c, te)

    @property
    def sample_ratio(self) -> float:
        return self.unet.sample_ratio
