"""HuBERT semantic-token → mel diffusion decoder.

Parity target: ``/root/reference/models/vocoder/hubert.py``:
token embedding (+optional f0 scalar channel, +speaker CNN embedding) →
``embed_encoder`` ResNet → conditional bottleneck-UNet diffusion over
mels; dedup mode adds a duration-predictor ResNet and a length
regulator.

TPU-first: the reference ``LengthRegulator`` builds ragged repeats in a
Python loop (``hubert.py:13-39``); here it's one vectorised
``cumsum + compare + take_along_axis`` over a static max length.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ...core.masked import Masked, resize_length
from ...hparams.hp import Hparams
from ...nn.conv import CNNStack, ResNet
from ...nn.diffusion import GaussianDiffusion1D
from ...nn.linear import Embedding, TimeAggregation
from ...nn.unet import ConditionalBottleNeckUNet

Array = jax.Array


def length_regulate(x: Array, durations: Array,
                    max_len: int) -> Masked:
    """Repeat-expand frames by integer durations into a static buffer.

    x: (B, S, C); durations: (B, S) int; output (B, max_len, C) with
    lengths = min(sum durations, max_len).
    """
    ends = jnp.cumsum(durations, axis=-1)              # (B, S)
    t = jnp.arange(max_len)
    idx = (ends[:, None, :] <= t[None, :, None]).sum(-1)   # (B, maxT)
    idx = jnp.clip(idx, 0, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[..., None], axis=1)
    lengths = jnp.minimum(ends[:, -1], max_len).astype(jnp.int32)
    return Masked(out, lengths, 1).apply_mask()


def interpolate_linear(x: Masked, ratio: float) -> Masked:
    """Linear time interpolation (torch F.interpolate align_corners=False
    semantics; ``utils/helpers.py:164-174``)."""
    b, t, c = x.value.shape
    s = int(t * ratio)
    scale = t / s
    pos = (jnp.arange(s) + 0.5) * scale - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t - 1)
    hi = jnp.clip(lo + 1, 0, t - 1)
    w = jnp.clip(pos - lo, 0.0, 1.0)[None, :, None]
    xv = x.value
    out = xv[:, lo] * (1.0 - w) + xv[:, hi] * w
    return Masked.from_lengths(out, resize_length(x.lengths, ratio))


class HuBERT(nnx.Module):
    def __init__(self, hp: Hparams, input_dim: Optional[int] = None,
                 mel_sample_rate: Optional[float] = None,
                 *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("hubert", "embed_encoder", "decoder")
        self.hp = hp
        self.input_dim = input_dim
        self.embedding = Embedding(hp.hubert.vocab_size, hp.embedding_dim,
                                   rngs=rngs)
        self.deduplicate = hp.hubert.deduplicate
        _embed_dim = hp.embedding_dim
        if hp.has("spkr"):
            self.spkr_net = CNNStack(hp.spkr, input_dim=input_dim,
                                     output_dim=hp.spkr.embedding_dim,
                                     rngs=rngs)
            self.spkr_pool = TimeAggregation()
            _embed_dim += hp.spkr.embedding_dim
        else:
            self.spkr_net = None
        self.f0 = True if hp.has("f0") else None
        if self.f0:
            _embed_dim += 1
        self.embed_encoder = ResNet(hp.embed_encoder,
                                    input_dim=_embed_dim,
                                    output_dim=hp.embedding_dim, rngs=rngs)
        if self.deduplicate:
            hp.check_arg_in_hparams("duration_predictor")
            self.dp = ResNet(hp.duration_predictor, input_dim=_embed_dim,
                             output_dim=1, rngs=rngs)
        denoiser = ConditionalBottleNeckUNet(hp.embedding_dim, input_dim,
                                             hp.decoder.cond_unet,
                                             rngs=rngs)
        self.decoder = GaussianDiffusion1D(denoiser, hp.decoder.diffusion)
        self.diff_scaling = hp.decoder.diffusion.get("input_scale", 1.0)
        self.interpolate_ratio = hp.get("interpolate_ratio", None)
        self.mel_sample_rate = mel_sample_rate

    @property
    def sample_ratio(self) -> float:
        return float(self.mel_sample_rate) / float(
            self.hp.hubert.sample_rate)

    def _spkr_embed(self, spkr: Masked) -> Array:
        return self.spkr_pool(self.spkr_net(spkr))

    def _cat_aux(self, x: Masked, spkr_emb: Optional[Array],
                 f0: Optional[Masked]) -> Masked:
        if self.f0 is not None and f0 is not None:
            x = x.cat(f0.value[:, : x.value.shape[1], None])
        if spkr_emb is not None:
            exp = jnp.broadcast_to(
                spkr_emb[:, None],
                (spkr_emb.shape[0], x.value.shape[1],
                 spkr_emb.shape[-1]))
            x = x.cat(exp)
        return x

    def __call__(self, x: Masked, x_mel: Masked, key: Array,
                 spkr: Optional[Masked] = None,
                 dedup_x: Optional[Masked] = None,
                 f0: Optional[Masked] = None) -> Dict[str, Masked]:
        """Training forward (``hubert.py:88-118``)."""
        emb = self.embedding(x)
        spkr_emb = self._spkr_embed(spkr) if self.spkr_net is not None \
            else None
        emb = self._cat_aux(emb, spkr_emb, f0)
        cond = self.embed_encoder(emb)
        if self.interpolate_ratio is not None:
            cond = interpolate_linear(cond, self.interpolate_ratio)
        scaled = dataclasses.replace(
            x_mel, value=x_mel.value / self.diff_scaling)
        diffusion_loss = self.decoder(scaled, cond, key)
        output = {"diffusion_loss": diffusion_loss, "condition": cond}
        if self.deduplicate:
            demb = self.embedding(dedup_x)
            if spkr_emb is not None:
                exp = jnp.broadcast_to(
                    spkr_emb[:, None],
                    (spkr_emb.shape[0], demb.value.shape[1],
                     spkr_emb.shape[-1]))
                demb = demb.cat(exp)
            output["duration_prediction"] = self.dp(demb)
        return output

    def encode(self, x: Masked,
               spkr: Optional[Masked] = None,
               f0: Optional[Masked] = None,
               max_len: Optional[int] = None) -> Masked:
        """tokens → diffusion condition (``hubert.py:137-168``)."""
        spkr_emb = self._spkr_embed(spkr) if self.spkr_net is not None \
            else None
        if self.deduplicate:
            demb = self.embedding(x)
            if spkr_emb is not None:
                exp = jnp.broadcast_to(
                    spkr_emb[:, None],
                    (spkr_emb.shape[0], demb.value.shape[1],
                     spkr_emb.shape[-1]))
                demb = demb.cat(exp)
            dp = self.dp(demb)
            duration = jnp.exp(dp.value.astype(jnp.float32)) - 1.0
            duration = jnp.ceil(jnp.maximum(duration, 1.0))
            duration = jnp.where(dp.expanded_mask(), duration, 0.0)
            duration = duration[..., 0].astype(jnp.int32)
            if max_len is None:
                max_len = int(demb.value.shape[1] * 4)
            out = length_regulate(demb.value, duration, max_len)
        else:
            emb = self.embedding(x)
            out = self._cat_aux(emb, spkr_emb, f0)
        out = self.embed_encoder(out)
        if self.interpolate_ratio is not None:
            out = interpolate_linear(out, self.interpolate_ratio)
        return out

    def decode(self, cond: Masked, key: Array) -> Masked:
        """condition → mel via diffusion (``hubert.py:120-135``)."""
        k_noise, k_samp = jax.random.split(key)
        intr = float(self.interpolate_ratio or 1.0)
        out_len = int(cond.value.shape[1] / intr * self.sample_ratio)
        noise = jax.random.normal(
            k_noise, (cond.value.shape[0], out_len, self.input_dim),
            jnp.float32)
        noise = Masked.from_lengths(
            noise, resize_length(cond.lengths, self.sample_ratio)
        ).apply_mask()
        out = self.decoder.sample(noise, cond.apply_mask(), k_samp)
        return dataclasses.replace(out,
                                   value=out.value * self.diff_scaling)
