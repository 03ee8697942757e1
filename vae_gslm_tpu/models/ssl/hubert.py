"""HuBERT speech encoder (JAX) for semantic tokenization.

Replaces the torch/HF ``HubertModel`` used by the reference tokenizer
(``/root/reference/scripts/hubert_kmeans.py:40-44``) with a TPU-native
port: conv feature extractor → feature projection → conv positional
embedding → transformer encoder (pre-LN "stable layer norm" variant for
hubert-large, post-LN for base).  Weights convert from a HF checkpoint
with :func:`convert_hf_state_dict` (weight-norm of the positional conv
folded at load — the encoder is frozen at tokenization time).

Mirrors HF semantics exactly (validated against a random HF model in
tests): conv strides (5,2,2,2,2,2,2) → 50 Hz frames, per-utterance
input normalisation is the caller's job (Wav2Vec2FeatureExtractor
default ``do_normalize=True``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...core.precision import get_policy

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: Sequence[int] = (512,) * 7
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"   # 'layer' (large) | 'group' (base)
    do_stable_layer_norm: bool = True  # True for large
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5

    @classmethod
    def large(cls) -> "HubertConfig":
        return cls()

    @classmethod
    def base(cls) -> "HubertConfig":
        return cls(hidden_size=768, num_hidden_layers=12,
                   num_attention_heads=12, intermediate_size=3072,
                   conv_bias=False, feat_extract_norm="group",
                   do_stable_layer_norm=False)

    @classmethod
    def from_hf(cls, config) -> "HubertConfig":
        return cls(
            hidden_size=config.hidden_size,
            num_hidden_layers=config.num_hidden_layers,
            num_attention_heads=config.num_attention_heads,
            intermediate_size=config.intermediate_size,
            conv_dim=tuple(config.conv_dim),
            conv_kernel=tuple(config.conv_kernel),
            conv_stride=tuple(config.conv_stride),
            conv_bias=config.conv_bias,
            feat_extract_norm=config.feat_extract_norm,
            do_stable_layer_norm=config.do_stable_layer_norm,
            num_conv_pos_embeddings=config.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=(
                config.num_conv_pos_embedding_groups),
            layer_norm_eps=config.layer_norm_eps)


def _zeros(shape):
    return nnx.Param(jnp.zeros(shape, jnp.float32))


def _ones(shape):
    return nnx.Param(jnp.ones(shape, jnp.float32))


class _LN(nnx.Module):
    def __init__(self, dim: int, eps: float):
        self.w = _ones((dim,))
        self.b = _zeros((dim,))
        self.eps = eps

    def __call__(self, x: Array) -> Array:
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (self.w[...] * y + self.b[...]).astype(x.dtype)


class _Dense(nnx.Module):
    def __init__(self, din: int, dout: int):
        self.w = _zeros((din, dout))
        self.b = _zeros((dout,))

    def __call__(self, x: Array) -> Array:
        dt = get_policy().compute_dtype
        return (x.astype(dt) @ self.w[...].astype(dt)
                + self.b[...].astype(dt))


class FeatureEncoder(nnx.Module):
    """Strided conv stack over raw waveform (NWC)."""

    def __init__(self, cfg: HubertConfig):
        self.cfg = cfg
        conv_w, conv_b, norms, meta = [], [], [], []
        in_ch = 1
        for i, (dim, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel,
                                            cfg.conv_stride)):
            conv_w.append(nnx.Param(jnp.zeros((k, in_ch, dim),
                                              jnp.float32)))
            conv_b.append(nnx.Param(jnp.zeros((dim,), jnp.float32))
                          if cfg.conv_bias else None)
            if cfg.feat_extract_norm == "layer":
                norms.append(_LN(dim, cfg.layer_norm_eps))
            elif i == 0:
                norms.append(_GroupNormAll(dim, cfg.layer_norm_eps))
            else:
                norms.append(None)
            meta.append((k, s))
            in_ch = dim
        self.conv_w = nnx.List(conv_w)
        self.conv_b = nnx.List(conv_b)
        self.norms = nnx.List(norms)
        self.meta = meta

    def __call__(self, wave: Array) -> Array:
        dt = get_policy().compute_dtype
        x = wave[..., None].astype(dt)  # (B, T, 1)
        for i, ((k, s), norm) in enumerate(zip(self.meta, self.norms)):
            w = self.conv_w[i][...].astype(dt)
            x = jax.lax.conv_general_dilated(
                x, w, (s,), [(0, 0)],
                dimension_numbers=("NWC", "WIO", "NWC"))
            if self.conv_b[i] is not None:
                x = x + self.conv_b[i][...].astype(dt)
            if norm is not None:
                x = norm(x)
            x = jax.nn.gelu(x, approximate=False)
        return x


class _GroupNormAll(nnx.Module):
    """GroupNorm(num_groups=C, C) as HF uses on conv layer 0 — per
    (batch, channel) stats over time."""

    def __init__(self, dim: int, eps: float):
        self.w = _ones((dim,))
        self.b = _zeros((dim,))
        self.eps = eps

    def __call__(self, x: Array) -> Array:
        xf = x.astype(jnp.float32)  # (B, T, C)
        mean = xf.mean(1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), 1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (self.w[...] * y + self.b[...]).astype(x.dtype)


class EncoderLayer(nnx.Module):
    def __init__(self, cfg: HubertConfig):
        d = cfg.hidden_size
        self.q = _Dense(d, d)
        self.k = _Dense(d, d)
        self.v = _Dense(d, d)
        self.o = _Dense(d, d)
        self.attn_ln = _LN(d, cfg.layer_norm_eps)
        self.ff1 = _Dense(d, cfg.intermediate_size)
        self.ff2 = _Dense(cfg.intermediate_size, d)
        self.final_ln = _LN(d, cfg.layer_norm_eps)
        self.nheads = cfg.num_attention_heads
        self.stable = cfg.do_stable_layer_norm
        self.d = d

    def _attn(self, x: Array, mask: Optional[Array]) -> Array:
        b, t, d = x.shape
        h = self.nheads
        hd = d // h
        q = self.q(x).reshape(b, t, h, hd)
        k = self.k(x).reshape(b, t, h, hd)
        v = self.v(x).reshape(b, t, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / np.sqrt(hd)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v,
                         preferred_element_type=jnp.float32)
        return self.o(out.astype(x.dtype).reshape(b, t, d))

    def _ff(self, x: Array) -> Array:
        return self.ff2(jax.nn.gelu(self.ff1(x), approximate=False))

    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        if self.stable:
            x = x + self._attn(self.attn_ln(x), mask)
            x = x + self._ff(self.final_ln(x))
        else:
            x = self.attn_ln(x + self._attn(x, mask))
            x = self.final_ln(x + self._ff(x))
        return x


class HubertEncoder(nnx.Module):
    def __init__(self, cfg: HubertConfig):
        self.cfg = cfg
        d = cfg.hidden_size
        self.feature_encoder = FeatureEncoder(cfg)
        self.fp_ln = _LN(cfg.conv_dim[-1], cfg.layer_norm_eps)
        self.fp_proj = _Dense(cfg.conv_dim[-1], d)
        k = cfg.num_conv_pos_embeddings
        g = cfg.num_conv_pos_embedding_groups
        self.pos_conv_w = _zeros((k, d // g, d))
        self.pos_conv_b = _zeros((d,))
        self.enc_ln = _LN(d, cfg.layer_norm_eps)
        self.layers = nnx.List([EncoderLayer(cfg)
                                for _ in range(cfg.num_hidden_layers)])

    def _pos_conv(self, x: Array) -> Array:
        cfg = self.cfg
        dt = x.dtype
        k = cfg.num_conv_pos_embeddings
        pad = k // 2
        y = jax.lax.conv_general_dilated(
            x, self.pos_conv_w[...].astype(dt), (1,), [(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=cfg.num_conv_pos_embedding_groups)
        y = y + self.pos_conv_b[...].astype(dt)
        if k % 2 == 0:
            y = y[:, :-1]
        return jax.nn.gelu(y, approximate=False)

    def frame_count(self, n_samples) -> int:
        """Output frames for an input length (conv stack arithmetic)."""
        n = n_samples
        for k, s in zip(self.cfg.conv_kernel, self.cfg.conv_stride):
            n = (n - k) // s + 1
        return n

    def __call__(self, wave: Array,
                 lengths: Optional[Array] = None) -> Array:
        """wave: (B, T) normalised waveform → (B, frames, d).

        With ``lengths``, padded frames are zeroed and masked out of
        attention (HF attention_mask semantics) so bucket-padded batches
        match unpadded runs up to pos-conv edge effects.
        """
        feats = self.feature_encoder(wave)
        mask = None
        if lengths is not None:
            n = lengths
            for k, s in zip(self.cfg.conv_kernel, self.cfg.conv_stride):
                n = (n - k) // s + 1
            pos = jnp.arange(feats.shape[1])
            mask = pos[None, :] < n[:, None]
            feats = jnp.where(mask[..., None], feats, 0.0)
        x = self.fp_proj(self.fp_ln(feats))
        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)
        if self.cfg.do_stable_layer_norm:
            x = x + self._pos_conv(x)
            x = self._run_layers(x, mask)
            x = self.enc_ln(x)
        else:
            x = x + self._pos_conv(x)
            x = self.enc_ln(x)
            x = self._run_layers(x, mask)
        return x.astype(jnp.float32)

    def _run_layers(self, x: Array, mask) -> Array:
        """``lax.scan`` over the layer stack: the identical layers are
        stacked into one pytree and a SINGLE compiled layer body runs
        L times — XLA compile time (the dominant cost of jitting the
        24-layer hubert-large in scripts/hubert_kmeans.py) and eager
        dispatch both become O(1) in depth, with bitwise-identical
        per-layer math.  ``VAE_GSLM_HUBERT_NO_SCAN=1`` restores the
        unrolled Python loop."""
        import os as _os

        if (len(self.layers) < 2
                or _os.environ.get("VAE_GSLM_HUBERT_NO_SCAN") == "1"):
            for layer in self.layers:
                x = layer(x, mask)
            return x
        import flax.nnx as _nnx

        graphdef, _ = _nnx.split(self.layers[0])
        states = [_nnx.state(l) for l in self.layers]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *states)

        def body(carry, s):
            layer = _nnx.merge(graphdef, s)
            return layer(carry, mask), None

        x, _ = jax.lax.scan(body, x, stacked)
        return x


def normalize_input(wave: np.ndarray) -> np.ndarray:
    """Wav2Vec2FeatureExtractor(do_normalize=True) semantics."""
    wave = np.asarray(wave, np.float32)
    mean = wave.mean(-1, keepdims=True)
    var = wave.var(-1, keepdims=True)
    return (wave - mean) / np.sqrt(var + 1e-7)


# ------------------------------------------------------------ conversion
def convert_hf_state_dict(model: HubertEncoder, sd: dict) -> None:
    """Load a HF HubertModel state_dict (torch tensors or numpy)."""

    def g(key):
        t = sd[key]
        return np.asarray(t.detach().cpu().numpy()
                          if hasattr(t, "detach") else t, np.float32)

    cfg = model.cfg
    for i in range(len(cfg.conv_dim)):
        pre = f"feature_extractor.conv_layers.{i}"
        model.feature_encoder.conv_w[i][...] = jnp.asarray(
            g(f"{pre}.conv.weight").transpose(2, 1, 0))
        if cfg.conv_bias and f"{pre}.conv.bias" in sd:
            model.feature_encoder.conv_b[i][...] = jnp.asarray(
                g(f"{pre}.conv.bias"))
        if f"{pre}.layer_norm.weight" in sd:
            norm = model.feature_encoder.norms[i]
            norm.w[...] = jnp.asarray(g(f"{pre}.layer_norm.weight"))
            norm.b[...] = jnp.asarray(g(f"{pre}.layer_norm.bias"))
    model.fp_ln.w[...] = jnp.asarray(
        g("feature_projection.layer_norm.weight"))
    model.fp_ln.b[...] = jnp.asarray(
        g("feature_projection.layer_norm.bias"))
    model.fp_proj.w[...] = jnp.asarray(
        g("feature_projection.projection.weight").T)
    model.fp_proj.b[...] = jnp.asarray(
        g("feature_projection.projection.bias"))
    # Positional conv: fold weight norm (dim=2) into a plain kernel.
    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.weight_g" in sd:
        wg, wv = g(f"{pc}.weight_g"), g(f"{pc}.weight_v")
    elif f"{pc}.parametrizations.weight.original0" in sd:
        wg = g(f"{pc}.parametrizations.weight.original0")
        wv = g(f"{pc}.parametrizations.weight.original1")
    else:
        wg, wv = None, g(f"{pc}.weight")
    if wg is not None:
        norm = np.sqrt((wv ** 2).sum(axis=(0, 1), keepdims=True) + 1e-12)
        w = wg * wv / norm          # (out, in/g, k), g is (1, 1, k)
    else:
        w = wv
    model.pos_conv_w[...] = jnp.asarray(w.transpose(2, 1, 0))
    model.pos_conv_b[...] = jnp.asarray(g(f"{pc}.bias"))
    model.enc_ln.w[...] = jnp.asarray(g("encoder.layer_norm.weight"))
    model.enc_ln.b[...] = jnp.asarray(g("encoder.layer_norm.bias"))
    for i, layer in enumerate(model.layers):
        pre = f"encoder.layers.{i}"
        for ours, theirs in ((layer.q, "attention.q_proj"),
                             (layer.k, "attention.k_proj"),
                             (layer.v, "attention.v_proj"),
                             (layer.o, "attention.out_proj"),
                             (layer.ff1, "feed_forward.intermediate_dense"),
                             (layer.ff2, "feed_forward.output_dense")):
            ours.w[...] = jnp.asarray(g(f"{pre}.{theirs}.weight").T)
            ours.b[...] = jnp.asarray(g(f"{pre}.{theirs}.bias"))
        layer.attn_ln.w[...] = jnp.asarray(g(f"{pre}.layer_norm.weight"))
        layer.attn_ln.b[...] = jnp.asarray(g(f"{pre}.layer_norm.bias"))
        layer.final_ln.w[...] = jnp.asarray(
            g(f"{pre}.final_layer_norm.weight"))
        layer.final_ln.b[...] = jnp.asarray(
            g(f"{pre}.final_layer_norm.bias"))


def from_hf_pretrained(path_or_name: str) -> HubertEncoder:
    """Build + load from a local HF checkpoint directory."""
    from transformers import HubertModel
    hf = HubertModel.from_pretrained(path_or_name)
    cfg = HubertConfig.from_hf(hf.config)
    model = HubertEncoder(cfg)
    convert_hf_state_dict(model, hf.state_dict())
    return model
