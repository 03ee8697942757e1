"""Vocoder wrappers and pretrained-checkpoint loading.

Parity target: ``/root/reference/models/vocoder/vocoder.py``:
abstract ``Vocoder`` (match_spec/decode/from_pretrained), ``HiFiGAN``
wrapper (un-rescale mel → Generator, weight norm folded at load),
``HuBERTIO`` (HiFi-GAN + HuBERT token→mel).  The reference's ``MixedIO``
depends on an undefined ``SoundStreamHuBERT`` (dead code,
``vocoder.py:126-176``) and is intentionally not reproduced.

Checkpoint contract preserved: ``{path}/hp.yaml`` + ``{path}/last-cpt.*``
— native ``.npz`` (flat param paths) or the released torch ``.ckpt``
for the Generator, converted on load (weight-norm g/v included).
"""
from __future__ import annotations

import abc
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...core.masked import Masked
from ...hparams.hp import Hparams
from ...training.checkpoint import get_last_ckpt, load_compact
from .hfgan import Generator, WNConv1d, WNConvT1d
from .hubert import HuBERT


class Vocoder(abc.ABC):
    @abc.abstractmethod
    def match_spec(self, hp: Hparams) -> bool:
        ...

    @abc.abstractmethod
    def decode(self, signal: Masked) -> Masked:
        ...


# ----------------------------------------------------- torch conversion
def _to_np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t)


def _wn_keys(sd: dict, prefix: str):
    """Return (g, v, bias) arrays for a torch weight-normed conv under
    either the old (weight_g/weight_v) or parametrizations API."""
    if f"{prefix}.weight_g" in sd:
        g, v = sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"]
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = sd[f"{prefix}.parametrizations.weight.original0"]
        v = sd[f"{prefix}.parametrizations.weight.original1"]
    elif f"{prefix}.weight" in sd:  # weight norm already removed
        v = sd[f"{prefix}.weight"]
        g = None
    else:
        raise KeyError(f"no weight for {prefix}")
    bias = sd.get(f"{prefix}.bias")
    return g, v, bias


def _load_wn_conv1d(mod: WNConv1d, sd: dict, prefix: str) -> None:
    g, v, bias = _wn_keys(sd, prefix)
    v = _to_np(v).transpose(2, 1, 0)  # (out,in,k) -> (k,in,out)
    if g is None:
        mod.v[...] = jnp.asarray(v)
        mod.g[...] = jnp.squeeze(jnp.asarray(
            np.sqrt((v ** 2).sum(axis=(0, 1)))))
    else:
        mod.v[...] = jnp.asarray(v)
        mod.g[...] = jnp.asarray(_to_np(g).reshape(-1))
    if bias is not None:
        mod.bias[...] = jnp.asarray(_to_np(bias))


def _load_wn_convt1d(mod: WNConvT1d, sd: dict, prefix: str) -> None:
    g, v, bias = _wn_keys(sd, prefix)
    v = _to_np(v).transpose(2, 1, 0)  # (in,out,k) -> (k,out,in)
    if g is None:
        mod.v[...] = jnp.asarray(v)
        mod.g[...] = jnp.squeeze(jnp.asarray(
            np.sqrt((v ** 2).sum(axis=(0, 1)))))
    else:
        mod.v[...] = jnp.asarray(v)
        mod.g[...] = jnp.asarray(_to_np(g).reshape(-1))
    if bias is not None:
        mod.bias[...] = jnp.asarray(_to_np(bias))


def load_torch_generator(gen: Generator, state_dict: dict) -> None:
    """Map the reference Generator torch state_dict onto ours."""
    sd = {k: v for k, v in state_dict.items()}
    _load_wn_conv1d(gen.conv_pre, sd, "conv_pre")
    for i, up in enumerate(gen.ups):
        _load_wn_convt1d(up, sd, f"ups.{i}")
    for i, rb in enumerate(gen.resblocks):
        for j, c in enumerate(rb.convs1):
            _load_wn_conv1d(c, sd, f"resblocks.{i}.convs1.{j}")
        for j, c in enumerate(rb.convs2):
            _load_wn_conv1d(c, sd, f"resblocks.{i}.convs2.{j}")
    _load_wn_conv1d(gen.conv_post, sd, "conv_post")


def _load_ckpt_file(path: str) -> Optional[dict]:
    """Load a torch checkpoint file into a flat state_dict, if torch is
    available and the file is a torch archive."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


# ------------------------------------------------------------- wrappers
class HiFiGAN(Vocoder):
    """(``vocoder.py:35-67``)"""

    def __init__(self, hp: Hparams, hp_rescale: Optional[Hparams] = None,
                 rngs: Optional[nnx.Rngs] = None):
        self.hp = hp.feature
        self.full_hp = hp
        self.hp_rescale = hp_rescale
        self.model = Generator(hp.model.generator,
                               rngs=rngs or nnx.Rngs(0))
        self._jit_decode = None

    def match_spec(self, hp: Hparams) -> bool:
        return hp == self.hp

    def decode(self, signal: Masked) -> Masked:
        if self.hp_rescale is not None:
            signal = Masked(
                signal.value * self.hp_rescale.std + self.hp_rescale.mean,
                signal.lengths, 1).apply_mask()
        if self._jit_decode is None:
            gd, state = nnx.split(self.model)

            @jax.jit
            def _decode(state, sig):
                return nnx.merge(gd, state)(sig).apply_mask()

            self._jit_decode = _decode
        _, state = nnx.split(self.model)
        return self._jit_decode(state, signal)

    @classmethod
    def from_pretrained(cls, path: str, **kwargs) -> "HiFiGAN":
        hp = Hparams.from_yamlfile(os.path.join(path, "hp.yaml"))
        hp.check_arg_in_hparams("model", "feature")
        hp.model.check_arg_in_hparams("generator")
        voc = cls(hp, **kwargs)
        ckpt = _find_ckpt(path)
        if ckpt.endswith(".npz"):
            load_compact(voc.model, ckpt)
        else:
            load_torch_generator(voc.model, _load_ckpt_file(ckpt))
        voc.model.remove_weight_norm()
        return voc

    def save_pretrained(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        self.full_hp.save(os.path.join(path, "hp.yaml"))
        from ...training.checkpoint import save_compact
        save_compact(self.model, os.path.join(path, "last-cpt.npz"))


def _find_ckpt(path: str) -> str:
    for name in ("last-cpt.npz", "last-cpt.ckpt"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            return p
    return get_last_ckpt(path)


class HuBERTIO(Vocoder):
    """HiFi-GAN + HuBERT token→mel codec (``vocoder.py:70-123``)."""

    def __init__(self, hp: Hparams, hp_rescale: Optional[Hparams] = None,
                 rngs: Optional[nnx.Rngs] = None):
        self.vocoder = HiFiGAN.from_pretrained(hp.vocoder.path,
                                               hp_rescale=hp_rescale)
        self.hp = self.vocoder.hp
        self.full_hp = hp
        self.model = HuBERT(hp.model, self.hp.n_mels,
                            self.hp.sample_rate / self.hp.hop_length,
                            rngs=rngs or nnx.Rngs(0))
        self.hp_vq = Hparams(
            num_quantizers=1,
            codebook_size=hp.model.hubert.vocab_size,
            dim=hp.model.embedding_dim)

    def match_spec(self, hp: Hparams) -> bool:
        return hp == self.hp

    def decode(self, signal: Masked, key: Optional[jax.Array] = None,
               spkr: Optional[Masked] = None,
               f0: Optional[Masked] = None) -> Masked:
        key = key if key is not None else jax.random.PRNGKey(0)
        cond = self.model.encode(signal, spkr, f0)
        mel = self.model.decode(cond, key)
        return self.vocoder.decode(mel)

    @classmethod
    def from_pretrained(cls, path: str, **kwargs) -> "HuBERTIO":
        hp = Hparams.from_yamlfile(os.path.join(path, "hp.yaml"))
        hp.check_arg_in_hparams("model", "vocoder")
        voc = cls(hp, **kwargs)
        ckpt = _find_ckpt(path)
        if ckpt.endswith(".npz"):
            load_compact(voc.model, ckpt)
        else:
            from ..convert_torch import load_torch_hubert_decoder
            load_torch_hubert_decoder(voc.model, _load_ckpt_file(ckpt))
        return voc

    def save_pretrained(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        self.full_hp.save(os.path.join(path, "hp.yaml"))
        from ...training.checkpoint import save_compact
        save_compact(self.model, os.path.join(path, "last-cpt.npz"))

    def encode_mel(self, mel: Masked) -> Masked:
        return mel

    @property
    def sample_ratio(self) -> float:
        return self.model.sample_ratio
