"""Torch→JAX checkpoint conversion for the reference model families.

Loads reference compact checkpoints (``last-cpt.ckpt`` torch
state_dicts as produced by ``trainers/speech/lvtr.py:294-296`` /
``trainers/vocoder/hubert.py``) into our modules, so released artifacts
(``vae-gslm_ckpt``, ``hubert`` codec) work directly.

Layout conventions (each validated by the per-module torch-parity
tests in ``tests/test_nn_layers.py`` / ``test_models.py``):
  * Linear (out, in)          → Dense kernel (in, out):      ``.T``
  * Conv1d (out, in/g, k)     → (k, in/g, out):   transpose(2, 1, 0)
  * ConvT1d (in, out, k)      → (k, out, in):     transpose(2, 1, 0)
  * Embedding                 → direct
  * RMSNorm ``scale`` / LayerNorm-InstanceNorm ``weight``/``bias`` →
    direct.
Buffers (ALiBi tables, diffusion schedules, SinCos tables) are
recomputed, not loaded.
"""
from __future__ import annotations

import logging
from typing import Dict

import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t, np.float32)


class _SD:
    """state_dict view with prefix navigation + consumption tracking."""

    def __init__(self, sd: Dict, prefix: str = ""):
        self.sd = sd
        self.prefix = prefix
        self.used = set() if prefix == "" else None

    def sub(self, name: str) -> "_SD":
        child = _SD(self.sd, f"{self.prefix}{name}.")
        child.used = self.used if self.used is not None else None
        return child

    def __call__(self, name: str):
        key = self.prefix + name
        return _np(self.sd[key])

    def has(self, name: str) -> bool:
        return (self.prefix + name) in self.sd


# ---------------------------------------------------------------- leaves
def load_dense(mod, sd: _SD, name: str) -> None:
    mod.kernel[...] = jnp.asarray(sd(f"{name}.weight").T)
    if mod.bias is not None and sd.has(f"{name}.bias"):
        mod.bias[...] = jnp.asarray(sd(f"{name}.bias"))


def load_conv(mod, sd: _SD, name: str) -> None:
    mod.kernel[...] = jnp.asarray(
        sd(f"{name}.weight").transpose(2, 1, 0))
    if mod.bias is not None and sd.has(f"{name}.bias"):
        mod.bias[...] = jnp.asarray(sd(f"{name}.bias"))


def load_convT(mod, sd: _SD, name: str) -> None:
    mod.kernel[...] = jnp.asarray(
        sd(f"{name}.weight").transpose(2, 1, 0))
    if mod.bias is not None and sd.has(f"{name}.bias"):
        mod.bias[...] = jnp.asarray(sd(f"{name}.bias"))


def load_norm(mod, sd: _SD, name: str) -> None:
    from ..nn.norms import Identity, RMSNorm

    if isinstance(mod, Identity):
        return
    if isinstance(mod, RMSNorm):
        mod.scale[...] = jnp.asarray(sd(f"{name}.scale"))
        return
    mod.weight[...] = jnp.asarray(sd(f"{name}.weight"))
    mod.bias[...] = jnp.asarray(sd(f"{name}.bias"))


def load_film(mod, sd: _SD, name: str, time_first: bool) -> None:
    w = sd(f"{name}.linear.weight")
    if not time_first:          # torch Conv1d(in, 2dim, 1)
        w = w[:, :, 0]
    mod.linear.kernel[...] = jnp.asarray(w.T)
    if mod.linear.bias is not None and sd.has(f"{name}.linear.bias"):
        mod.linear.bias[...] = jnp.asarray(sd(f"{name}.linear.bias"))


def load_linear_wrap(mod, sd: _SD, name: str) -> None:
    """reference ``Linear`` module = .linear inside."""
    load_dense(mod.dense, sd, f"{name}.linear")


def load_gaussian(mod, sd: _SD, name: str) -> None:
    if mod.mean_head is not None:
        load_dense(mod.mean_head, sd, f"{name}.mean")
    if mod.logstd_head is not None:
        load_dense(mod.logstd_head, sd, f"{name}.logstd")


# ------------------------------------------------------------- conv stacks
def load_residual_block(mod, sd: _SD, name: str) -> None:
    load_norm(mod.norm, sd, f"{name}.norm")
    load_conv(mod.conv1, sd, f"{name}.conv1")
    load_conv(mod.conv2, sd, f"{name}.conv2")
    load_conv(mod.conv3, sd, f"{name}.conv3")
    if mod.shortcut_conv is not None:
        load_conv(mod.shortcut_conv, sd, f"{name}.shortcut.0")
    if mod.layer_scale is not None:
        mod.layer_scale.gamma[...] = jnp.asarray(
            sd(f"{name}.layer_scale.gamma").reshape(-1))
    if getattr(mod, "film", None) is not None \
            and sd.has(f"{name}.film.linear.weight"):
        load_film(mod.film, sd, f"{name}.film", time_first=False)
    if getattr(mod, "time_emb", None) is not None:
        load_dense(mod.time_emb, sd, f"{name}.time_emb")


def load_sample(mod, sd: _SD, name: str) -> None:
    from ..nn.conv import Downsample, Upsample

    load_norm(mod.norm, sd, f"{name}.norm")
    if isinstance(mod, Upsample):
        load_convT(mod.conv, sd, f"{name}.conv")
    elif isinstance(mod, Downsample):
        load_conv(mod.conv, sd, f"{name}.conv")


def load_bottleneck(mod, sd: _SD, name: str) -> None:
    for i, layer in enumerate(mod.layers):
        load_residual_block(layer, sd, f"{name}.layers.{i}")
    for i, s in enumerate(mod.samples):
        if s is not None:
            load_sample(s, sd, f"{name}.samples.{i}")
    # plain ResNet (conv/layers.py:298-383) has no skip connections
    for i, s in enumerate(getattr(mod, "skip_conv", ()) or ()):
        if s is not None:
            load_conv(s, sd, f"{name}.skip_conv.{i}")
    if mod.linear is not None:
        load_dense(mod.linear, sd, f"{name}.linear")
    if mod.out_linear is not None:
        load_dense(mod.out_linear, sd, f"{name}.out_linear")
    if mod.final_norm is not None:
        load_norm(mod.final_norm, sd, f"{name}.final_norm")
    if mod.first_norm is not None:
        load_norm(mod.first_norm, sd, f"{name}.first_norm")


load_resnet = load_bottleneck  # identical attribute structure


def load_cnnstack(mod, sd: _SD, name: str) -> None:
    from ..nn.conv import ConvTranspose1d

    for i, layer in enumerate(mod.layers):
        if isinstance(layer.conv, ConvTranspose1d):
            load_convT(layer.conv, sd, f"{name}.layers.{i}.conv")
        else:
            load_conv(layer.conv, sd, f"{name}.layers.{i}.conv")
        load_norm(layer.norm, sd, f"{name}.layers.{i}.norm")
    if mod.linear is not None:
        load_dense(mod.linear, sd, f"{name}.linear")
    if mod.out_linear is not None:
        load_dense(mod.out_linear, sd, f"{name}.out_linear")


# ------------------------------------------------------------ transformer
def load_transformer_stack(mod, sd: _SD, name: str) -> None:
    for i, layer in enumerate(mod.layers):
        p = f"{name}.layers.{i}"
        load_dense(layer.self_attn.in_proj, sd, f"{p}.self_attn.in_proj")
        load_dense(layer.self_attn.out_proj, sd,
                   f"{p}.self_attn.out_proj")
        if layer.cross_attn is not None:
            load_dense(layer.cross_attn.q_proj, sd,
                       f"{p}.cross_attn.q_proj")
            load_dense(layer.cross_attn.kv_proj, sd,
                       f"{p}.cross_attn.kv_proj")
            load_dense(layer.cross_attn.out_proj, sd,
                       f"{p}.cross_attn.out_proj")
            load_norm(layer.norm2, sd, f"{p}.norm2")
        load_dense(layer.linear1, sd, f"{p}.linear1")
        load_dense(layer.linear2, sd, f"{p}.linear2")
        load_norm(layer.norm1, sd, f"{p}.norm1")
        load_norm(layer.norm3, sd, f"{p}.norm3")
    if mod.linear is not None:
        load_dense(mod.linear, sd, f"{name}.linear")
    if mod.memory_linear is not None:
        load_dense(mod.memory_linear, sd, f"{name}.memory_linear")
    if mod.out is not None:
        load_dense(mod.out, sd, f"{name}.out")
    if mod.final_norm is not None:
        load_norm(mod.final_norm, sd, f"{name}.final_norm")
    if mod.first_norm is not None:
        load_norm(mod.first_norm, sd, f"{name}.first_norm")
    if mod.rpe_id == "T5RPE":
        mod.rpe.table[...] = jnp.asarray(
            sd(f"{name}.rpe.relative_attention_bias.weight"))


def load_flow(mod, sd: _SD, name: str) -> None:
    from ..nn.flow import ConvCoupling, LinearCoupling

    for i, layer in enumerate(mod.layers):
        p = f"{name}.layers.{i}"
        if isinstance(layer, LinearCoupling):
            load_dense(layer.linear1, sd, f"{p}.linear1")
            load_dense(layer.linear2, sd, f"{p}.linear2")
            load_norm(layer.norm, sd, f"{p}.norm")
            if layer.film is not None:
                # Flow FiLM is nn.Linear (time_first=True default,
                # flow/layers.py:29) unlike the conv blocks' Conv1d.
                load_film(layer.film, sd, f"{p}.film", time_first=True)
        elif isinstance(layer, ConvCoupling):
            load_conv(layer.conv1, sd, f"{p}.conv1")
            load_conv(layer.conv2, sd, f"{p}.conv2")
            load_norm(layer.norm, sd, f"{p}.norm")
        else:  # RQS spline
            load_dense(layer.linear1, sd, f"{p}.linear1")
            load_dense(layer.linear2, sd, f"{p}.linear2")
            load_norm(layer.norm, sd, f"{p}.norm")


def load_cond_bottleneck_unet(mod, sd: _SD, name: str) -> None:
    load_dense(mod.cond_net, sd, f"{name}.cond_net")
    load_dense(mod.time_embedding.lin1, sd,
               f"{name}.time_embedding.lin1")
    load_dense(mod.time_embedding.lin2, sd,
               f"{name}.time_embedding.lin2")
    load_bottleneck(mod.unet, sd, f"{name}.unet")


def load_cond_unet(mod, sd: _SD, name: str) -> None:
    load_resnet(mod.cond_net, sd, f"{name}.cond_net")
    load_dense(mod.time_embedding.lin1, sd,
               f"{name}.time_embedding.lin1")
    load_dense(mod.time_embedding.lin2, sd,
               f"{name}.time_embedding.lin2")
    load_dense(mod.noise_linear, sd, f"{name}.noise_linear")
    load_resnet(mod.unet, sd, f"{name}.unet")


# ---------------------------------------------------------------- models
def load_torch_lvtr(model, state_dict: Dict) -> None:
    """Reference LVTR state_dict → our LVTR.

    Reference structure (``models/speech/lvtr.py``): ``encoder.0/1``
    (conv stack + Gaussian head), token heads, ``transformer.0/1``
    (stack + prior head), ``transformer_flow``, ``decoder.model``
    (denoiser), ``utterance_encoder.0``.
    """
    from ..nn.conv import BottleNeckResNet, CNNStack
    from ..nn.unet import ConditionalBottleNeckUNet

    sd = _SD(state_dict)
    if isinstance(model.encoder_net, BottleNeckResNet):
        load_bottleneck(model.encoder_net, sd, "encoder.0")
    elif isinstance(model.encoder_net, CNNStack):
        load_cnnstack(model.encoder_net, sd, "encoder.0")
    else:
        load_resnet(model.encoder_net, sd, "encoder.0")
    load_gaussian(model.encoder_head, sd, "encoder.1")
    if model.use_tokens:
        model.token_embedding.table[...] = jnp.asarray(
            sd("token_embedding.weight"))
        load_linear_wrap(model.token_predictor, sd, "token_predictor")
        load_linear_wrap(model.token_fuser, sd, "token_fuser")
        load_linear_wrap(model.token_spliter, sd, "token_spliter")
        load_linear_wrap(model.q_spliter, sd, "q_spliter")
    load_transformer_stack(model.transformer, sd, "transformer.0")
    load_gaussian(model.prior_head, sd, "transformer.1")
    if model.transformer_flow is not None:
        load_flow(model.transformer_flow, sd, "transformer_flow")
    if isinstance(model.decoder.model, ConditionalBottleNeckUNet):
        load_cond_bottleneck_unet(model.decoder.model, sd,
                                  "decoder.model")
    else:
        load_cond_unet(model.decoder.model, sd, "decoder.model")
    if model.utterance_net is not None:
        load_cnnstack(model.utterance_net, sd, "utterance_encoder.0")


def load_torch_hubert_decoder(model, state_dict: Dict) -> None:
    """Reference token→mel HuBERT decoder state_dict → ours
    (``models/vocoder/hubert.py``)."""
    sd = _SD(state_dict)
    model.embedding.table[...] = jnp.asarray(sd("embedding.weight"))
    load_resnet(model.embed_encoder, sd, "embed_encoder")
    if model.spkr_net is not None:
        load_cnnstack(model.spkr_net, sd, "spkr_encoder.0")
    if model.deduplicate:
        load_resnet(model.dp, sd, "dp")
    load_cond_bottleneck_unet(model.decoder.model, sd, "decoder.model")


def load_torch_lvtts(model, state_dict: Dict) -> None:
    """Reference LVTTS state_dict → ours (superset of LVTR keys)."""
    load_torch_lvtr(model, state_dict)
    sd = _SD(state_dict)
    model.text_embedding.table[...] = jnp.asarray(
        sd("text_encoder.0.weight"))
    load_transformer_stack(model.text_encoder, sd, "text_encoder.1")
    # eos head: LinearLayerStack
    eos = model.eos_head
    for i, blk in enumerate(eos.layers):
        p = f"eos_head.layers.{i}"
        load_dense(blk.linear1, sd, f"{p}.linear1")
        load_dense(blk.linear2, sd, f"{p}.linear2")
        load_norm(blk.norm1, sd, f"{p}.norm1")
        load_norm(blk.norm2, sd, f"{p}.norm2")
    if eos.linear is not None:
        load_dense(eos.linear, sd, "eos_head.linear")
    if eos.out_linear is not None:
        load_dense(eos.out_linear, sd, "eos_head.out_linear")
    load_bottleneck(model.spkr_encoder, sd, "spkr_encoder.0")
    load_film(model.spkr_film, sd, "spkr_film", time_first=True)


# ------------------------------------------------------------ export side
# Inverse mapping: our params → reference-keyed torch-layout arrays.
# Used for round-trip validation of the converter and to export trained
# checkpoints back to the reference format.
def _x_dense(out, mod, name):
    out[f"{name}.weight"] = np.asarray(mod.kernel[...]).T
    if mod.bias is not None:
        out[f"{name}.bias"] = np.asarray(mod.bias[...])


def _x_conv(out, mod, name):
    out[f"{name}.weight"] = np.asarray(
        mod.kernel[...]).transpose(2, 1, 0)
    if mod.bias is not None:
        out[f"{name}.bias"] = np.asarray(mod.bias[...])


def _x_norm(out, mod, name):
    from ..nn.norms import Identity, RMSNorm

    if isinstance(mod, Identity):
        return
    if isinstance(mod, RMSNorm):
        out[f"{name}.scale"] = np.asarray(mod.scale[...])
        return
    out[f"{name}.weight"] = np.asarray(mod.weight[...])
    out[f"{name}.bias"] = np.asarray(mod.bias[...])


def _x_film(out, mod, name, time_first):
    w = np.asarray(mod.linear.kernel[...]).T
    if not time_first:
        w = w[:, :, None]
    out[f"{name}.linear.weight"] = w
    if mod.linear.bias is not None:
        out[f"{name}.linear.bias"] = np.asarray(mod.linear.bias[...])


def _x_linear_wrap(out, mod, name):
    _x_dense(out, mod.dense, f"{name}.linear")


def _x_gaussian(out, mod, name):
    if mod.mean_head is not None:
        _x_dense(out, mod.mean_head, f"{name}.mean")
    if mod.logstd_head is not None:
        _x_dense(out, mod.logstd_head, f"{name}.logstd")


def _x_residual_block(out, mod, name):
    _x_norm(out, mod.norm, f"{name}.norm")
    _x_conv(out, mod.conv1, f"{name}.conv1")
    _x_conv(out, mod.conv2, f"{name}.conv2")
    _x_conv(out, mod.conv3, f"{name}.conv3")
    if mod.shortcut_conv is not None:
        _x_conv(out, mod.shortcut_conv, f"{name}.shortcut.0")
    if mod.layer_scale is not None:
        out[f"{name}.layer_scale.gamma"] = np.asarray(
            mod.layer_scale.gamma[...]).reshape(1, -1, 1)
    if getattr(mod, "film", None) is not None:
        _x_film(out, mod.film, f"{name}.film", time_first=False)
    if getattr(mod, "time_emb", None) is not None:
        _x_dense(out, mod.time_emb, f"{name}.time_emb")


def _x_sample(out, mod, name):
    _x_norm(out, mod.norm, f"{name}.norm")
    _x_conv(out, mod.conv, f"{name}.conv")


def _x_bottleneck(out, mod, name):
    for i, layer in enumerate(mod.layers):
        _x_residual_block(out, layer, f"{name}.layers.{i}")
    for i, s in enumerate(mod.samples):
        if s is not None:
            _x_sample(out, s, f"{name}.samples.{i}")
    for i, s in enumerate(getattr(mod, "skip_conv", ()) or ()):
        if s is not None:
            _x_conv(out, s, f"{name}.skip_conv.{i}")
    if mod.linear is not None:
        _x_dense(out, mod.linear, f"{name}.linear")
    if mod.out_linear is not None:
        _x_dense(out, mod.out_linear, f"{name}.out_linear")
    if mod.final_norm is not None:
        _x_norm(out, mod.final_norm, f"{name}.final_norm")
    if mod.first_norm is not None:
        _x_norm(out, mod.first_norm, f"{name}.first_norm")


def _x_cnnstack(out, mod, name):
    for i, layer in enumerate(mod.layers):
        _x_conv(out, layer.conv, f"{name}.layers.{i}.conv")
        _x_norm(out, layer.norm, f"{name}.layers.{i}.norm")
    if mod.linear is not None:
        _x_dense(out, mod.linear, f"{name}.linear")
    if mod.out_linear is not None:
        _x_dense(out, mod.out_linear, f"{name}.out_linear")


def _x_transformer_stack(out, mod, name):
    for i, layer in enumerate(mod.layers):
        p = f"{name}.layers.{i}"
        _x_dense(out, layer.self_attn.in_proj, f"{p}.self_attn.in_proj")
        _x_dense(out, layer.self_attn.out_proj,
                 f"{p}.self_attn.out_proj")
        if layer.cross_attn is not None:
            _x_dense(out, layer.cross_attn.q_proj,
                     f"{p}.cross_attn.q_proj")
            _x_dense(out, layer.cross_attn.kv_proj,
                     f"{p}.cross_attn.kv_proj")
            _x_dense(out, layer.cross_attn.out_proj,
                     f"{p}.cross_attn.out_proj")
            _x_norm(out, layer.norm2, f"{p}.norm2")
        _x_dense(out, layer.linear1, f"{p}.linear1")
        _x_dense(out, layer.linear2, f"{p}.linear2")
        _x_norm(out, layer.norm1, f"{p}.norm1")
        _x_norm(out, layer.norm3, f"{p}.norm3")
    if mod.linear is not None:
        _x_dense(out, mod.linear, f"{name}.linear")
    if mod.memory_linear is not None:
        _x_dense(out, mod.memory_linear, f"{name}.memory_linear")
    if mod.out is not None:
        _x_dense(out, mod.out, f"{name}.out")
    if mod.final_norm is not None:
        _x_norm(out, mod.final_norm, f"{name}.final_norm")
    if mod.first_norm is not None:
        _x_norm(out, mod.first_norm, f"{name}.first_norm")
    if mod.rpe_id == "T5RPE":
        out[f"{name}.rpe.relative_attention_bias.weight"] = np.asarray(
            mod.rpe.table[...])


def _x_flow(out, mod, name):
    from ..nn.flow import ConvCoupling, LinearCoupling

    for i, layer in enumerate(mod.layers):
        p = f"{name}.layers.{i}"
        if isinstance(layer, LinearCoupling):
            _x_dense(out, layer.linear1, f"{p}.linear1")
            _x_dense(out, layer.linear2, f"{p}.linear2")
            _x_norm(out, layer.norm, f"{p}.norm")
            if layer.film is not None:
                _x_film(out, layer.film, f"{p}.film", time_first=True)
        elif isinstance(layer, ConvCoupling):
            _x_conv(out, layer.conv1, f"{p}.conv1")
            _x_conv(out, layer.conv2, f"{p}.conv2")
            _x_norm(out, layer.norm, f"{p}.norm")
        else:
            _x_dense(out, layer.linear1, f"{p}.linear1")
            _x_dense(out, layer.linear2, f"{p}.linear2")
            _x_norm(out, layer.norm, f"{p}.norm")


def _x_cond_bottleneck_unet(out, mod, name):
    _x_dense(out, mod.cond_net, f"{name}.cond_net")
    _x_dense(out, mod.time_embedding.lin1, f"{name}.time_embedding.lin1")
    _x_dense(out, mod.time_embedding.lin2, f"{name}.time_embedding.lin2")
    _x_bottleneck(out, mod.unet, f"{name}.unet")


def export_torch_lvtr(model) -> Dict[str, np.ndarray]:
    """Our LVTR params → reference-keyed torch-layout state_dict."""
    from ..nn.conv import BottleNeckResNet, CNNStack
    from ..nn.unet import ConditionalBottleNeckUNet

    out: Dict[str, np.ndarray] = {}
    if isinstance(model.encoder_net, BottleNeckResNet):
        _x_bottleneck(out, model.encoder_net, "encoder.0")
    elif isinstance(model.encoder_net, CNNStack):
        _x_cnnstack(out, model.encoder_net, "encoder.0")
    else:
        _x_bottleneck(out, model.encoder_net, "encoder.0")
    _x_gaussian(out, model.encoder_head, "encoder.1")
    if model.use_tokens:
        out["token_embedding.weight"] = np.asarray(
            model.token_embedding.table[...])
        _x_linear_wrap(out, model.token_predictor, "token_predictor")
        _x_linear_wrap(out, model.token_fuser, "token_fuser")
        _x_linear_wrap(out, model.token_spliter, "token_spliter")
        _x_linear_wrap(out, model.q_spliter, "q_spliter")
    _x_transformer_stack(out, model.transformer, "transformer.0")
    _x_gaussian(out, model.prior_head, "transformer.1")
    if model.transformer_flow is not None:
        _x_flow(out, model.transformer_flow, "transformer_flow")
    if isinstance(model.decoder.model, ConditionalBottleNeckUNet):
        _x_cond_bottleneck_unet(out, model.decoder.model,
                                "decoder.model")
    if model.utterance_net is not None:
        _x_cnnstack(out, model.utterance_net, "utterance_encoder.0")
    return out


def export_torch_hubert_decoder(model) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    out["embedding.weight"] = np.asarray(model.embedding.table[...])
    _x_bottleneck(out, model.embed_encoder, "embed_encoder")
    if model.spkr_net is not None:
        _x_cnnstack(out, model.spkr_net, "spkr_encoder.0")
    if model.deduplicate:
        _x_bottleneck(out, model.dp, "dp")
    _x_cond_bottleneck_unet(out, model.decoder.model, "decoder.model")
    return out


def load_torch_discrete_ar(model, state_dict: Dict) -> None:
    """Reference DiscreteAR state_dict → ours
    (``models/speech/discrete.py``: Sequential(embedding, stack))."""
    sd = _SD(state_dict)
    if model.single_vq:
        model.embedding.table[...] = jnp.asarray(
            sd("transformer.0.weight"))
    else:
        for i in range(model.embedding.num_quantizers):
            tab = np.asarray(model.embedding.tables[...])
            tab[i] = sd(f"transformer.0.embeddings.{i}.weight")
            model.embedding.tables[...] = jnp.asarray(tab)
    load_transformer_stack(model.transformer, sd, "transformer.1")
    if model.f0_dense is not None:
        load_dense(model.f0_dense, sd, "f0_dense")
    if not model.single_vq:
        arc = model.arc_transformer
        arc.pos_encoding[...] = jnp.asarray(sd("arc_transformer.pos_encoding"))
        arc.embedding.table[...] = jnp.asarray(
            sd("arc_transformer.embedding.weight"))
        load_transformer_stack(arc.transformer, sd,
                               "arc_transformer.transformer")
