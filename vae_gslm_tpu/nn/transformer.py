"""Transformer blocks and stack with shared RPE and KV-cache decode.

Parity target: ``/root/reference/modules/transformer/layers.py``.
Pre-LN (default) or post-LN: self-attn → optional cross-attn → FFN;
the stack owns a single RPE whose bias is computed by the first layer
and reused by the rest (``layers.py:163-180``), and ``run`` returns
per-layer outputs / kv / attention like the reference.

TPU-first: ``decode`` runs one AR step over a preallocated list of
``LayerKVCache`` so the full sampling loop compiles into one
``lax.scan`` — no dynamic concatenation, no per-step retrace.
"""
from __future__ import annotations

from typing import Any, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.masked import Masked
from ..hparams.hp import Hparams
from .activations import get_activation
from .attention import CrossAttention, LayerKVCache, SelfAttention
from .linear import Dense
from .norms import get_norm
from .positions import get_positional_encoding

Array = jax.Array


class TransformerLayer(nnx.Module):
    """One block (``transformer/layers.py:14-93``)."""

    def __init__(self, hp: Hparams, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("ffd_size", "norm", "activation", "dim",
                                "self_attn")
        self.preln = hp.get("preln", True)
        self.self_attn = SelfAttention(hp.dim, hp.self_attn, rngs=rngs)
        if hp.has("cross_attn"):
            self.cross_attn = CrossAttention(hp.dim, hp.cross_attn,
                                             rngs=rngs)
            self.norm2 = get_norm(hp.dim, hp.norm, rngs=rngs)
        else:
            self.cross_attn = None
        bias = hp.get("bias", True)
        self.linear1 = Dense(hp.dim, hp.ffd_size, bias=bias, rngs=rngs)
        self.linear2 = Dense(hp.ffd_size, hp.dim, bias=bias, rngs=rngs)
        self.norm1 = get_norm(hp.dim, hp.norm, rngs=rngs)
        self.norm3 = get_norm(hp.dim, hp.norm, rngs=rngs)
        self.activation = get_activation(hp.activation)

    def _ffn(self, x: Array) -> Array:
        return self.linear2(self.activation(self.linear1(x)))

    def __call__(self, tgt: Masked,
                 memory: Optional[Masked] = None,
                 rpe_pair: Optional[Tuple[str, Any]] = None,
                 rpe_bias: Optional[Array] = None,
                 past_kv: Optional[Mapping] = None,
                 return_attn: bool = False,
                 return_kv: bool = False) -> Mapping[str, Any]:
        output: dict = {}
        lengths = tgt.lengths
        if self.preln:
            n_tgt = Masked(self.norm1(tgt.value), lengths, 1).apply_mask()
        else:
            n_tgt = tgt
        sa = self.self_attn(n_tgt, rpe_pair=rpe_pair, rpe_bias=rpe_bias,
                            past_kv=past_kv, return_attn=return_attn,
                            return_kv=return_kv)
        if "rpe_bias" in sa:
            output["rpe_bias"] = sa["rpe_bias"]
        x = tgt.value + sa["output"].value
        if not self.preln:
            x = self.norm1(x)
        if self.cross_attn is not None:
            n_x = self.norm2(x) if self.preln else x
            ca = self.cross_attn(Masked(n_x, lengths, 1).apply_mask(),
                                 memory, return_attn=return_attn)
            x = x + ca["output"].value
            if not self.preln:
                x = self.norm2(x)
        n_x = self.norm3(x) if self.preln else x
        x = x + self._ffn(n_x)
        if not self.preln:
            x = self.norm3(x)
        output["output"] = Masked(x, lengths, 1).apply_mask()
        if return_attn:
            output["self_attn"] = sa["attn"]
            if self.cross_attn is not None:
                output["cross_attn"] = ca["attn"]
        if return_kv:
            output["kv"] = sa["kv"]
        return output

    def decode(self, xv: Array, cache: LayerKVCache, pos: Array,
               rpe_pair=None,
               memory: Optional[Masked] = None,
               window: Optional[int] = None,
               return_attn: bool = False):
        """Pre/post-LN step over the static cache (no masking needed:
        decode positions are always valid).  With ``memory``,
        cross-attention runs statelessly against the full memory.
        With ``return_attn`` a third element is returned:
        ``{"self_attn": (B,H,S,max_len)[, "cross_attn":
        (B,H,S,T_mem)]}``."""
        attn: dict = {}

        def _self(x):
            res = self.self_attn.decode_step(x, cache, pos,
                                             rpe_pair=rpe_pair,
                                             window=window,
                                             return_attn=return_attn)
            if return_attn:
                attn["self_attn"] = res[2]
            return res[0], res[1]

        def _cross(x):
            ca = self.cross_attn(Masked.full(x), memory,
                                 return_attn=return_attn)
            if return_attn:
                attn["cross_attn"] = ca["attn"]
            return ca["output"].value

        if self.preln:
            h, cache = _self(self.norm1(xv))
            x = xv + h
            if self.cross_attn is not None and memory is not None:
                x = x + _cross(self.norm2(x))
            x = x + self._ffn(self.norm3(x))
        else:
            h, cache = _self(xv)
            x = self.norm1(xv + h)
            if self.cross_attn is not None and memory is not None:
                x = self.norm2(x + _cross(x))
            x = self.norm3(x + self._ffn(x))
        if return_attn:
            return x, cache, attn
        return x, cache


class TransformerLayerStack(nnx.Module):
    """Layer stack with optional in/out/memory projections and shared RPE
    (``transformer/layers.py:96-204``)."""

    def __init__(self, hp: Hparams, input_dim: Optional[int] = None,
                 output_dim: Optional[int] = None,
                 memory_dim: Optional[int] = None, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("num_layers", "layer")
        self.hp = hp
        self.layers = nnx.List([TransformerLayer(hp.layer, rngs=rngs)
                                for _ in range(hp.num_layers)])
        bias = hp.get("bias", True)
        self.linear = (Dense(input_dim, hp.layer.dim, bias=bias, rngs=rngs)
                       if input_dim is not None else None)
        self.is_cross_attn = hp.layer.has("cross_attn")
        self.memory_linear = (
            Dense(memory_dim, hp.layer.dim, bias=bias, rngs=rngs)
            if (self.is_cross_attn and memory_dim is not None) else None)
        self.out = (Dense(hp.layer.dim, output_dim, bias=bias, rngs=rngs)
                    if output_dim is not None else None)
        self.final_norm = (get_norm(hp.layer.dim, hp.layer.norm, rngs=rngs)
                           if hp.get("final_ln", True) else None)
        self.first_norm = (get_norm(hp.layer.dim, hp.layer.norm, rngs=rngs)
                           if hp.get("first_ln", False) else None)
        if hp.get("rpe", False):
            self.rpe_id = hp.rpe.identifier
            self.rpe = get_positional_encoding(
                self.rpe_id, hp.rpe, hp.layer.dim,
                hp.layer.self_attn.nheads, rngs=rngs)
        else:
            self.rpe_id, self.rpe = None, None

    @property
    def dim(self) -> int:
        return self.hp.layer.dim

    @property
    def num_layers(self) -> int:
        return self.hp.num_layers

    def _project_in(self, tgt: Masked,
                    memory: Optional[Masked]) -> Tuple[Masked,
                                                       Optional[Masked]]:
        out = tgt
        if self.linear is not None:
            out = Masked(self.linear(out.value), out.lengths,
                         1).apply_mask()
        if self.first_norm is not None:
            out = Masked(self.first_norm(out.value), out.lengths,
                         1).apply_mask()
        if self.memory_linear is not None and memory is not None:
            memory = Masked(self.memory_linear(memory.value),
                            memory.lengths, 1).apply_mask()
        return out, memory

    def run(self, tgt: Masked, memory: Optional[Masked] = None,
            past_kv: Optional[List] = None,
            return_attn: bool = False,
            return_kv: bool = False) -> Mapping[str, Any]:
        outputs: dict = {"output": []}
        if return_attn:
            outputs["self_attn"] = []
            if self.is_cross_attn:
                outputs["cross_attn"] = []
        if return_kv:
            outputs["kv"] = []
        if past_kv is None:
            past_kv = [None] * len(self.layers)
        output, memory = self._project_in(tgt, memory)
        rpe_pair = (self.rpe_id, self.rpe)
        rpe_bias = None
        output_layers = []
        for i, mod in enumerate(self.layers):
            res = mod(output, memory, rpe_pair=rpe_pair, rpe_bias=rpe_bias,
                      past_kv=past_kv[i], return_attn=return_attn,
                      return_kv=return_kv)
            if "rpe_bias" in res:
                rpe_pair = None
                rpe_bias = res["rpe_bias"]
            if return_attn:
                outputs["self_attn"].append(res["self_attn"])
                if self.is_cross_attn:
                    outputs["cross_attn"].append(res["cross_attn"])
            if return_kv:
                outputs["kv"].append(res["kv"])
            output = res["output"]
            output_layers.append(output)
        if self.final_norm is not None:
            output = Masked(self.final_norm(output.value), output.lengths,
                            1)
            output_layers.append(output)
        if self.out is not None:
            output = Masked(self.out(output.value), output.lengths,
                            1).apply_mask()
        outputs["output"] = output
        outputs["layers"] = output_layers
        return outputs

    def __call__(self, tgt: Masked,
                 memory: Optional[Masked] = None) -> Masked:
        return self.run(tgt, memory=memory)["output"]

    # -- static-cache decode ----------------------------------------------
    def init_cache(self, batch: int, max_len: int,
                   dtype=None) -> List[LayerKVCache]:
        return [layer.self_attn.init_cache(batch, max_len, dtype)
                for layer in self.layers]

    def project_memory(self, memory: Masked) -> Masked:
        """Apply the stack's memory projection once (pre-scan)."""
        if self.memory_linear is not None:
            memory = Masked(self.memory_linear(memory.value),
                            memory.lengths, 1).apply_mask()
        return memory

    def decode(self, xv: Array, caches: List[LayerKVCache], pos: Array,
               memory: Optional[Masked] = None,
               window: Optional[int] = None,
               return_attn: bool = False):
        """One AR step: xv (B, S, C) raw input frames at absolute
        positions [pos, pos+S); returns final hidden (B, S, C) and
        updated caches.  ``memory`` (already passed through
        ``project_memory``) enables per-step cross-attention (TTS).
        With ``return_attn`` a third element is returned with the
        per-layer maps stacked on a leading axis:
        ``{"self_attn": (L,B,H,S,max_len)[, "cross_attn": ...]}``."""
        if self.linear is not None:
            xv = self.linear(xv)
        if self.first_norm is not None:
            xv = self.first_norm(xv)
        rpe_pair = (self.rpe_id, self.rpe) if self.rpe is not None else None
        new_caches = []
        attns: List[dict] = []
        for layer, cache in zip(self.layers, caches):
            res = layer.decode(xv, cache, pos, rpe_pair=rpe_pair,
                               memory=memory, window=window,
                               return_attn=return_attn)
            if return_attn:
                xv, cache, a = res
                attns.append(a)
            else:
                xv, cache = res
            new_caches.append(cache)
        if self.final_norm is not None:
            xv = self.final_norm(xv)
        if self.out is not None:
            xv = self.out(xv)
        if return_attn:
            stacked = {k: jnp.stack([a[k] for a in attns])
                       for k in attns[0]}
            return xv, new_caches, stacked
        return xv, new_caches

    def set_uniform(self, std: float, *, key: jax.Array) -> None:
        if self.rpe_id == "T5RPE":
            self.rpe.set_uniform(std, key=key)

    def quantize_weights_int8(self) -> None:
        """Inference-only weight int8 (per-out-channel scales) for every
        projection in the stack — halves the ~2 bytes/param/step weight
        HBM traffic of AR decode, which dominates at small serving
        batches.  Irreversible on this instance; use on a sampling
        copy."""
        for layer in self.layers:
            layer.self_attn.in_proj.quantize_int8()
            layer.self_attn.out_proj.quantize_int8()
            layer.linear1.quantize_int8()
            layer.linear2.quantize_int8()
            if layer.cross_attn is not None:
                layer.cross_attn.q_proj.quantize_int8()
                layer.cross_attn.kv_proj.quantize_int8()
                layer.cross_attn.out_proj.quantize_int8()
        if self.linear is not None:
            self.linear.quantize_int8()
        if self.memory_linear is not None:
            self.memory_linear.quantize_int8()
        if self.out is not None:
            self.out.quantize_int8()
