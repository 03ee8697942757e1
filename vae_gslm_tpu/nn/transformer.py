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

import math
from typing import Any, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.masked import Masked
from ..core.precision import get_policy
from ..hparams.hp import Hparams
from ..parallel.tp import constrain_seq
from .activations import get_activation
from .attention import (NEG_INF, CrossAttention, LayerKVCache,
                        SelfAttention)
from .linear import Dense
from .norms import get_norm
from .positions import get_positional_encoding

# Materialize the FFN activation before the second GEMM at training
# scale (see TransformerLayer._ffn).  Measured on chip
# (tools/bench_ffn_fusion.py, interleaved A/B): 98.7 -> 91.5 ms per
# flagship microbatch — XLA otherwise fuses the (B, T, ffd)
# packed-relu unpack INTO the linear2/dW GEMM fusions, where the conv
# emitter re-runs it per output tile (~8 VPU passes over 42 MB).
# Trace-time global, flipped by the probe tool for A/Bs.
_FFN_MATERIALIZE = True

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
        h = self.activation(self.linear1(x))
        if _FFN_MATERIALIZE and h.shape[-2] > 1:
            # Fence the (B, T, ffd) activation out of the linear2 GEMM
            # fusion so its elementwise chain is not re-run per output
            # tile (chip A/B in the module-level comment).  Decode
            # steps (T == 1) are left fused: the tile is tiny and the
            # serving paths are separately chip-tuned.
            h = jax.lax.optimization_barrier(h)
        return self.linear2(h)

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
        # Sequence-parallel residual stream: a no-op unless a
        # sequence_parallel() mesh is ambient (parallel/tp.py), in
        # which case the constraints below shard T over the model axis
        # for the norm/residual regions between the TP matmuls.
        x = constrain_seq(tgt.value + sa["output"].value)
        if not self.preln:
            x = self.norm1(x)
        if self.cross_attn is not None:
            n_x = self.norm2(x) if self.preln else x
            ca = self.cross_attn(Masked(n_x, lengths, 1).apply_mask(),
                                 memory, return_attn=return_attn)
            x = constrain_seq(x + ca["output"].value)
            if not self.preln:
                x = self.norm2(x)
        n_x = self.norm3(x) if self.preln else x
        x = constrain_seq(x + self._ffn(n_x))
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
        # remat: true — wrap each layer's training forward in
        # jax.checkpoint so the backward pass recomputes the block's
        # activations instead of storing them (the standard HBM trade
        # once batch*T*dim*layers outgrows the chip).  Decode paths and
        # attn/kv-returning calls are unaffected.
        self.remat = bool(hp.get("remat", False))

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
        # Pipeline-parallel trunk (parallel/pp.py): GPipe schedule
        # over an ambient ("data", "pipe") mesh when eligible — the
        # same stacked-weights constraints as the fused decode paths.
        from ..parallel import pp as pp_lib
        pp_ctx = pp_lib.active_pipeline()
        if pp_ctx is not None and memory is None \
                and not return_attn and not return_kv \
                and all(p is None for p in past_kv):
            mesh, n_micro = pp_ctx
            shape = dict(mesh.shape)
            b = tgt.value.shape[0]
            if (self.num_layers % shape["pipe"] == 0
                    and b % n_micro == 0
                    and (b // n_micro) % shape.get("data", 1) == 0
                    and self.supports_stacked_decode()):
                output, _ = self._project_in(tgt, None)
                value = pp_lib.pipeline_apply(
                    self, output.value, output.lengths, mesh, n_micro)
                output = Masked(value, tgt.lengths, 1).apply_mask()
                output_layers = [output]
                if self.final_norm is not None:
                    output = Masked(self.final_norm(output.value),
                                    output.lengths, 1)
                    output_layers.append(output)
                if self.out is not None:
                    output = Masked(self.out(output.value),
                                    output.lengths, 1).apply_mask()
                outputs["output"] = output
                outputs["layers"] = output_layers
                return outputs
        output, memory = self._project_in(tgt, memory)
        rpe_pair = (self.rpe_id, self.rpe)
        rpe_bias = None
        output_layers = []
        # Rematerialized per-layer call (training path only: the
        # attn/kv-returning and cached-decode variants keep their
        # activations).  Plain jax.checkpoint over an explicit
        # split/merge — the layer and shared-RPE state ride through as
        # checkpoint INPUTS, so gradients flow to every parameter
        # (including a learned T5 bias table) and nothing is baked into
        # the closure as a constant.
        use_remat = (self.remat and not return_attn and not return_kv)
        rpe_split = None
        if use_remat and self.rpe is not None:
            rpe_split = nnx.split(self.rpe)
        for i, mod in enumerate(self.layers):
            if use_remat and past_kv[i] is None:
                layer_def, layer_state = nnx.split(mod)
                use_pair = rpe_pair is not None
                rpe_state = rpe_split[1] if (use_pair and
                                             rpe_split is not None) \
                    else None

                def _layer_call(layer_state, rpe_state, out, mem, bias,
                                _def=layer_def, _use_pair=use_pair):
                    m = nnx.merge(_def, layer_state)
                    pair = None
                    if _use_pair:
                        rpe_mod = (nnx.merge(rpe_split[0], rpe_state)
                                   if rpe_state is not None else None)
                        pair = (self.rpe_id, rpe_mod)
                    return m(out, mem, rpe_pair=pair, rpe_bias=bias)

                res = jax.checkpoint(_layer_call)(
                    layer_state, rpe_state, output, memory, rpe_bias)
            else:
                res = mod(output, memory, rpe_pair=rpe_pair,
                          rpe_bias=rpe_bias,
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
                   dtype=None, packed: bool = False
                   ) -> List[LayerKVCache]:
        return [layer.self_attn.init_cache(batch, max_len, dtype,
                                           packed=packed)
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

    # -- fused (scan-over-layers) decode ------------------------------
    #
    # The per-layer Python loop in ``decode`` emits ~10 small HLO ops
    # per layer per AR step; at serving batch 8 the fixed per-op costs
    # dominate (~2.5 ms/step measured vs a ~0.65 ms weight-streaming
    # floor, tools/bench_decode.py).  The fused path stacks the
    # per-layer weights on a leading L axis once per sampling call and
    # runs the 16 layers as a single ``lax.scan`` whose carry holds the
    # residual stream and the stacked KV cache — one compiled body,
    # weights streamed back-to-back at full HBM rate.

    def supports_stacked_decode(self, allow_cross: bool = False) -> bool:
        from .norms import RMSNorm

        if self.rpe_id not in (None, "ALiBi"):
            return False
        for layer in self.layers:
            if not layer.preln:
                return False
            if layer.cross_attn is not None:
                # Cross-attention folds into the layer scan only when
                # its K/V of the (static) memory can be precomputed
                # (``build_stacked_memory``): no q/k RPE, RMSNorm.
                if not allow_cross:
                    return False
                if layer.cross_attn.rpe_id is not None:
                    return False
                if not isinstance(layer.norm2, RMSNorm):
                    return False
            if not isinstance(layer.norm1, RMSNorm):
                return False
            if not isinstance(layer.norm3, RMSNorm):
                return False
        return True

    def build_stacked_decode(self, allow_cross: bool = False):
        """Stack per-layer decode weights (L leading axis); returns
        None when this stack's config can't use the fused path.  Call
        once per jitted sampling program, outside the AR scan."""
        if not self.supports_stacked_decode(allow_cross):
            return None
        dt = get_policy().compute_dtype

        def dense(getter):
            mods = [getter(layer) for layer in self.layers]
            w = jnp.stack([m.kernel[...] for m in mods])
            entry = {}
            if w.dtype == jnp.int8:
                entry["w"] = w
                entry["scale"] = jnp.stack(
                    [m.kernel_scale[...] for m in mods]).astype(dt)
            else:
                entry["w"] = w.astype(dt)
            if mods[0].bias is not None:
                entry["b"] = jnp.stack(
                    [m.bias[...] for m in mods]).astype(dt)
            return entry

        out = {
            "n1": jnp.stack([la.norm1.scale[...]
                             for la in self.layers]),
            "n3": jnp.stack([la.norm3.scale[...]
                             for la in self.layers]),
            "qkv": dense(lambda la: la.self_attn.in_proj),
            "out": dense(lambda la: la.self_attn.out_proj),
            "ffn1": dense(lambda la: la.linear1),
            "ffn2": dense(lambda la: la.linear2),
        }
        if self.is_cross_attn and allow_cross:
            out["n2"] = jnp.stack([la.norm2.scale[...]
                                   for la in self.layers])
            out["cq"] = dense(lambda la: la.cross_attn.q_proj)
            out["cout"] = dense(lambda la: la.cross_attn.out_proj)
        return out

    def build_stacked_memory(self, memory: Masked) -> dict:
        """Per-layer cross-attention K/V of the (static, already
        ``project_memory``-ed) memory, computed ONCE per sampling call
        and streamed through the layer scan as xs — the per-step
        ``kv_proj`` recompute of the per-layer path
        (``TransformerLayer.decode``'s stateless cross-attention) is
        hoisted out of the AR loop entirely.  Returns ``{"mk", "mv":
        (L, B, H, Tm, Dh), "mask": (B, Tm) bool}``."""
        from .attention import _split_heads

        dt = get_policy().compute_dtype
        ks, vs = [], []
        for la in self.layers:
            kvv = la.cross_attn.kv_proj(memory.value)
            k, v = jnp.split(kvv, 2, axis=-1)
            nh = la.cross_attn.nheads
            ks.append(jnp.swapaxes(_split_heads(k, nh), 1, 2))
            vs.append(jnp.swapaxes(_split_heads(v, nh), 1, 2))
        tm = memory.value.shape[1]
        mask = jnp.arange(tm)[None, :] < memory.lengths[:, None]
        return {"mk": jnp.stack(ks).astype(dt),
                "mv": jnp.stack(vs).astype(dt), "mask": mask}

    def hybrid_cache_from_prefill(self, cache: LayerKVCache,
                                  prompt_len: int, total_len: int):
        """Convert a filled int8 stacked prefill cache (positions
        [0, prompt_len)) into the hybrid cold/tail layout of
        ``ops/fused_decode.py``: time-minor cold prefix holding the
        flushed multiple-of-128 positions + head-major 128-row tail
        holding the remainder.  Returns (HybridKVCache-dict, flushed)."""
        from ..ops.fused_decode import BLK, TAIL

        assert cache.quantized, "hybrid decode requires the int8 cache"
        nl, b, h, _, dh = cache.k.shape
        flushed = (prompt_len // TAIL) * TAIL
        max_flushed = (total_len // TAIL) * TAIL
        nb = max(max_flushed, BLK) // BLK
        nb_f = flushed // BLK

        def cold(x):
            # block-major (L,NB,B,H,Dh,BLK): contiguous (Dh,BLK)
            # planes per (b,h) -> 16 KB kernel DMA runs
            out = jnp.zeros((nl, nb, b, h, dh, BLK), jnp.int8)
            if not flushed:
                return out
            blk = x[:, :, :, :flushed].reshape(
                nl, b, h, nb_f, BLK, dh)
            return out.at[:, :nb_f].set(
                jnp.transpose(blk, (0, 3, 1, 2, 5, 4)))

        def cold_s(x):
            out = jnp.zeros((nl, nb, b, h, BLK), jnp.float32)
            if not flushed:
                return out
            return out.at[:, :nb_f].set(jnp.transpose(
                x[..., :flushed].reshape(nl, b, h, nb_f, BLK),
                (0, 3, 1, 2, 4)))

        def tail(x):
            n = prompt_len - flushed
            out = jnp.zeros((nl, b, h, TAIL, dh), jnp.int8)
            return out.at[:, :, :, :n].set(
                x[:, :, :, flushed:prompt_len])

        def tail_s(x):
            n = prompt_len - flushed
            out = jnp.zeros((nl, b, h, TAIL), jnp.float32)
            return out.at[..., :n].set(x[..., flushed:prompt_len])

        return {
            "k_cold": cold(cache.k), "v_cold": cold(cache.v),
            "kc_scale": cold_s(cache.k_scale),
            "vc_scale": cold_s(cache.v_scale),
            "k_tail": tail(cache.k), "v_tail": tail(cache.v),
            "kt_scale": tail_s(cache.k_scale),
            "vt_scale": tail_s(cache.v_scale),
        }, flushed

    @staticmethod
    def flush_hybrid(cache: dict, flushed_prev: int) -> dict:
        """Move the full tail (one 256-token block) into cold block
        ``flushed_prev // 256`` — a single structured block write per
        segment (a per-step lane-dim write would rewrite the whole
        cache — measured 11 ms/step)."""
        from ..ops.fused_decode import BLK

        nb = flushed_prev // BLK
        return {
            "k_cold": cache["k_cold"].at[:, nb].set(
                jnp.swapaxes(cache["k_tail"], 3, 4)),
            "v_cold": cache["v_cold"].at[:, nb].set(
                jnp.swapaxes(cache["v_tail"], 3, 4)),
            "kc_scale": cache["kc_scale"].at[:, nb].set(
                cache["kt_scale"]),
            "vc_scale": cache["vc_scale"].at[:, nb].set(
                cache["vt_scale"]),
            "k_tail": cache["k_tail"], "v_tail": cache["v_tail"],
            "kt_scale": cache["kt_scale"],
            "vt_scale": cache["vt_scale"],
        }

    def decode_hybrid(self, xv: Array, stacked, cache: dict,
                      pos: Array, flushed: int,
                      interpret: bool = False):
        """Single-token fused step over the hybrid cold/tail cache:
        the layer-scan streams stacked weights while attention runs as
        ONE Pallas kernel per layer (``ops/fused_decode.py`` — int8
        MXU QK/AV, in-kernel masks/ALiBi/self-token; ~36 us/layer at
        B=8 vs ~60 us for the XLA op chain).  The 16 layers' new K/V
        rows are appended to the head-major tail in one deferred write
        (slot ``pos - flushed``)."""
        from ..ops.fused_decode import fused_decode_attention_prepared
        from .attention import _quantize_i8

        if self.linear is not None:
            xv = self.linear(xv)
        if self.first_norm is not None:
            xv = self.first_norm(xv)
        la0 = self.layers[0]
        nheads = la0.self_attn.nheads
        eps1 = la0.norm1.eps
        act = la0.activation
        b, s, d = xv.shape
        assert s == 1
        dh = d // nheads
        slopes = (self.rpe.slopes[...] if self.rpe_id == "ALiBi"
                  else jnp.zeros((nheads,), jnp.float32))
        slopes_f = slopes.astype(jnp.float32)[:, None]
        nl = len(self.layers)
        # (L, 2) [pos, li] rows: ONE stack per step instead of
        # per-layer scalar packing inside the scan body.
        scalars_all = jnp.stack(
            [jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (nl,)),
             jnp.arange(nl, dtype=jnp.int32)], axis=1)

        def rms(x, scale):
            xf = x.astype(jnp.float32)
            ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            return (xf * jax.lax.rsqrt(ms + eps1)
                    * scale).astype(x.dtype)

        def matmul(x, entry):
            w = entry["w"]
            if w.dtype == jnp.int8:
                w = w.astype(x.dtype) * entry["scale"]
            y = x @ w
            if "b" in entry:
                y = y + entry["b"]
            return y

        def body(x, wl):
            w_l, scal = wl
            h = rms(x, w_l["n1"])
            qkv = matmul(h, w_l["qkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            qh = q[:, 0].reshape(b, nheads, dh)
            kh = k[:, 0].reshape(b, nheads, dh)
            vh = v[:, 0].reshape(b, nheads, dh)
            out = fused_decode_attention_prepared(
                qh, cache["k_cold"], cache["v_cold"],
                cache["kc_scale"], cache["vc_scale"],
                cache["k_tail"], cache["v_tail"],
                cache["kt_scale"], cache["vt_scale"],
                scal, slopes_f, kh, vh, flushed=flushed,
                interpret=interpret)
            out = out.astype(x.dtype).reshape(b, 1, d)
            x = x + matmul(out, w_l["out"])
            h2 = rms(x, w_l["n3"])
            x = x + matmul(act(matmul(h2, w_l["ffn1"])), w_l["ffn2"])
            return x, (kh, vh)

        x, (k_new, v_new) = jax.lax.scan(
            body, xv, (stacked, scalars_all))
        kq, ksc = _quantize_i8(k_new)       # (L, B, H, Dh) per-row
        vq, vsc = _quantize_i8(v_new)
        slot = pos - flushed
        cache = dict(cache)
        cache["k_tail"] = jax.lax.dynamic_update_slice(
            cache["k_tail"], kq[:, :, :, None], (0, 0, 0, slot, 0))
        cache["v_tail"] = jax.lax.dynamic_update_slice(
            cache["v_tail"], vq[:, :, :, None], (0, 0, 0, slot, 0))
        cache["kt_scale"] = jax.lax.dynamic_update_slice(
            cache["kt_scale"], ksc[..., None], (0, 0, 0, slot))
        cache["vt_scale"] = jax.lax.dynamic_update_slice(
            cache["vt_scale"], vsc[..., None], (0, 0, 0, slot))
        if self.final_norm is not None:
            x = self.final_norm(x)
        if self.out is not None:
            x = self.out(x)
        return x, cache

    def supports_mega_decode(self) -> bool:
        """``build_mega_decode``'s eligibility checks without building
        the stacked arrays — a cheap caller-side predicate (used by
        the sampler's chunked-serving gate)."""
        if not self.supports_stacked_decode():
            return False
        d = self.dim
        if self.rpe_id != "ALiBi" or d % 256:
            return False
        for la in self.layers:
            mods = (la.self_attn.in_proj, la.self_attn.out_proj,
                    la.linear1, la.linear2)
            if any(m.kernel[...].dtype != jnp.int8 for m in mods):
                return False
            if la.linear1.out_dim != 4 * d or la.norm1.eps != 1e-6:
                return False
            if la.activation is not get_activation(
                    Hparams(identifier="GELU")):
                return False
        return True

    def build_mega_decode(self):
        """Chunked int8 weight arrays for the single-call trunk-step
        kernel (``ops/mega_step.fused_trunk_step``).  Returns None
        unless the config fits the kernel: int8-quantized projections
        (``quantize_weights_int8``), no biases, RMSNorm(eps 1e-6),
        ALiBi, pre-LN, GELU, ffd == 4*dim, dim % 256 == 0."""
        if not self.supports_mega_decode():
            return None
        d = self.dim

        def scales(getter):
            return jnp.stack([getter(la).reshape(-1)
                              for la in self.layers]).astype(
                                  jnp.float32)

        def biases(getter, n):
            return jnp.stack([
                (getter(la).bias[...].astype(jnp.float32)
                 if getter(la).bias is not None
                 else jnp.zeros((n,), jnp.float32))
                for la in self.layers])

        def stack(getter):
            return jnp.stack([getter(la) for la in self.layers])

        return {
            "wq": stack(lambda la: la.self_attn.in_proj.kernel[...]),
            "wo": stack(lambda la: la.self_attn.out_proj.kernel[...]),
            "w1": stack(lambda la: la.linear1.kernel[...]),
            "w2": stack(lambda la: la.linear2.kernel[...]),
            "sq": scales(
                lambda la: la.self_attn.in_proj.kernel_scale[...]),
            "so": scales(
                lambda la: la.self_attn.out_proj.kernel_scale[...]),
            "s1": scales(lambda la: la.linear1.kernel_scale[...]),
            "s2": scales(lambda la: la.linear2.kernel_scale[...]),
            "n1": jnp.stack([la.norm1.scale[...]
                             for la in self.layers]).astype(
                                 jnp.float32),
            "n3": jnp.stack([la.norm3.scale[...]
                             for la in self.layers]).astype(
                                 jnp.float32),
            "bq": biases(lambda la: la.self_attn.in_proj, 3 * d),
            "bo": biases(lambda la: la.self_attn.out_proj, d),
            "b1": biases(lambda la: la.linear1, 4 * d),
            "b2": biases(lambda la: la.linear2, d),
        }

    def build_mega_decode_w4(self, group: int = 128):
        """Nibble-packed (int4) weights for the mega kernel's w4 path.

        Rows ``r`` and ``r + din/2`` of each int8 kernel share one
        byte (hi/lo nibble), so the per-step weight stream — the
        measured floor of B<=8 serving (344 us for 252 MB at flagship
        dims, PERFORMANCE.md) — halves.  Values are re-quantized from
        the int8 kernels with per-(row-group, column) scales
        (``group`` rows each, matching the kernel's group-dot K
        depth), folded with the existing per-column scale into
        ``gq/go/g1/g2`` (L, din/group, dout) f32.  The unpack order
        is chosen so ``concat([packed >> 4, (packed << 4) >> 4])``
        IS the row order — no in-kernel permutation."""
        w8 = self.build_mega_decode()
        if w8 is None:
            return None
        out = dict(w8)
        for name, sname, gname in (("wq", "sq", "gq"),
                                   ("wo", "so", "go"),
                                   ("w1", "s1", "g1"),
                                   ("w2", "s2", "g2")):
            w = w8[name]                       # (L, din, dout) int8
            s_col = w8[sname]                  # (L, dout) f32
            nl, din, dout = w.shape
            g = group
            assert din % (2 * g) == 0
            q = w.astype(jnp.float32).reshape(nl, din // g, g, dout)
            amax = jnp.max(jnp.abs(q), axis=2)         # (L, G, dout)
            s4 = jnp.maximum(amax, 1e-8) / 7.0
            q4 = jnp.clip(jnp.round(q / s4[:, :, None, :]), -8, 7)
            q4 = q4.reshape(nl, din, dout).astype(jnp.int8)
            hi = q4[:, :din // 2]
            lo = q4[:, din // 2:]
            out[name] = ((hi << 4) | (lo & 0xF)).astype(jnp.int8)
            out[gname] = s4 * s_col[:, None, :]
        return out

    def mega_cache_from_prefill(self, cache: LayerKVCache,
                                prompt_len: int, total_len: int):
        """Convert a filled int8 stacked prefill cache (positions
        [0, prompt_len)) into the mega-kernel's three-tier layout
        (``ops/mega_step.py``): block-major time-minor cold blocks
        (multiples of 128) + head-major int8 tail (8-row-merged
        groups) + bf16 stage rows (the <8 remainder).  Returns
        (cache-dict, flushed)."""
        from ..ops.mega_step import BLK, STAGE, TAIL

        assert cache.quantized, "mega decode requires the int8 cache"
        nl, b, h, _, dh = cache.k.shape
        flushed = (prompt_len // BLK) * BLK
        nb = max(total_len // BLK + 1, 1)
        nb_f = flushed // BLK
        rel = prompt_len - flushed
        n_tail = (rel // STAGE) * STAGE
        n_st = rel - n_tail

        def cold(x):
            out = jnp.zeros((nl, nb, h, b, dh, BLK), jnp.int8)
            if not flushed:
                return out
            blk = x[:, :, :, :flushed].reshape(
                nl, b, h, nb_f, BLK, dh)
            return out.at[:, :nb_f].set(
                jnp.transpose(blk, (0, 3, 2, 1, 5, 4)))

        def cold_s(x):
            out = jnp.zeros((nl, nb, h, b, BLK), jnp.float32)
            if not flushed:
                return out
            return out.at[:, :nb_f].set(jnp.transpose(
                x[..., :flushed].reshape(nl, b, h, nb_f, BLK),
                (0, 3, 2, 1, 4)))

        def tail(x):
            out = jnp.zeros((nl, h, b, TAIL, dh), jnp.int8)
            if not n_tail:
                return out
            return out.at[:, :, :, :n_tail].set(jnp.swapaxes(
                x[:, :, :, flushed:flushed + n_tail], 1, 2))

        def tail_s(x):
            out = jnp.zeros((nl, h, b, TAIL), jnp.float32)
            if not n_tail:
                return out
            return out.at[..., :n_tail].set(jnp.swapaxes(
                x[..., flushed:flushed + n_tail], 1, 2))

        def stage(xq, xs):
            out = jnp.zeros((nl, STAGE, h, b, dh), jnp.bfloat16)
            if not n_st:
                return out
            rows = (xq[:, :, :, flushed + n_tail:prompt_len]
                    .astype(jnp.float32)
                    * xs[..., flushed + n_tail:prompt_len, None])
            return out.at[:, :n_st].set(jnp.transpose(
                rows, (0, 3, 2, 1, 4)).astype(jnp.bfloat16))

        return {
            "k_cold": cold(cache.k), "v_cold": cold(cache.v),
            "kc_scale": cold_s(cache.k_scale),
            "vc_scale": cold_s(cache.v_scale),
            "k_tail": tail(cache.k), "v_tail": tail(cache.v),
            "kt_scale": tail_s(cache.k_scale),
            "vt_scale": tail_s(cache.v_scale),
            "k_stage": stage(cache.k, cache.k_scale),
            "v_stage": stage(cache.v, cache.v_scale),
        }, flushed

    def decode_mega(self, xv: Array, weights, cache: dict,
                    pos: Array, flushed: int,
                    interpret: bool = False):
        """Single-token trunk step as ONE Pallas kernel call
        (``ops/mega_step.fused_trunk_step``) over the three-tier mega
        cache, plus the per-step bf16 stage append.  The caller owns
        the every-8-step ``merge_stage`` and every-128-step
        ``flush_mega`` cadence."""
        import os as _os

        from ..ops.mega_step import (STAGE, fused_trunk_step,
                                     stage_append)

        if self.linear is not None:
            xv = self.linear(xv)
        if self.first_norm is not None:
            xv = self.first_norm(xv)
        b, s, d = xv.shape
        assert s == 1
        slopes = self.rpe.slopes[...]
        # s8 x s8 dense matmuls (per-row activation quantization, no
        # int8->bf16 weight upconversion).  Same-session chip pairs
        # (PERFORMANCE.md round 5): +3.8% at B=8, -1.5%/-3.6% at
        # B=16/32 (the per-row quantize/dequant work grows with B
        # while the upconversion it replaces is B-independent), so
        # the default is batch-gated; quality band measured identical
        # at B=8 (chip_results/quant_quality_b8_a8.txt).
        a8_env = _os.environ.get("VAE_GSLM_MEGA_A8", "auto")
        a8 = (b <= 8) if a8_env == "auto" else a8_env == "1"
        xo, kn, vn = fused_trunk_step(
            xv[:, 0].astype(jnp.float32), weights, cache, pos,
            slopes, flushed=flushed, interpret=interpret, a8=a8)
        cache = stage_append(cache, kn, vn,
                             jax.lax.rem(pos - flushed, STAGE))
        x = xo[:, None].astype(xv.dtype)
        if self.final_norm is not None:
            x = self.final_norm(x)
        if self.out is not None:
            x = self.out(x)
        return x, cache

    def init_stacked_cache(self, batch: int, max_len: int,
                           dtype=None) -> LayerKVCache:
        """One KV cache for the whole stack: ``(L, B, H, maxT, D)``."""
        la = self.layers[0].self_attn
        nl = len(self.layers)
        shape = (nl, batch, la.nheads, max_len, la.head_dim)
        if dtype == jnp.int8:
            sshape = shape[:-1]
            return LayerKVCache(jnp.zeros(shape, jnp.int8),
                                jnp.zeros(shape, jnp.int8),
                                jnp.zeros(sshape, jnp.float32),
                                jnp.zeros(sshape, jnp.float32))
        if dtype is None:
            dtype = jnp.float32
        return LayerKVCache(jnp.zeros(shape, dtype),
                            jnp.zeros(shape, dtype))

    def decode_stacked(self, xv: Array, stacked, cache: LayerKVCache,
                       pos: Array, window: Optional[int] = None,
                       return_attn: bool = False,
                       memory_kv: Optional[dict] = None):
        """One AR step through all layers as a single layer-scan.

        xv: (B, S, C) raw frames at absolute positions [pos, pos+S);
        cache: stacked cache from ``init_stacked_cache``.  Matches
        ``decode`` (same per-layer math, RMS fp32, ALiBi, int8 cache)
        — parity asserted in tests/test_attention.py.
        ``memory_kv`` (from ``build_stacked_memory``) enables fused
        per-step cross-attention (TTS; single-token steps only)."""
        if self.linear is not None:
            xv = self.linear(xv)
        if self.first_norm is not None:
            xv = self.first_norm(xv)

        la0 = self.layers[0]
        nheads = la0.self_attn.nheads
        eps1 = la0.norm1.eps
        act = la0.activation
        slopes = (self.rpe.slopes[...] if self.rpe_id == "ALiBi"
                  else None)
        b, s, d = xv.shape
        max_len = cache.k.shape[-2]   # stacked cache is (L,B,H,T,D)
        quantized = cache.quantized
        win = min(window, max_len) if window is not None else max_len

        # Prefill (S > 1) constants, shared across layers.
        if s > 1:
            k_pos = jnp.arange(win)
            q_pos = pos + jnp.arange(s)
            mask = (k_pos[None, :] <= q_pos[:, None])[None, None]
            mask = jnp.broadcast_to(mask, (b, 1, s, win))
            bias = (self.rpe.bias(q_pos, k_pos)
                    if slopes is not None else None)

        def rms(x, scale):
            xf = x.astype(jnp.float32)
            ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            y = xf * jax.lax.rsqrt(ms + eps1) * scale
            return y.astype(x.dtype)

        def matmul(x, entry):
            w = entry["w"]
            if w.dtype == jnp.int8:
                w = w.astype(x.dtype) * entry["scale"]
            y = x @ w
            if "b" in entry:
                y = y + entry["b"]
            return y

        if s == 1:
            x, new_cache, attns = self._decode_stacked_step(
                xv, stacked, cache, pos, win, slopes, nheads, rms,
                matmul, act, return_attn, memory_kv)
        else:
            assert memory_kv is None, \
                "fused cross-attention is single-token only"
            x, new_cache, attns = self._decode_stacked_prefill(
                xv, stacked, cache, pos, win, mask, bias, nheads,
                rms, matmul, act, return_attn)
        if self.final_norm is not None:
            x = self.final_norm(x)
        if self.out is not None:
            x = self.out(x)
        if return_attn:
            if attns.shape[-1] < max_len:
                attns = jnp.pad(
                    attns,
                    ((0, 0),) * (attns.ndim - 1)
                    + ((0, max_len - attns.shape[-1]),))
            return x, new_cache, {"self_attn": attns}
        return x, new_cache

    def _decode_stacked_step(self, xv, stacked, cache, pos, win,
                             slopes, nheads, rms, matmul, act,
                             return_attn, memory_kv=None):
        """Single-token fused step.

        The inner layer-scan only READS the stacked cache (as scan
        xs); the current token's key/value enter the softmax through
        an explicit extra logit, and all 16 layers' new rows are
        written to the cache in ONE deferred ``dynamic_update_slice``
        after the scan.  Interleaving per-layer writes and reads on
        the single stacked buffer defeats XLA's in-place buffer
        analysis and costs a full cache copy per layer (measured 3x:
        2.98 ms -> 1.0 ms per step at B=8, tools/bench_decode.py)."""
        from .attention import _quantize_i8, _split_heads

        b, _, d = xv.shape
        quantized = cache.quantized
        head_dim = d // nheads
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, win), 2)
        old_mask = k_pos < pos          # strict: row `pos` is stale
        dist = jnp.abs(k_pos - pos).astype(jnp.float32)
        alibi = (slopes.astype(jnp.float32)[None, :, None] * dist
                 if slopes is not None else None)
        scale = 1.0 / math.sqrt(head_dim)
        if memory_kv is not None:
            nh_c = self.layers[0].cross_attn.nheads
            dh_c = d // nh_c
            scale_c = 1.0 / math.sqrt(dh_c)
            cmask = memory_kv["mask"][:, None, :]       # (B, 1, Tm)

        def body(x, xs):
            if memory_kv is not None:
                *xs, mk_l, mv_l = xs
                xs = tuple(xs)
            if quantized:
                w_l, k_l, v_l, ks_l, vs_l = xs
                k_l = k_l[:, :, :win]
                v_l = v_l[:, :, :win]
                ks_l = ks_l[:, :, :win]
                vs_l = vs_l[:, :, :win]
            else:
                w_l, k_l, v_l = xs
                k_l = k_l[:, :, :win]
                v_l = v_l[:, :, :win]
            h = rms(x, w_l["n1"])
            qkv = matmul(h, w_l["qkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            kh = jnp.swapaxes(_split_heads(k, nheads), 1, 2)  # B,H,1,D
            vh = jnp.swapaxes(_split_heads(v, nheads), 1, 2)
            qh = _split_heads(q, nheads)[:, 0]                # B,H,D
            if quantized:
                q_amax = jnp.max(jnp.abs(qh), axis=-1, keepdims=True)
                q_scale = (q_amax / 127.0).astype(jnp.float32)
                qi = jnp.round(
                    qh / jnp.maximum(q_scale, 1e-8)).astype(jnp.int8)
                logits = jnp.einsum("bhd,bhtd->bht", qi, k_l,
                                    preferred_element_type=jnp.int32)
                logits = (logits.astype(jnp.float32)
                          * (q_scale * ks_l.astype(jnp.float32)
                             * scale))
            else:
                logits = jnp.einsum(
                    "bhd,bhtd->bht", qh, k_l,
                    preferred_element_type=jnp.float32) * scale
            if alibi is not None:
                logits = logits + alibi
            logits = jnp.where(old_mask, logits, NEG_INF)
            # current token: |distance| = 0 -> no ALiBi term
            l_self = (jnp.sum(qh.astype(jnp.float32)
                              * kh[:, :, 0].astype(jnp.float32),
                              axis=-1, keepdims=True) * scale)
            logits = jnp.concatenate([logits, l_self], axis=-1)
            w = jax.nn.softmax(logits, axis=-1)
            if quantized:
                wv = (w[..., :-1]
                      * vs_l.astype(jnp.float32)).astype(jnp.bfloat16)
                out = jnp.einsum("bht,bhtd->bhd", wv,
                                 v_l.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
            else:
                out = jnp.einsum("bht,bhtd->bhd",
                                 w[..., :-1].astype(v_l.dtype), v_l,
                                 preferred_element_type=jnp.float32)
            out = out + (w[..., -1:].astype(jnp.float32)
                         * vh[:, :, 0].astype(jnp.float32))
            out = out.astype(x.dtype).reshape(b, 1, d)
            x = x + matmul(out, w_l["out"])
            if memory_kv is not None:
                # Fused cross-attention against the precomputed
                # per-layer memory K/V (same math as the per-layer
                # path's stateless CrossAttention: fp32 logits,
                # padding mask, 1/sqrt(dh) scale).
                hc = rms(x, w_l["n2"])
                qc = matmul(hc, w_l["cq"])[:, 0].reshape(b, nh_c, dh_c)
                cl = jnp.einsum("bhd,bhtd->bht", qc, mk_l,
                                preferred_element_type=jnp.float32)
                cl = jnp.where(cmask, cl * scale_c, NEG_INF)
                wc = jax.nn.softmax(cl, axis=-1)
                oc = jnp.einsum("bht,bhtd->bhd", wc.astype(mv_l.dtype),
                                mv_l,
                                preferred_element_type=jnp.float32)
                x = x + matmul(oc.astype(x.dtype).reshape(b, 1, d),
                               w_l["cout"])
            h2 = rms(x, w_l["n3"])
            x = x + matmul(act(matmul(h2, w_l["ffn1"])), w_l["ffn2"])
            ys = (kh, vh, w if return_attn else None)
            return x, ys

        xs = ((stacked, cache.k, cache.v, cache.k_scale, cache.v_scale)
              if quantized else (stacked, cache.k, cache.v))
        if memory_kv is not None:
            xs = xs + (memory_kv["mk"], memory_kv["mv"])
        x, (k_new, v_new, w_attn) = jax.lax.scan(body, xv, xs)
        # One deferred write of all layers' new rows (L, B, H, 1, D).
        if quantized:
            kq, ksc = _quantize_i8(k_new)
            vq, vsc = _quantize_i8(v_new)
            new_cache = LayerKVCache(
                jax.lax.dynamic_update_slice(cache.k, kq,
                                             (0, 0, 0, pos, 0)),
                jax.lax.dynamic_update_slice(cache.v, vq,
                                             (0, 0, 0, pos, 0)),
                jax.lax.dynamic_update_slice(cache.k_scale, ksc,
                                             (0, 0, 0, pos)),
                jax.lax.dynamic_update_slice(cache.v_scale, vsc,
                                             (0, 0, 0, pos)))
        else:
            new_cache = LayerKVCache(
                jax.lax.dynamic_update_slice(
                    cache.k, k_new.astype(cache.k.dtype),
                    (0, 0, 0, pos, 0)),
                jax.lax.dynamic_update_slice(
                    cache.v, v_new.astype(cache.v.dtype),
                    (0, 0, 0, pos, 0)))
        attns = None
        if return_attn:
            # (L,B,H,win+1) -> place the self weight at column `pos`
            # of a (L,B,H,1,win) row like the carry-write path.
            w_old = w_attn[..., :-1]
            w_self = w_attn[..., -1:]
            col = jax.lax.broadcasted_iota(
                jnp.int32, w_old.shape, w_old.ndim - 1)
            attns = jnp.where(col == pos, w_self, w_old)[:, :, :, None]
        return x, new_cache, attns

    def _decode_stacked_prefill(self, xv, stacked, cache, pos, win,
                                mask, bias, nheads, rms, matmul, act,
                                return_attn):
        """Prefill (S > 1): carry-write layer scan.  Runs once per
        sampling call, so the in-place-defeating write/read interleave
        is acceptable here."""
        from .attention import (_merge_heads, _quantize_i8,
                                _split_heads, attend)

        b, s, d = xv.shape
        quantized = cache.quantized

        def body(carry, w_l):
            x, ck, cv, ks, vs, li = carry
            h = rms(x, w_l["n1"])
            qkv = matmul(h, w_l["qkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            kh = jnp.swapaxes(_split_heads(k, nheads), 1, 2)
            vh = jnp.swapaxes(_split_heads(v, nheads), 1, 2)
            if quantized:
                kq, ksc = _quantize_i8(kh)
                vq, vsc = _quantize_i8(vh)
                ck = jax.lax.dynamic_update_slice(
                    ck, kq[None], (li, 0, 0, pos, 0))
                cv = jax.lax.dynamic_update_slice(
                    cv, vq[None], (li, 0, 0, pos, 0))
                ks = jax.lax.dynamic_update_slice(
                    ks, ksc[None], (li, 0, 0, pos))
                vs = jax.lax.dynamic_update_slice(
                    vs, vsc[None], (li, 0, 0, pos))
            else:
                ck = jax.lax.dynamic_update_slice(
                    ck, kh[None].astype(ck.dtype), (li, 0, 0, pos, 0))
                cv = jax.lax.dynamic_update_slice(
                    cv, vh[None].astype(cv.dtype), (li, 0, 0, pos, 0))
            k_l = jax.lax.dynamic_index_in_dim(
                ck, li, 0, keepdims=False)[:, :, :win]
            v_l = jax.lax.dynamic_index_in_dim(
                cv, li, 0, keepdims=False)[:, :, :win]
            if quantized:
                ks_l = jax.lax.dynamic_index_in_dim(
                    ks, li, 0, keepdims=False)[:, :, :win]
                vs_l = jax.lax.dynamic_index_in_dim(
                    vs, li, 0, keepdims=False)[:, :, :win]
                # bf16 like LayerKVCache.dense_kv so the fused prefill
                # bit-matches the per-layer path
                kd = (k_l.astype(jnp.float32)
                      * ks_l[..., None]).astype(jnp.bfloat16)
                vd = (v_l.astype(jnp.float32)
                      * vs_l[..., None]).astype(jnp.bfloat16)
            else:
                kd, vd = k_l, v_l
            qh = _split_heads(q, nheads)
            out, w_attn = attend(
                qh, jnp.swapaxes(kd, 1, 2), jnp.swapaxes(vd, 1, 2),
                bias, mask, return_attn=return_attn)
            out = _merge_heads(out)
            x = x + matmul(out, w_l["out"])
            h2 = rms(x, w_l["n3"])
            x = x + matmul(act(matmul(h2, w_l["ffn1"])), w_l["ffn2"])
            ys = w_attn if return_attn else None
            return (x, ck, cv, ks, vs, li + 1), ys

        ks0 = cache.k_scale if quantized else jnp.zeros((), jnp.float32)
        vs0 = cache.v_scale if quantized else jnp.zeros((), jnp.float32)
        carry = (xv, cache.k, cache.v, ks0, vs0, jnp.asarray(0))
        carry, attns = jax.lax.scan(body, carry, stacked)
        x, ck, cv, ks, vs, _ = carry
        new_cache = LayerKVCache(ck, cv,
                                 ks if quantized else None,
                                 vs if quantized else None)
        return x, new_cache, attns

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
