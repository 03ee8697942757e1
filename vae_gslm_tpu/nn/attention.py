"""Self/cross attention with masked sequences and a static KV cache.

Parity target: ``/root/reference/modules/attention/attention.py``.
Semantics preserved: fused qkv projection, padding+causal masking,
Rotary/SinCos rotate q&k, ALiBi/T5 add a bias that is computed once and
reused by later layers, fp32 softmax.

TPU-first design:
  * The reference materialises a dense ``(B, H, Tkv, Tkv)`` additive mask
    and concatenates past K/V dynamically (``attention.py:56-77``).
    Here the mask never exists as a tensor — padding/causal conditions
    are fused ``jnp.where`` on the logits — and AR decode uses a
    **preallocated ring-free static cache** written with
    ``lax.dynamic_update_slice`` so the whole sampling loop jits as one
    ``lax.scan`` (`decode_step`).
  * Logit matmuls run in the compute dtype with fp32 accumulation
    (``preferred_element_type``); softmax is fp32.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.masked import Masked
from ..core.precision import get_policy
from ..hparams.hp import Hparams
from .linear import Dense
from .positions import ALiBi, Rotary, SinCos, T5RPE, get_positional_encoding

Array = jax.Array
NEG_INF = -1e30


def _quantize_i8(x: Array) -> Tuple[Array, Array]:
    """Per-(…, t) symmetric int8 quantization over the last axis."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale[..., 0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LayerKVCache:
    """Static per-layer KV cache.

    Two layouts, distinguished by rank (no static metadata — the
    pytree stays scan/jit-transparent):

      * base ``(B, H, maxT, D)`` — head-major planes; the layout XLA
        serves well when B fills the 128 vector lanes (B >= 128).
      * packed ``(maxT, D, B*H)`` — lane-packed: the flattened
        (batch, head) axis N = B*H is minor, so BOTH decode dots are
        lane-parallel over N at ANY batch.  Fixes the measured B=64
        layout cliff where XLA assigns the base cache a D-minor
        layout (64 of 128 lanes + cross-lane D reduction: 946 vs 219
        us/step/layer at B=128 — r4 trace, tools/bench_b64_fold.py).
        N-axis order is (b major, h minor): n = b * H + h.

    Optional int8 mode stores per-row symmetric scales alongside
    (AR decode is KV-bandwidth-bound; int8 halves the cache traffic);
    scales are (B, H, maxT) base / (maxT, B*H) packed.
    """

    k: Array
    v: Array
    k_scale: Optional[Array] = None
    v_scale: Optional[Array] = None

    @classmethod
    def zeros(cls, batch: int, max_len: int, nheads: int, head_dim: int,
              dtype=jnp.float32, packed: bool = False) -> "LayerKVCache":
        shape = ((max_len, head_dim, batch * nheads) if packed
                 else (batch, nheads, max_len, head_dim))
        if dtype == jnp.int8:
            sshape = ((max_len, batch * nheads) if packed
                      else (batch, nheads, max_len))
            out = cls(jnp.zeros(shape, jnp.int8),
                      jnp.zeros(shape, jnp.int8),
                      jnp.zeros(sshape, jnp.float32),
                      jnp.zeros(sshape, jnp.float32))
        else:
            out = cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        return out._constrain() if packed else out

    def _constrain(self) -> "LayerKVCache":
        """Under an ambient packed-cache mesh (multi-chip serving),
        pin the packed N = B*H axis sharded over every mesh axis —
        decode attention is parallel over (batch, head), so all
        cache-sized traffic stays device-local and only the tiny
        per-step q/out rows reshard (``parallel/tp.py``)."""
        if not self.packed:
            return self
        from ..parallel.tp import constrain_packed_cache as cc
        if self.quantized:
            return LayerKVCache(cc(self.k), cc(self.v),
                                cc(self.k_scale), cc(self.v_scale))
        return LayerKVCache(cc(self.k), cc(self.v))

    @property
    def packed(self) -> bool:
        return self.k.ndim == 3

    @property
    def max_len(self) -> int:
        return self.k.shape[0] if self.packed else self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    def _pack_rows(self, x: Array) -> Array:
        """(B, H, S, D) -> (S, D, B*H)."""
        b, h, s, d = x.shape
        return jnp.transpose(x, (2, 3, 0, 1)).reshape(s, d, b * h)

    def write(self, pos: Array, k: Array, v: Array) -> "LayerKVCache":
        """Insert ``(B, S, H, D)`` new keys/values at position ``pos``."""
        k = jnp.swapaxes(k, 1, 2)  # (B, H, S, D)
        v = jnp.swapaxes(v, 1, 2)
        if self.packed:
            if self.quantized:
                kq, ks = _quantize_i8(k)
                vq, vs = _quantize_i8(v)
                b, h, s = ks.shape
                sc_at = (pos, 0)
                return LayerKVCache(
                    jax.lax.dynamic_update_slice(
                        self.k, self._pack_rows(kq), (pos, 0, 0)),
                    jax.lax.dynamic_update_slice(
                        self.v, self._pack_rows(vq), (pos, 0, 0)),
                    jax.lax.dynamic_update_slice(
                        self.k_scale,
                        jnp.transpose(ks, (2, 0, 1)).reshape(s, b * h),
                        sc_at),
                    jax.lax.dynamic_update_slice(
                        self.v_scale,
                        jnp.transpose(vs, (2, 0, 1)).reshape(s, b * h),
                        sc_at))._constrain()
            return LayerKVCache(
                jax.lax.dynamic_update_slice(
                    self.k, self._pack_rows(k).astype(self.k.dtype),
                    (pos, 0, 0)),
                jax.lax.dynamic_update_slice(
                    self.v, self._pack_rows(v).astype(self.v.dtype),
                    (pos, 0, 0)))._constrain()
        if self.quantized:
            kq, ks = _quantize_i8(k)
            vq, vs = _quantize_i8(v)
            return LayerKVCache(
                jax.lax.dynamic_update_slice(self.k, kq, (0, 0, pos, 0)),
                jax.lax.dynamic_update_slice(self.v, vq, (0, 0, pos, 0)),
                jax.lax.dynamic_update_slice(self.k_scale, ks,
                                             (0, 0, pos)),
                jax.lax.dynamic_update_slice(self.v_scale, vs,
                                             (0, 0, pos)))
        return LayerKVCache(
            jax.lax.dynamic_update_slice(
                self.k, k.astype(self.k.dtype), (0, 0, pos, 0)),
            jax.lax.dynamic_update_slice(
                self.v, v.astype(self.v.dtype), (0, 0, pos, 0)))

    def dense_kv(self, nheads: Optional[int] = None
                 ) -> Tuple[Array, Array]:
        """Dequantized (B, T, H, D) views for the prefill path.

        ``nheads`` is required for the packed layout (the (B*H) axis
        cannot be split without it)."""
        if self.quantized:
            if self.packed:
                k = (self.k.astype(jnp.float32)
                     * self.k_scale[:, None]).astype(jnp.bfloat16)
                v = (self.v.astype(jnp.float32)
                     * self.v_scale[:, None]).astype(jnp.bfloat16)
            else:
                k = (self.k.astype(jnp.float32)
                     * self.k_scale[..., None]).astype(jnp.bfloat16)
                v = (self.v.astype(jnp.float32)
                     * self.v_scale[..., None]).astype(jnp.bfloat16)
        else:
            k, v = self.k, self.v
        if self.packed:
            assert nheads is not None
            t, d, n = k.shape
            b = n // nheads
            # (T, D, B, H) -> (B, T, H, D)
            k = jnp.transpose(k.reshape(t, d, b, nheads), (2, 0, 3, 1))
            v = jnp.transpose(v.reshape(t, d, b, nheads), (2, 0, 3, 1))
            return k, v
        return jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)


def _split_heads(x: Array, nheads: int) -> Array:
    b, t, c = x.shape
    return x.reshape(b, t, nheads, c // nheads)


def _merge_heads(x: Array) -> Array:
    b, t, h, d = x.shape
    return x.reshape(b, t, h * d)


def attend(q: Array, k: Array, v: Array,
           bias: Optional[Array], mask: Array,
           return_attn: bool = False) -> Tuple[Array, Optional[Array]]:
    """Masked multi-head attention core.

    q: (B, Tq, H, D); k, v: (B, Tk, H, D); bias: (H, Tq, Tk) or None;
    mask: (B, 1, Tq, Tk) bool (True = attend).
    """
    dt = get_policy().compute_dtype
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(dt), k.astype(dt),
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)[None]
    logits = jnp.where(mask, logits, NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(dt), v.astype(dt),
                     preferred_element_type=jnp.float32)
    return out.astype(dt), (weights if return_attn else None)


class SelfAttention(nnx.Module):
    """Masked (optionally causal) self-attention
    (``attention.py:21-98``)."""

    def __init__(self, dim: int, hp: Hparams, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("nheads", "causal")
        self.nheads = hp.nheads
        self.dim = dim
        assert dim % self.nheads == 0
        self.head_dim = dim // self.nheads
        self.causal = hp.causal
        # use_flash: false routes training attention through the dense
        # XLA path — needed under tensor parallelism, where GSPMD can
        # partition the einsums on the head axis but not the Pallas
        # custom call (parallel/tp.py).
        self.use_flash = bool(hp.get("use_flash", True))
        bias = bool(hp.get("bias", None))
        self.in_proj = Dense(dim, dim * 3, bias=bias, rngs=rngs)
        self.out_proj = Dense(dim, dim, bias=bias, rngs=rngs)

    def _qkv(self, xv: Array, rpe_pair=None, offset=0):
        """offset: absolute position of xv[:, 0] (int or traced scalar;
        used by the KV-cache decode path so Rotary/SinCos rotate at the
        true positions)."""
        qkv = self.in_proj(xv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if rpe_pair is not None:
            rpe_id, rpe = rpe_pair
            if rpe_id in ("SinCos", "Rotary") and rpe is not None:
                if isinstance(rpe, Rotary) and rpe.use_xpos:
                    q = rpe(q, offset=offset, scale_power=1)
                    k = rpe(k, offset=offset, scale_power=-1)
                else:
                    q, k = rpe(q, offset=offset), rpe(k, offset=offset)
        return q, k, v

    def __call__(self, x: Masked,
                 rpe_pair: Optional[Tuple[str, Any]] = None,
                 rpe_bias: Optional[Array] = None,
                 return_attn: bool = False,
                 return_kv: bool = False,
                 past_kv: Optional[Mapping[str, Array]] = None,
                 ) -> Mapping[str, Any]:
        outputs: dict = {}
        # Fused Pallas path: causal/padding masks and ALiBi synthesized
        # in-kernel — no (B,H,T,T) tensors in HBM. Dense fallback keeps
        # the reference's bias-reuse protocol for T5/debug paths.
        if (self.use_flash and self.causal and past_kv is None
                and not return_attn
                and rpe_bias is None
                and (rpe_pair is None
                     or rpe_pair[0] in (None, "ALiBi", "SinCos",
                                        "Rotary"))):
            q, k, v = self._qkv(x.value, rpe_pair)
            slopes = None
            if rpe_pair is not None and isinstance(rpe_pair[1], ALiBi):
                slopes = rpe_pair[1].slopes[...]
            from ..parallel import tp
            mesh_axes = tp.active_flash_mesh(self.nheads, q.shape[0])
            if mesh_axes is not None:
                # GSPMD cannot partition the Pallas custom call;
                # shard_map runs it per device over (data, model).
                from ..ops.flash_attention import flash_attention
                qh = jnp.transpose(_split_heads(q, self.nheads),
                                   (0, 2, 1, 3))
                kh = jnp.transpose(_split_heads(k, self.nheads),
                                   (0, 2, 1, 3))
                vh = jnp.transpose(_split_heads(v, self.nheads),
                                   (0, 2, 1, 3))
                out = tp.shard_map_flash(qh, kh, vh, x.lengths,
                                         slopes, True, mesh_axes)
                out = _merge_heads(jnp.transpose(out, (0, 2, 1, 3)))
            else:
                # Packed-layout kernel: the (B, T, H*D) projection
                # output goes straight in and the result feeds
                # out_proj as-is — no head relayout copies (round-4
                # trace: ~4 ms/microbatch at flagship shapes).
                from ..ops.flash_attention import flash_attention_packed
                out = flash_attention_packed(q, k, v, x.lengths,
                                             slopes, True, self.nheads)
            out = self.out_proj(out)
            outputs["output"] = Masked(out, x.lengths, 1).apply_mask()
            if return_kv:
                outputs["kv"] = {
                    "key": jax.lax.stop_gradient(k),
                    "value": jax.lax.stop_gradient(v),
                }
            return outputs
        q, k, v = self._qkv(x.value, rpe_pair)
        kv_lengths = x.lengths
        past_len = 0
        if past_kv is not None:
            k = jnp.concatenate([past_kv["key"], k], axis=1)
            v = jnp.concatenate([past_kv["value"], v], axis=1)
            past_len = past_kv["key"].shape[1]
            kv_lengths = kv_lengths + past_len
        tq, tk = q.shape[1], k.shape[1]
        # Padding mask over keys.
        k_pos = jnp.arange(tk)
        pad = k_pos[None, :] < kv_lengths[:, None]          # (B, Tk)
        mask = pad[:, None, None, :]                        # (B,1,1,Tk)
        if self.causal:
            q_pos = jnp.arange(past_len, past_len + tq)
            causal = k_pos[None, :] <= q_pos[:, None]       # (Tq, Tk)
            mask = mask & causal[None, None]
        else:
            mask = jnp.broadcast_to(mask,
                                    (x.value.shape[0], 1, tq, tk))
        bias = None
        if rpe_pair is not None and rpe_pair[0] in ("ALiBi", "T5RPE"):
            rpe = rpe_pair[1]
            if isinstance(rpe, ALiBi):
                bias = rpe.bias(jnp.arange(past_len, past_len + tq),
                                k_pos)
            else:
                assert isinstance(rpe, T5RPE) and past_len == 0
                bias = rpe(tq, tk)
            outputs["rpe_bias"] = bias
        if rpe_bias is not None:
            bias = rpe_bias if bias is None else bias + rpe_bias
        qh = _split_heads(q, self.nheads)
        kh = _split_heads(k, self.nheads)
        vh = _split_heads(v, self.nheads)
        out, attn = attend(qh, kh, vh, bias, mask, return_attn=return_attn)
        out = self.out_proj(_merge_heads(out))
        outputs["output"] = Masked(out, x.lengths, 1).apply_mask()
        if return_kv:
            outputs["kv"] = {
                "key": jax.lax.stop_gradient(k),
                "value": jax.lax.stop_gradient(v),
            }
        if return_attn:
            outputs["attn"] = jax.lax.stop_gradient(attn)
        return outputs

    # -- static-cache decode ----------------------------------------------
    def init_cache(self, batch: int, max_len: int,
                   dtype=None, packed: bool = False) -> LayerKVCache:
        dtype = dtype or get_policy().compute_dtype
        return LayerKVCache.zeros(batch, max_len, self.nheads,
                                  self.head_dim, dtype, packed=packed)

    def decode_step(self, xv: Array, cache: LayerKVCache, pos: Array,
                    rpe_pair: Optional[Tuple[str, Any]] = None,
                    window: Optional[int] = None,
                    return_attn: bool = False):
        """One AR step over a preallocated cache.

        xv: (B, S, C) new frames whose absolute positions start at
        ``pos``; returns attention output (B, S, C) and the updated
        cache.  With ``return_attn`` a third element — the fp32
        attention weights (B, H, S, max_len) over the cache — is
        returned (attention-map figures; ``trainers/tts/sampler.py``
        parity).  All shapes static => scan-compatible.
        """
        s = xv.shape[1]
        # Rotary/SinCos rotate q/k at the true absolute positions
        # (cached k is stored post-rotation, so only the new frames
        # need the offset); ALiBi positions are handled explicitly
        # below.
        q, k, v = self._qkv(xv, rpe_pair, offset=pos)
        qh = _split_heads(q, self.nheads)
        cache = cache.write(pos, _split_heads(k, self.nheads),
                            _split_heads(v, self.nheads))
        slopes = None
        if rpe_pair is not None and isinstance(rpe_pair[1], ALiBi):
            slopes = rpe_pair[1].slopes[...]
        if s == 1:
            from ..ops.decode_attention import decode_attention
            res = decode_attention(qh[:, 0], cache.k, cache.v, pos,
                                   slopes, window=window,
                                   k_scale=cache.k_scale,
                                   v_scale=cache.v_scale,
                                   return_weights=return_attn)
            out, w = res if return_attn else (res, None)
            out = out.reshape(out.shape[0], 1, self.dim)
            out = self.out_proj(out)
            if return_attn:
                return out, cache, w[:, :, None]        # (B,H,1,T)
            return out, cache
        # Prefill (S > 1): dense attention over the cache.
        max_len = cache.max_len
        k_pos = jnp.arange(max_len)
        q_pos = pos + jnp.arange(s)
        mask = (k_pos[None, :] <= q_pos[:, None])[None, None]  # (1,1,S,T)
        mask = jnp.broadcast_to(mask, (xv.shape[0], 1, s, max_len))
        bias = None
        if slopes is not None:
            bias = rpe_pair[1].bias(q_pos, k_pos)
        kc, vc = cache.dense_kv(self.nheads)  # (B, T, H, D)
        out, attn = attend(qh, kc, vc, bias, mask,
                           return_attn=return_attn)
        out = self.out_proj(_merge_heads(out))
        if return_attn:
            return out, cache, attn                     # (B,H,S,T)
        return out, cache


class CrossAttention(nnx.Module):
    """Encoder-memory attention (``attention.py:101-172``)."""

    def __init__(self, dim: int, hp: Hparams, *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("nheads")
        self.nheads = hp.nheads
        self.dim = dim
        assert dim % self.nheads == 0
        self.head_dim = dim // self.nheads
        bias = bool(hp.get("bias", None))
        self.q_proj = Dense(dim, dim, bias=bias, rngs=rngs)
        self.kv_proj = Dense(dim, dim * 2, bias=bias, rngs=rngs)
        self.out_proj = Dense(dim, dim, bias=bias, rngs=rngs)
        if hp.has("rpe"):
            self.rpe_id = hp.rpe.identifier
            assert self.rpe_id in ("SinCos", "Rotary")
            self.rpe = get_positional_encoding(self.rpe_id, hp.rpe,
                                               dim, self.nheads, rngs=rngs)
            self.rpe_target = hp.rpe.get("target", None)
        else:
            self.rpe_id, self.rpe, self.rpe_target = None, None, None

    def __call__(self, q: Masked, kv: Masked,
                 return_attn: bool = False) -> Mapping[str, Any]:
        q_lengths = q.lengths
        qv = self.q_proj(q.value)
        kvv = self.kv_proj(kv.value)
        kk, vv = jnp.split(kvv, 2, axis=-1)
        if self.rpe_id in ("SinCos", "Rotary"):
            if self.rpe_target == "source":
                qv = self.rpe(qv)
            elif self.rpe_target == "memory":
                kk = self.rpe(kk)
            else:
                qv, kk = self.rpe(qv), self.rpe(kk)
        tq, tk = qv.shape[1], kk.shape[1]
        k_pos = jnp.arange(tk)
        pad = k_pos[None, :] < kv.lengths[:, None]
        mask = jnp.broadcast_to(pad[:, None, None, :],
                                (qv.shape[0], 1, tq, tk))
        out, attn = attend(_split_heads(qv, self.nheads),
                           _split_heads(kk, self.nheads),
                           _split_heads(vv, self.nheads),
                           None, mask, return_attn=return_attn)
        out = self.out_proj(_merge_heads(out))
        ret: dict = {"output": Masked(out, q_lengths, 1).apply_mask()}
        if return_attn:
            ret["attn"] = jax.lax.stop_gradient(attn)
        return ret
