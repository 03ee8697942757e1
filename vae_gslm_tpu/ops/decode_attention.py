"""Single-query decode attention over a static KV cache.

The AR decode step is KV-cache-bandwidth-bound: at the flagship
operating point (B=128, 16 heads, d=64, cache 651) each step streams
~5.5 GB of cache through HBM.  Two levers applied here:

  * head-major ``(B, H, T, D)`` cache layout (contiguous per-head
    planes);
  * a **static window**: the sampler splits its scan into segments and
    attends only over ``cache[:, :, :window]`` for the segment's maximal
    position — unfilled cache slots beyond the window are never read.
    With 4 segments over a 150→650 position ramp this cuts cache reads
    ~30% at full XLA streaming efficiency (see
    ``inference/speech/sampler.py``).

ALiBi bias is synthesized from iota (slopes are negative, symmetric
|distance| as in ``nn.positions.ALiBi``); softmax in fp32.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array
NEG_INF = -1e30


def decode_attention_packed(q: Array, k_cache: Array, v_cache: Array,
                            pos: Array, slopes: Optional[Array],
                            window: Optional[int] = None,
                            k_scale: Optional[Array] = None,
                            v_scale: Optional[Array] = None,
                            return_weights: bool = False):
    """Lane-packed decode attention over a ``(T, D, N)`` cache,
    N = B*H (b major, h minor).

    Both dots keep N on the vector lanes at any batch — the QK product
    reduces over D (sublanes) and the AV product streams over T (major
    axis) — which is the layout XLA only picks for the base
    ``(B, H, T, D)`` cache when B >= 128 (r4 trace finding: at B=64 it
    falls back to a D-minor layout, 946 vs 219 us/step/layer;
    ``tools/bench_b64_fold.py`` measures this form at 521 GB/s vs 60
    for the base form at B=64).  q: (B, H, D); scales: (T, N).
    Returns (B, H, D) (+ optional (B, H, T_full) weights)."""
    b, h, d = q.shape
    n = b * h
    t_full = k_cache.shape[0]
    if window is not None and window < t_full:
        k_cache = k_cache[:window]
        v_cache = v_cache[:window]
        if k_scale is not None:
            k_scale = k_scale[:window]
            v_scale = v_scale[:window]
    t = k_cache.shape[0]
    scale = 1.0 / math.sqrt(d)
    qn = q.reshape(n, d)
    if k_scale is not None:
        q_amax = jnp.max(jnp.abs(qn), axis=-1, keepdims=True)
        q_scale = (q_amax.astype(jnp.float32) / 127.0)
        qi = jnp.round(qn.astype(jnp.float32)
                       / jnp.maximum(q_scale, 1e-8)).astype(jnp.int8)
        li = jnp.einsum("dn,tdn->tn", jnp.swapaxes(qi, 0, 1), k_cache,
                        preferred_element_type=jnp.int32)
        logits = (li.astype(jnp.float32)
                  * (q_scale[None, :, 0]
                     * k_scale.astype(jnp.float32) * scale))
    else:
        logits = jnp.einsum("dn,tdn->tn", jnp.swapaxes(qn, 0, 1),
                            k_cache,
                            preferred_element_type=jnp.float32) * scale
    k_pos = jnp.arange(t)
    if slopes is not None:
        slopes_n = jnp.tile(slopes.astype(jnp.float32), b)   # n=b*H+h
        dist = jnp.abs(k_pos - pos).astype(jnp.float32)
        logits = logits + slopes_n[None, :] * dist[:, None]
    logits = jnp.where(k_pos[:, None] <= pos, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=0)                        # (T, N)
    if v_scale is not None:
        wv = (w * v_scale.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jnp.einsum("tn,tdn->dn", wv,
                         v_cache.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    else:
        wv = w.astype(v_cache.dtype)
        out = jnp.einsum("tn,tdn->dn", wv, v_cache,
                         preferred_element_type=jnp.float32)
    out = jnp.swapaxes(out, 0, 1).reshape(b, h, d).astype(q.dtype)
    if return_weights:
        wbht = jnp.swapaxes(w, 0, 1).reshape(b, h, t)
        if t < t_full:
            wbht = jnp.pad(wbht, ((0, 0), (0, 0), (0, t_full - t)))
        return out, wbht
    return out


def decode_attention(q: Array, k_cache: Array, v_cache: Array,
                     pos: Array, slopes: Optional[Array],
                     window: Optional[int] = None,
                     k_scale: Optional[Array] = None,
                     v_scale: Optional[Array] = None,
                     return_weights: bool = False):
    """q: (B, H, D); caches: (B, H, T, D); pos: scalar absolute query
    position (keys ≤ pos are valid); slopes: (H,) negative ALiBi slopes
    or None; window: static prefix length to attend over (must satisfy
    window > pos at runtime); k_scale/v_scale: (B, H, T) int8
    dequantization scales.  Returns (B, H, D), or
    ``(out, weights (B, H, T_full))`` with ``return_weights`` (weights
    are zero-padded back to the full cache length if windowed).
    A rank-3 ``k_cache`` dispatches to the lane-packed form
    (``decode_attention_packed``)."""
    if k_cache.ndim == 3:
        return decode_attention_packed(
            q, k_cache, v_cache, pos, slopes, window=window,
            k_scale=k_scale, v_scale=v_scale,
            return_weights=return_weights)
    t_full = k_cache.shape[2]
    if window is not None and window < k_cache.shape[2]:
        k_cache = k_cache[:, :, :window]
        v_cache = v_cache[:, :, :window]
        if k_scale is not None:
            k_scale = k_scale[:, :, :window]
            v_scale = v_scale[:, :, :window]
    t = k_cache.shape[2]
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    if k_scale is not None:
        # Native s8 x s8 MXU matmul: quantize the single query row per
        # (b, h) and dequantize the small logits tensor instead of
        # upconverting the whole cache — the int8->bf16 convert
        # otherwise caps streaming at ~570 GB/s vs ~800 GB/s
        # (measured; ~7% faster at the flagship operating point).
        q_amax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
        q_scale = (q_amax / 127.0).astype(jnp.float32)
        qi = jnp.round(q / jnp.maximum(q_scale, 1e-8)).astype(jnp.int8)
        logits_i = jnp.einsum("bhd,bhtd->bht", qi, k_cache,
                              preferred_element_type=jnp.int32)
        logits = (logits_i.astype(jnp.float32)
                  * (q_scale * k_scale.astype(jnp.float32) * scale))
    else:
        logits = jnp.einsum("bhd,bhtd->bht", q, k_cache,
                            preferred_element_type=jnp.float32) * scale
    k_pos = jnp.arange(t)
    if slopes is not None:
        dist = jnp.abs(k_pos - pos).astype(jnp.float32)
        logits = logits + (slopes.astype(jnp.float32)[None, :, None]
                           * dist[None, None, :])
    mask = k_pos[None, None, :] <= pos
    logits = jnp.where(mask, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        # Fold the per-key scale into the attention weights so the int8
        # values are consumed directly by the weighted sum.
        wv = (w * v_scale.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jnp.einsum("bht,bhtd->bhd", wv,
                         v_cache.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum("bht,bhtd->bhd", w.astype(v_cache.dtype),
                         v_cache, preferred_element_type=jnp.float32)
    out = out.astype(q.dtype)
    if return_weights:
        if t < t_full:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, t_full - t)))
        return out, w
    return out
