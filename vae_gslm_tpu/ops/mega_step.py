"""Pallas TPU mega-kernel: the ENTIRE 16-layer trunk AR step in ONE
kernel call.

Motivation (PERFORMANCE.md round 2): a trivial Pallas call costs
~16.5 us on this platform and XLA ops ~3-5 us, so at serving batch 8
any per-op or per-layer-kernel decode pays 0.3-1 ms/step of pure
fixed cost against a ~0.45 ms data floor (int8 weights ~200 MB +
int8 KV prefix ~140 MB).  One kernel per step pays the fixed cost
once and streams everything back-to-back:

  grid = (num_layers, 4): 4 phases per layer —
    p 0   qkv        (h1 = RMS(x); qkv = h1 @ Wqkv)
    p 1   attention  (cold cache DMA loop + tail + self)
                     + out-projection, residual
    p 2   FFN up     (h2 = RMS(x); g = GELU(h2 @ W1))
    p 3   FFN down   (x += g @ W2)

  Weights are int8 (per-out-column scales) stacked per layer; each
  phase's BlockSpec streams one whole matrix (3-4 MB int8),
  double-buffered by the Pallas pipeline.  The residual stream
  x (B, D) lives in VMEM scratch across all grid steps.  (A 12-phase
  1 MB-chunk variant measured ~230 us/step slower: per-grid-step
  overhead dominates at B=8.)

KV cache is the hybrid cold/tail layout of ``ops/fused_decode.py``:
time-minor int8 cold prefix (manual double-buffered DMA over a STATIC
``flushed`` bound) + head-major 128-token tail (BlockSpec input).
The kernel emits each layer's quantized new K/V row + scales as
outputs; the caller appends them to the tail (cheap sublane-dim
``dynamic_update_slice``) and periodically flushes tail -> cold.

Attention numerics match ``ops/fused_decode.py``: s8 x s8 MXU for
both the q-K and prob-V products, f32 only on (B*H, BLK) logits;
matmuls run bf16 (weights upconverted chunk-wise in VMEM).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

Array = jax.Array


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7 ~
    f32 exact); Mosaic has no erf/erfc lowering."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, pp = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + pp * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t
               + a1) * t * jnp.exp(-ax * ax)
    return sign * y


def _gelu_exact(x):
    """erf-form GELU (torch nn.GELU default)."""
    return 0.5 * x * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))
BLK = 256
TAIL = 128
NEG_INF = -1e30
NPHASE = 4


def _kernel(scalars_ref,
            x_ref, wq_ref, wo_ref, w1_ref, w2_ref,
            sq_ref, so_ref, s1_ref, s2_ref, n1_ref, n3_ref,
            bq_ref, bo_ref, b1_ref, b2_ref,
            slopes_ref, ktail_ref, vtail_ref, kts_ref, vts_ref,
            k_hbm, v_hbm, kcs_hbm, vcs_hbm,
            xo_ref, kn_ref, vn_ref, kns_ref, vns_ref,
            x_s, h_s, qkv_s, g_s,
            kb, vb, ksb, vsb, sems,
            *, nlayers: int, nheads: int, head_dim: int, dim: int,
            flushed: int, batch: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    li = pl.program_id(0)
    p = pl.program_id(1)
    pos = scalars_ref[0]
    d = dim
    dh = head_dim
    h = nheads
    b = batch
    gh = b * h
    nblk = flushed // BLK
    scale = 1.0 / math.sqrt(dh)

    def rms(x, nscale):
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(ms + 1e-6) * nscale

    def mm(xin, w_ref, scales, din, dout):
        """bf16 matmul with an int8 weight block + col scales."""
        w = w_ref[...].reshape(din, dout).astype(jnp.bfloat16)
        y = jnp.dot(xin.astype(jnp.bfloat16), w,
                    preferred_element_type=jnp.float32)
        return y * scales

    # ------------------------------------------------ p 0..2: qkv
    @pl.when(jnp.logical_and(li == 0, p == 0))
    def _():
        x_s[...] = x_ref[...].astype(jnp.float32)

    @pl.when(p == 0)
    def _():
        h1 = rms(x_s[...], n1_ref[li])
        qkv_s[...] = (mm(h1, wq_ref, sq_ref[li], d, 3 * d)
                      + bq_ref[li])

    # ------------------------------------------------ p 1: attention
    @pl.when(p == 1)
    def _():
        def heads(off):
            """(B, D) lane range -> (GH, 1, Dh), h-major rows
            (Mosaic cannot lane->sublane reshape (B, D) directly)."""
            return jnp.stack(
                [qkv_s[:, off + h0 * dh: off + (h0 + 1) * dh]
                 for h0 in range(h)]).reshape(gh, 1, dh)

        q = heads(0)
        k_cur = heads(d)
        v_cur = heads(2 * d)
        slopes = slopes_ref[...].reshape(h, 1, 1)
        slopes = jnp.broadcast_to(slopes, (h, b, 1)).reshape(gh, 1, 1)

        q_amax = jnp.max(jnp.abs(q), axis=2, keepdims=True)
        q_scale = jnp.maximum(q_amax, 1e-8) / 127.0
        q8 = jnp.round(q / q_scale).astype(jnp.int8)

        # quantize + emit the new K/V row (appended to the tail by
        # the caller; it feeds THIS step's softmax via the self term)
        k_amax = jnp.max(jnp.abs(k_cur), axis=2, keepdims=True)
        k_sc = jnp.maximum(k_amax, 1e-8) / 127.0
        v_amax = jnp.max(jnp.abs(v_cur), axis=2, keepdims=True)
        v_sc = jnp.maximum(v_amax, 1e-8) / 127.0
        kn_ref[...] = jnp.round(k_cur / k_sc).astype(jnp.int8).reshape(
            1, h, b, dh)
        vn_ref[...] = jnp.round(v_cur / v_sc).astype(jnp.int8).reshape(
            1, h, b, dh)
        kns_ref[...] = k_sc.reshape(1, h, b)
        vns_ref[...] = v_sc.reshape(1, h, b)

        def merge(m, l, acc, s, v_fn):
            m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
            corr = jnp.exp(m - m_new)
            e = jnp.exp(s - m_new)
            l_new = l * corr + jnp.sum(e, axis=2, keepdims=True)
            return m_new, l_new, acc * corr + v_fn(e)

        def av_i8(e, vs, v8, tdim):
            u = e * vs
            u_amax = jnp.max(u, axis=2, keepdims=True)
            u_scale = jnp.maximum(u_amax, 1e-20) / 127.0
            u8 = jnp.round(u / u_scale).astype(jnp.int8)
            av = jax.lax.dot_general(
                u8, v8, (((2,), (tdim,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            return av.astype(jnp.float32) * u_scale

        def dma(slot, blk):
            sl = pl.ds(blk * BLK, BLK)
            return (
                pltpu.make_async_copy(k_hbm.at[li, :, :, :, sl],
                                      kb.at[slot], sems.at[0, slot]),
                pltpu.make_async_copy(v_hbm.at[li, :, :, :, sl],
                                      vb.at[slot], sems.at[1, slot]),
                pltpu.make_async_copy(kcs_hbm.at[li, :, :, sl],
                                      ksb.at[slot], sems.at[2, slot]),
                pltpu.make_async_copy(vcs_hbm.at[li, :, :, sl],
                                      vsb.at[slot], sems.at[3, slot]),
            )

        if nblk > 0:
            for c in dma(0, 0):
                c.start()

        def step(i, carry):
            m, l, acc = carry
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < nblk)
            def _():
                for c in dma(nxt, i + 1):
                    c.start()

            for c in dma(slot, i):
                c.wait()
            k8 = kb[slot].reshape(gh, dh, BLK)
            s_i32 = jax.lax.dot_general(
                q8, k8, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            s = (s_i32.astype(jnp.float32)
                 * (q_scale * scale)) * ksb[slot].reshape(gh, 1, BLK)
            t_idx = (i * BLK + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, BLK), 2))
            s = s + slopes * jnp.abs(t_idx - pos).astype(jnp.float32)
            vsl = vsb[slot].reshape(gh, 1, BLK)
            vbl = vb[slot].reshape(gh, dh, BLK)
            return merge(m, l, acc, s,
                         lambda e: av_i8(e, vsl, vbl, 2))

        m0 = jnp.full((gh, 1, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((gh, 1, 1), jnp.float32)
        acc0 = jnp.zeros((gh, 1, dh), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblk, step, (m0, l0, acc0))

        # tail: positions [flushed, flushed + TAIL)
        kt8 = ktail_ref[...].reshape(gh, TAIL, dh)
        s_i32 = jax.lax.dot_general(
            q8, kt8, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        s = (s_i32.astype(jnp.float32)
             * (q_scale * scale)) * kts_ref[...].reshape(gh, 1, TAIL)
        t_idx = (flushed + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, TAIL), 2))
        s = s + slopes * jnp.abs(t_idx - pos).astype(jnp.float32)
        s = jnp.where(t_idx < pos, s, NEG_INF)
        vt8 = vtail_ref[...].reshape(gh, TAIL, dh)
        vts = vts_ref[...].reshape(gh, 1, TAIL)
        m, l, acc = merge(m, l, acc, s,
                          lambda e: av_i8(e, vts, vt8, 1))

        # current token
        s_self = jnp.sum(q * k_cur, axis=2, keepdims=True) * scale
        m_f = jnp.maximum(m, s_self)
        corr = jnp.exp(m - m_f)
        e_self = jnp.exp(s_self - m_f)
        l_f = l * corr + e_self
        acc_f = acc * corr + e_self * v_cur

        attn = (acc_f / l_f).astype(jnp.bfloat16)   # (GH, 1, Dh)
        wo = wo_ref[...].reshape(d, d).astype(jnp.bfloat16)
        y = jnp.zeros((b, d), jnp.float32)
        for h0 in range(h):
            a_h = attn[h0 * b:(h0 + 1) * b, 0]        # (B, Dh)
            y = y + jnp.dot(a_h, wo[h0 * dh:(h0 + 1) * dh],
                            preferred_element_type=jnp.float32)
        x_s[...] = x_s[...] + y * so_ref[li] + bo_ref[li]

    # --------------------------------------------------- p 2: FFN up
    @pl.when(p == 2)
    def _():
        h2 = rms(x_s[...], n3_ref[li])
        g_s[...] = _gelu_exact(mm(h2, w1_ref, s1_ref[li], d, 4 * d)
                               + b1_ref[li])

    # ------------------------------------------------- p 3: FFN down
    @pl.when(p == 3)
    def _():
        x_s[...] = (x_s[...] + mm(g_s[...], w2_ref, s2_ref[li],
                                  4 * d, d) + b2_ref[li])

    @pl.when(jnp.logical_and(li == nlayers - 1, p == NPHASE - 1))
    def _():
        xo_ref[...] = x_s[...].astype(xo_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("flushed", "interpret"))
def fused_trunk_step(x: Array, weights, k_cold: Array, v_cold: Array,
                     kc_scale: Array, vc_scale: Array,
                     k_tail: Array, v_tail: Array,
                     kt_scale: Array, vt_scale: Array,
                     pos: Array, slopes: Array, flushed: int,
                     interpret: bool = False):
    """One full trunk AR step.

    x: (B, D) residual stream; ``weights`` is the dict from
    ``TransformerLayerStack.build_mega_decode`` (int8 chunk arrays +
    scales + norm scales); caches as in ``ops/fused_decode.py``.
    Returns (x_out (B, D) f32, k_new (L, B, H, Dh) i8, v_new i8,
    k_new_scale (L, B, H) f32, v_new_scale f32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d = x.shape
    nl = weights["wq"].shape[0]
    h = k_tail.shape[1]
    dh = d // h
    assert flushed % BLK == 0

    full = lambda a: pl.BlockSpec(a.shape, lambda li, p, s:
                                  (0,) * a.ndim)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nl, NPHASE),
        in_specs=[
            full(x),
            pl.BlockSpec((1, d, 3 * d), lambda li, p, s: (li, 0, 0)),
            pl.BlockSpec((1, d, d), lambda li, p, s: (li, 0, 0)),
            pl.BlockSpec((1, d, 4 * d), lambda li, p, s: (li, 0, 0)),
            pl.BlockSpec((1, 4 * d, d), lambda li, p, s: (li, 0, 0)),
            full(weights["sq"]), full(weights["so"]),
            full(weights["s1"]), full(weights["s2"]),
            full(weights["n1"]), full(weights["n3"]),
            full(weights["bq"]), full(weights["bo"]),
            full(weights["b1"]), full(weights["b2"]),
            pl.BlockSpec((h, 1), lambda li, p, s: (0, 0)),
            pl.BlockSpec((1, h, b, TAIL, dh),
                         lambda li, p, s: (li, 0, 0, 0, 0)),
            pl.BlockSpec((1, h, b, TAIL, dh),
                         lambda li, p, s: (li, 0, 0, 0, 0)),
            pl.BlockSpec((1, h, b, TAIL),
                         lambda li, p, s: (li, 0, 0, 0)),
            pl.BlockSpec((1, h, b, TAIL),
                         lambda li, p, s: (li, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((b, d), lambda li, p, s: (0, 0)),
            pl.BlockSpec((1, h, b, dh), lambda li, p, s: (li, 0, 0, 0)),
            pl.BlockSpec((1, h, b, dh), lambda li, p, s: (li, 0, 0, 0)),
            pl.BlockSpec((1, h, b), lambda li, p, s: (li, 0, 0)),
            pl.BlockSpec((1, h, b), lambda li, p, s: (li, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),          # x_s
            pltpu.VMEM((b, d), jnp.float32),          # h_s
            pltpu.VMEM((b, 3 * d), jnp.float32),      # qkv_s
            pltpu.VMEM((b, 4 * d), jnp.float32),      # g_s
            pltpu.VMEM((2, h, b, dh, BLK), jnp.int8),  # kb
            pltpu.VMEM((2, h, b, dh, BLK), jnp.int8),  # vb
            pltpu.VMEM((2, h, b, BLK), jnp.float32),  # ksb
            pltpu.VMEM((2, h, b, BLK), jnp.float32),  # vsb
            pltpu.SemaphoreType.DMA((4, 2)),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, nlayers=nl, nheads=h, head_dim=dh,
                          dim=d, flushed=flushed, batch=b),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((nl, h, b, dh), jnp.int8),
            jax.ShapeDtypeStruct((nl, h, b, dh), jnp.int8),
            jax.ShapeDtypeStruct((nl, h, b), jnp.float32),
            jax.ShapeDtypeStruct((nl, h, b), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray([pos], jnp.int32),
      x, weights["wq"], weights["wo"], weights["w1"], weights["w2"],
      weights["sq"], weights["so"], weights["s1"], weights["s2"],
      weights["n1"], weights["n3"],
      weights["bq"], weights["bo"], weights["b1"], weights["b2"],
      slopes.astype(jnp.float32)[:, None],
      k_tail, v_tail,
      kt_scale.astype(jnp.float32), vt_scale.astype(jnp.float32),
      k_cold, v_cold,
      kc_scale.astype(jnp.float32), vc_scale.astype(jnp.float32))
    return tuple(outs)


def fused_trunk_step_reference(x, weights, k_cold, v_cold, kc_scale,
                               vc_scale, k_tail, v_tail, kt_scale,
                               vt_scale, pos, slopes, flushed):
    """Plain-JAX replication of the kernel's exact math (bf16 matmuls,
    int8 QK/AV with per-block u-quantization) for validation."""
    b, d = x.shape
    nl = weights["wq"].shape[0]
    h = k_tail.shape[1]
    dh = d // h
    gh = b * h
    scale = 1.0 / math.sqrt(dh)
    slopes_f = jnp.broadcast_to(
        slopes.astype(jnp.float32).reshape(h, 1, 1),
        (h, b, 1)).reshape(gh, 1, 1)

    def rms(xx, ns):
        ms = jnp.mean(jnp.square(xx), axis=-1, keepdims=True)
        return xx * jax.lax.rsqrt(ms + 1e-6) * ns

    def mm(xin, w8, scales):
        w = w8.astype(jnp.bfloat16)
        y = jnp.dot(xin.astype(jnp.bfloat16), w,
                    preferred_element_type=jnp.float32)
        return y * scales

    def merge(m, l, acc, s, v_fn):
        m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
        corr = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new)
        l_new = l * corr + jnp.sum(e, axis=2, keepdims=True)
        return m_new, l_new, acc * corr + v_fn(e)

    def av_i8(e, vs, v8, tdim):
        u = e * vs
        u_amax = jnp.max(u, axis=2, keepdims=True)
        u_scale = jnp.maximum(u_amax, 1e-20) / 127.0
        u8 = jnp.round(u / u_scale).astype(jnp.int8)
        av = jax.lax.dot_general(
            u8, v8, (((2,), (tdim,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        return av.astype(jnp.float32) * u_scale

    x = x.astype(jnp.float32)
    k_news, v_news, kn_scales, vn_scales = [], [], [], []
    for li in range(nl):
        h1 = rms(x, weights["n1"][li])
        qkv = (mm(h1, weights["wq"][li], weights["sq"][li])
               + weights["bq"][li])
        def heads(off):
            return jnp.stack(
                [qkv[:, off + h0 * dh: off + (h0 + 1) * dh]
                 for h0 in range(h)]).reshape(gh, 1, dh)

        q = heads(0)
        k_cur = heads(d)
        v_cur = heads(2 * d)
        q_amax = jnp.max(jnp.abs(q), axis=2, keepdims=True)
        q_scale = jnp.maximum(q_amax, 1e-8) / 127.0
        q8 = jnp.round(q / q_scale).astype(jnp.int8)
        k_amax = jnp.max(jnp.abs(k_cur), axis=2, keepdims=True)
        k_sc = jnp.maximum(k_amax, 1e-8) / 127.0
        v_amax = jnp.max(jnp.abs(v_cur), axis=2, keepdims=True)
        v_sc = jnp.maximum(v_amax, 1e-8) / 127.0
        k_news.append(jnp.round(k_cur / k_sc).astype(
            jnp.int8).reshape(h, b, dh))
        v_news.append(jnp.round(v_cur / v_sc).astype(
            jnp.int8).reshape(h, b, dh))
        kn_scales.append(k_sc.reshape(h, b))
        vn_scales.append(v_sc.reshape(h, b))

        m = jnp.full((gh, 1, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((gh, 1, 1), jnp.float32)
        acc = jnp.zeros((gh, 1, dh), jnp.float32)
        for i in range(flushed // BLK):
            sl = slice(i * BLK, (i + 1) * BLK)
            k8 = k_cold[li][:, :, :, sl].reshape(gh, dh, BLK)
            s_i32 = jax.lax.dot_general(
                q8, k8, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            s = (s_i32.astype(jnp.float32) * (q_scale * scale)
                 * kc_scale[li][:, :, sl].reshape(gh, 1, BLK))
            t_idx = i * BLK + jnp.arange(BLK).reshape(1, 1, BLK)
            s = s + slopes_f * jnp.abs(t_idx - pos).astype(jnp.float32)
            vsl = vc_scale[li][:, :, sl].reshape(gh, 1, BLK)
            vbl = v_cold[li][:, :, :, sl].reshape(gh, dh, BLK)
            m, l, acc = merge(m, l, acc, s,
                              lambda e: av_i8(e, vsl, vbl, 2))

        kt8 = k_tail[li].reshape(gh, TAIL, dh)
        s_i32 = jax.lax.dot_general(
            q8, kt8, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        s = (s_i32.astype(jnp.float32) * (q_scale * scale)
             * kt_scale[li].reshape(gh, 1, TAIL))
        t_idx = flushed + jnp.arange(TAIL).reshape(1, 1, TAIL)
        s = s + slopes_f * jnp.abs(t_idx - pos).astype(jnp.float32)
        s = jnp.where(t_idx < pos, s, NEG_INF)
        vt8 = v_tail[li].reshape(gh, TAIL, dh)
        vts = vt_scale[li].reshape(gh, 1, TAIL)
        m, l, acc = merge(m, l, acc, s,
                          lambda e: av_i8(e, vts, vt8, 1))

        s_self = jnp.sum(q * k_cur, axis=2, keepdims=True) * scale
        m_f = jnp.maximum(m, s_self)
        corr = jnp.exp(m - m_f)
        e_self = jnp.exp(s_self - m_f)
        l_f = l * corr + e_self
        acc_f = acc * corr + e_self * v_cur
        attn = (acc_f / l_f).astype(jnp.bfloat16)
        wo = weights["wo"][li].astype(jnp.bfloat16)
        y = jnp.zeros((b, d), jnp.float32)
        for h0 in range(h):
            a_h = attn[h0 * b:(h0 + 1) * b, 0]
            y = y + jnp.dot(a_h, wo[h0 * dh:(h0 + 1) * dh],
                            preferred_element_type=jnp.float32)
        x = x + y * weights["so"][li] + weights["bo"][li]
        h2 = rms(x, weights["n3"][li])
        g = _gelu_exact(mm(h2, weights["w1"][li], weights["s1"][li])
                        + weights["b1"][li])
        x = (x + mm(g, weights["w2"][li], weights["s2"][li])
             + weights["b2"][li])
    return (x,
            jnp.stack(k_news), jnp.stack(v_news),
            jnp.stack(kn_scales), jnp.stack(vn_scales))
