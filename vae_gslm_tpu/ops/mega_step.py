"""Pallas TPU mega-kernel: the ENTIRE 16-layer trunk AR step in ONE
kernel call (v2 — staged appends, block-major cold reads).

Motivation (PERFORMANCE.md round-3 slope-timed ladder): at serving
batch 8 the v1 kernel's cost decomposed into a 344 us streaming shell
(already at the ~733 GB/s HBM roofline), ~156 us of B=8 compute,
+230 us of cold-prefix reads (vs a 168 us bandwidth floor for the
strided flat layout) and +118 us of caller-side tail-append
``dynamic_update_slice`` (XLA rewrites all four tail arrays every
step because the kernel consumed them).  v2 removes the two
non-roofline items:

  * **8-row bf16 staging tier.** The kernel emits the current step's
    K/V rows in bf16; the caller appends them to a tiny
    ``(L, 8, H, B, Dh)`` staging buffer (a ~2 MB copy instead of
    ~50 MB) and only every 8 steps quantizes the staged rows into the
    int8 tail in one amortized update.  In-kernel attention gains a
    third tier — cold (int8 blocks) / tail (int8 + per-row scales) /
    stage (bf16) / current token — with the tail masked at
    ``stage_base`` so tiers never overlap.
  * **Block-major cold cache** ``(L, NB, H, B, Dh, 128)``: each
    (layer, block) read is one contiguous 1 MB DMA instead of
    H*B*Dh strided 128-byte runs, and the first block's DMA is
    started one grid phase early (during the FFN phases of the
    previous layer) to hide its latency.

Kernel structure (unchanged from v1 where it was already at
roofline):

  grid = (num_layers, 4): 4 phases per layer —
    p 0   qkv        (h1 = RMS(x); qkv = h1 @ Wqkv)
    p 1   attention  (cold DMA loop + tail + stage + self)
                     + out-projection, residual
    p 2   FFN up     (h2 = RMS(x); g = GELU(h2 @ W1))
    p 3   FFN down   (x += g @ W2)

Weights are int8 (per-out-column scales) stacked per layer; each
phase's BlockSpec streams one whole matrix (1-4 MB int8),
double-buffered by the Pallas pipeline.  The residual stream x (B, D)
lives in VMEM scratch across all grid steps.  Attention numerics:
s8 x s8 MXU for the cold/tail q-K and prob-V products (f32 only on
(B*H, T) logits), bf16 VPU for the 8-row stage tier, f32 for the
current token; matmuls run bf16 (int8 weights upconverted chunk-wise
in VMEM).

Replaces the reference's cuDNN/torch per-op decode
(reference ``models/transformer.py`` decode path +
``trainers/speech/sampler.py:50-62`` AR loop) with a one-call-per-
step design; see ``inference/speech/sampler.py`` for the wiring.
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


BLK = 128
TAIL = 128
STAGE = 8
NEG_INF = -1e30
NPHASE = 4


def _kernel(scalars_ref,
            x_ref, wq_ref, wo_ref, w1_ref, w2_ref,
            sq_ref, so_ref, s1_ref, s2_ref, n1_ref, n3_ref,
            bq_ref, bo_ref, b1_ref, b2_ref,
            slopes_ref, ktail_ref, vtail_ref, kts_ref, vts_ref,
            kstage_ref, vstage_ref,
            k_hbm, v_hbm, kcs_hbm, vcs_hbm,
            xo_ref, kn_ref, vn_ref,
            x_s, qkv_s, g_s,
            kb, vb, ksb, vsb, sems,
            *, nlayers: int, nheads: int, head_dim: int, dim: int,
            flushed: int, batch: int, nslot: int, mm_chunk: int,
            a8: bool, w4: bool = False, w4_group: int = 128):
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
    # staging bookkeeping: rows [stage_base, pos) live in the bf16
    # stage buffer; the int8 tail holds [flushed, stage_base).
    rel = pos - flushed
    ns = jax.lax.rem(rel, STAGE)
    stage_base = pos - ns

    def rms(x, nscale):
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(ms + 1e-6) * nscale

    def mm(xin, w_ref, scales, din, dout):
        """bf16 matmul with an int8 weight block + col scales.

        The int8->bf16 upconversion is chunked along the output
        columns when ``mm_chunk`` is set (B>=32 default): converting
        the whole (d, 4d) block at once holds an 8 MB bf16 temp live
        through the dot, which is what pushed B=32 1.63 MB past the
        VMEM stack limit (chip_results/bench_b32_mega3.err).
        1024-column chunks cap the temp at 2 MB; at B<=16 the
        unchunked form stays (one big MXU dot, no concat).

        With ``a8`` the activation rows are quantized per-row to int8
        and the product runs s8 x s8 -> s32 on the MXU: the
        (din, dout) int8->bf16 weight upconversion (a VPU pass over
        every streamed weight byte — the largest non-roofline cost in
        the round-3 ladder's "+dense matmuls" rung) disappears
        entirely, the MXU runs at its doubled int8 rate, and no bf16
        weight temp exists (so no ``mm_chunk`` VMEM pressure either).
        Numerics precedent: the attention phase already int8-quantizes
        q and the probability rows the same way (per-row amax/127)."""
        if w4:
            # Nibble-packed weights: (din/2, dout) int8, rows r /
            # r + din/2 in the hi/lo nibble; ``scales`` is the
            # (din/group, dout) folded group scale.  Per-group a8
            # dots (K = group = 128, MXU-native depth) with f32
            # accumulation of the scaled partials — the weight
            # stream halves while the unpack shifts ride the same
            # VPU budget the a8 experiment showed is overlapped.
            wp = w_ref[...].reshape(din // 2, dout)
            # Mosaic has no int8 arith shifts (arith.shrsi fails to
            # legalize on i8 vectors); unpack through i32, the native
            # VPU width.
            w32 = wp.astype(jnp.int32)
            hi = (w32 >> 4).astype(jnp.int8)
            lo = ((w32 << 28) >> 28).astype(jnp.int8)  # sign-extended
            xf = xin.astype(jnp.float32)
            half = din // 2
            gsz = w4_group
            y = jnp.zeros((batch, dout), jnp.float32)
            for gi in range(din // gsz):
                r0 = gi * gsz
                wg = (hi[r0:r0 + gsz] if r0 < half
                      else lo[r0 - half:r0 - half + gsz])
                xg = xf[:, r0:r0 + gsz]
                amax = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)
                xs = jnp.maximum(amax, 1e-8) / 127.0
                x8 = jnp.round(xg / xs).astype(jnp.int8)
                y = y + jax.lax.dot_general(
                    x8, wg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32
                ).astype(jnp.float32) * (xs * scales[gi])
            return y
        if a8:
            xf = xin.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            xs = jnp.maximum(amax, 1e-8) / 127.0
            x8 = jnp.round(xf / xs).astype(jnp.int8)
            y = jax.lax.dot_general(
                x8, w_ref[...].reshape(din, dout),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return y.astype(jnp.float32) * (xs * scales)
        xb = xin.astype(jnp.bfloat16)
        if not mm_chunk or dout <= mm_chunk:
            w = w_ref[...].reshape(din, dout).astype(jnp.bfloat16)
            y = jnp.dot(xb, w, preferred_element_type=jnp.float32)
            return y * scales
        wv = w_ref[...].reshape(din, dout)
        outs = [
            jnp.dot(xb, wv[:, c0:c0 + mm_chunk].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            for c0 in range(0, dout, mm_chunk)
        ]
        return jnp.concatenate(outs, axis=-1) * scales

    def dma(layer, blk):
        """Cold block ``blk`` of ``layer`` -> slot ``blk % nslot``.
        With ``nslot == nblk`` (small batch) every block is prefetched
        during the PREVIOUS layer's FFN phases so the attention phase
        only waits; with fewer slots (large batch, VMEM-bounded) the
        attention loop double-buffers: block ``i + nslot`` starts as
        soon as block ``i`` has been consumed."""
        slot = blk % nslot
        return (
            pltpu.make_async_copy(k_hbm.at[layer, blk],
                                  kb.at[slot], sems.at[0, slot]),
            pltpu.make_async_copy(v_hbm.at[layer, blk],
                                  vb.at[slot], sems.at[1, slot]),
            pltpu.make_async_copy(kcs_hbm.at[layer, blk],
                                  ksb.at[slot], sems.at[2, slot]),
            pltpu.make_async_copy(vcs_hbm.at[layer, blk],
                                  vsb.at[slot], sems.at[3, slot]),
        )

    # ------------------------------------------------ p 0: qkv
    @pl.when(jnp.logical_and(li == 0, p == 0))
    def _():
        x_s[...] = x_ref[...].astype(jnp.float32)
        # layer 0's cold blocks (up to one per slot): start during
        # the qkv phase
        for blk in range(min(nblk, nslot)):
            for c in dma(0, blk):
                c.start()

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

        # emit the new K/V row in bf16; the caller stages it
        kn_ref[...] = k_cur.astype(jnp.bfloat16).reshape(1, h, b, dh)
        vn_ref[...] = v_cur.astype(jnp.bfloat16).reshape(1, h, b, dh)

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

        m0 = jnp.full((gh, 1, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((gh, 1, 1), jnp.float32)
        acc0 = jnp.zeros((gh, 1, dh), jnp.float32)
        m, l, acc = m0, l0, acc0
        for i in range(nblk):     # slot-resident blocks in flight
            for c in dma(li, i):
                c.wait()
            k8 = kb[i % nslot].reshape(gh, dh, BLK)
            s_i32 = jax.lax.dot_general(
                q8, k8, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            s = (s_i32.astype(jnp.float32)
                 * (q_scale * scale)) * ksb[i % nslot].reshape(
                     gh, 1, BLK)
            t_idx = (i * BLK + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, BLK), 2))
            s = s + slopes * jnp.abs(t_idx - pos).astype(jnp.float32)
            vsl = vsb[i % nslot].reshape(gh, 1, BLK)
            vbl = vb[i % nslot].reshape(gh, dh, BLK)
            m, l, acc = merge(m, l, acc, s,
                              lambda e: av_i8(e, vsl, vbl, 2))
            if i + nslot < nblk:
                # slot ``i % nslot`` is consumed (the dots above read
                # its data synchronously) — refill it with the block
                # ``nslot`` ahead while later tiers compute.
                for c in dma(li, i + nslot):
                    c.start()

        # tail: positions [flushed, flushed + TAIL), valid below
        # stage_base (rows >= stage_base are served by the stage tier)
        kt8 = ktail_ref[...].reshape(gh, TAIL, dh)
        s_i32 = jax.lax.dot_general(
            q8, kt8, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        s = (s_i32.astype(jnp.float32)
             * (q_scale * scale)) * kts_ref[...].reshape(gh, 1, TAIL)
        t_idx = (flushed + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, TAIL), 2))
        s = s + slopes * jnp.abs(t_idx - pos).astype(jnp.float32)
        s = jnp.where(t_idx < stage_base, s, NEG_INF)
        vt8 = vtail_ref[...].reshape(gh, TAIL, dh)
        vts = vts_ref[...].reshape(gh, 1, TAIL)
        m, l, acc = merge(m, l, acc, s,
                          lambda e: av_i8(e, vts, vt8, 1))

        # stage: bf16 rows [stage_base, pos) — VPU tier (8 rows)
        kst = kstage_ref[...].reshape(STAGE, gh, dh).astype(
            jnp.float32)
        vst = vstage_ref[...].reshape(STAGE, gh, dh).astype(
            jnp.float32)
        q1 = q.reshape(1, gh, dh)
        s_st = jnp.sum(q1 * kst, axis=2) * scale      # (STAGE, GH)
        s_st = jnp.transpose(s_st).reshape(gh, 1, STAGE)
        j_idx = (stage_base + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, STAGE), 2))
        s_st = s_st + slopes * jnp.abs(j_idx - pos).astype(
            jnp.float32)
        s_st = jnp.where(j_idx < pos, s_st, NEG_INF)

        def av_stage(e):
            e_t = jnp.transpose(e.reshape(gh, STAGE))   # (STAGE, GH)
            return jnp.sum(e_t[:, :, None] * vst,
                           axis=0).reshape(gh, 1, dh)

        m, l, acc = merge(m, l, acc, s_st, av_stage)

        # current token
        s_self = jnp.sum(q * k_cur, axis=2, keepdims=True) * scale
        m_f = jnp.maximum(m, s_self)
        corr = jnp.exp(m - m_f)
        e_self = jnp.exp(s_self - m_f)
        l_f = l * corr + e_self
        acc_f = acc * corr + e_self * v_cur

        # Each branch produces the FINAL-scaled projection y: the w4
        # group scales are per (row-group, out-col) and must apply
        # inside the per-head loop, so the shared per-column
        # ``* so_ref[li]`` epilogue moves into the branches.
        y = jnp.zeros((b, d), jnp.float32)
        if w4:
            wp32 = wo_ref[...].reshape(d // 2, d).astype(jnp.int32)
            wo8 = jnp.concatenate(
                [(wp32 >> 4).astype(jnp.int8),
                 ((wp32 << 28) >> 28).astype(jnp.int8)], axis=0)
            attn = acc_f / l_f                        # (GH, 1, Dh) f32
            for h0 in range(h):
                a_h = attn[h0 * b:(h0 + 1) * b, 0]    # (B, Dh)
                amax = jnp.max(jnp.abs(a_h), axis=-1, keepdims=True)
                asx = jnp.maximum(amax, 1e-8) / 127.0
                a8_h = jnp.round(a_h / asx).astype(jnp.int8)
                # head rows [h0*dh, (h0+1)*dh) sit inside ONE scale
                # group (dh <= w4_group and the slices are aligned)
                gsc = so_ref[li, (h0 * dh) // w4_group]
                y = y + jax.lax.dot_general(
                    a8_h, wo8[h0 * dh:(h0 + 1) * dh],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32
                ).astype(jnp.float32) * (asx * gsc)
        elif a8:
            attn = acc_f / l_f                        # (GH, 1, Dh) f32
            wo8 = wo_ref[...].reshape(d, d)
            for h0 in range(h):
                a_h = attn[h0 * b:(h0 + 1) * b, 0]    # (B, Dh)
                amax = jnp.max(jnp.abs(a_h), axis=-1, keepdims=True)
                asx = jnp.maximum(amax, 1e-8) / 127.0
                a8_h = jnp.round(a_h / asx).astype(jnp.int8)
                y = y + jax.lax.dot_general(
                    a8_h, wo8[h0 * dh:(h0 + 1) * dh],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32
                ).astype(jnp.float32) * asx
            y = y * so_ref[li]
        else:
            attn = (acc_f / l_f).astype(jnp.bfloat16)  # (GH, 1, Dh)
            wo = wo_ref[...].reshape(d, d).astype(jnp.bfloat16)
            for h0 in range(h):
                a_h = attn[h0 * b:(h0 + 1) * b, 0]    # (B, Dh)
                y = y + jnp.dot(a_h, wo[h0 * dh:(h0 + 1) * dh],
                                preferred_element_type=jnp.float32)
            y = y * so_ref[li]
        x_s[...] = x_s[...] + y + bo_ref[li]

    # --------------------------------------------------- p 2: FFN up
    @pl.when(p == 2)
    def _():
        h2 = rms(x_s[...], n3_ref[li])
        g_s[...] = _gelu_exact(mm(h2, w1_ref, s1_ref[li], d, 4 * d)
                               + b1_ref[li])
        if nblk > 0:
            # prefetch the next layer's cold blocks (one per free
            # slot) during the FFN phases — with nslot == nblk the
            # attention phase then only waits; with fewer slots the
            # attention loop streams the remainder
            @pl.when(li + 1 < nlayers)
            def _():
                for blk in range(min(nblk, nslot)):
                    for c in dma(li + 1, blk):
                        c.start()

    # ------------------------------------------------- p 3: FFN down
    @pl.when(p == 3)
    def _():
        x_s[...] = (x_s[...] + mm(g_s[...], w2_ref, s2_ref[li],
                                  4 * d, d) + b2_ref[li])

    @pl.when(jnp.logical_and(li == nlayers - 1, p == NPHASE - 1))
    def _():
        xo_ref[...] = x_s[...].astype(xo_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("flushed", "interpret", "nslot",
                                    "mm_chunk", "a8"))
def fused_trunk_step(x: Array, weights, cache: dict,
                     pos: Array, slopes: Array, flushed: int,
                     interpret: bool = False,
                     nslot: int | None = None,
                     mm_chunk: int | None = None,
                     a8: bool = False):
    """One full trunk AR step over the mega cache.

    x: (B, D) residual stream; ``weights`` is the dict from
    ``TransformerLayerStack.build_mega_decode`` (int8 chunk arrays +
    scales + norm scales); ``cache`` holds
      k_cold/v_cold   (L, NB, H, B, Dh, BLK) int8   block-major
      kc_scale/vc_scale (L, NB, H, B, BLK) f32
      k_tail/v_tail   (L, H, B, TAIL, Dh) int8
      kt_scale/vt_scale (L, H, B, TAIL) f32
      k_stage/v_stage (L, STAGE, H, B, Dh) bf16
    Returns (x_out (B, D) f32, k_new (L, H, B, Dh) bf16, v_new).
    The caller appends k_new/v_new into the stage buffer at slot
    ``(pos - flushed) % STAGE`` and merges the stage into the tail
    every STAGE steps (``merge_stage``)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d = x.shape
    nl = weights["wq"].shape[0]
    h = cache["k_tail"].shape[1]
    dh = d // h
    # Nibble-packed weights (build_mega_decode_w4): detected from the
    # pytree structure, so the jit retraces automatically.  The scale
    # group size is derived from the gq shape (L, din/group, dout).
    w4 = "gq" in weights
    wd = d // 2 if w4 else d
    w4_group = d // weights["gq"].shape[1] if w4 else 128
    assert flushed % BLK == 0
    nblk = flushed // BLK
    # Cold-cache VMEM slots: one per block when they fit in a ~32 MB
    # budget (B<=16: the attention phase then only waits on prefetches
    # issued during the previous layer's FFN), else the largest slot
    # count the budget allows (>=2, double-buffered streaming inside
    # the attention loop) — this is what admits B=32/64, where
    # one-slot-per-block exceeds VMEM.
    if nslot is None:
        # 24 MB: leaves room in the 128 MB VMEM for the register-
        # allocator spill slots Mosaic generates at large B (measured
        # 24.6 MB at B=32 — a 32 MB slot budget OOM'd by 3.2 MB).
        slot_bytes = h * b * BLK * (2 * dh + 8)
        nslot = max(2, (24 * 2**20) // max(slot_bytes, 1))
    nslot = max(1, min(max(nblk, 1), nslot))
    if mm_chunk is None:
        # Chunked weight upconversion at B>=32 only: at B<=16 the
        # whole-matrix bf16 temp fits comfortably and one big MXU dot
        # avoids the per-chunk concat.
        mm_chunk = 1024 if b >= 32 else 0

    full = lambda a: pl.BlockSpec(a.shape, lambda li, p, s:
                                  (0,) * a.ndim)

    def at_phase(use_p):
        """Index map fetching the layer's block one phase BEFORE it
        is used at phase ``use_p``: all four weight matrices fetched
        in one burst (index map (li,..)) stall the pipeline for
        ~16 us at each layer boundary; spreading them across phases
        overlaps each fetch with the previous phase's compute."""
        def f(li, p, s):
            return jnp.maximum(
                (li * NPHASE + p - use_p) // NPHASE, 0)
        return f

    i_q, i_att, i_up, i_dn = (at_phase(u) for u in range(NPHASE))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nl, NPHASE),
        in_specs=[
            full(x),
            pl.BlockSpec((1, wd, 3 * d),
                         lambda li, p, s: (i_q(li, p, s), 0, 0)),
            pl.BlockSpec((1, wd, d),
                         lambda li, p, s: (i_att(li, p, s), 0, 0)),
            pl.BlockSpec((1, wd, 4 * d),
                         lambda li, p, s: (i_up(li, p, s), 0, 0)),
            pl.BlockSpec((1, 4 * wd, d),
                         lambda li, p, s: (i_dn(li, p, s), 0, 0)),
            full(weights["gq"] if w4 else weights["sq"]),
            full(weights["go"] if w4 else weights["so"]),
            full(weights["g1"] if w4 else weights["s1"]),
            full(weights["g2"] if w4 else weights["s2"]),
            full(weights["n1"]), full(weights["n3"]),
            full(weights["bq"]), full(weights["bo"]),
            full(weights["b1"]), full(weights["b2"]),
            pl.BlockSpec((h, 1), lambda li, p, s: (0, 0)),
            pl.BlockSpec((1, h, b, TAIL, dh),
                         lambda li, p, s: (i_att(li, p, s),
                                           0, 0, 0, 0)),
            pl.BlockSpec((1, h, b, TAIL, dh),
                         lambda li, p, s: (i_att(li, p, s),
                                           0, 0, 0, 0)),
            pl.BlockSpec((1, h, b, TAIL),
                         lambda li, p, s: (i_att(li, p, s), 0, 0, 0)),
            pl.BlockSpec((1, h, b, TAIL),
                         lambda li, p, s: (i_att(li, p, s), 0, 0, 0)),
            pl.BlockSpec((1, STAGE, h, b, dh),
                         lambda li, p, s: (i_att(li, p, s),
                                           0, 0, 0, 0)),
            pl.BlockSpec((1, STAGE, h, b, dh),
                         lambda li, p, s: (i_att(li, p, s),
                                           0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((b, d), lambda li, p, s: (0, 0)),
            pl.BlockSpec((1, h, b, dh), lambda li, p, s: (li, 0, 0, 0)),
            pl.BlockSpec((1, h, b, dh), lambda li, p, s: (li, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),          # x_s
            pltpu.VMEM((b, 3 * d), jnp.float32),      # qkv_s
            pltpu.VMEM((b, 4 * d), jnp.float32),      # g_s
            pltpu.VMEM((nslot, h, b, dh, BLK), jnp.int8),  # kb
            pltpu.VMEM((nslot, h, b, dh, BLK), jnp.int8),  # vb
            pltpu.VMEM((nslot, h, b, BLK), jnp.float32),  # ksb
            pltpu.VMEM((nslot, h, b, BLK), jnp.float32),  # vsb
            pltpu.SemaphoreType.DMA((4, nslot)),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, nlayers=nl, nheads=h, head_dim=dh,
                          dim=d, flushed=flushed, batch=b,
                          nslot=nslot, mm_chunk=mm_chunk, a8=a8,
                          w4=w4, w4_group=w4_group),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((nl, h, b, dh), jnp.bfloat16),
            jax.ShapeDtypeStruct((nl, h, b, dh), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            # 119 MB: the r3 100 MB cap was itself the B=32 compile
            # failure (standalone scoped demand measured 101-104 MB vs
            # a ~121 MB hardware ceiling — tools/probe_mega_vmem.py).
            vmem_limit_bytes=119 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray([pos], jnp.int32),
      x, weights["wq"], weights["wo"], weights["w1"], weights["w2"],
      weights["gq"] if w4 else weights["sq"],
      weights["go"] if w4 else weights["so"],
      weights["g1"] if w4 else weights["s1"],
      weights["g2"] if w4 else weights["s2"],
      weights["n1"], weights["n3"],
      weights["bq"], weights["bo"], weights["b1"], weights["b2"],
      slopes.astype(jnp.float32)[:, None],
      cache["k_tail"], cache["v_tail"],
      cache["kt_scale"].astype(jnp.float32),
      cache["vt_scale"].astype(jnp.float32),
      cache["k_stage"], cache["v_stage"],
      cache["k_cold"], cache["v_cold"],
      cache["kc_scale"].astype(jnp.float32),
      cache["vc_scale"].astype(jnp.float32))
    return tuple(outs)


def stage_append(cache: dict, k_new: Array, v_new: Array,
                 slot) -> dict:
    """Append the step's bf16 K/V rows ((L, H, B, Dh)) to stage slot
    ``slot`` — a ~2 MB update instead of the v1 full-tail rewrite."""
    cache = dict(cache)
    cache["k_stage"] = jax.lax.dynamic_update_slice(
        cache["k_stage"], k_new[:, None], (0, slot, 0, 0, 0))
    cache["v_stage"] = jax.lax.dynamic_update_slice(
        cache["v_stage"], v_new[:, None], (0, slot, 0, 0, 0))
    return cache


def merge_stage(cache: dict, tail_slot: int) -> dict:
    """Quantize the 8 staged rows and write them into the int8 tail
    at ``tail_slot`` (static, multiple of STAGE).  Runs once every
    STAGE steps."""
    ks = cache["k_stage"].astype(jnp.float32)   # (L, S, H, B, Dh)
    vs = cache["v_stage"].astype(jnp.float32)

    def quant(x):
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        sc = jnp.maximum(amax, 1e-8) / 127.0
        return (jnp.round(x / sc).astype(jnp.int8),
                sc[..., 0].astype(jnp.float32))

    k8, ksc = quant(ks)
    v8, vsc = quant(vs)
    # (L, S, H, B, Dh) -> (L, H, B, S, Dh)
    perm = (0, 2, 3, 1, 4)
    cache = dict(cache)
    cache["k_tail"] = jax.lax.dynamic_update_slice(
        cache["k_tail"], jnp.transpose(k8, perm),
        (0, 0, 0, tail_slot, 0))
    cache["v_tail"] = jax.lax.dynamic_update_slice(
        cache["v_tail"], jnp.transpose(v8, perm),
        (0, 0, 0, tail_slot, 0))
    cache["kt_scale"] = jax.lax.dynamic_update_slice(
        cache["kt_scale"], jnp.transpose(ksc, (0, 2, 3, 1)),
        (0, 0, 0, tail_slot))
    cache["vt_scale"] = jax.lax.dynamic_update_slice(
        cache["vt_scale"], jnp.transpose(vsc, (0, 2, 3, 1)),
        (0, 0, 0, tail_slot))
    return cache


def flush_mega(cache: dict, flushed_prev: int) -> dict:
    """Move the full int8 tail (one BLK-token block) into cold block
    ``flushed_prev // BLK`` — one structured write per 128 steps."""
    nb = flushed_prev // BLK
    cache = dict(cache)
    # tail (L, H, B, T, Dh) -> cold block (H, B, Dh, T)
    cache["k_cold"] = cache["k_cold"].at[:, nb].set(
        jnp.swapaxes(cache["k_tail"], 3, 4))
    cache["v_cold"] = cache["v_cold"].at[:, nb].set(
        jnp.swapaxes(cache["v_tail"], 3, 4))
    cache["kc_scale"] = cache["kc_scale"].at[:, nb].set(
        cache["kt_scale"])
    cache["vc_scale"] = cache["vc_scale"].at[:, nb].set(
        cache["vt_scale"])
    return cache


def fused_trunk_step_reference(x, weights, cache, pos, slopes,
                               flushed, a8=False):
    """Plain-JAX replication of the kernel's exact math (bf16 matmuls,
    int8 QK/AV with per-block u-quantization, bf16 stage tier; with
    ``a8`` the s8 x s8 dense-matmul path) for validation."""
    b, d = x.shape
    nl = weights["wq"].shape[0]
    h = cache["k_tail"].shape[1]
    dh = d // h
    gh = b * h
    scale = 1.0 / math.sqrt(dh)
    slopes_f = jnp.broadcast_to(
        slopes.astype(jnp.float32).reshape(h, 1, 1),
        (h, b, 1)).reshape(gh, 1, 1)
    rel = pos - flushed
    ns = rel % STAGE
    stage_base = pos - ns

    def rms(xx, nsc):
        ms = jnp.mean(jnp.square(xx), axis=-1, keepdims=True)
        return xx * jax.lax.rsqrt(ms + 1e-6) * nsc

    w4 = "gq" in weights
    w4_group = (d // weights["go"].shape[1]) if w4 else 128

    def mm(xin, w8, scales):
        if w4:
            din2, dout = w8.shape
            hi = w8 >> 4
            lo = (w8 << 4) >> 4
            xf = xin.astype(jnp.float32)
            gsz = (2 * din2) // scales.shape[0]
            y = jnp.zeros((xf.shape[0], dout), jnp.float32)
            for gi in range((2 * din2) // gsz):
                r0 = gi * gsz
                wg = (hi[r0:r0 + gsz] if r0 < din2
                      else lo[r0 - din2:r0 - din2 + gsz])
                xg = xf[:, r0:r0 + gsz]
                amax = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)
                xs = jnp.maximum(amax, 1e-8) / 127.0
                x8 = jnp.round(xg / xs).astype(jnp.int8)
                y = y + jax.lax.dot_general(
                    x8, wg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32
                ).astype(jnp.float32) * (xs * scales[gi])
            return y
        if a8:
            xf = xin.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            xs = jnp.maximum(amax, 1e-8) / 127.0
            x8 = jnp.round(xf / xs).astype(jnp.int8)
            y = jax.lax.dot_general(
                x8, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return y.astype(jnp.float32) * (xs * scales)
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
    k_news, v_news = [], []
    nblk = flushed // BLK
    for li in range(nl):
        h1 = rms(x, weights["n1"][li])
        qkv = (mm(h1, weights["wq"][li],
                  weights["gq" if w4 else "sq"][li])
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
        k_news.append(k_cur.astype(jnp.bfloat16).reshape(h, b, dh))
        v_news.append(v_cur.astype(jnp.bfloat16).reshape(h, b, dh))

        m = jnp.full((gh, 1, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((gh, 1, 1), jnp.float32)
        acc = jnp.zeros((gh, 1, dh), jnp.float32)
        for i in range(nblk):
            k8 = cache["k_cold"][li, i].reshape(gh, dh, BLK)
            s_i32 = jax.lax.dot_general(
                q8, k8, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            s = (s_i32.astype(jnp.float32) * (q_scale * scale)
                 * cache["kc_scale"][li, i].reshape(gh, 1, BLK))
            t_idx = i * BLK + jnp.arange(BLK).reshape(1, 1, BLK)
            s = s + slopes_f * jnp.abs(t_idx - pos).astype(jnp.float32)
            vsl = cache["vc_scale"][li, i].reshape(gh, 1, BLK)
            vbl = cache["v_cold"][li, i].reshape(gh, dh, BLK)
            m, l, acc = merge(m, l, acc, s,
                              lambda e: av_i8(e, vsl, vbl, 2))

        kt8 = cache["k_tail"][li].reshape(gh, TAIL, dh)
        s_i32 = jax.lax.dot_general(
            q8, kt8, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        s = (s_i32.astype(jnp.float32) * (q_scale * scale)
             * cache["kt_scale"][li].reshape(gh, 1, TAIL))
        t_idx = flushed + jnp.arange(TAIL).reshape(1, 1, TAIL)
        s = s + slopes_f * jnp.abs(t_idx - pos).astype(jnp.float32)
        s = jnp.where(t_idx < stage_base, s, NEG_INF)
        vt8 = cache["v_tail"][li].reshape(gh, TAIL, dh)
        vts = cache["vt_scale"][li].reshape(gh, 1, TAIL)
        m, l, acc = merge(m, l, acc, s,
                          lambda e: av_i8(e, vts, vt8, 1))

        kst = cache["k_stage"][li].reshape(
            STAGE, gh, dh).astype(jnp.float32)
        vst = cache["v_stage"][li].reshape(
            STAGE, gh, dh).astype(jnp.float32)
        q1 = q.reshape(1, gh, dh)
        s_st = jnp.sum(q1 * kst, axis=2) * scale
        s_st = jnp.transpose(s_st).reshape(gh, 1, STAGE)
        j_idx = stage_base + jnp.arange(STAGE).reshape(1, 1, STAGE)
        s_st = s_st + slopes_f * jnp.abs(j_idx - pos).astype(
            jnp.float32)
        s_st = jnp.where(j_idx < pos, s_st, NEG_INF)

        def av_stage(e):
            e_t = jnp.transpose(e.reshape(gh, STAGE))
            return jnp.sum(e_t[:, :, None] * vst,
                           axis=0).reshape(gh, 1, dh)

        m, l, acc = merge(m, l, acc, s_st, av_stage)

        s_self = jnp.sum(q * k_cur, axis=2, keepdims=True) * scale
        m_f = jnp.maximum(m, s_self)
        corr = jnp.exp(m - m_f)
        e_self = jnp.exp(s_self - m_f)
        l_f = l * corr + e_self
        acc_f = acc * corr + e_self * v_cur
        y = jnp.zeros((b, d), jnp.float32)
        if w4:
            wp = weights["wo"][li]
            wo8 = jnp.concatenate([wp >> 4, (wp << 4) >> 4], axis=0)
            attn = acc_f / l_f
            for h0 in range(h):
                a_h = attn[h0 * b:(h0 + 1) * b, 0]
                amax = jnp.max(jnp.abs(a_h), axis=-1, keepdims=True)
                asx = jnp.maximum(amax, 1e-8) / 127.0
                a8_h = jnp.round(a_h / asx).astype(jnp.int8)
                gsc = weights["go"][li, (h0 * dh) // w4_group]
                y = y + jax.lax.dot_general(
                    a8_h, wo8[h0 * dh:(h0 + 1) * dh],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32
                ).astype(jnp.float32) * (asx * gsc)
        elif a8:
            attn = acc_f / l_f
            wo8 = weights["wo"][li]
            for h0 in range(h):
                a_h = attn[h0 * b:(h0 + 1) * b, 0]
                amax = jnp.max(jnp.abs(a_h), axis=-1, keepdims=True)
                asx = jnp.maximum(amax, 1e-8) / 127.0
                a8_h = jnp.round(a_h / asx).astype(jnp.int8)
                y = y + jax.lax.dot_general(
                    a8_h, wo8[h0 * dh:(h0 + 1) * dh],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32
                ).astype(jnp.float32) * asx
            y = y * weights["so"][li]
        else:
            attn = (acc_f / l_f).astype(jnp.bfloat16)
            wo = weights["wo"][li].astype(jnp.bfloat16)
            for h0 in range(h):
                a_h = attn[h0 * b:(h0 + 1) * b, 0]
                y = y + jnp.dot(a_h, wo[h0 * dh:(h0 + 1) * dh],
                                preferred_element_type=jnp.float32)
            y = y * weights["so"][li]
        x = x + y + weights["bo"][li]
        h2 = rms(x, weights["n3"][li])
        g = _gelu_exact(mm(h2, weights["w1"][li],
                           weights["g1" if w4 else "s1"][li])
                        + weights["b1"][li])
        x = (x + mm(g, weights["w2"][li],
                    weights["g2" if w4 else "s2"][li])
             + weights["b2"][li])
    return x, jnp.stack(k_news), jnp.stack(v_news)
