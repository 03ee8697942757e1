"""Pallas TPU kernel: fully-fused single-query decode attention over a
hybrid cold/tail int8 KV cache (one kernel per layer per AR step).

Memory architecture (why two cache pieces):
  * TPU DMA slices must be 128-aligned in the minor dimension, so the
    bulk ("cold") cache is stored **block-major time-minor**
    ``(L, NB, B, H, D, 256)`` — each 256-token block is a contiguous
    ``(D, 256)`` plane per (batch, head), so the kernel's manual DMAs
    move 16 KB runs instead of the 256-byte runs a flat time-minor
    layout would produce (the block index leads B so the sliced dims
    stay clear of Mosaic's int8 sub-tiling).  ``flushed`` is static
    (a segment constant), so the ``flushed // 256``-block loop fully
    unrolls/pipelines.
  * XLA cannot write a time-minor column cheaply (a lane-dim
    ``dynamic_update_slice`` rewrites the whole cache — measured
    11 ms/step), so the most recent ≤256 tokens live in a small
    **head-major tail** ``(L, B, H, 256, D)`` that XLA appends to with
    a cheap sublane-dim row write.  The kernel reads the tail through
    a scalar-prefetch-indexed BlockSpec (block pipelining tolerates a
    64-wide minor dim; manual DMA does not).  Every 256 positions the
    sampler transposes the full tail into the cold cache in one
    aligned static-offset update ("flush") and starts a new segment.

Numerics: the q-K product runs s8 x s8 on the MXU (per-head query
scales, like ``ops/decode_attention.py``); the probability-V product
also runs s8 x s8 — the per-block ``e * v_scale`` weights are
quantized per head against the online-softmax running max, so the
only f32 math touches ``(G*H, BLK)`` logits.  The rejected
``ops/flash_decode.py`` upconverted the whole cache to f32 and ran
f32 M=1 dots (VPU-bound); keeping both dots in int8 makes the kernel
HBM-bound.  The current token's key/value (cache write deferred by
the caller) enter the softmax in-kernel as an extra logit.

Per-call fixed cost on this platform is ~16 us (a trivial Pallas
kernel measures 16.5 us), which bounds any per-layer-kernel design to
~260 us/step at 16 layers; this kernel adds ~20 us of real
work (measured 36 us/layer at B=8 vs ~60 us for the XLA op chain).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

Array = jax.Array
BLK = 256
TAIL = 256
NEG_INF = -1e30


def _kernel(scalars_ref, q_ref, slopes_ref, knew_ref, vnew_ref,
            ktail_ref, vtail_ref, kts_ref, vts_ref,
            k_hbm, v_hbm, kscale_hbm, vscale_hbm,
            o_ref, *, head_dim: int, nheads: int, grp: int,
            flushed: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ig = pl.program_id(0)
    pos = scalars_ref[0]
    li = scalars_ref[1]
    nblk = flushed // BLK
    gh = grp * nheads
    d = head_dim
    scale = 1.0 / math.sqrt(d)
    q = q_ref[...].astype(jnp.float32).reshape(gh, d)[:, None, :]
    slopes = slopes_ref[...].reshape(1, nheads, 1)
    slopes = jnp.broadcast_to(slopes, (grp, nheads, 1)).reshape(
        gh, 1, 1)

    # Per-head int8 query (s8 x s8 QK on the MXU).
    q_amax = jnp.max(jnp.abs(q), axis=2, keepdims=True)   # (GH,1,1)
    q_scale = jnp.maximum(q_amax, 1e-8) / 127.0
    q8 = jnp.round(q / q_scale).astype(jnp.int8)          # (GH,1,D)

    def merge(m, l, acc, s, v_fn):
        """Online-softmax merge of one logit block ``s`` whose value
        contribution is ``v_fn(e) -> (GH, 1, D)``."""
        m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
        corr = jnp.exp(m - m_new)
        e = jnp.exp(s - m_new)
        l_new = l * corr + jnp.sum(e, axis=2, keepdims=True)
        acc_new = acc * corr + v_fn(e)
        return m_new, l_new, acc_new

    def qk_i8(k8):
        """(GH, D, N) s8 keys -> dequantized f32 logits (GH, 1, N)."""
        s_i32 = jax.lax.dot_general(
            q8, k8, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
        return s_i32.astype(jnp.float32) * (q_scale * scale)

    def av_i8(e, vs, v8_dn):
        """Quantize ``e * vs`` per head, s8 x s8 with values.
        v8_dn: (GH, D, N) (time-minor) keys-style values."""
        u = e * vs
        u_amax = jnp.max(u, axis=2, keepdims=True)        # u >= 0
        u_scale = jnp.maximum(u_amax, 1e-20) / 127.0
        u8 = jnp.round(u / u_scale).astype(jnp.int8)
        av = jax.lax.dot_general(
            u8, v8_dn, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)             # (GH,1,D)
        return av.astype(jnp.float32) * u_scale

    def body(kb, vb, ksb, vsb, sems):
        def dma(slot, blk):
            bs = pl.ds(ig * grp, grp)
            return (
                pltpu.make_async_copy(k_hbm.at[li, blk, bs],
                                      kb.at[slot], sems.at[0, slot]),
                pltpu.make_async_copy(v_hbm.at[li, blk, bs],
                                      vb.at[slot], sems.at[1, slot]),
                pltpu.make_async_copy(kscale_hbm.at[li, blk, bs],
                                      ksb.at[slot], sems.at[2, slot]),
                pltpu.make_async_copy(vscale_hbm.at[li, blk, bs],
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
            s = qk_i8(kb[slot].reshape(gh, d, BLK))
            s = s * ksb[slot].reshape(gh, 1, BLK)
            t_idx = (i * BLK + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, BLK), 2))
            s = s + slopes * jnp.abs(t_idx - pos).astype(jnp.float32)
            # cold rows are < flushed <= pos: always valid, no mask
            vsl = vsb[slot].reshape(gh, 1, BLK)
            vbl = vb[slot].reshape(gh, d, BLK)
            return merge(m, l, acc, s,
                         lambda e: av_i8(e, vsl, vbl))

        m0 = jnp.full((gh, 1, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((gh, 1, 1), jnp.float32)
        acc0 = jnp.zeros((gh, 1, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblk, step, (m0, l0, acc0))

        # ---- head-major tail: positions [flushed, flushed + TAIL) --
        kt8 = ktail_ref[...].reshape(gh, TAIL, d)
        s_i32 = jax.lax.dot_general(
            q8, kt8, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)             # (GH,1,TAIL)
        s = s_i32.astype(jnp.float32) * (q_scale * scale)
        s = s * kts_ref[...].reshape(gh, 1, TAIL)
        t_idx = (flushed + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, TAIL), 2))
        s = s + slopes * jnp.abs(t_idx - pos).astype(jnp.float32)
        s = jnp.where(t_idx < pos, s, NEG_INF)
        vt8 = vtail_ref[...].reshape(gh, TAIL, d)
        vts = vts_ref[...].reshape(gh, 1, TAIL)

        def av_tail(e):
            u = e * vts
            u_amax = jnp.max(u, axis=2, keepdims=True)
            u_scale = jnp.maximum(u_amax, 1e-20) / 127.0
            u8 = jnp.round(u / u_scale).astype(jnp.int8)
            av = jax.lax.dot_general(
                u8, vt8, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)
            return av.astype(jnp.float32) * u_scale

        m, l, acc = merge(m, l, acc, s, av_tail)

        # ---- current token (|distance| = 0 -> no ALiBi term) -------
        k_new = knew_ref[...].astype(jnp.float32).reshape(
            gh, d)[:, None, :]
        v_new = vnew_ref[...].astype(jnp.float32).reshape(
            gh, d)[:, None, :]
        s_self = jnp.sum(q * k_new, axis=2, keepdims=True) * scale
        m_f = jnp.maximum(m, s_self)
        corr = jnp.exp(m - m_f)
        e_self = jnp.exp(s_self - m_f)
        l_f = l * corr + e_self
        acc_f = acc * corr + e_self * v_new
        o_ref[...] = (acc_f / l_f).reshape(gh, d).reshape(
            grp, nheads, d).astype(o_ref.dtype)

    pl.run_scoped(
        body,
        kb=pltpu.VMEM((2, grp, nheads, head_dim, BLK), jnp.int8),
        vb=pltpu.VMEM((2, grp, nheads, head_dim, BLK), jnp.int8),
        ksb=pltpu.VMEM((2, grp, nheads, BLK), jnp.float32),
        vsb=pltpu.VMEM((2, grp, nheads, BLK), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((4, 2)),
    )


def fused_decode_attention(q: Array, k_cold: Array, v_cold: Array,
                           kc_scale: Array, vc_scale: Array,
                           k_tail: Array, v_tail: Array,
                           kt_scale: Array, vt_scale: Array,
                           pos: Array, li: Array, slopes: Array,
                           k_new: Array, v_new: Array,
                           flushed: int,
                           interpret: bool = False) -> Array:
    """q/k_new/v_new: (B, H, D); cold: (L, NB, B, H, D, 256) int8
    block-major with ``flushed % 256 == 0`` filled positions; tail:
    (L, B, H, 256, D) int8 holding positions [flushed, flushed+256);
    scales f32 ((L, NB, B, H, 256) cold / (L, B, H, 256) tail);
    pos/li scalars; slopes (H,) negative ALiBi slopes.  → (B, H, D)
    f32 softmax(QK)V including the current (not yet written) token."""
    scalars = jnp.stack([jnp.asarray(pos, jnp.int32),
                         jnp.asarray(li, jnp.int32)])
    return fused_decode_attention_prepared(
        q, k_cold, v_cold, kc_scale.astype(jnp.float32),
        vc_scale.astype(jnp.float32), k_tail, v_tail,
        kt_scale.astype(jnp.float32), vt_scale.astype(jnp.float32),
        scalars, slopes.astype(jnp.float32)[:, None], k_new, v_new,
        flushed=flushed, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("flushed", "interpret"))
def fused_decode_attention_prepared(
        q: Array, k_cold: Array, v_cold: Array,
        kc_scale: Array, vc_scale: Array,
        k_tail: Array, v_tail: Array,
        kt_scale: Array, vt_scale: Array,
        scalars: Array, slopes_f: Array,
        k_new: Array, v_new: Array,
        flushed: int, interpret: bool = False) -> Array:
    """Hot-loop entry: operands pre-laid-out so the call adds ZERO
    per-layer XLA ops inside the sampling scan (the generic wrapper's
    casts/stacks cost ~10 small ops per layer per step).  scalars:
    (2,) int32 [pos, li]; slopes_f: (H, 1) f32; scales f32;
    q/k_new/v_new native dtype (cast in-kernel)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import os as _os
    b, h, d = q.shape
    assert flushed % BLK == 0
    # batch rows per grid program: bigger groups -> fewer, larger
    # DMAs (VMEM-bounded); 8 measured best at B=8
    grp = min(b, int(_os.environ.get("VAE_GSLM_FUSED_GRP", "8")))
    while b % grp:
        grp //= 2

    def blk(shape, imap):
        return pl.BlockSpec(shape, imap)

    return pl.pallas_call(
        functools.partial(_kernel, head_dim=d, nheads=h, grp=grp,
                          flushed=flushed),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // grp,),
            in_specs=[
                blk((grp, h, d), lambda g, s: (g, 0, 0)),
                blk((h, 1), lambda g, s: (0, 0)),
                blk((grp, h, d), lambda g, s: (g, 0, 0)),
                blk((grp, h, d), lambda g, s: (g, 0, 0)),
                blk((1, grp, h, TAIL, d),
                    lambda g, s: (s[1], g, 0, 0, 0)),
                blk((1, grp, h, TAIL, d),
                    lambda g, s: (s[1], g, 0, 0, 0)),
                blk((1, grp, h, TAIL),
                    lambda g, s: (s[1], g, 0, 0)),
                blk((1, grp, h, TAIL),
                    lambda g, s: (s[1], g, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((grp, h, d),
                                   lambda g, s: (g, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # grp<=8 fits the 64 MB scope; a blanket 100 MB limit
            # costs ~6% at B=8 (Mosaic schedules more conservatively)
            vmem_limit_bytes=(64 if grp <= 8 else 100) * 1024 * 1024),
        interpret=interpret,
    )(scalars, q, slopes_f, k_new, v_new,
      k_tail, v_tail, kt_scale, vt_scale,
      k_cold, v_cold, kc_scale, vc_scale)


def fused_decode_attention_reference(q, k_cold, v_cold, kc_scale,
                                     vc_scale, k_tail, v_tail,
                                     kt_scale, vt_scale, pos, li,
                                     slopes, k_new, v_new, flushed):
    """Plain-JAX reference implementation (same quantized math) for
    kernel validation."""
    qf = q.astype(jnp.float32)
    q_amax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
    q_scale = jnp.maximum(q_amax, 1e-8) / 127.0
    q8 = jnp.round(qf / q_scale).astype(jnp.int8)
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    slopes_f = slopes.astype(jnp.float32)[None, :, None]

    def logits(k8_bhtd, ks, base, strict_mask):
        s = jnp.einsum("bhd,bhtd->bht", q8.astype(jnp.int32),
                       k8_bhtd.astype(jnp.int32)).astype(jnp.float32)
        s = s * (q_scale * ks * scale)
        t_idx = base + jnp.arange(k8_bhtd.shape[2])
        s = s + slopes_f * jnp.abs(t_idx - pos).astype(
            jnp.float32)[None, None]
        if strict_mask:
            s = jnp.where(t_idx[None, None] < pos, s, NEG_INF)
        return s

    # cold is block-major (NB, B, H, D, BLK): -> (B, H, NB*BLK, D)
    b_, h_ = q.shape[0], q.shape[1]

    def unblock(x):
        x = jnp.transpose(x, (1, 2, 0, 4, 3))     # (B,H,NB,BLK,D)
        return x.reshape(b_, h_, -1, d)[:, :, :flushed]

    def unblock_s(x):
        x = jnp.transpose(x, (1, 2, 0, 3))        # (B,H,NB,BLK)
        return x.reshape(b_, h_, -1)[..., :flushed]

    k8c = unblock(k_cold[li])
    v8c = unblock(v_cold[li])
    parts = []
    if flushed:
        parts.append((logits(k8c, unblock_s(kc_scale[li]), 0, False),
                      v8c, unblock_s(vc_scale[li])))
    parts.append((logits(k_tail[li], kt_scale[li], flushed, True),
                  v_tail[li], vt_scale[li]))
    s_self = (jnp.sum(qf * k_new.astype(jnp.float32), -1)[..., None]
              * scale)
    full = jnp.concatenate([p[0] for p in parts] + [s_self], axis=-1)
    m = jnp.max(full, axis=-1, keepdims=True)
    e_all = jnp.exp(full - m)
    l = jnp.sum(e_all, axis=-1, keepdims=True)
    acc = e_all[..., -1:] * v_new.astype(jnp.float32)
    off = 0
    for s_p, v8, vs in parts:
        n = s_p.shape[-1]
        e = e_all[..., off:off + n]
        off += n
        for i in range(0, n, BLK):
            j = min(i + BLK, n)
            u = e[..., i:j] * vs[..., i:j]
            u_amax = jnp.max(u, axis=-1, keepdims=True)
            u_scale = jnp.maximum(u_amax, 1e-20) / 127.0
            u8 = jnp.round(u / u_scale).astype(jnp.int8)
            av = jnp.einsum("bht,bhtd->bhd", u8.astype(jnp.int32),
                            v8[:, :, i:j].astype(jnp.int32))
            acc = acc + av.astype(jnp.float32) * u_scale
    return acc / l
