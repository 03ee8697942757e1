"""Pallas TPU kernel: single-query decode attention over an int8 KV
cache, reading ONLY the filled blocks.

The XLA decode path (``ops/decode_attention.py``) must attend over a
statically-shaped prefix of the cache; the windowed segmented scan
bounds the waste but still reads up to the segment's maximal position.
This kernel's in-kernel ``fori_loop`` bound is **dynamic in ``pos``**:
exactly ``ceil((pos+1)/BLK)`` key blocks are DMA'd from HBM per batch
program (all heads at once, double-buffered), with ALiBi bias, causal
masking, int8 dequantization (per-token scales) and an online softmax
fused in VMEM.

Design notes (measured on v5e, B=128 H=16 T=768 D=64, pos=500):
  * grid is ``(B,)`` with ALL heads handled per program — a ``(B, H)``
    grid makes 2048 programs issuing 8 KB DMAs and runs ~7x slower
    (DMA-latency-bound, ~40 GB/s effective);
  * the cache must be **time-minor** ``(B, H, D, T)`` so each DMA
    slice ``(H, D, BLK)`` puts the time block in the lane dimension —
    Mosaic requires the minor DMA-slice dim 128-divisible even when it
    spans the full array dim, so head_dim=64 in the lane position is
    rejected.  ``flash_decode_int8`` accepts the standard head-major
    ``(B, H, T, D)`` cache and transposes; a production wiring would
    keep the cache time-minor to skip that.

STATUS — experimental, NOT wired into the samplers.  Measured:
~600 us/step vs 360 us for the XLA full-768 einsum path and ~310 us
for the XLA windowed path at the same operating point, despite reading
only ~2/3 of the cache.  Sweeps over batch-blocked grids (2/4/8
batches per program), eager multi-slot DMA starts, and a fully
contiguous pre-blocked ``(B*H, NB, D, BLK)`` layout all land within
530–600 us: the kernel is **VPU-compute-bound**, not DMA-bound — the
int8→f32 upconversion and the M=1 batched matvecs on ``(G, 1, BLK)``
shapes run at 1/8 sublane occupancy, while XLA's fused
convert+einsum already streams the cache at ~560 GB/s (~70% of HBM
peak).  The sampler's 8-segment windowed scan already captures most
of the read-only-the-filled-prefix benefit, so the XLA path
(``ops/decode_attention.py``) remains the production decode route.

Requires ``T % BLK == 0`` with ``BLK = 256``.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

Array = jax.Array
BLK = 256
NEG_INF = -1e30


def _kernel(pos_ref, q_ref, slopes_ref, kscale_ref, vscale_ref,
            k_hbm, v_hbm, o_ref, *, head_dim: int, nheads: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ib = pl.program_id(0)
    pos = pos_ref[0]
    nblk = (pos + BLK) // BLK      # ceil((pos+1)/BLK)
    q = q_ref[0].astype(jnp.float32)          # (H, 1, D)
    scale = 1.0 / math.sqrt(head_dim)
    slopes = slopes_ref[...][:, :, None]      # (H, 1, 1)

    def body(kb, vb, sems):
        def dma(slot, blk):
            # Source slice (H, D, BLK): time in the lane dim.
            k_c = pltpu.make_async_copy(
                k_hbm.at[ib, :, :, pl.ds(blk * BLK, BLK)],
                kb.at[slot], sems.at[0, slot])
            v_c = pltpu.make_async_copy(
                v_hbm.at[ib, :, :, pl.ds(blk * BLK, BLK)],
                vb.at[slot], sems.at[1, slot])
            return k_c, v_c

        kc0, vc0 = dma(0, 0)
        kc0.start()
        vc0.start()

        def step(i, carry):
            m, l, acc = carry
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < nblk)
            def _():
                kcn, vcn = dma(nxt, i + 1)
                kcn.start()
                vcn.start()

            kci, vci = dma(slot, i)
            kci.wait()
            vci.wait()
            k = kb[slot].astype(jnp.float32)          # (H, D, BLK)
            v = vb[slot].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale  # (H,1,BLK)
            t_idx = (i * BLK + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, BLK), 2))
            ks = kscale_ref[0, :, :, pl.ds(i * BLK, BLK)]   # (H,1,BLK)
            vs = vscale_ref[0, :, :, pl.ds(i * BLK, BLK)]
            s = s * ks
            s = s + slopes * jnp.abs(t_idx - pos).astype(jnp.float32)
            s = jnp.where(t_idx <= pos, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=2, keepdims=True))
            corr = jnp.exp(m - m_new)                 # (H, 1, 1)
            e = jnp.exp(s - m_new)                    # (H, 1, BLK)
            l_new = l * corr + jnp.sum(e, axis=2, keepdims=True)
            acc_new = acc * corr + jax.lax.dot_general(
                e * vs, v, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # (H, 1, D)
            return m_new, l_new, acc_new

        m0 = jnp.full((nheads, 1, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((nheads, 1, 1), jnp.float32)
        acc0 = jnp.zeros((nheads, 1, head_dim), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblk, step, (m0, l0, acc0))
        o_ref[0] = (acc / l).astype(o_ref.dtype)      # (H, 1, D)

    pl.run_scoped(
        body,
        kb=pltpu.VMEM((2, nheads, head_dim, BLK), jnp.int8),
        vb=pltpu.VMEM((2, nheads, head_dim, BLK), jnp.int8),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


@functools.partial(jax.jit, static_argnames=())
def flash_decode_int8(q: Array, k_i8: Array, v_i8: Array,
                      k_scale: Array, v_scale: Array, pos: Array,
                      slopes: Array) -> Array:
    """q: (B, H, D); caches: (B, H, T, D) int8 with T % 256 == 0;
    scales: (B, H, T) f32; pos: scalar; slopes: (H,) negative ALiBi
    slopes.  → (B, H, D)."""
    return flash_decode_int8_tm(
        q, jnp.swapaxes(k_i8, 2, 3), jnp.swapaxes(v_i8, 2, 3),
        k_scale, v_scale, pos, slopes)


@functools.partial(jax.jit, static_argnames=())
def flash_decode_int8_tm(q: Array, k_tm: Array, v_tm: Array,
                         k_scale: Array, v_scale: Array, pos: Array,
                         slopes: Array) -> Array:
    """Time-minor entry point: caches are (B, H, D, T) int8."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, d = q.shape
    t = k_tm.shape[3]
    assert t % BLK == 0, t
    out = pl.pallas_call(
        functools.partial(_kernel, head_dim=d, nheads=h),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,   # pos
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, 1, d), lambda b_, *_: (b_, 0, 0, 0)),
                pl.BlockSpec((h, 1), lambda b_, *_: (0, 0)),
                pl.BlockSpec((1, h, 1, t), lambda b_, *_: (b_, 0, 0, 0)),
                pl.BlockSpec((1, h, 1, t), lambda b_, *_: (b_, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, h, 1, d),
                                   lambda b_, *_: (b_, 0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), jnp.float32),
    )(jnp.asarray([pos], jnp.int32).reshape(1),
      q.astype(jnp.float32)[:, :, None],
      slopes.astype(jnp.float32)[:, None],
      k_scale.astype(jnp.float32)[:, :, None],
      v_scale.astype(jnp.float32)[:, :, None], k_tm, v_tm)
    return out[:, :, 0]
