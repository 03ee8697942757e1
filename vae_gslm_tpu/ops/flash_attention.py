"""Pallas TPU attention kernel with fused ALiBi + causal/length masking.

The reference materialises a dense ``(B, H, Tkv, Tkv)`` additive mask
and an ALiBi bias tensor for SDPA
(``/root/reference/modules/attention/attention.py:60-73``) — an HBM
memory sink.  This kernel keeps K/V for one (batch, head) resident in
VMEM (T ≤ ~2k at d=64 fits comfortably), streams q in ``block_q`` tiles
over the MXU and synthesises the symmetric-ALiBi bias and causal /
padding masks from iota *inside* the kernel — nothing quadratic ever
touches HBM.

Shapes: q, k, v: (B, H, T, D); lengths: (B,); slopes: (H,) (negative,
as produced by ``nn.positions.ALiBi``).  fp32 softmax; matmuls accumulate
fp32 via ``preferred_element_type``.

Forward: at training scale (tq == tk <= 1024) a full-matrix kernel
per (batch, head) — K/V fetched once, the whole (T, T) logits in
VMEM (2.2x the q-tiled kernel: 213 vs 471 us/layer measured at
B8/H16/T641/D64 on v5e, where the tiled grid's per-step overhead and
per-tile K/V re-fetch dominate).  Longer or cross-shaped inputs
stream q in ``block_q`` tiles over resident K/V.  Matmuls run at
input precision (bf16 under the mixed policy) with fp32 softmax.
Backward: a ``jax.custom_vjp`` full-matrix Pallas kernel per
(batch, head) with the FA2-style ``delta = rowsum(dO * O)``
precomputed in XLA from the O saved by the forward — five gradient
matmuls on the MXU with the (T, T) probability matrix living only in
VMEM (falls back to a blockwise kernel for T > 1024 and to the XLA
dense VJP off-TPU).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array
NEG_INF = -1e30


def _attention_reference(q, k, v, lengths, slopes, causal):
    """XLA fallback with identical semantics (also the custom-vjp fwd
    residual path)."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if slopes is not None:
        q_pos = jnp.arange(tq)
        k_pos = jnp.arange(tk)
        dist = jnp.abs(k_pos[None, :] - q_pos[:, None]).astype(
            jnp.float32)
        logits = logits + slopes[:, None, None] * dist[None]
    k_pos = jnp.arange(tk)
    mask = k_pos[None, None, None, :] < lengths[:, None, None, None]
    if causal:
        q_pos = jnp.arange(tq)
        mask = mask & (k_pos[None, None, None, :]
                       <= q_pos[None, None, :, None])
    logits = jnp.where(mask, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(len_ref, slope_ref, q_ref, k_ref, v_ref, o_ref, *,
                  block_q: int, causal: bool, use_alibi: bool):
    from jax.experimental import pallas as pl

    ib = pl.program_id(0)
    ih = pl.program_id(1)
    iq = pl.program_id(2)
    q = q_ref[0, 0]                            # (block_q, D) input dtype
    k = k_ref[0, 0]                            # (T, D)
    v = v_ref[0, 0]                            # (T, D)
    d = q.shape[-1]
    t = k.shape[0]
    scale = 1.0 / math.sqrt(d)
    # Matmuls run at input precision (bf16 under the mixed policy —
    # full MXU rate) and accumulate fp32; softmax math stays fp32.
    # (An online-softmax variant with causal/length block skipping was
    # benchmarked and is ~4% slower end-to-end at training shapes —
    # the loop/renormalization overhead outweighs the skipped tiles.)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # (block_q, T)
    q_pos = (iq * block_q
             + jax.lax.broadcasted_iota(jnp.int32, (block_q, t), 0))
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, t), 1)
    if use_alibi:
        slope = slope_ref[ih]
        dist = jnp.abs(k_pos - q_pos).astype(jnp.float32)
        logits = logits + slope * dist
    valid = k_pos < len_ref[ib]
    if causal:
        valid = valid & (k_pos <= q_pos)
    logits = jnp.where(valid, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    w = (e / s).astype(v.dtype)
    out = jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _fwd_full_kernel(len_ref, slope_ref, q_ref, k_ref, v_ref, o_ref,
                     *maybe_l_ref, causal: bool, use_alibi: bool,
                     with_stats: bool = False):
    """Full-matrix forward for one (batch, head): grid (B, H).

    At training scale (T <= ~1k) the whole (T, T) logits matrix fits
    VMEM, so Q/K/V are fetched ONCE per (batch, head) and the kernel
    runs 128 grid steps instead of B*H*n_q.  Measured ~2.2x the
    q-tiled kernel at B8/H16/T641/D64 on v5e — the tiled grid's
    ~0.45 us/step overhead and its per-tile K/V re-fetch dominate at
    these shapes.  Probabilities are normalized BEFORE the V matmul:
    the unnormalized-E @ V + divide-after variant measured 20x worse
    fp32 accuracy (2.3e-3 vs 1e-4 vs the XLA reference).

    ``with_stats`` additionally writes the FA2 log-sum-exp
    ``L = m + log(sum e)`` per row, so the backward can reconstruct
    ``p = exp(s - L)`` without re-running the max/sum reductions and
    the divide over the (T, T) tile (three VPU passes saved).
    """
    from jax.experimental import pallas as pl

    ib = pl.program_id(0)
    ih = pl.program_id(1)
    q = q_ref[0, 0]                            # (T, D)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    t, d = q.shape
    scale = 1.0 / math.sqrt(d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    if use_alibi:
        s = s + slope_ref[ih] * jnp.abs(k_pos - q_pos).astype(
            jnp.float32)
    valid = k_pos < len_ref[ib]
    if causal:
        valid = valid & (k_pos <= q_pos)
    s = jnp.where(valid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    w = (e / denom).astype(v.dtype)
    out = jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)
    if with_stats:
        maybe_l_ref[0][0, 0] = m + jnp.log(denom)


# Full-matrix forward VMEM gate: (T, T) fp32 logits + exp live tiles.
_FWD_FULL_MAX_T = 1024


# ---------------------------------------------------------------------
# Packed-layout full-matrix kernels: q/k/v/o as (B, T, H*D) — the
# model's native projection layout.  The round-4 training trace showed
# the (B,T,H,D)<->(B,H,T,D) relayout copies around the BHTD kernels
# costing ~4 ms/microbatch; this variant reads the projection outputs
# directly.  Mosaic requires the last two block dims to be (mult-of-8,
# mult-of-128) or full, so a (1, T, 1, D) per-head block is not
# lowerable for D = 64; instead each grid step takes a (1, T, 128)
# lane window = ``128 // D`` heads and unrolls them with STATIC lane
# slices (dynamic lane offsets are not lowerable either).
# ---------------------------------------------------------------------


def _heads_per_block(d: int, hd: int) -> int:
    """Heads per 128-lane block; 0 when the packed kernel can't apply."""
    if d % 128 == 0:
        return 1
    if 128 % d == 0 and hd % 128 == 0:
        return 128 // d
    return 0


def _fwd_full_packed_kernel(len_ref, slope_ref, q_ref, k_ref, v_ref,
                            o_ref, *maybe_l_ref, causal: bool,
                            use_alibi: bool, d: int, hpb: int,
                            with_stats: bool = False):
    """Packed full-matrix forward: grid (B, H // hpb), block (1, T,
    hpb*D); ``hpb`` heads unrolled per step with static lane slices."""
    from jax.experimental import pallas as pl

    ib = pl.program_id(0)
    ig = pl.program_id(1)
    qg = q_ref[0]                              # (T, hpb*D)
    kg = k_ref[0]
    vg = v_ref[0]
    t = qg.shape[0]
    scale = 1.0 / math.sqrt(d)
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    valid = k_pos < len_ref[ib]
    if causal:
        valid = valid & (k_pos <= q_pos)
    dist = jnp.abs(k_pos - q_pos).astype(jnp.float32)
    for j in range(hpb):
        sl = slice(j * d, (j + 1) * d)
        s = jax.lax.dot_general(
            qg[:, sl], kg[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if use_alibi:
            s = s + slope_ref[ig * hpb + j] * dist
        s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        w = (e / denom).astype(vg.dtype)
        out = jax.lax.dot_general(
            w, vg[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = out.astype(o_ref.dtype)
        if with_stats:
            maybe_l_ref[0][0, 0, :, j] = (m + jnp.log(denom))[:, 0]


def _flash_forward_full_packed(q, k, v, lengths, slopes, causal,
                               nheads: int, with_stats: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, hd = q.shape
    d = hd // nheads
    hpb = _heads_per_block(d, hd)
    assert hpb > 0 and nheads % hpb == 0
    ng = nheads // hpb
    use_alibi = slopes is not None
    if slopes is None:
        slopes = jnp.zeros((nheads,), jnp.float32)
    spec = pl.BlockSpec((1, t, hpb * d),
                        lambda b_, g_, *_: (b_, 0, g_))
    out_specs = spec
    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    if with_stats:
        lspec = pl.BlockSpec((1, 1, t, hpb),
                             lambda b_, g_, *_: (b_, g_, 0, 0))
        out_specs = [spec, lspec]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, ng, t, hpb),
                                          jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_fwd_full_packed_kernel, causal=causal,
                          use_alibi=use_alibi, d=d, hpb=hpb,
                          with_stats=with_stats),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, ng),
            in_specs=[spec] * 3,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(lengths.astype(jnp.int32), slopes.astype(jnp.float32), q, k, v)
    return out


def _bwd_full_packed_kernel(len_ref, slope_ref, q_ref, k_ref, v_ref,
                            g_ref, delta_ref, lse_ref, dq_ref, dk_ref,
                            dv_ref, *, causal: bool, use_alibi: bool,
                            d: int, hpb: int, orient2: bool):
    """Packed full-matrix backward (LSE residual always present)."""
    from jax.experimental import pallas as pl

    ib = pl.program_id(0)
    ig = pl.program_id(1)
    qg = q_ref[0]                              # (T, hpb*D)
    kg = k_ref[0]
    vg = v_ref[0]
    gg = g_ref[0]
    t = qg.shape[0]
    scale = 1.0 / math.sqrt(d)
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    valid = k_pos < len_ref[ib]
    if causal:
        valid = valid & (k_pos <= q_pos)
    dist = jnp.abs(k_pos - q_pos).astype(jnp.float32)
    # Transposed-orientation masks: rows = keys, cols = queries.
    valid_t = q_pos < len_ref[ib]          # q_pos iota dim 0 = key idx
    if causal:
        valid_t = valid_t & (q_pos <= k_pos)
    for j in range(hpb):
        sl = slice(j * d, (j + 1) * d)
        q = qg[:, sl]
        k = kg[:, sl]
        v = vg[:, sl]
        g = gg[:, sl]
        lse = lse_ref[0, 0, :, j]                      # (T,)
        delta = delta_ref[0, 0, :, j]                  # (T,)
        # --- orientation 1: rows = queries (feeds dq) -------------
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if use_alibi:
            s = s + slope_ref[ig * hpb + j] * dist
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.exp(s - lse[:, None])                  # (T, T) fp32
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[:, None])).astype(q.dtype)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if not orient2:
            # dim-0 contractions: MXU-native (stationary operand is
            # loaded transposed in hardware) — see _flash_bwd_kernel.
            dv = jax.lax.dot_general(
                p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)
            continue
        # --- orientation 2: rows = keys (feeds dk, dv) ------------
        # Dual-orientation probability recompute from the same LSE
        # residual (FA2's two-loop structure fused in one kernel):
        # no (T, T) operand contracted over dim 0.
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if use_alibi:
            st = st + slope_ref[ig * hpb + j] * dist
        st = jnp.where(valid_t, st, NEG_INF)
        pt = jnp.exp(st - lse[None, :])                # (T, T) fp32
        dv = jax.lax.dot_general(
            pt.astype(g.dtype), g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dpt = jax.lax.dot_general(
            v, g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dst = (pt * (dpt - delta[None, :])).astype(q.dtype)
        dk = jax.lax.dot_general(
            dst, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _flash_backward_packed(q, k, v, g, o, lengths, slopes, causal,
                           nheads: int, lse):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, hd = q.shape
    d = hd // nheads
    hpb = _heads_per_block(d, hd)
    assert hpb > 0 and nheads % hpb == 0 and lse is not None
    ng = nheads // hpb
    use_alibi = slopes is not None
    if slopes is None:
        slopes = jnp.zeros((nheads,), jnp.float32)
    import os as _os

    orient2 = _os.environ.get("VAE_GSLM_BWD_ORIENT2", "0") == "1"
    # delta = rowsum(dO * O) per head: (B, ng, T, hpb), same blocking
    # as the LSE residual.
    delta = jnp.transpose(
        jnp.sum((g.astype(jnp.float32) * o.astype(jnp.float32))
                .reshape(b, t, ng, hpb, d), axis=-1),
        (0, 2, 1, 3))
    spec = pl.BlockSpec((1, t, hpb * d),
                        lambda b_, g_, *_: (b_, 0, g_))
    lspec = pl.BlockSpec((1, 1, t, hpb),
                         lambda b_, g_, *_: (b_, g_, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_full_packed_kernel, causal=causal,
                          use_alibi=use_alibi, d=d, hpb=hpb,
                          orient2=orient2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, ng),
            in_specs=[spec] * 4 + [lspec, lspec],
            out_specs=[spec] * 3,
        ),
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(lengths.astype(jnp.int32), slopes.astype(jnp.float32),
      q, k, v, g, delta, lse)
    return dq, dk, dv


def _flash_forward_full(q: Array, k: Array, v: Array, lengths: Array,
                        slopes: Optional[Array], causal: bool,
                        with_stats: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, t, d = q.shape
    use_alibi = slopes is not None
    if slopes is None:
        slopes = jnp.zeros((h,), jnp.float32)
    spec = pl.BlockSpec((1, 1, t, d), lambda b_, h_, *_: (b_, h_, 0, 0))
    out_specs = spec
    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    if with_stats:
        out_specs = [spec, pl.BlockSpec(
            (1, 1, t, 1), lambda b_, h_, *_: (b_, h_, 0, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, h, t, 1), jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_fwd_full_kernel, causal=causal,
                          use_alibi=use_alibi, with_stats=with_stats),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, h),
            in_specs=[spec] * 3,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # (T, T) fp32 intermediates exceed the 16 MB default
            # scoped-vmem limit near T = 1024.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(lengths.astype(jnp.int32), slopes.astype(jnp.float32), q, k, v)
    return out


def _flash_forward(q: Array, k: Array, v: Array, lengths: Array,
                   slopes: Optional[Array], causal: bool,
                   block_q: int) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, tq, d = q.shape
    tk = k.shape[2]
    padded_tq = ((tq + block_q - 1) // block_q) * block_q
    if padded_tq != tq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, padded_tq - tq), (0, 0)))
    n_q = padded_tq // block_q
    use_alibi = slopes is not None
    if slopes is None:
        slopes = jnp.zeros((h,), jnp.float32)
    grid = (b, h, n_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_q=block_q, causal=causal,
                          use_alibi=use_alibi),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # lengths (per b), slopes (per h)
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda b, h, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, tk, d),
                             lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, tk, d),
                             lambda b, h, i, *_: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d),
                                   lambda b, h, i, *_: (b, h, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, padded_tq, d), q.dtype),
    )(lengths.astype(jnp.int32), slopes.astype(jnp.float32), q, k, v)
    return out[:, :, :tq]


def _flash_bwd_kernel(len_ref, slope_ref, q_ref, k_ref, v_ref, g_ref,
                      delta_ref, *refs, causal: bool, use_alibi: bool,
                      have_lse: bool, orient2: bool):
    """Full-matrix attention backward for one (batch, head).

    T at training scale (<= ~1k) lets the whole (T, T) probability
    matrix live in VMEM, so the five backward matmuls all run on the
    MXU at input precision (bf16 under the mixed policy) with nothing
    quadratic ever touching HBM — vs the XLA dense VJP which
    round-trips several (B, H, T, T) fp32 tensors through HBM
    (~5x slower measured at B8/H16/T641/D64 on v5e).

    ``delta = rowsum(dO * O)`` arrives precomputed (FA2-style) from
    the O saved by the forward — dropping the in-kernel O = P V
    recompute takes the kernel from six to five T^2 D matmuls
    (621 -> 590 us/layer measured at the training shapes).

    ``orient2`` (env ``VAE_GSLM_BWD_ORIENT2``) recomputes the
    probability tile in BOTH row orientations so no (T, T) operand is
    contracted over dim 0.  Chip A/B at T=641: 991 vs 505 us/layer —
    the dim-0 contractions are MXU-native (the stationary operand is
    loaded transposed in hardware), so the five-matmul form stays the
    default and the dual-orientation variant is kept only as a
    measured-negative probe.

    With ``have_lse`` the forward's log-sum-exp rows arrive as a
    residual and the probabilities are reconstructed directly as
    ``p = exp(s - L)`` — the (T, T) max-reduce, sum-reduce and divide
    all drop out.  The 1/sqrt(d) scale is folded into the (T, D)
    dq/dk outputs instead of the (T, T) ds tile (one more quadratic
    VPU pass saved).
    """
    from jax.experimental import pallas as pl

    if have_lse:
        lse_ref, dq_ref, dk_ref, dv_ref = refs
    else:
        dq_ref, dk_ref, dv_ref = refs
    ib = pl.program_id(0)
    ih = pl.program_id(1)
    q = q_ref[0, 0]                            # (T, D)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    g = g_ref[0, 0]
    delta = delta_ref[0, 0]                    # (T, 1) fp32
    t, d = q.shape
    scale = 1.0 / math.sqrt(d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # (T, T) fp32
    q_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    if use_alibi:
        slope = slope_ref[ih]
        s = s + slope * jnp.abs(k_pos - q_pos).astype(jnp.float32)
    valid = k_pos < len_ref[ib]
    if causal:
        valid = valid & (k_pos <= q_pos)
    s = jnp.where(valid, s, NEG_INF)
    if have_lse:
        lse = lse_ref[0, 0]                            # (T, 1) fp32
    else:
        m = jnp.max(s, axis=-1, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(s - m), axis=-1,
                                  keepdims=True))
    # --- orientation 1: rows = queries (feeds dq) -----------------
    p = jnp.exp(s - lse)                               # (T, T) fp32
    # dP = dO V^T ; dS = P * (dP - delta)  (scale folded into dq/dk)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(q.dtype)            # (T, T)
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if not orient2:
        # dim-0 contractions over the (T, T) tiles: the MXU loads the
        # stationary operand transposed natively, so these are NOT
        # materialized transposes (chip A/B vs the dual-orientation
        # recompute below: 505 vs 991 us/layer — orientation recompute
        # doubles the live fp32 tile set past scoped VMEM and spills).
        dv = jax.lax.dot_general(
            p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dq_ref[0, 0] = dq.astype(dq_ref.dtype)
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv.astype(dv_ref.dtype)
        return
    # --- orientation 2: rows = keys (feeds dk, dv) ----------------
    # Recompute the probability tile in the TRANSPOSED orientation
    # from the same LSE residual (FA2's two loops fused in one
    # kernel), so no (T, T) operand is contracted over dim 0.
    st = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if use_alibi:
        st = st + slope * jnp.abs(k_pos - q_pos).astype(jnp.float32)
    valid_t = q_pos < len_ref[ib]      # iota dim 0 = key index here
    if causal:
        valid_t = valid_t & (q_pos <= k_pos)
    st = jnp.where(valid_t, st, NEG_INF)
    pt = jnp.exp(st - lse[:, 0][None, :])              # (T, T) fp32
    dv = jax.lax.dot_general(
        pt.astype(g.dtype), g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpt = jax.lax.dot_general(
        v, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dst = (pt * (dpt - delta[:, 0][None, :])).astype(q.dtype)
    dk = jax.lax.dot_general(
        dst, q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


# VMEM budget: two (T, T) fp32 live matrices + bf16 copies; beyond
# this the backward switches to the blockwise kernel below.
_BWD_MAX_T = 1024
# Blockwise backward keeps K/V rows + one (block_q, Tk) probability
# block in VMEM — bounded by Tk only.
_BWD_BLOCKWISE_MAX_TK = 8192


def _flash_bwd_blockwise_kernel(len_ref, slope_ref, q_ref, k_ref,
                                v_ref, g_ref, delta_ref,
                                dq_ref, dk_ref, dv_ref,
                                *, block_q: int, causal: bool,
                                use_alibi: bool):
    """Blockwise attention backward: grid (B, H, n_q).

    Streams q/dO in ``block_q`` tiles with K/V for the (batch, head)
    resident in VMEM; each tile's softmax rows are exact (full key
    axis), so no online rescaling is needed, and dK/dV accumulate
    across the sequential q-tile grid steps into revisited output
    blocks.  Removes the full-matrix kernel's ``tq == tk`` and
    ``T <= 1024`` limits (VERDICT r1 item 5): VMEM is bounded by the
    (block_q, Tk) probability tile, not (T, T)."""
    from jax.experimental import pallas as pl

    ib = pl.program_id(0)
    ih = pl.program_id(1)
    iq = pl.program_id(2)
    q = q_ref[0, 0]                            # (block_q, D)
    k = k_ref[0, 0]                            # (Tk, D)
    v = v_ref[0, 0]
    g = g_ref[0, 0]                            # (block_q, D)
    d = q.shape[-1]
    tk = k.shape[0]
    scale = 1.0 / math.sqrt(d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (block_q, Tk)
    q_pos = (iq * block_q
             + jax.lax.broadcasted_iota(jnp.int32, (block_q, tk), 0))
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, tk), 1)
    if use_alibi:
        s = s + slope_ref[ih] * jnp.abs(k_pos - q_pos).astype(
            jnp.float32)
    valid = k_pos < len_ref[ib]
    if causal:
        valid = valid & (k_pos <= q_pos)
    s = jnp.where(valid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # exact rows
    pb = p.astype(v.dtype)
    dv_p = jax.lax.dot_general(                 # P^T dO   (Tk, D)
        pb, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    delta = delta_ref[0, 0]                     # (block_q, 1) fp32
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # scale folded into the (block_q/Tk, D) outputs, not the
    # quadratic ds tile (partial dk scales commute with the
    # across-grid-step accumulation)
    ds = (p * (dp - delta)).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dk_p = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)

    @pl.when(iq == 0)
    def _():
        dk_ref[0, 0] = dk_p
        dv_ref[0, 0] = dv_p

    @pl.when(iq > 0)
    def _():
        dk_ref[0, 0] += dk_p
        dv_ref[0, 0] += dv_p


def _flash_backward_blockwise(q, k, v, g, o, lengths, slopes, causal,
                              block_q: int = 128):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, tq, d = q.shape
    tk = k.shape[2]
    # delta = rowsum(dO * O) precomputed in XLA (fuses upstream);
    # zero-padded rows contribute zero like the padded dO rows.
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)
    padded_tq = ((tq + block_q - 1) // block_q) * block_q
    if padded_tq != tq:
        pad = ((0, 0), (0, 0), (0, padded_tq - tq), (0, 0))
        q = jnp.pad(q, pad)
        g = jnp.pad(g, pad)     # zero dO rows -> zero contributions
        delta = jnp.pad(delta, ((0, 0), (0, 0),
                                (0, padded_tq - tq), (0, 0)))
    n_q = padded_tq // block_q
    use_alibi = slopes is not None
    if slopes is None:
        slopes = jnp.zeros((h,), jnp.float32)
    qspec = pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h_, i, *_: (b_, h_, i, 0))
    kspec = pl.BlockSpec((1, 1, tk, d),
                         lambda b_, h_, i, *_: (b_, h_, 0, 0))
    dspec = pl.BlockSpec((1, 1, block_q, 1),
                         lambda b_, h_, i, *_: (b_, h_, i, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_blockwise_kernel,
                          block_q=block_q, causal=causal,
                          use_alibi=use_alibi),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, h, n_q),
            in_specs=[qspec, kspec, kspec, qspec, dspec],
            out_specs=[qspec, kspec, kspec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, padded_tq, d), q.dtype),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # K/V + f32 dK/dV accum blocks exceed the 16 MB default
            # scoped-vmem limit at Tk >= 4096 (physical VMEM is larger)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(lengths.astype(jnp.int32), slopes.astype(jnp.float32),
      q, k, v, g, delta)
    return (dq[:, :, :tq], dk.astype(k.dtype), dv.astype(v.dtype))


def _flash_backward(q, k, v, g, o, lengths, slopes, causal, lse=None):
    import os as _os

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, t, d = q.shape
    use_alibi = slopes is not None
    if slopes is None:
        slopes = jnp.zeros((h,), jnp.float32)
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)
    spec = pl.BlockSpec((1, 1, t, d), lambda b_, h_, *_: (b_, h_, 0, 0))
    dspec = pl.BlockSpec((1, 1, t, 1), lambda b_, h_, *_: (b_, h_, 0, 0))
    have_lse = lse is not None
    orient2 = _os.environ.get("VAE_GSLM_BWD_ORIENT2", "0") == "1"
    ins = [q, k, v, g, delta] + ([lse] if have_lse else [])
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, causal=causal,
                          use_alibi=use_alibi, have_lse=have_lse,
                          orient2=orient2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, h),
            in_specs=([spec] * 4 + [dspec]
                      + ([dspec] if have_lse else [])),
            out_specs=[spec] * 3,
        ),
        compiler_params=pltpu.CompilerParams(
            # several (T, T) fp32/bf16 tiles live at once: the 16 MB
            # default scoped-vmem limit forces spills near T = 1024
            # (and everywhere for the dual-orientation variant)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
    )(lengths.astype(jnp.int32), slopes.astype(jnp.float32), *ins)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention(q, k, v, lengths, slopes, causal=True,
                    block_q=128):
    """Fused attention; falls back to XLA off-TPU.

    q, k, v: (B, H, T, D); lengths: (B,) valid key counts;
    slopes: (H,) negative ALiBi slopes or None.
    """
    return _dispatch(q, k, v, lengths, slopes, causal, block_q)


def _dispatch(q, k, v, lengths, slopes, causal, block_q):
    if jax.default_backend() in ("tpu",):
        # Self-attention at training scale: full-matrix kernel (one
        # K/V fetch and one grid step per (batch, head)); q-tiled
        # streaming kernel beyond the VMEM gate.
        if (q.shape[2] == k.shape[2]
                and k.shape[2] <= _FWD_FULL_MAX_T):
            try:
                return _flash_forward_full(q, k, v, lengths, slopes,
                                           causal)
            except Exception:
                _warn_fallback("forward")
        try:
            return _flash_forward(q, k, v, lengths, slopes, causal,
                                  block_q)
        except Exception:
            _warn_fallback("forward")
    return _attention_reference(q, k, v, lengths, slopes, causal)


_warned = set()


def _warn_fallback(which: str) -> None:
    """Falling back silently would hide a broken kernel as a slowdown —
    log once per direction."""
    if which not in _warned:
        _warned.add(which)
        import logging
        logging.getLogger(__name__).warning(
            "Pallas flash attention %s failed to trace/compile; "
            "using the XLA dense path (slower).", which)


def _fwd(q, k, v, lengths, slopes, causal, block_q):
    # O is saved for the FA2-style delta precompute in the backward
    # (rowsum(dO * O) in XLA instead of an in-kernel P V recompute);
    # on the full-matrix TPU path the forward also emits the row
    # log-sum-exp so the backward skips its softmax re-reductions.
    if (jax.default_backend() in ("tpu",)
            and q.shape[2] == k.shape[2]
            and k.shape[2] <= min(_FWD_FULL_MAX_T, _BWD_MAX_T)):
        try:
            out, lse = _flash_forward_full(q, k, v, lengths, slopes,
                                           causal, with_stats=True)
            return out, (q, k, v, out, lse, lengths, slopes)
        except Exception:
            _warn_fallback("forward")
    out = _dispatch(q, k, v, lengths, slopes, causal, block_q)
    return out, (q, k, v, out, None, lengths, slopes)


def _bwd(causal, block_q, res, g):
    q, k, v, o, lse, lengths, slopes = res
    if jax.default_backend() in ("tpu",):
        # Full-matrix kernel where the (T, T) tile fits VMEM (it wins
        # there: one grid step per (b, h)); blockwise beyond.
        if (q.shape[2] == k.shape[2] and k.shape[2] <= _BWD_MAX_T):
            try:
                dq, dk, dv = _flash_backward(q, k, v, g, o, lengths,
                                             slopes, causal, lse=lse)
                return dq, dk, dv, None, None
            except Exception:
                _warn_fallback("backward")
        elif k.shape[2] <= _BWD_BLOCKWISE_MAX_TK:
            try:
                dq, dk, dv = _flash_backward_blockwise(
                    q, k, v, g, o, lengths, slopes, causal)
                return dq, dk, dv, None, None
            except Exception:
                _warn_fallback("backward")
    # XLA backward through the reference formulation.
    def f(q, k, v):
        return _attention_reference(q, k, v, lengths, slopes, causal)

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


flash_attention.defvjp(_fwd, _bwd)


def _packed_to_bhtd(x: Array, nheads: int) -> Array:
    b, t, hd = x.shape
    return jnp.transpose(x.reshape(b, t, nheads, hd // nheads),
                         (0, 2, 1, 3))


def _bhtd_to_packed(x: Array) -> Array:
    b, h, t, d = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, h * d)


def _packed_eligible(q: Array, k: Array, nheads: int) -> bool:
    b, t, hd = q.shape
    d = hd // nheads
    hpb = _heads_per_block(d, hd)
    return (hpb > 0 and nheads % hpb == 0 and k.shape[1] == t
            and t <= min(_FWD_FULL_MAX_T, _BWD_MAX_T))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention_packed(q, k, v, lengths, slopes, causal, nheads):
    """Fused attention over the packed (B, T, H*D) projection layout.

    Reads the QKV projection outputs directly and writes the layout
    ``out_proj`` consumes — no (B,T,H,D)<->(B,H,T,D) relayout copies
    (~4 ms/microbatch at flagship training shapes, round-4 trace).
    Falls back to the BHTD kernels (via two transposes) off the
    full-matrix envelope, and to XLA off-TPU.
    """
    if (jax.default_backend() in ("tpu",)
            and _packed_eligible(q, k, nheads)):
        try:
            return _flash_forward_full_packed(q, k, v, lengths, slopes,
                                              causal, nheads)
        except Exception:
            _warn_fallback("forward")
    return _bhtd_to_packed(_dispatch(
        _packed_to_bhtd(q, nheads), _packed_to_bhtd(k, nheads),
        _packed_to_bhtd(v, nheads), lengths, slopes, causal, 128))


def _fwd_packed(q, k, v, lengths, slopes, causal, nheads):
    if (jax.default_backend() in ("tpu",)
            and _packed_eligible(q, k, nheads)):
        try:
            out, lse = _flash_forward_full_packed(
                q, k, v, lengths, slopes, causal, nheads,
                with_stats=True)
            return out, (q, k, v, out, lse, lengths, slopes)
        except Exception:
            _warn_fallback("forward")
    out = flash_attention_packed(q, k, v, lengths, slopes, causal,
                                 nheads)
    return out, (q, k, v, None, None, lengths, slopes)


def _bwd_packed(causal, nheads, res, g):
    q, k, v, o, lse, lengths, slopes = res
    if lse is not None:
        try:
            dq, dk, dv = _flash_backward_packed(
                q, k, v, g, o, lengths, slopes, causal, nheads, lse)
            return dq, dk, dv, None, None
        except Exception:
            _warn_fallback("backward")

    def f(q, k, v):
        return _bhtd_to_packed(_attention_reference(
            _packed_to_bhtd(q, nheads), _packed_to_bhtd(k, nheads),
            _packed_to_bhtd(v, nheads), lengths, slopes, causal))

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


flash_attention_packed.defvjp(_fwd_packed, _bwd_packed)
