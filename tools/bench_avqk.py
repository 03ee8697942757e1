"""Decode-attention variants microbenchmark at the B=128 operating
point: which QK/AV formulation streams the int8 KV cache fastest?

Pattern under test (one layer-step inside the AR scan):
    q (B,H,D) vs cache (B,H,T,D) int8 + (B,H,T) scales
measured as a 200-step lax.scan so per-step dispatch amortizes like
the real sampler.  Reports us/layer-step and effective HBM GB/s
(cache bytes + logits/output traffic excluded — cache dominates).

Usage: python tools/bench_avqk.py [batch] [window]
"""
from __future__ import annotations

import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

NEG_INF = -1e30


def timeit(fn, *args, runs=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 448
    h, d = 16, 64
    steps = 200
    scale = 1.0 / math.sqrt(d)
    rng = np.random.RandomState(0)
    kc = jnp.asarray(rng.randint(-127, 127, (b, h, t, d)), jnp.int8)
    vc = jnp.asarray(rng.randint(-127, 127, (b, h, t, d)), jnp.int8)
    ks = jnp.asarray(rng.rand(b, h, t) * 0.02, jnp.float32)
    vs = jnp.asarray(rng.rand(b, h, t) * 0.02, jnp.float32)
    kb = (kc.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
    vb = (vc.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
    q0 = jnp.asarray(rng.randn(b, h, d), jnp.bfloat16)
    slopes = jnp.asarray(-(2.0 ** -np.arange(1, h + 1)), jnp.float32)
    pos = t - 8

    def qk_s8(q):
        q_amax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
        q_scale = (q_amax / 127.0).astype(jnp.float32)
        qi = jnp.round(q / jnp.maximum(q_scale, 1e-8)).astype(jnp.int8)
        li = jnp.einsum("bhd,bhtd->bht", qi, kc,
                        preferred_element_type=jnp.int32)
        return (li.astype(jnp.float32)
                * (q_scale * ks * scale))

    def softmax_masked(logits):
        k_pos = jnp.arange(t)
        dist = jnp.abs(k_pos - pos).astype(jnp.float32)
        logits = logits + slopes[None, :, None] * dist[None, None]
        logits = jnp.where(k_pos[None, None] <= pos, logits, NEG_INF)
        return jax.nn.softmax(logits, axis=-1)

    def shipped(q):
        """Current decode_attention: s8 QK + scale-folded bf16 AV."""
        w = softmax_masked(qk_s8(q))
        wv = (w * vs).astype(jnp.bfloat16)
        return jnp.einsum("bht,bhtd->bhd", wv, vc.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def av_s8(q):
        """s8 x s8 AV: quantize the softmax row per (b,h)."""
        w = softmax_masked(qk_s8(q)) * vs
        w_amax = jnp.max(w, axis=-1, keepdims=True)
        w_scale = (w_amax / 127.0).astype(jnp.float32)
        wi = jnp.round(w / jnp.maximum(w_scale, 1e-8)).astype(jnp.int8)
        oi = jnp.einsum("bht,bhtd->bhd", wi, vc,
                        preferred_element_type=jnp.int32)
        return oi.astype(jnp.float32) * w_scale

    def bf16_cache(q):
        """Full bf16 cache (2x bytes) — the no-convert reference."""
        logits = jnp.einsum("bhd,bhtd->bht", q, kb,
                            preferred_element_type=jnp.float32) * scale
        w = softmax_masked(logits)
        return jnp.einsum("bht,bhtd->bhd", w.astype(jnp.bfloat16), vb,
                          preferred_element_type=jnp.float32)

    def dequant_first(q):
        """int8 cache upconverted to bf16 before both einsums (the
        round-1 formulation that measured ~570 GB/s)."""
        kd = (kc.astype(jnp.float32) * ks[..., None]).astype(
            jnp.bfloat16)
        vd = (vc.astype(jnp.float32) * vs[..., None]).astype(
            jnp.bfloat16)
        logits = jnp.einsum("bhd,bhtd->bht", q, kd,
                            preferred_element_type=jnp.float32) * scale
        w = softmax_masked(logits)
        return jnp.einsum("bht,bhtd->bhd", w.astype(jnp.bfloat16), vd,
                          preferred_element_type=jnp.float32)

    def qk_vpu(q):
        """QK as VPU multiply-reduce (no MXU): the M=1 matvec wastes
        127/128 systolic rows, so a fused convert*mul+sum over the
        (B,H,T,D) stream can beat it at full HBM rate."""
        qf = q.astype(jnp.float32)
        prod = qf[:, :, None, :] * kc.astype(jnp.float32)
        return prod.sum(-1) * (ks * scale)

    def vpu_both(q):
        w = softmax_masked(qk_vpu(q))
        wv = w * vs
        return (wv[..., None] * vc.astype(jnp.float32)).sum(2)

    def vpu_av(q):
        w = softmax_masked(qk_s8(q))
        wv = w * vs
        return (wv[..., None] * vc.astype(jnp.float32)).sum(2)

    def vpu_qk_mxu_av(q):
        w = softmax_masked(qk_vpu(q))
        wv = (w * vs).astype(jnp.bfloat16)
        return jnp.einsum("bht,bhtd->bhd", wv, vc.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    # -- time-major layout: (T, B, H, D) — the window slice is a
    # contiguous prefix of the whole buffer, so the stream is one
    # linear read instead of B*H strided (win, D) planes.
    kt = jnp.transpose(kc, (2, 0, 1, 3))      # (T,B,H,D) int8
    vt = jnp.transpose(vc, (2, 0, 1, 3))
    kst = jnp.transpose(ks, (2, 0, 1))        # (T,B,H)
    vst = jnp.transpose(vs, (2, 0, 1))

    def tmajor(q):
        qf = q.astype(jnp.float32)[None]                  # (1,B,H,D)
        logits = (qf * kt.astype(jnp.float32)).sum(-1)    # (T,B,H)
        logits = logits * (kst * scale)
        k_pos = jnp.arange(t)
        dist = jnp.abs(k_pos - pos).astype(jnp.float32)
        logits = logits + slopes[None, None, :] * dist[:, None, None]
        logits = jnp.where(k_pos[:, None, None] <= pos, logits,
                           NEG_INF)
        w = jax.nn.softmax(logits, axis=0)
        wv = w * vst                                      # (T,B,H)
        return (wv[..., None] * vt.astype(jnp.float32)).sum(0)

    def read_bw_hmajor(q):
        """Pure-read ceiling for the head-major strided pattern."""
        s = kc.astype(jnp.float32).sum((2, 3)) \
            + vc.astype(jnp.float32).sum((2, 3))          # (B,H)
        return q + s[..., None].astype(q.dtype) * 1e-6

    def read_bw_tmajor(q):
        s = kt.astype(jnp.float32).sum((0, 3)) \
            + vt.astype(jnp.float32).sum((0, 3))
        return q + s[..., None].astype(q.dtype) * 1e-6

    variants = [("shipped s8QK+bf16AV", shipped, 2),
                ("s8 QK + s8 AV", av_s8, 2),
                ("bf16 cache", bf16_cache, 4),
                ("dequant-first int8", dequant_first, 2),
                ("VPU QK + MXU AV", vpu_qk_mxu_av, 2),
                ("MXU s8 QK + VPU AV", vpu_av, 2),
                ("VPU QK + VPU AV", vpu_both, 2),
                ("time-major VPU", tmajor, 2),
                ("pure-read h-major", read_bw_hmajor, 2),
                ("pure-read t-major", read_bw_tmajor, 2)]

    for name, fn, bytes_per in variants:
        @jax.jit
        def run(q0, fn=fn):
            def body(q, _):
                o = fn(q)
                # feed output back so steps serialize like real decode
                return (o * 1e-3 + q0).astype(q0.dtype), ()
            q, _ = jax.lax.scan(body, q0, None, length=steps)
            return q

        sec = timeit(run, q0)
        us = sec / steps * 1e6
        gbs = (b * h * t * d * bytes_per) / (sec / steps) / 1e9
        print(f"{name:<24} {us:8.1f} us/step  {gbs:7.0f} GB/s eff")


if __name__ == "__main__":
    main()
