"""Reproduce + fix the B=64 per-layer decode-attention pathology.

Trace analysis (r4, tools/xplane_top.py on tools/profile_decode.py
captures): the int8 QK multiply-reduce fusion runs 946 us/step/layer
at B=64 vs 219 at B=128 because XLA assigns the cache a batch-minor
layout at B=128 (s8[128,16,663,64]{0,3,1,2} — batch fills the 128
lanes exactly) but a D-minor layout at B=64 ({3,1,0,2} — 64 of 128
lanes, cross-lane D reduction).  The r3 isolated-einsum probe missed
this because its caches were loop-invariant jit INPUTS; the layout
cliff only appears when the cache is a scan carry that the step also
WRITES (cache.write's dynamic_update_slice constrains the layout
choice).

This probe carries the caches through the scan and writes them every
step like the real path, then compares:

  base : (B, H, T, D) caches, bhd,bhtd->bht   (the shipped form)
  fold : (B*H, T, D) caches, nd,ntd->nt       (lane dim B*H = 1024
         at B=64 — full lanes at any batch)
  packed : (T, D, B*H) caches, dn,tdn->tn     (N minor: BOTH dots
         lane-parallel over N; QK reduces over sublane D, AV
         streams over major T — the mega-kernel cold-block
         structure in plain XLA)

Usage: python tools/bench_b64_fold.py [batch] [T] [steps]
"""
from __future__ import annotations

import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, D, L = 16, 64, 16
NEG_INF = -1e30


def timeit(fn, *args, runs=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
        best = min(best, time.perf_counter() - t0)
    return best


def run(b, t_len, steps, form):
    win = t_len - steps          # static window (like segment 1)
    slopes = -jnp.exp2(-jnp.arange(1, H + 1, dtype=jnp.float32) / 2)
    scale = 1.0 / math.sqrt(D)
    rng = np.random.RandomState(0)
    if form == "fold":
        n = b * H
        kshape = (L, n, t_len, D)
        sshape = (L, n, t_len)
        slopes_n = jnp.tile(slopes, b)          # n = b*H + h order
    elif form == "packed":
        n = b * H
        kshape = (L, t_len, D, n)
        sshape = (L, t_len, n)
        slopes_n = jnp.tile(slopes, b)
    else:
        kshape = (L, b, H, t_len, D)
        sshape = (L, b, H, t_len)
    k0 = jnp.asarray(rng.randint(-127, 128, kshape), jnp.int8)
    v0 = jnp.asarray(rng.randint(-127, 128, kshape), jnp.int8)
    ks0 = jnp.asarray(rng.rand(*sshape) * 0.01 + 0.005, jnp.float32)
    vs0 = jnp.asarray(rng.rand(*sshape) * 0.01 + 0.005, jnp.float32)
    x0 = jnp.asarray(rng.randn(b, H, D) * 0.3, jnp.bfloat16)
    pos0 = jnp.asarray(win - steps, jnp.int32)

    def attn_base(x, k, v, ks, vs, pos):
        kw, vw = k[:, :, :win], v[:, :, :win]
        ksw, vsw = ks[:, :, :win], vs[:, :, :win]
        q_amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        q_scale = (q_amax.astype(jnp.float32) / 127.0)
        qi = jnp.round(x.astype(jnp.float32)
                       / jnp.maximum(q_scale, 1e-8)).astype(jnp.int8)
        li = jnp.einsum("bhd,bhtd->bht", qi, kw,
                        preferred_element_type=jnp.int32)
        logits = (li.astype(jnp.float32)
                  * (q_scale * ksw.astype(jnp.float32) * scale))
        k_pos = jnp.arange(win)
        dist = jnp.abs(k_pos - pos).astype(jnp.float32)
        logits = logits + slopes[None, :, None] * dist[None, None, :]
        logits = jnp.where(k_pos[None, None, :] <= pos, logits,
                           NEG_INF)
        w = jax.nn.softmax(logits, axis=-1)
        wv = (w * vsw.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jnp.einsum("bht,bhtd->bhd", wv, vw.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out.astype(jnp.bfloat16)

    def attn_fold(x, k, v, ks, vs, pos):
        n = b * H
        xn = x.reshape(n, D)
        kw, vw = k[:, :win], v[:, :win]
        ksw, vsw = ks[:, :win], vs[:, :win]
        q_amax = jnp.max(jnp.abs(xn), axis=-1, keepdims=True)
        q_scale = (q_amax.astype(jnp.float32) / 127.0)
        qi = jnp.round(xn.astype(jnp.float32)
                       / jnp.maximum(q_scale, 1e-8)).astype(jnp.int8)
        li = jnp.einsum("nd,ntd->nt", qi, kw,
                        preferred_element_type=jnp.int32)
        logits = (li.astype(jnp.float32)
                  * (q_scale * ksw.astype(jnp.float32) * scale))
        k_pos = jnp.arange(win)
        dist = jnp.abs(k_pos - pos).astype(jnp.float32)
        logits = logits + slopes_n[:, None] * dist[None, :]
        logits = jnp.where(k_pos[None, :] <= pos, logits, NEG_INF)
        w = jax.nn.softmax(logits, axis=-1)
        wv = (w * vsw.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jnp.einsum("nt,ntd->nd", wv, vw.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out.astype(jnp.bfloat16).reshape(b, H, D)

    def attn_packed(x, k, v, ks, vs, pos):
        n = b * H
        xn = x.reshape(n, D)
        kw, vw = k[:win], v[:win]               # (T, D, N)
        ksw, vsw = ks[:win], vs[:win]           # (T, N)
        q_amax = jnp.max(jnp.abs(xn), axis=-1, keepdims=True)
        q_scale = (q_amax.astype(jnp.float32) / 127.0)
        qi = jnp.round(xn.astype(jnp.float32)
                       / jnp.maximum(q_scale, 1e-8)).astype(jnp.int8)
        qdn = jnp.swapaxes(qi, 0, 1)            # (D, N)
        li = jnp.einsum("dn,tdn->tn", qdn, kw,
                        preferred_element_type=jnp.int32)
        logits = (li.astype(jnp.float32)
                  * (q_scale[None, :, 0] * ksw.astype(jnp.float32)
                     * scale))
        k_pos = jnp.arange(win)
        dist = jnp.abs(k_pos - pos).astype(jnp.float32)
        logits = logits + slopes_n[None, :] * dist[:, None]
        logits = jnp.where(k_pos[:, None] <= pos, logits, NEG_INF)
        w = jax.nn.softmax(logits, axis=0)
        wv = (w * vsw.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jnp.einsum("tn,tdn->dn", wv, vw.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return (jnp.swapaxes(out, 0, 1).astype(jnp.bfloat16)
                .reshape(b, H, D))

    def write(k, v, ks, vs, row, pos):
        r8 = jnp.clip(jnp.round(row.astype(jnp.float32) * 127),
                      -127, 127).astype(jnp.int8)
        sc = jnp.full(row.shape[:-1], 1 / 127.0, jnp.float32)
        if form == "fold":
            r8 = r8.reshape(b * H, 1, D)
            sc = sc.reshape(b * H, 1)
            k = jax.lax.dynamic_update_slice(k, r8, (0, pos, 0))
            v = jax.lax.dynamic_update_slice(v, r8, (0, pos, 0))
            ks = jax.lax.dynamic_update_slice(ks, sc, (0, pos))
            vs = jax.lax.dynamic_update_slice(vs, sc, (0, pos))
        elif form == "packed":
            r8 = jnp.swapaxes(r8.reshape(b * H, D), 0, 1)[None]
            sc = sc.reshape(1, b * H)
            k = jax.lax.dynamic_update_slice(k, r8, (pos, 0, 0))
            v = jax.lax.dynamic_update_slice(v, r8, (pos, 0, 0))
            ks = jax.lax.dynamic_update_slice(ks, sc, (pos, 0))
            vs = jax.lax.dynamic_update_slice(vs, sc, (pos, 0))
        else:
            r8 = r8[:, :, None]
            sc = sc[:, :, None]
            k = jax.lax.dynamic_update_slice(k, r8, (0, 0, pos, 0))
            v = jax.lax.dynamic_update_slice(v, r8, (0, 0, pos, 0))
            ks = jax.lax.dynamic_update_slice(ks, sc, (0, 0, pos))
            vs = jax.lax.dynamic_update_slice(vs, sc, (0, 0, pos))
        return k, v, ks, vs

    attn = {"fold": attn_fold, "packed": attn_packed}.get(form,
                                                          attn_base)

    @jax.jit
    def scan_steps(x0, k0, v0, ks0, vs0):
        def body(carry, _):
            x, ks_, pos = carry
            new_ks = []
            for i in range(L):
                k, v, ks, vs = ks_[i]
                k, v, ks, vs = write(k, v, ks, vs, x, pos)
                x = attn(x, k, v, ks, vs, pos)
                new_ks.append((k, v, ks, vs))
            return (x, new_ks, pos + 1), ()
        caches = [(k0[i], v0[i], ks0[i], vs0[i]) for i in range(L)]
        (x, _, _), _ = jax.lax.scan(body, (x0, caches, pos0), None,
                                    length=steps)
        return x

    dt = timeit(scan_steps, x0, k0, v0, ks0, vs0)
    per = dt / steps
    gb = (2 * L * b * H * win * (D + 4)) / 1e9
    print(f"{form:>5} b={b:<4} win={win}: {dt*1e3:8.1f} ms "
          f"({per*1e6:7.1f} us/step, {gb/per:6.0f} GB/s eff)")


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    t_len = int(sys.argv[2]) if len(sys.argv) > 2 else 640
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    forms = (sys.argv[4].split(",") if len(sys.argv) > 4
             else ("base", "fold", "packed"))
    for form in forms:
        run(b, t_len, steps, form)


if __name__ == "__main__":
    main()
