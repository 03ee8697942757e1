"""Probe the B=64 per-layer int8 decode-attention pathology.

PERFORMANCE.md batch sweep: the per-layer int8 QK einsum measures
9.4 ms/step at B=64 vs 4.8 ms at B=128 (half the work, double the
time).  This probe times the isolated 16-layer decode-attention chain
(quantized q s8xs8 QK, ALiBi+softmax, scale-folded AV) per step at
both batches and tries alternative lowerings at B=64:

  base      : current form, (B, H, T, D) caches, bhd,bhtd->bht
  fold      : reshape (B, H) -> BH, nd,ntd->nt
  bf16      : dequantize cache to bf16 then bf16 einsum
  pad128    : pad batch 64 -> 128 (the non-pathological shape)
  kmajor    : cache stored (B, H, D, T), bhd,bhdt->bht

Run on the real chip: python tools/bench_b64_qk.py [T]
"""
import sys
import time
import math

import jax
import jax.numpy as jnp
import numpy as np

H, D, L = 16, 64, 16
T = int(sys.argv[1]) if len(sys.argv) > 1 else 768
STEPS = 100


def timeit(fn, *args):
    # min-of-3 after one warm-up (matches tools/bench_avqk.py; the
    # lowerings compared here differ ~2x, single shots are too noisy).
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(jax.device_get(x[..., :1])), out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x[..., :1])), out)
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def make(b, layout="bhtd"):
    kk, kv, kq = jax.random.split(jax.random.PRNGKey(0), 3)
    if layout == "bhdt":
        shape = (L, b, H, D, T)
    else:
        shape = (L, b, H, T, D)
    k = jax.random.randint(kk, shape, -127, 128, jnp.int8)
    v = jax.random.randint(kv, shape, -127, 128, jnp.int8)
    ks = jnp.ones((L, b, H, T), jnp.float32) * 0.01
    vs = jnp.ones((L, b, H, T), jnp.float32) * 0.01
    q = jax.random.normal(kq, (b, H, D), jnp.bfloat16)
    slopes = -jnp.exp2(-jnp.arange(1, H + 1, dtype=jnp.float32) / 2)
    return q, k, v, ks, vs, slopes


def chain(q, kc, vc, ks, vs, slopes, pos, form):
    scale = 1.0 / math.sqrt(D)
    k_pos = jnp.arange(kc.shape[-2] if form != "kmajor" else kc.shape[-1])
    q_amax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
    q_scale = (q_amax / 127.0).astype(jnp.float32)
    qi = jnp.round(q / jnp.maximum(q_scale, 1e-8)).astype(jnp.int8)
    if form == "fold":
        b = q.shape[0]
        qi2 = qi.reshape(b * H, D)
        kc2 = kc.reshape(b * H, *kc.shape[2:])
        li = jnp.einsum("nd,ntd->nt", qi2, kc2,
                        preferred_element_type=jnp.int32)
        li = li.reshape(b, H, -1)
    elif form == "kmajor":
        li = jnp.einsum("bhd,bhdt->bht", qi, kc,
                        preferred_element_type=jnp.int32)
    elif form == "bf16":
        kb = (kc.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
        li = None
        logits = jnp.einsum("bhd,bhtd->bht", q.astype(jnp.bfloat16), kb,
                            preferred_element_type=jnp.float32) * scale
    elif form == "pad128":
        # Pad batch 64->128 (the non-pathological shape) inside the
        # step, einsum at 128, slice back.  Tests whether a pad copy +
        # the fast-shape einsum beats the pathological 64 einsum.
        b = q.shape[0]
        pad = [(0, 128 - b)] + [(0, 0)] * (kc.ndim - 1)
        li = jnp.einsum("bhd,bhtd->bht",
                        jnp.pad(qi, pad[:qi.ndim]),
                        jnp.pad(kc, pad),
                        preferred_element_type=jnp.int32)[:b]
    else:
        li = jnp.einsum("bhd,bhtd->bht", qi, kc,
                        preferred_element_type=jnp.int32)
    if form != "bf16":
        logits = (li.astype(jnp.float32)
                  * (q_scale * ks.astype(jnp.float32) * scale))
    dist = jnp.abs(k_pos - pos).astype(jnp.float32)
    logits = logits + slopes[None, :, None] * dist[None, None, :]
    logits = jnp.where(k_pos[None, None, :] <= pos, logits, -1e30)
    w = jax.nn.softmax(logits, axis=-1)
    if form == "bf16":
        vb = (vc.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
        out = jnp.einsum("bht,bhtd->bhd", w.astype(jnp.bfloat16), vb,
                         preferred_element_type=jnp.float32)
    elif form == "kmajor":
        wv = (w * vs.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jnp.einsum("bht,bhdt->bhd", wv, vc.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    else:
        wv = (w * vs.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jnp.einsum("bht,bhtd->bhd", wv, vc.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    return out.astype(jnp.bfloat16)


def run(b, form, layout="bhtd", unrolled=True):
    q, k, v, ks, vs, slopes = make(b, layout)
    pos = jnp.int32(T - 2)
    # Match the shipped per-layer path: 16 SEPARATE cache arrays read
    # in an unrolled loop (scan-xs stacked caches materialize a copy —
    # the known 214 GB/s pathology, measured here too).
    kl = [k[i] for i in range(L)]
    vl = [v[i] for i in range(L)]
    ksl = [ks[i] for i in range(L)]
    vsl = [vs[i] for i in range(L)]

    @jax.jit
    def steps(q, kl, vl, ksl, vsl):
        def outer(carry, _):
            o = carry
            for i in range(L):
                o = chain(o, kl[i], vl[i], ksl[i], vsl[i],
                          slopes, pos, form)
            return o, ()
        o, _ = jax.lax.scan(outer, q, None, length=STEPS)
        return o
    dt = timeit(steps, q, kl, vl, ksl, vsl)
    # int8 K+V bytes plus the fp32 k/v scale arrays (~12% extra).
    gb = (2 * L * b * H * T * D + 2 * L * b * H * T * 4) / 1e9
    print(f"B={b:4d} {form:8s}: {dt*1e3:7.3f} ms/step "
          f"({gb/dt:.0f} GB/s cache)", flush=True)
    return dt


if __name__ == "__main__":
    print(f"T={T} L={L} H={H} D={D}")
    run(128, "base")
    run(64, "base")
    run(64, "fold")
    run(64, "bf16")
    run(64, "pad128")
    run(64, "kmajor", layout="bhdt")
    run(32, "base")
    run(96, "base")
