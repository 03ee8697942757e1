"""Interleaved slope-timed A/B of flash-backward formulations at the
training shapes (one process, variants alternated, min-of-N — cancels
tunnel drift; the only comparison style that reproduced across
sessions, PERFORMANCE.md round 4).

Variants:
  full   — default full-matrix kernel (five matmuls, LSE residual)
  block  — blockwise kernel forced at T=641 (K/V-resident q-tiles,
           dk/dv accumulated across grid steps)

Run: python tools/bench_bwd_variants.py [T] [block_q]
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from vae_gslm_tpu.ops import flash_attention as fa  # noqa: E402

B, H, D = 8, 16, 64
T = int(sys.argv[1]) if len(sys.argv) > 1 else 641
BQ = int(sys.argv[2]) if len(sys.argv) > 2 else 128
N1, N2, REPS = 2, 8, 8


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, T, D) * 0.3, jnp.bfloat16)
    lengths = jnp.full((B,), T, jnp.int32)
    slopes = -jnp.exp2(-jnp.arange(1, H + 1, dtype=jnp.float32) / 2)

    def attn_with_bwd(which):
        @jax.custom_vjp
        def f(q, k, v):
            return fa._attention_reference(q, k, v, lengths, slopes,
                                           True)

        def fwd(q, k, v):
            out, lse = fa._flash_forward_full(q, k, v, lengths, slopes,
                                              True, with_stats=True)
            return out, (q, k, v, out, lse)

        def bwd(res, g):
            q, k, v, o, lse = res
            if which == "full":
                return fa._flash_backward(q, k, v, g, o, lengths,
                                          slopes, True, lse=lse)
            return fa._flash_backward_blockwise(q, k, v, g, o, lengths,
                                                slopes, True,
                                                block_q=BQ)

        f.defvjp(fwd, bwd)
        return f

    fns = {w: attn_with_bwd(w) for w in ("full", "block")}

    def chain(w, n):
        f = fns[w]

        def loss(x):
            y = x
            for _ in range(n):
                y = f(y, y, y)
            return (y.astype(jnp.float32) ** 2).sum()
        return jax.jit(jax.grad(loss))

    # parity first
    gr = jax.jit(jax.grad(lambda q: (fa._attention_reference(
        q, q, q, lengths, slopes, True).astype(jnp.float32) ** 2
    ).sum()))(x)
    for w in fns:
        gf = jax.jit(jax.grad(lambda q: (fns[w](q, q, q).astype(
            jnp.float32) ** 2).sum()))(x)
        rel = (np.abs(np.asarray(gf, np.float32)
                      - np.asarray(gr, np.float32)).max()
               / (np.abs(np.asarray(gr, np.float32)).max() + 1e-9))
        print(f"parity {w}: dq max-rel {rel:.2e}", flush=True)
        assert rel < 3e-2, w

    compiled = {}
    for w in fns:
        for n in (N1, N2):
            compiled[(w, n)] = chain(w, n)
            np.asarray(compiled[(w, n)](x).ravel()[:4])  # compile+warm
    times = {k: [] for k in compiled}
    for _ in range(REPS):
        for k, f in compiled.items():     # interleave all four
            t0 = time.perf_counter()
            np.asarray(f(x).ravel()[:4])
            times[k].append(time.perf_counter() - t0)
    print(f"T={T} B={B} H={H} D={D} block_q={BQ}  (fwd+bwd us/layer, "
          f"min-of-{REPS} slope)")
    for w in fns:
        s = (min(times[(w, N2)]) - min(times[(w, N1)])) / (N2 - N1)
        print(f"{w:6s}: {s * 1e6:7.1f}", flush=True)


if __name__ == "__main__":
    main()
