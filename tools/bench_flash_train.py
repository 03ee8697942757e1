"""Training flash-attention kernels on the real chip: grad parity vs
the XLA dense VJP + slope-timed us/layer for fwd and fwd+bwd.

The CPU suite exercises the XLA fallback, so kernel-level changes to
``ops/flash_attention.py`` (full-matrix fwd/bwd, the FA2 lse residual,
scale folding) must be validated here.  Slope timing — per-layer cost
= (T(n2) - T(n1)) / (n2 - n1) over a chained stack — cancels the
~30 ms fixed host/tunnel fetch latency.

Run: python tools/bench_flash_train.py [T]
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

from vae_gslm_tpu.ops.flash_attention import (  # noqa: E402
    _attention_reference, flash_attention)

B, H, D = 8, 16, 64
T = int(sys.argv[1]) if len(sys.argv) > 1 else 641
N1, N2 = 2, 8


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, T, D) * 0.3, jnp.bfloat16)
    lengths = jnp.full((B,), T, jnp.int32)
    slopes = -jnp.exp2(-jnp.arange(1, H + 1, dtype=jnp.float32) / 2)

    # ---- parity: one layer, dq/dk/dv vs the XLA dense VJP ----------
    def one_flash(q, k, v):
        o = flash_attention(q, k, v, lengths, slopes, True)
        return (o.astype(jnp.float32) ** 2).sum()

    def one_ref(q, k, v):
        o = _attention_reference(q, k, v, lengths, slopes, True)
        return (o.astype(jnp.float32) ** 2).sum()

    gf = jax.jit(jax.grad(one_flash, argnums=(0, 1, 2)))(x, x, x)
    gr = jax.jit(jax.grad(one_ref, argnums=(0, 1, 2)))(x, x, x)
    for name, a, b in zip("dq dk dv".split(), gf, gr):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = (np.abs(a - b).max()
               / (np.abs(b).max() + 1e-9))
        print(f"parity {name}: max-rel {rel:.2e}")
        assert rel < 3e-2, f"{name} grad mismatch vs XLA VJP"

    # ---- slope timing ----------------------------------------------
    def chain_fwd(n):
        @jax.jit
        def f(x):
            for _ in range(n):
                x = flash_attention(x, x, x, lengths, slopes, True)
            return x
        return f

    def chain_bwd(n):
        def loss(x):
            y = x
            for _ in range(n):
                y = flash_attention(y, y, y, lengths, slopes, True)
            return (y.astype(jnp.float32) ** 2).sum()
        return jax.jit(jax.grad(loss))

    def slope(mk):
        f1, f2 = mk(N1), mk(N2)
        np.asarray(f1(x).ravel()[:4])
        np.asarray(f2(x).ravel()[:4])
        t1s, t2s = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f1(x).ravel()[:4])
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(f2(x).ravel()[:4])
            t2s.append(time.perf_counter() - t0)
        return (min(t2s) - min(t1s)) / (N2 - N1)

    fwd = slope(chain_fwd)
    both = slope(chain_bwd)
    print(f"T={T} B={B} H={H} D={D}")
    print(f"fwd      : {fwd * 1e6:7.1f} us/layer")
    print(f"fwd+bwd  : {both * 1e6:7.1f} us/layer")
    print(f"bwd alone: {(both - fwd) * 1e6:7.1f} us/layer")


if __name__ == "__main__":
    main()
