"""Compile-only VMEM probe for ops/mega_step.fused_trunk_step.

Builds random flagship-dims weights + cache at a given (batch,
flushed) and lower+compiles the kernel on the real chip, printing
ok / the scoped-VMEM OOM size.  Used to localize what scales the
122.68M stack at B=32 (chip_results/bench_b32_mega3.err): if the
scoped size grows ~8 MB per cold block at B=32, the unrolled
cold-block loop's per-block (GH, Dh, BLK) reshape temps are the
peak, not the weight-upconversion temps.

Usage: python tools/probe_mega_vmem.py <batch> <flushed> [nslot]
"""
from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from vae_gslm_tpu.ops.mega_step import (BLK, STAGE, TAIL,
                                        fused_trunk_step)

L, D, H, F = 16, 1024, 16, 4096
DH = D // H


def make(b: int, flushed: int):
    rng = np.random.RandomState(0)
    nb = max(flushed // BLK, 1)
    w = {
        "wq": jnp.asarray(rng.randint(-127, 128, (L, D, 3 * D)),
                          jnp.int8),
        "wo": jnp.asarray(rng.randint(-127, 128, (L, D, D)), jnp.int8),
        "w1": jnp.asarray(rng.randint(-127, 128, (L, D, F)), jnp.int8),
        "w2": jnp.asarray(rng.randint(-127, 128, (L, F, D)), jnp.int8),
        "sq": jnp.ones((L, 3 * D), jnp.float32) * 1e-3,
        "so": jnp.ones((L, D), jnp.float32) * 1e-3,
        "s1": jnp.ones((L, F), jnp.float32) * 1e-3,
        "s2": jnp.ones((L, D), jnp.float32) * 1e-3,
        "n1": jnp.ones((L, D), jnp.float32),
        "n3": jnp.ones((L, D), jnp.float32),
        "bq": jnp.zeros((L, 3 * D), jnp.float32),
        "bo": jnp.zeros((L, D), jnp.float32),
        "b1": jnp.zeros((L, F), jnp.float32),
        "b2": jnp.zeros((L, D), jnp.float32),
    }
    cache = {
        "k_cold": jnp.zeros((L, nb, H, b, DH, BLK), jnp.int8),
        "v_cold": jnp.zeros((L, nb, H, b, DH, BLK), jnp.int8),
        "kc_scale": jnp.ones((L, nb, H, b, BLK), jnp.float32),
        "vc_scale": jnp.ones((L, nb, H, b, BLK), jnp.float32),
        "k_tail": jnp.zeros((L, H, b, TAIL, DH), jnp.int8),
        "v_tail": jnp.zeros((L, H, b, TAIL, DH), jnp.int8),
        "kt_scale": jnp.ones((L, H, b, TAIL), jnp.float32),
        "vt_scale": jnp.ones((L, H, b, TAIL), jnp.float32),
        "k_stage": jnp.zeros((L, STAGE, H, b, DH), jnp.bfloat16),
        "v_stage": jnp.zeros((L, STAGE, H, b, DH), jnp.bfloat16),
    }
    x = jnp.zeros((b, D), jnp.float32)
    slopes = jnp.ones((H,), jnp.float32) * -0.1
    return x, w, cache, slopes


def main():
    b = int(sys.argv[1])
    flushed = int(sys.argv[2])
    nslot = int(sys.argv[3]) if len(sys.argv) > 3 else None
    x, w, cache, slopes = make(b, flushed)
    try:
        lowered = jax.jit(
            lambda x, w, c, p, s: fused_trunk_step(
                x, w, c, p, s, flushed=flushed, nslot=nslot)
        ).lower(x, w, cache, jnp.asarray(flushed + 5, jnp.int32),
                slopes)
        lowered.compile()
        print(f"b={b} flushed={flushed} nslot={nslot}: COMPILE OK")
    except Exception as e:  # noqa: BLE001
        import re
        msg = str(e)
        mm = re.search(r"Scoped allocation with size ([0-9.]+[MK]) and "
                       r"limit ([0-9.]+[MK]) exceeded[^.]*by "
                       r"([0-9.]+[MK])", msg)
        det = (f"scoped {mm.group(1)} limit {mm.group(2)} "
               f"over by {mm.group(3)}" if mm else msg[-300:])
        print(f"b={b} flushed={flushed} nslot={nslot}: FAIL  {det}")


if __name__ == "__main__":
    main()
