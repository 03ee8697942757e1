"""Capture a device trace of the per-layer AR decode scan.

Traces a short (64-step) windowed decode scan at a given batch on the
real chip — the per-layer (stacked/XLA) path that bench.py uses at
B=128 and that measures 3.9x off its B=128 per-step cost at B=64
(PERFORMANCE.md batch sweep).  Parse with tools/xplane_top.py to see
which ops blow up at B=64.

Usage: python tools/profile_decode.py <batch> [logdir]
Env:   BENCH_KV_INT8=0|1 (default 1)
"""
from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from vae_gslm_tpu.core import precision
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.models.speech.lvtr import LVTR


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    logdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/decode_trace"
    steps = 64
    precision.set_policy(precision.bf16_mixed())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hp = Hparams.from_yamlfile(os.path.join(
        root, "configs", "train", "speech", "vae-gslm.yaml"))
    model = nnx.jit(lambda: LVTR(hp.model, input_dim=80,
                                 rngs=nnx.Rngs(0)))()
    _, p, _ = nnx.split(model, nnx.Param, ...)
    p = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, p)
    nnx.update(model, p)
    kv_dtype = (jnp.int8
                if os.environ.get("BENCH_KV_INT8", "1") != "0"
                else None)
    graphdef, state = nnx.split(model)
    tp = 150
    max_len = tp + 1 + 512

    @jax.jit
    def scan_steps(state, key):
        m = nnx.merge(graphdef, state)
        caches = m.init_cache(batch, max_len, dtype=kv_dtype)
        in_dim = (m.transformer.linear.kernel.shape[0]
                  if m.transformer.linear is not None else 1024)
        x0 = jax.random.normal(key, (batch, 1, in_dim), jnp.bfloat16)

        def body(carry, _):
            xv, caches, pos = carry
            h, caches = m.transformer.decode(xv, caches, pos,
                                             window=512)
            return (h[:, :, :in_dim].astype(jnp.bfloat16) * 1e-3,
                    caches, pos + 1), ()

        (xv, _, _), _ = jax.lax.scan(
            body, (x0, caches, jnp.asarray(256)), None, length=steps)
        return xv

    k = jax.random.PRNGKey(0)
    np.asarray(scan_steps(state, k))[0, 0]   # compile + warm
    with jax.profiler.trace(logdir):
        np.asarray(scan_steps(state, k))[0, 0]
    print(f"trace written to {logdir} (batch={batch}, {steps} steps)")


if __name__ == "__main__":
    main()
