"""AR-decode stage microbenchmark: where does the per-step time go?

Times, on the real chip at the flagship config (16L/d1024/16h/FFN4096):
  * the full AR stage (prefill + N-step scan) as the sampler builds it
  * a trunk-only decode scan (16-layer transformer.decode, no
    prior/flow/token heads)
  * a stacked-weight matmul-only scan (the bandwidth floor of the
    trunk's dense projections)

Usage:  python tools/bench_decode.py [batch] [steps]
Env:    BENCH_KV_INT8=0|1 (default 1)
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from vae_gslm_tpu.core import precision
from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.inference.speech.sampler import ARTRSampler
from vae_gslm_tpu.models.speech.lvtr import LVTR


def timeit(fn, *args, runs=3):
    fn(*args)  # compile + warm
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(*args)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500
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

    mel_rate, tp = 50, 150
    rng = np.random.RandomState(0)
    toks = rng.randint(0, 200, (batch, tp, 1)).astype(np.float32)
    mel = (rng.randn(batch, tp, 80) * 0.5 - 1.0).astype(np.float32)
    prior = Masked.from_lengths(
        jnp.asarray(np.concatenate([toks, mel], -1)),
        jnp.full((batch,), tp, np.int32))
    kv_dtype = (jnp.int8
                if os.environ.get("BENCH_KV_INT8", "1") != "0" else None)

    # ------------------------------------------------ full AR stage
    # (the sampler's AR loop without the diffusion decode/vocoder)
    graphdef0, state0 = nnx.split(model)

    @jax.jit
    def ar_stage(state, key):
        m = nnx.merge(graphdef0, state)
        k_enc, k_init, k_pre, k_scan = jax.random.split(key, 4)
        enc = m.encode(prior, k_enc, temperature=1.0)
        b, tpp = enc.value.shape[0], enc.value.shape[1]
        caches = m.init_cache(b, tpp + 1 + steps, dtype=kv_dtype)
        kw = dict(temperature=0.85, token_temperature=0.85)
        out, caches = m.step(enc.value, caches, jnp.asarray(0), k_pre,
                             push_init_state=True, init_key=k_init,
                             **kw)
        frame = out[:, -1:]
        max_len = tpp + 1 + steps
        n_seg = max(1, min(8, steps // 48))
        bounds = [round(steps * (i + 1) / n_seg) for i in range(n_seg)]
        keys = jax.random.split(k_scan, steps)
        carry = (frame, caches, jnp.asarray(tpp + 1))
        start = 0
        outs = []
        for end in bounds:
            window = min(-(-(tpp + 1 + end) // 64) * 64, max_len)

            def body(carry, k_i, window=window):
                frame, caches, pos = carry
                nxt, caches = m.step(frame, caches, pos, k_i,
                                     window=window, **kw)
                return (nxt, caches, pos + 1), frame[:, 0]

            carry, fr = jax.lax.scan(body, carry, keys[start:end])
            outs.append(fr)
            start = end
        return jnp.concatenate(outs, 0)

    def full(key):
        return np.asarray(ar_stage(state0, key))[-1, 0, :2]

    t_full = timeit(full, jax.random.PRNGKey(0))
    print(f"full AR stage      b={batch} steps={steps}: "
          f"{t_full*1e3:8.1f} ms  ({t_full/steps*1e6:7.1f} us/step)")

    # --------------------------------------------- trunk-only scan
    graphdef, state = nnx.split(model)
    max_len = tp + 1 + steps

    @jax.jit
    def trunk_only(state, key):
        m = nnx.merge(graphdef, state)
        caches = m.init_cache(batch, max_len, dtype=kv_dtype)
        in_dim = (m.transformer.linear.kernel.shape[0]
                  if m.transformer.linear is not None else 1024)
        x0 = jax.random.normal(key, (batch, 1, in_dim), jnp.bfloat16)

        def body(carry, _):
            xv, caches, pos = carry
            h, caches = m.transformer.decode(xv, caches, pos,
                                             window=max_len)
            return (h[:, :, :in_dim].astype(jnp.bfloat16) * 1e-3,
                    caches, pos + 1), ()

        (xv, _, _), _ = jax.lax.scan(
            body, (x0, caches, jnp.asarray(0)), None, length=steps)
        return xv

    t_trunk = timeit(lambda k: np.asarray(trunk_only(state, k))[0, 0],
                     jax.random.PRNGKey(1))
    print(f"trunk-only scan    b={batch} steps={steps}: "
          f"{t_trunk*1e3:8.1f} ms  ({t_trunk/steps*1e6:7.1f} us/step)")

    # ------------------------------- stacked dense matmuls (floor)
    L, D, F = 16, 1024, 4096
    kk = jax.random.split(jax.random.PRNGKey(2), 4)
    sc = 0.02
    wq = jax.random.normal(kk[0], (L, D, 3 * D), jnp.bfloat16) * sc
    wo = jax.random.normal(kk[1], (L, D, D), jnp.bfloat16) * sc
    w1 = jax.random.normal(kk[2], (L, D, F), jnp.bfloat16) * sc
    w2 = jax.random.normal(kk[3], (L, F, D), jnp.bfloat16) * sc

    @jax.jit
    def matmuls_only(x, wq, wo, w1, w2):
        def step_body(x, _):
            def layer(h, ws):
                q, o, a, b2 = ws
                h = h + (h @ q)[:, :D] @ o
                h = h + jax.nn.gelu(h @ a) @ b2
                return h, ()
            x, _ = jax.lax.scan(layer, x, (wq, wo, w1, w2))
            return x * 1e-2, ()

        x, _ = jax.lax.scan(step_body, x, None, length=steps)
        return x

    x = jnp.ones((batch, D), jnp.bfloat16)
    t_mm = timeit(
        lambda: np.asarray(matmuls_only(x, wq, wo, w1, w2))[0, 0])
    print(f"stacked matmuls    b={batch} steps={steps}: "
          f"{t_mm*1e3:8.1f} ms  ({t_mm/steps*1e6:7.1f} us/step)")

    # weight bytes per step (bf16): qkv+out+ffn = 12M params/layer
    gbs = (L * (D * 3 * D + D * D + 2 * D * F) * 2) * steps / t_mm / 1e9
    print(f"  -> dense weight stream at {gbs:.0f} GB/s")


if __name__ == "__main__":
    main()
