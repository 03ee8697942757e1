"""AR-step time split: transformer trunk vs sampling extras.

The B=128 AR stage costs ~4.64 ms/step while the measured memory
floor (int8 cache converts at ~480 G elem/s + bf16 weight streaming)
is ~3 ms — this tool attributes the gap by timing a 500-step scan of
(a) the full ``LVTR.step`` (trunk + prior head + flow reverse + token
sampling), and (b) the trunk decode alone (feeding the trunk output
straight back in, preserving the scan's serial data dependence).

Usage:  python tools/bench_ar_split.py [batch]
Env:    BENCH_RUNS (default 3), VAE_GSLM_DECODE_SEGMENTS
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
from vae_gslm_tpu.inference.speech.sampler import (_hybrid_scan_segments,
                                                   _n_segments)
from vae_gslm_tpu.models.speech.lvtr import LVTR


def timeit(fn, *args, runs=3):
    fn(*args)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(*args)
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    runs = int(os.environ.get("BENCH_RUNS", "3"))
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

    mel_rate, tp, length = 50, 150, 500
    rng = np.random.RandomState(0)
    toks = rng.randint(0, 200, (batch, tp, 1)).astype(np.float32)
    mel = (rng.randn(batch, tp, 80) * 0.5 - 1.0).astype(np.float32)
    prior = Masked.from_lengths(
        jnp.asarray(np.concatenate([toks, mel], -1)),
        jnp.full((batch,), tp, np.int32))

    graphdef, state = nnx.split(model)
    kv_dtype = jnp.int8
    kw = dict(temperature=0.85, token_temperature=0.85,
              truncated_norm=None)

    def segments(tpv):
        max_len = tpv + 1 + length
        n_seg = _n_segments(length)
        bounds = [round(length * (i + 1) / n_seg) for i in range(n_seg)]
        return max_len, bounds

    @jax.jit
    def full_scan(state, prior, key):
        m = nnx.merge(graphdef, state)
        k_enc, k_init, k_pre, k_scan = jax.random.split(key, 4)
        enc = m.encode(prior, k_enc, temperature=0.85)
        b, tpv = enc.value.shape[0], enc.value.shape[1]
        caches = m.init_cache(b, tpv + 1 + length, dtype=kv_dtype)
        out, caches = m.step(enc.value, caches, jnp.asarray(0), k_pre,
                             push_init_state=True, init_key=k_init, **kw)
        frame = out[:, -1:]
        max_len, bounds = segments(tpv)
        keys = jax.random.split(k_scan, length)
        carry = (frame, caches, jnp.asarray(tpv + 1))
        acc = jnp.zeros((b, out.shape[-1]), jnp.float32)
        start = 0
        for end in bounds:
            window = min(-(-(tpv + 1 + end) // 64) * 64, max_len)

            def body(carry, k_i, window=window):
                frame, caches, pos = carry
                nxt, caches = m.step(frame, caches, pos, k_i,
                                     window=window, **kw)
                return (nxt, caches, pos + 1), frame[:, 0]

            carry, fr = jax.lax.scan(body, carry, keys[start:end])
            acc = acc + fr.sum(0)
            start = end
        return acc

    @jax.jit
    def trunk_scan(state, prior, key):
        """Same scan but only embed+trunk per step (no prior head,
        flow reverse, or token sampling): next input = f(trunk out)."""
        m = nnx.merge(graphdef, state)
        k_enc, k_init, k_pre, k_scan = jax.random.split(key, 4)
        enc = m.encode(prior, k_enc, temperature=0.85)
        b, tpv = enc.value.shape[0], enc.value.shape[1]
        caches = m.init_cache(b, tpv + 1 + length, dtype=kv_dtype)
        out, caches = m.step(enc.value, caches, jnp.asarray(0), k_pre,
                             push_init_state=True, init_key=k_init, **kw)
        max_len, bounds = segments(tpv)
        h0 = jnp.zeros((b, 1, 64), jnp.bfloat16)  # token-embedding dim
        carry = (h0, caches, jnp.asarray(tpv + 1))
        acc = jnp.zeros((b,), jnp.float32)
        start = 0
        for end in bounds:
            window = min(-(-(tpv + 1 + end) // 64) * 64, max_len)

            def body(carry, k_i, window=window):
                h_prev, caches, pos = carry
                h, caches = m.transformer.decode(h_prev, caches, pos,
                                                 window=window)
                return (h[..., :64].astype(jnp.bfloat16), caches,
                        pos + 1), ()

            carry, _ = jax.lax.scan(body, carry,
                                    jnp.arange(start, end))
            start = end
        return carry[0].astype(jnp.float32).sum()

    hybrid = os.environ.get("BENCH_HYBRID", "0") != "0"
    if hybrid:
        w_int8 = os.environ.get("BENCH_W_INT8", "1") != "0"
        if w_int8:
            model.transformer.quantize_weights_int8()
            graphdef, state = nnx.split(model)

        @jax.jit
        def full_scan(state, prior, key):  # noqa: F811
            m = nnx.merge(graphdef, state)
            k_enc, k_init, k_pre, k_scan = jax.random.split(key, 4)
            enc = m.encode(prior, k_enc, temperature=0.85)
            b, tpv = enc.value.shape[0], enc.value.shape[1]
            stacked = m.transformer.build_stacked_decode()
            pre_cache = m.init_cache(b, tpv + 1, dtype=jnp.int8,
                                     stacked=True)
            out, pre_cache = m.step(enc.value, pre_cache,
                                    jnp.asarray(0), k_pre,
                                    push_init_state=True,
                                    init_key=k_init, stacked=stacked,
                                    **kw)
            frame = out[:, -1:]
            total = tpv + 1 + length
            cache, flushed = m.transformer.hybrid_cache_from_prefill(
                pre_cache, tpv + 1, total)

            def step_fn(frame, cache, pos, flushed, k_i):
                return m.step_hybrid(frame, stacked, cache, pos,
                                     flushed, k_i, **kw)

            frames, _ = _hybrid_scan_segments(
                m, frame, cache, flushed, tpv + 1, length,
                jax.random.split(k_scan, length), step_fn)
            return frames.sum()

        @jax.jit
        def trunk_scan(state, prior, key):  # noqa: F811
            m = nnx.merge(graphdef, state)
            k_enc, k_init, k_pre, k_scan = jax.random.split(key, 4)
            enc = m.encode(prior, k_enc, temperature=0.85)
            b, tpv = enc.value.shape[0], enc.value.shape[1]
            stacked = m.transformer.build_stacked_decode()
            pre_cache = m.init_cache(b, tpv + 1, dtype=jnp.int8,
                                     stacked=True)
            out, pre_cache = m.step(enc.value, pre_cache,
                                    jnp.asarray(0), k_pre,
                                    push_init_state=True,
                                    init_key=k_init, stacked=stacked,
                                    **kw)
            total = tpv + 1 + length
            cache, flushed = m.transformer.hybrid_cache_from_prefill(
                pre_cache, tpv + 1, total)
            h0 = jnp.zeros((b, 1, 64), jnp.bfloat16)

            def step_fn(h_prev, cache, pos, flushed, k_i):
                h, cache = m.transformer.decode_hybrid(
                    h_prev, stacked, cache, pos, flushed)
                return h[..., :64].astype(jnp.bfloat16), cache

            frames, _ = _hybrid_scan_segments(
                m, h0, cache, flushed, tpv + 1, length,
                jax.random.split(k_scan, length), step_fn)
            return frames.astype(jnp.float32).sum()

    key = jax.random.PRNGKey(0)

    def run(fn):
        out = fn(state, prior, key)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:8])

    t_full = timeit(lambda: run(full_scan), runs=runs)
    t_trunk = timeit(lambda: run(trunk_scan), runs=runs)
    extra = t_full - t_trunk
    print(f"batch={batch} length={length}")
    print(f"full step scan : {t_full:7.3f} s  "
          f"{t_full / length * 1e3:7.3f} ms/step")
    print(f"trunk-only scan: {t_trunk:7.3f} s  "
          f"{t_trunk / length * 1e3:7.3f} ms/step")
    print(f"extras         : {extra:7.3f} s  "
          f"{extra / length * 1e3:7.3f} ms/step "
          f"({extra / t_full:5.1%} of AR)")


if __name__ == "__main__":
    main()
