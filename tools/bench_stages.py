"""Full-pipeline stage split: AR vs DDIM vs vocoder wall time.

Times the three headline-pipeline stages as separate jitted programs
at the flagship config so optimization effort goes where the time is
(the one-program bench.py can't attribute time).

Usage:  python tools/bench_stages.py [batch]
Env:    BENCH_KV_INT8=0|1 (default 1), BENCH_W_INT8=1, BENCH_RUNS
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
from vae_gslm_tpu.inference.speech.sampler import (ARTRSampler,
                                                   _n_segments,
                                                   _select_hybrid)
from vae_gslm_tpu.models.speech.lvtr import LVTR
from vae_gslm_tpu.models.vocoder.hfgan import Generator


def timeit(fn, *args, runs=3):
    out = fn(*args)  # compile + warm
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args)
        times.append(time.perf_counter() - t0)
    return min(times), out


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    precision.set_policy(precision.bf16_mixed())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hp = Hparams.from_yamlfile(os.path.join(
        root, "configs", "train", "speech", "vae-gslm.yaml"))
    voc_hp = Hparams.from_yamlfile(os.path.join(
        root, "configs", "train", "vocoder",
        "hfgan_16k_50hz_librispeech.yaml"))
    model = nnx.jit(lambda: LVTR(hp.model, input_dim=80,
                                 rngs=nnx.Rngs(0)))()
    model.decoder.override_sampling(sampling_timesteps=100,
                                    ddim_sampling_eta=0.5)
    generator = nnx.jit(
        lambda: Generator(voc_hp.model.generator, rngs=nnx.Rngs(1)))()
    generator.remove_weight_norm()
    _, p, _ = nnx.split(model, nnx.Param, ...)
    p = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, p)
    nnx.update(model, p)

    use_int8 = os.environ.get("BENCH_KV_INT8", "1") != "0"
    kv_dtype = jnp.int8 if use_int8 else None
    w_int8 = os.environ.get("BENCH_W_INT8", "0") != "0"

    mel_rate, tp, length = 50, 150, 500
    rng = np.random.RandomState(0)
    toks = rng.randint(0, 200, (batch, tp, 1)).astype(np.float32)
    mel = (rng.randn(batch, tp, 80) * 0.5 - 1.0).astype(np.float32)
    prior = Masked.from_lengths(
        jnp.asarray(np.concatenate([toks, mel], -1)),
        jnp.full((batch,), tp, np.int32))

    sampler = ARTRSampler(model, kv_dtype=kv_dtype,
                          quantize_weights=w_int8)
    graphdef, state = nnx.split(model)
    use_stacked = model.transformer.supports_stacked_decode()
    use_hybrid, interp = _select_hybrid(use_stacked, kv_dtype, False)
    hybrid_cap = int(os.environ.get("VAE_GSLM_HYBRID_MAX_BATCH", "64"))

    @jax.jit
    def ar_stage(state, prior, key):
        m = nnx.merge(graphdef, state)
        k_enc, k_init, k_pre, k_dec, k_scan = jax.random.split(key, 5)
        enc = m.encode(prior, k_enc, temperature=0.85)
        b, tpv = enc.value.shape[0], enc.value.shape[1]
        kw = dict(temperature=0.85, token_temperature=0.85,
                  truncated_norm=None)
        stacked = (m.transformer.build_stacked_decode()
                   if use_stacked
                   and b <= max(32, hybrid_cap if use_hybrid else 32)
                   else None)
        if use_hybrid and stacked is not None and b <= hybrid_cap:
            frames, _ = sampler._run_hybrid(
                m, stacked, enc, length, k_init, k_pre, k_scan,
                0.85, 0.85, None, interp)
        else:
            caches = m.init_cache(b, tpv + 1 + length, dtype=kv_dtype,
                                  stacked=stacked is not None)
            out, caches = m.step(enc.value, caches, jnp.asarray(0),
                                 k_pre, push_init_state=True,
                                 init_key=k_init, stacked=stacked, **kw)
            frame = out[:, -1:]
            max_len = tpv + 1 + length
            n_seg = _n_segments(length)
            bounds = [round(length * (i + 1) / n_seg)
                      for i in range(n_seg)]
            keys = jax.random.split(k_scan, length)
            carry = (frame, caches, jnp.asarray(tpv + 1))
            seg_frames = []
            start = 0
            for end in bounds:
                window = min(-(-(tpv + 1 + end) // 64) * 64, max_len)

                def body(carry, k_i, window=window):
                    frame, caches, pos = carry
                    nxt, caches = m.step(frame, caches, pos, k_i,
                                         window=window, **kw)
                    return (nxt, caches, pos + 1), frame[:, 0]

                carry, fr = jax.lax.scan(body, carry, keys[start:end])
                seg_frames.append(fr)
                start = end
            frames = jnp.swapaxes(jnp.concatenate(seg_frames, 0), 0, 1)
        full = jnp.concatenate([enc.value, frames], axis=1)
        return Masked.from_lengths(full, enc.lengths + length)

    has_utt = getattr(model, "utterance_net", None) is not None

    @jax.jit
    def ddim_stage(state, full_m, prior, key):
        m = nnx.merge(graphdef, state)
        u_c = m.encode_utterance(prior) if has_utt else None
        return (m.decode(full_m, key, u_c=u_c) if has_utt
                else m.decode(full_m, key))

    g_graphdef, g_state = nnx.split(generator)

    @jax.jit
    def vocode(g_state, mel):
        return nnx.merge(g_graphdef, g_state)(mel)

    def force(x):
        # Slice ON DEVICE before the host transfer: np.asarray of a
        # full stage output would time the ~38 MB/s tunnel transfer
        # (an 84 MB wave batch costs ~2.2 s), not the computation.
        leaf = jax.tree_util.tree_leaves(x)[0]
        return np.asarray(leaf.ravel()[:8])

    key = jax.random.PRNGKey(0)

    def run_ar():
        out = ar_stage(state, prior, key)
        force(out)          # device->host slice: honest timing
        return out

    t_ar, full_m = timeit(run_ar, runs=runs)

    def run_dd():
        out = ddim_stage(state, full_m, prior, key)
        force(out)
        return out

    t_dd, mel_out = timeit(run_dd, runs=runs)

    def run_vc():
        out = vocode(g_state, mel_out)
        force(out)
        return out

    t_vc, _ = timeit(run_vc, runs=runs)

    total = t_ar + t_dd + t_vc
    audio = batch * 10.0
    print(f"batch={batch} kv_int8={use_int8} w_int8={w_int8}")
    print(f"AR stage:    {t_ar:8.3f} s  ({t_ar / total:5.1%})"
          f"  {t_ar / length * 1e3:7.3f} ms/step")
    print(f"DDIM stage:  {t_dd:8.3f} s  ({t_dd / total:5.1%})"
          f"  {t_dd / 100 * 1e3:7.3f} ms/ddim-step")
    print(f"vocoder:     {t_vc:8.3f} s  ({t_vc / total:5.1%})")
    print(f"total {total:.3f} s -> RTF {audio / total:.1f}x "
          f"(one-program bench.py may differ slightly)")


if __name__ == "__main__":
    main()
