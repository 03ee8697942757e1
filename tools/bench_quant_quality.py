"""Flagship-dims quantization-ladder metric deltas (real chip).

Samples 3 s-prompt -> 10 s continuations at the flagship config under
each serving quantization rung with a SHARED PRNG key and reports the
output-domain divergence vs the fp path: token agreement, latent RMS
ratio, decoded-mel RMS ratio — the measured numbers behind the
PERFORMANCE.md quantization table (VERDICT r2 item 4).

A compact checkpoint from ``tools/train_smoke.py [steps] [every]
[save_ckpt]`` should be passed as the third argument: at RANDOM init
the token logits are near-uniform, so the rungs diverge at step 0 by
construction (token agreement reads the 1/vocab chance floor — 0.010
measured) and 500 untrained AR steps blow the latents up to NaN.
Only a trained model with sharp logits measures quantization, not
chaos.  Prompts come from the same synthetic distribution the smoke
model was trained on (in-distribution rollouts).

Usage: python tools/bench_quant_quality.py [batch] [length] [ckpt]
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
from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.inference.speech.sampler import ARTRSampler
from vae_gslm_tpu.models.speech.lvtr import LVTR


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    length = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    ckpt = sys.argv[3] if len(sys.argv) > 3 else None
    precision.set_policy(precision.bf16_mixed())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hp = Hparams.from_yamlfile(os.path.join(
        root, "configs", "train", "speech", "vae-gslm.yaml"))

    def build():
        m = nnx.jit(lambda: LVTR(hp.model, input_dim=80,
                                 rngs=nnx.Rngs(0)))()
        if ckpt is not None:
            from vae_gslm_tpu.training.checkpoint import load_compact
            load_compact(m, ckpt)
        m.decoder.override_sampling(sampling_timesteps=100,
                                    ddim_sampling_eta=0.5)
        _, p, _ = nnx.split(m, nnx.Param, ...)
        p = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p)
        nnx.update(m, p)
        return m

    tp = 150
    rng = np.random.RandomState(0)
    if ckpt is not None:
        # in-distribution prompts: same synthetic process the smoke
        # checkpoint was trained on (tools/train_smoke.py::synth_batch)
        from tools.train_smoke import synth_batch
        sb = synth_batch(rng, 1, batch, tp, 80,
                         int(hp.model.tokens.vocab_size))
        toks = np.asarray(sb["tokens"].value)[0][..., None].astype(
            np.float32)
        mel = np.asarray(sb["mel"].value)[0].astype(np.float32)
    else:
        toks = rng.randint(0, 200, (batch, tp, 1)).astype(np.float32)
        mel = (rng.randn(batch, tp, 80) * 0.5 - 1.0).astype(np.float32)
    prior = Masked.from_lengths(
        jnp.asarray(np.concatenate([toks, mel], -1)),
        jnp.full((batch,), tp, np.int32))
    key = jax.random.PRNGKey(7)
    kw = dict(temperature=0.85, token_temperature=0.85)

    def sample(kv_dtype, w_int8, hybrid_env, mega_env="0",
               packed_env="0"):
        os.environ["VAE_GSLM_HYBRID_DECODE"] = hybrid_env
        os.environ["VAE_GSLM_MEGA_DECODE"] = mega_env
        os.environ["VAE_GSLM_PACKED_CACHE"] = packed_env
        s = ARTRSampler(build(), kv_dtype=kv_dtype,
                        quantize_weights=w_int8)
        out = s(length, prior, key, **kw)
        return (np.asarray(out["frames"].value),
                np.asarray(out["output"].value))

    # The shipped serving ladder (sampler auto-gating): B<=32 mega
    # kernel (w-int8 + int8 KV), B>=64 lane-packed per-layer int8 KV
    # (PACKED_CACHE auto); hybrid kept as the non-mega stacked rung.
    rungs = [
        ("bf16 (fp cache)", dict(kv_dtype=None, w_int8=False,
                                 hybrid_env="0")),
        ("int8 KV (stacked/XLA)", dict(kv_dtype=jnp.int8, w_int8=False,
                                       hybrid_env="0")),
        ("int8 KV + hybrid Pallas", dict(kv_dtype=jnp.int8,
                                         w_int8=False, hybrid_env="auto")),
        ("w-int8 + int8 KV + hybrid",
         dict(kv_dtype=jnp.int8, w_int8=True, hybrid_env="auto")),
    ]
    if batch > 32:
        # the per-layer path is only reachable above the stacked cap
        rungs.append(
            ("int8 KV packed per-layer (shipped B>=64)",
             dict(kv_dtype=jnp.int8, w_int8=False, hybrid_env="0",
                  packed_env="1")))
    if batch <= 32:
        rungs.append(
            ("w-int8 + int8 KV + mega kernel (shipped B<=32)",
             dict(kv_dtype=jnp.int8, w_int8=True, hybrid_env="0",
                  mega_env="auto")))
    ref_f, ref_m = sample(**rungs[0][1])
    print(f"batch={batch} length={length} (flagship dims, shared key; "
          "deltas vs bf16 rung)")
    print("NOTE: AR sampling is chaotic — one flipped token diverges "
          "the whole remaining trajectory, so `div@` (mean step of "
          "first token difference, of {length}) is the honest "
          "long-horizon metric; tok agree is dominated by "
          "post-divergence noise.")
    hdr = (f"{'rung':<44} {'tok agree':>9} {'div@':>6} "
           f"{'lat RMS':>8} {'mel RMS':>8}")
    print(hdr)
    print(f"{rungs[0][0]:<44} {'1.000':>9} {'-':>6} "
          f"{'0.000':>8} {'0.000':>8}")
    for name, cfg in rungs[1:]:
        f, m = sample(**cfg)
        toks_r = ref_f[:, tp:, 0]
        toks_q = f[:, tp:, 0]
        agree = float((toks_q == toks_r).mean())
        neq = toks_q != toks_r
        first = np.where(neq.any(1), neq.argmax(1), length)
        lat = float(np.sqrt(np.mean((f[..., 1:] - ref_f[..., 1:]) ** 2))
                    / (np.sqrt(np.mean(ref_f[..., 1:] ** 2)) + 1e-9))
        melr = float(np.sqrt(np.mean((m - ref_m) ** 2))
                     / (np.sqrt(np.mean(ref_m ** 2)) + 1e-9))
        print(f"{name:<44} {agree:>9.3f} {first.mean():>6.0f} "
              f"{lat:>8.3f} {melr:>8.3f}")
        # AR divergence is a per-sequence event (one flipped token
        # decorrelates that sequence's whole remaining trajectory), so
        # the mean div@ conflates "every sequence slightly earlier"
        # with "one outlier sequence very early" — print the full
        # distribution so the two cases are distinguishable.
        dist = np.sort(first)
        print(f"{'':<44} div@ per sequence: "
              f"{np.array2string(dist, max_line_width=70)} "
              f"(median {int(np.median(dist))})")


if __name__ == "__main__":
    main()
