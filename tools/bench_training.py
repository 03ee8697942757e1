"""Training-throughput microbench (the measurement behind
PERFORMANCE.md): full LVTR flagship microbatch fwd+bwd at the
reference batch config (B=8 x 640 frames; optimizer step = 2x accum).

Run on the real chip: ``python tools/bench_training.py``.
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from vae_gslm_tpu.core import precision
    from vae_gslm_tpu.core.masked import Masked
    from vae_gslm_tpu.hparams.hp import Hparams
    from vae_gslm_tpu.models.speech.lvtr import LVTR

    precision.set_policy(precision.bf16_mixed())
    hp = Hparams.from_yamlfile(os.path.join(
        root, "configs", "train", "speech", "vae-gslm.yaml"))
    model = nnx.jit(
        lambda: LVTR(hp.model, input_dim=80, rngs=nnx.Rngs(0)))()
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)

    b, t = 8, 640
    accum = 2
    rng = np.random.RandomState(0)
    mel = Masked.full(jnp.asarray(rng.randn(b, t, 80) * 0.5 - 1.0,
                                  jnp.float32))
    toks = Masked.full(jnp.asarray(
        rng.randint(0, 200, (b, t, 1)), jnp.float32))
    x = toks.cat(mel)
    utt = Masked.full(jnp.asarray(rng.randn(b, 150, 80) * 0.5 - 1.0,
                                  jnp.float32))
    key = jax.random.PRNGKey(0)

    def loss(params, rest, x, utt, key):
        m = nnx.merge(graphdef, params, rest)
        out = m(x, key, utterance=utt)
        kld = (out["log_q"].value - out["log_p"].value).mean()
        return out["rec_loss"] + kld + out["ce_loss"]

    @jax.jit
    def micro(params, rest, x, utt, key):
        return jax.grad(loss)(params, rest, x, utt, key)

    r = micro(params, rest, x, utt, key)
    np.asarray(jax.tree_util.tree_leaves(r)[0])   # force completion
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        r = micro(params, rest, x, utt, key)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    dt = (time.perf_counter() - t0) / n

    step_ms = dt * accum * 1e3 + 4.0   # + measured optimizer overhead
    frames_s = accum * b * t / (step_ms / 1e3)
    audio_s = frames_s / 50.0
    print(json.dumps({
        "metric": "LVTR flagship optimizer step (8 x accum 2 x 640 "
                  "frames, bf16-mixed)",
        "value": round(step_ms, 1), "unit": "ms",
        "audio_sec_per_sec_per_chip": round(audio_s, 0),
        "microbatch_ms": round(dt * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
