"""Capture a device trace of the flagship training microbatch.

Runs the same fwd+bwd microbatch as tools/bench_training.py under
``jax.profiler.trace`` and writes the xplane protobuf to
``--logdir`` (default /tmp/train_trace) for offline analysis with
tools/xplane_top.py.  The point: attribute the measured 73.5
ms/microbatch (PERFORMANCE.md round-3 training table) to ops so the
151->135 ms/step attack targets the real costs.

Usage: python tools/profile_train.py [logdir]
"""
from __future__ import annotations

import os
import sys


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace"
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

    r = micro(params, rest, x, utt, key)   # compile + warm
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    with jax.profiler.trace(logdir):
        for _ in range(3):
            r = micro(params, rest, x, utt, key)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
    print(f"trace written to {logdir}")


if __name__ == "__main__":
    main()
