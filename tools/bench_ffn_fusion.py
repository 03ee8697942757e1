"""In-model A/B of the FFN fusion shape (chip): does materializing the
(B, T, ffd) activation before linear2 beat letting XLA fuse it into the
GEMM?

Round-4 trace finding (tools/profile_train.py + xplane_top.py): the
linear2 forward fusion at flagship dims runs 528 us vs the
FLOPs-identical linear1 fusion's 247 us; its fused input chain
(packed-relu unpack over the 42 MB intermediate) is re-executed per
output N-tile by the conv emitter, burning ~8 VPU passes.  The knob
under test is ``nn/transformer._FFN_MATERIALIZE`` — a trace-time
global flipped between two jit traces in ONE process, so both variants
are timed interleaved and the axon-tunnel drift cancels.

Run: python tools/bench_ffn_fusion.py
"""
from __future__ import annotations

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
    from vae_gslm_tpu.nn import transformer as tr

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

    def make(flag):
        # jit caches on function identity; the global is read at trace
        # time (first call), so each wrapper must trace under its flag.
        @jax.jit
        def micro(params, rest, x, utt, key):
            return jax.grad(loss)(params, rest, x, utt, key)

        prev = tr._FFN_MATERIALIZE
        tr._FFN_MATERIALIZE = flag
        try:
            r = micro(params, rest, x, utt, key)   # trace + compile
            np.asarray(jax.tree_util.tree_leaves(r)[0])
        finally:
            tr._FFN_MATERIALIZE = prev
        return micro

    fns = {"fused (today)": make(False), "materialized": make(True)}
    ts = {k: [] for k in fns}
    for rep in range(10):
        for k, f in fns.items():
            t0 = time.perf_counter()
            r = f(params, rest, x, utt, key)
            np.asarray(jax.tree_util.tree_leaves(r)[0])
            ts[k].append(time.perf_counter() - t0)
    for k, v in ts.items():
        v = sorted(v)
        print(f"{k:16s}: min {min(v)*1e3:6.1f} ms  "
              f"med {v[len(v)//2]*1e3:6.1f} ms  (incl ~28 ms sync)")


if __name__ == "__main__":
    main()
