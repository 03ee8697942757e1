"""Single-call trunk-step mega-kernel (ops/mega_step.py): interpret-
mode validation against (a) a plain-JAX replication of its exact math
and (b) the production stacked-decode path at quantization tolerance."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.nn.transformer import TransformerLayerStack
from vae_gslm_tpu.ops.mega_step import (BLK, TAIL, fused_trunk_step,
                                        fused_trunk_step_reference)

D, H, L = 256, 4, 2


def _stack():
    hp = Hparams.from_yaml(f"""
num_layers: {L}
bias: false
rpe: {{identifier: ALiBi, maxpos: 1024}}
layer:
    ffd_size: {4 * D}
    dim: {D}
    norm: {{identifier: RMSNorm, eps: 1.0e-6}}
    activation: {{identifier: GELU}}
    self_attn: {{nheads: {H}, causal: true}}
""")
    m = TransformerLayerStack(hp, rngs=nnx.Rngs(0))
    m.quantize_weights_int8()
    return m


def _caches(b, tc, seed=1):
    rng = np.random.RandomState(seed)
    dh = D // H
    kc = jnp.asarray(rng.randint(-127, 128, (L, H, b, dh, tc)),
                     jnp.int8)
    vc = jnp.asarray(rng.randint(-127, 128, (L, H, b, dh, tc)),
                     jnp.int8)
    kcs = jnp.asarray(rng.rand(L, H, b, tc) * 0.02, jnp.float32)
    vcs = jnp.asarray(rng.rand(L, H, b, tc) * 0.02, jnp.float32)
    kt = jnp.asarray(rng.randint(-127, 128, (L, H, b, TAIL, dh)),
                     jnp.int8)
    vt = jnp.asarray(rng.randint(-127, 128, (L, H, b, TAIL, dh)),
                     jnp.int8)
    kts = jnp.asarray(rng.rand(L, H, b, TAIL) * 0.02, jnp.float32)
    vts = jnp.asarray(rng.rand(L, H, b, TAIL) * 0.02, jnp.float32)
    return kc, vc, kcs, vcs, kt, vt, kts, vts


@pytest.mark.parametrize("flushed,pos", [(0, 0), (0, 40),
                                         (256, 300), (512, 600)])
def test_mega_kernel_matches_reference(flushed, pos):
    m = _stack()
    weights = m.build_mega_decode()
    assert weights is not None
    b = 8
    caches = _caches(b, 512)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, D) * 0.3, jnp.float32)
    slopes = m.rpe.slopes[...]
    args = (x, weights) + caches + (jnp.asarray(pos), slopes)
    outs_k = fused_trunk_step(*args, flushed=flushed, interpret=True)
    outs_r = fused_trunk_step_reference(*args, flushed=flushed)
    names = ("x", "k_new", "v_new", "kn_scale", "vn_scale")
    for name, a, bb in zip(names, outs_k, outs_r):
        a, bb = np.asarray(a), np.asarray(bb)
        if a.dtype == np.int8:
            # quantized rows: identical up to round-at-.5 jitter
            assert (np.abs(a.astype(np.int32)
                           - bb.astype(np.int32)) <= 1).mean() > 0.999
        else:
            np.testing.assert_allclose(a, bb, rtol=2e-3, atol=2e-4,
                                       err_msg=name)


def test_build_mega_decode_requires_int8():
    hp = Hparams.from_yaml(f"""
num_layers: 1
bias: false
rpe: {{identifier: ALiBi, maxpos: 64}}
layer:
    ffd_size: {4 * D}
    dim: {D}
    norm: {{identifier: RMSNorm, eps: 1.0e-6}}
    activation: {{identifier: GELU}}
    self_attn: {{nheads: {H}, causal: true}}
""")
    m = TransformerLayerStack(hp, rngs=nnx.Rngs(0))
    assert m.build_mega_decode() is None   # not quantized
    m.quantize_weights_int8()
    assert m.build_mega_decode() is not None
