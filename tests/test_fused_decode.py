"""Hybrid cold/tail decode-attention kernel (ops/fused_decode.py):
interpret-mode validation against a plain-JAX replication of its exact
quantized math, across flushed/pos combinations covering empty cold,
partial tail, and boundary positions.  (The end-to-end path is covered
by the sampler A/B test in tests/test_lvtr_step_parity.py.)"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_gslm_tpu.ops.fused_decode import (BLK, TAIL,
                                           fused_decode_attention,
                                           fused_decode_attention_reference)

L, B, H, D, TC = 3, 8, 4, 64, 512


def _setup(seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, D), jnp.float32)
    nb = TC // BLK
    kc = jnp.asarray(rng.randint(-127, 128, (L, nb, B, H, D, BLK)),
                     jnp.int8)
    vc = jnp.asarray(rng.randint(-127, 128, (L, nb, B, H, D, BLK)),
                     jnp.int8)
    kcs = jnp.asarray(rng.rand(L, nb, B, H, BLK) * 0.02, jnp.float32)
    vcs = jnp.asarray(rng.rand(L, nb, B, H, BLK) * 0.02, jnp.float32)
    kt = jnp.asarray(rng.randint(-127, 128, (L, B, H, TAIL, D)),
                     jnp.int8)
    vt = jnp.asarray(rng.randint(-127, 128, (L, B, H, TAIL, D)),
                     jnp.int8)
    kts = jnp.asarray(rng.rand(L, B, H, TAIL) * 0.02, jnp.float32)
    vts = jnp.asarray(rng.rand(L, B, H, TAIL) * 0.02, jnp.float32)
    slopes = -jnp.asarray([0.25, 0.0625, 0.015625, 0.00390625],
                          jnp.float32)
    kn = jnp.asarray(rng.randn(B, H, D), jnp.float32) * 0.1
    vn = jnp.asarray(rng.randn(B, H, D), jnp.float32) * 0.1
    return (q, kc, vc, kcs, vcs, kt, vt, kts, vts, slopes, kn, vn)


@pytest.mark.parametrize("flushed,pos", [
    (0, 0),            # first step: nothing but the current token
    (0, 5),            # tail only
    (256, 300),        # one cold block + partial tail
    (512, 513),        # two cold blocks, nearly-empty tail
    (512, 512 + TAIL - 1),   # full tail (flush due next step)
])
def test_kernel_matches_reference(flushed, pos):
    (q, kc, vc, kcs, vcs, kt, vt, kts, vts, slopes,
     kn, vn) = _setup()
    li = jnp.asarray(pos % L)
    out_k = fused_decode_attention(q, kc, vc, kcs, vcs, kt, vt, kts,
                                   vts, jnp.asarray(pos), li, slopes,
                                   kn, vn, flushed, interpret=True)
    out_r = fused_decode_attention_reference(
        q, kc, vc, kcs, vcs, kt, vt, kts, vts, jnp.asarray(pos), li,
        slopes, kn, vn, flushed)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=1e-5, atol=1e-6)


def test_reference_against_exact_softmax():
    """The quantized reference itself stays within int8 error of an
    exact fp32 attention over the dequantized cache."""
    (q, kc, vc, kcs, vcs, kt, vt, kts, vts, slopes,
     kn, vn) = _setup(1)
    flushed, pos, li = 256, 300, jnp.asarray(1)
    got = np.asarray(fused_decode_attention_reference(
        q, kc, vc, kcs, vcs, kt, vt, kts, vts, jnp.asarray(pos), li,
        slopes, kn, vn, flushed))

    # exact fp32: dequantize, unblock, concat cold+tail+self, softmax
    def unblock(x):
        x = np.transpose(np.asarray(x, np.float32), (1, 2, 0, 4, 3))
        return x.reshape(B, H, -1, D)[:, :, :flushed]

    def unblock_s(x):
        x = np.transpose(np.asarray(x), (1, 2, 0, 3))
        return x.reshape(B, H, -1)[..., :flushed]

    k_cold = unblock(kc[1]) * unblock_s(kcs[1])[..., None]
    v_cold = unblock(vc[1]) * unblock_s(vcs[1])[..., None]
    k_tail = (np.asarray(kt[1], np.float32)
              * np.asarray(kts[1])[..., None])
    v_tail = (np.asarray(vt[1], np.float32)
              * np.asarray(vts[1])[..., None])
    ks = np.concatenate([k_cold, k_tail,
                         np.asarray(kn, np.float32)[:, :, None]], 2)
    vs = np.concatenate([v_cold, v_tail,
                         np.asarray(vn, np.float32)[:, :, None]], 2)
    t_idx = np.concatenate([np.arange(flushed),
                            flushed + np.arange(TAIL), [pos]])
    logits = np.einsum("bhd,bhtd->bht", np.asarray(q), ks) / 8.0
    logits += (np.asarray(slopes)[None, :, None]
               * np.abs(t_idx - pos)[None, None])
    logits[..., :-1][..., t_idx[:-1] >= pos] = -1e30
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    exact = np.einsum("bht,bhtd->bhd", w, vs)
    rel = np.abs(got - exact).max() / (np.abs(exact).max() + 1e-9)
    # synthetic worst case (uniform-random int8 rows): pure
    # quantization noise; real activations sit well below this
    assert rel < 5e-2, rel
