import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.nn.attention import SelfAttention, attend, _split_heads
from vae_gslm_tpu.nn.positions import ALiBi
from vae_gslm_tpu.ops.flash_attention import (_attention_reference,
                                              flash_attention)


def test_reference_matches_dense_attend():
    """ops XLA reference == nn.attend with the same masks/bias."""
    rng = np.random.RandomState(0)
    b, h, t, d = 2, 4, 16, 8
    q = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    lengths = jnp.asarray([16, 10])
    alibi = ALiBi(h, 64)
    slopes = alibi.slopes[...]
    got = np.asarray(_attention_reference(q, k, v, lengths, slopes,
                                          causal=True))
    # dense path via nn.attend
    k_pos = jnp.arange(t)
    pad = k_pos[None, :] < lengths[:, None]
    mask = pad[:, None, None, :] & (
        k_pos[None, :] <= jnp.arange(t)[:, None])[None, None]
    bias = alibi(t, t)
    qb = jnp.transpose(q, (0, 2, 1, 3))
    kb = jnp.transpose(k, (0, 2, 1, 3))
    vb = jnp.transpose(v, (0, 2, 1, 3))
    ref, _ = attend(qb, kb, vb, bias, mask)
    ref = np.asarray(jnp.transpose(ref, (0, 2, 1, 3)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_flash_attention_cpu_fallback_and_grads():
    rng = np.random.RandomState(1)
    b, h, t, d = 2, 2, 8, 4
    q = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
    lengths = jnp.asarray([8, 5])
    slopes = -jnp.asarray([0.25, 0.5])

    out = flash_attention(q, k, v, lengths, slopes, True)
    ref = _attention_reference(q, k, v, lengths, slopes, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6)

    def loss(q, k, v):
        return flash_attention(q, k, v, lengths, slopes, True).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        return _attention_reference(q, k, v, lengths, slopes,
                                    True).sum()

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_self_attention_fused_path_matches_dense():
    """The module's fused branch == the dense branch (forced via
    return_attn, which disables fusion)."""
    dim, nheads = 16, 4
    m = SelfAttention(dim, Hparams(nheads=nheads, causal=True),
                      rngs=nnx.Rngs(0))
    rpe = ALiBi(nheads, 64)
    rng = np.random.RandomState(2)
    x = Masked.from_lengths(
        jnp.asarray(rng.randn(2, 12, dim), jnp.float32),
        jnp.asarray([12, 7]))
    fused = m(x, rpe_pair=("ALiBi", rpe))["output"]
    dense = m(x, rpe_pair=("ALiBi", rpe), return_attn=True)["output"]
    np.testing.assert_allclose(np.asarray(fused.value),
                               np.asarray(dense.value), rtol=1e-4,
                               atol=1e-5)


import pytest  # noqa: E402


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas blockwise backward needs a TPU")
def test_blockwise_backward_long_sequence_tpu():
    """T=4096 grads (beyond the full-matrix kernel's 1024 cap) and a
    tq != tk decode-style case match the XLA reference (VERDICT r1
    item 5)."""
    from vae_gslm_tpu.ops.flash_attention import (
        _flash_backward_blockwise)

    rng = np.random.RandomState(2)
    for (b, h, tq, tk) in ((1, 2, 4096, 4096), (1, 2, 96, 256)):
        q = jnp.asarray(rng.randn(b, h, tq, 64), jnp.float32) * 0.2
        k = jnp.asarray(rng.randn(b, h, tk, 64), jnp.float32) * 0.2
        v = jnp.asarray(rng.randn(b, h, tk, 64), jnp.float32) * 0.2
        g = jnp.asarray(rng.randn(b, h, tq, 64), jnp.float32)
        lengths = jnp.asarray([tk - 5])
        slopes = -jnp.asarray([0.25, 0.0625])

        o = _attention_reference(q, k, v, lengths, slopes,
                                 causal=(tq == tk))
        dq, dk, dv = _flash_backward_blockwise(
            q, k, v, g, o, lengths, slopes, causal=(tq == tk))

        def f(q, k, v):
            return (_attention_reference(
                q, k, v, lengths, slopes, causal=(tq == tk)) * g).sum()

        dq_r, dk_r, dv_r = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        for a, r in ((dq, dq_r), (dk, dk_r), (dv, dv_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=5e-3, atol=5e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernels need a TPU")
def test_full_matrix_forward_and_delta_backward_tpu():
    """The full-matrix fwd kernel (grid (B, H)) and the FA2-style
    delta-precompute bwd match the XLA reference at training shapes,
    including variable lengths."""
    rng = np.random.RandomState(0)
    b, h, t, d = 4, 8, 641, 64
    q = jnp.asarray(rng.randn(b, h, t, d) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(b, h, t, d) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(b, h, t, d) * 0.3, jnp.float32)
    lengths = jnp.asarray([t, t // 2, 300, t], jnp.int32)
    slopes = jnp.asarray(-(2.0 ** -np.arange(1, h + 1)), jnp.float32)
    valid = (np.arange(t)[None, :]
             < np.asarray(lengths)[:, None])[:, None, :, None]

    out = flash_attention(q, k, v, lengths, slopes, True)
    ref = _attention_reference(q, k, v, lengths, slopes, True)
    err = (np.abs(np.asarray(out) - np.asarray(ref)) * valid).max()
    assert err < 5e-4, err

    def loss(fn):
        def f(q, k, v):
            o = fn(q, k, v, lengths, slopes, True)
            return (o * valid).sum()
        return f

    g = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(_attention_reference), argnums=(0, 1, 2))(
        q, k, v)
    for name, a, r in zip("dq dk dv".split(), g, gr):
        scale = max(1.0, float(np.abs(np.asarray(r)).max()))
        e = np.abs(np.asarray(a) - np.asarray(r)).max()
        assert e < 2e-2 * scale, (name, e)



def test_flash_attention_packed_matches_bhtd():
    """flash_attention_packed consumes the raw (B, T, H*D) projection
    layout; output and grads must match the BHTD call.  On CPU this
    exercises the wrapper's relayout fallback; TPU kernel parity lives
    in test_packed_kernel_tpu."""
    from vae_gslm_tpu.ops.flash_attention import flash_attention_packed

    rng = np.random.RandomState(3)
    b, h, t, d = 2, 2, 8, 4
    q = jnp.asarray(rng.randn(b, t, h * d), jnp.float32)
    k = jnp.asarray(rng.randn(b, t, h * d), jnp.float32)
    v = jnp.asarray(rng.randn(b, t, h * d), jnp.float32)
    lengths = jnp.asarray([8, 5])
    slopes = -jnp.asarray([0.25, 0.5])

    def bhtd(x):
        return jnp.transpose(x.reshape(b, t, h, d), (0, 2, 1, 3))

    def packed(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, h * d)

    out = flash_attention_packed(q, k, v, lengths, slopes, True, h)
    ref = packed(flash_attention(bhtd(q), bhtd(k), bhtd(v), lengths,
                                 slopes, True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6)

    def loss_packed(q, k, v):
        o = flash_attention_packed(q, k, v, lengths, slopes, True, h)
        return (o.astype(jnp.float32) ** 2).sum()

    def loss_bhtd(q, k, v):
        o = flash_attention(bhtd(q), bhtd(k), bhtd(v), lengths,
                            slopes, True)
        return (o.astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_bhtd, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas kernels need a TPU")
def test_packed_kernel_tpu():
    """The packed (B, T, H*D) kernels must actually LOWER on the chip
    (no silent XLA fallback) and match the BHTD kernels at training
    shapes with variable lengths, fwd + grads."""
    from vae_gslm_tpu.ops import flash_attention as fa

    rng = np.random.RandomState(0)
    b, h, t, d = 4, 8, 641, 64
    q = jnp.asarray(rng.randn(b, t, h * d) * 0.3, jnp.float32)
    k = jnp.asarray(rng.randn(b, t, h * d) * 0.3, jnp.float32)
    v = jnp.asarray(rng.randn(b, t, h * d) * 0.3, jnp.float32)
    lengths = jnp.asarray([t, t // 2, 300, t], jnp.int32)
    slopes = jnp.asarray(-(2.0 ** -np.arange(1, h + 1)), jnp.float32)

    # the kernel itself must lower — bypass the fallback wrapper
    out_k, lse = fa._flash_forward_full_packed(
        q, k, v, lengths, slopes, True, h, with_stats=True)
    assert lse.shape[2] == t

    def bhtd(x):
        return jnp.transpose(x.reshape(b, t, h, d), (0, 2, 1, 3))

    def packed(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, h * d)

    valid = (np.arange(t)[None, :]
             < np.asarray(lengths)[:, None])[:, :, None]
    ref = packed(flash_attention(bhtd(q), bhtd(k), bhtd(v), lengths,
                                 slopes, True))
    err = (np.abs(np.asarray(out_k) - np.asarray(ref)) * valid).max()
    assert err < 5e-4, err

    # grads through the packed custom_vjp (exercises the packed bwd
    # kernel — eligible shapes, so no fallback)
    def loss(fn):
        def f(q, k, v):
            o = fn(q, k, v)
            return ((o * valid).astype(jnp.float32) ** 2).sum()
        return f

    g = jax.grad(loss(lambda q, k, v: fa.flash_attention_packed(
        q, k, v, lengths, slopes, True, h)), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(lambda q, k, v: packed(flash_attention(
        bhtd(q), bhtd(k), bhtd(v), lengths, slopes, True))),
        argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("dq dk dv".split(), g, gr):
        a, b_ = np.asarray(a), np.asarray(b_)
        rel = np.abs(a - b_).max() / (np.abs(b_).max() + 1e-9)
        assert rel < 3e-2, (name, rel)
