import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.models.speech.soundstream import SoundStream
from vae_gslm_tpu.nn.linear import GumbelSoftMaxParameterize
from vae_gslm_tpu.nn.vq import (SimpleBestRQ, SimpleVectorQuantizer,
                                nearest_centroid)


def masked(b=2, t=6, c=4, lengths=(6, 4), seed=0):
    rng = np.random.RandomState(seed)
    return Masked.from_lengths(
        jnp.asarray(rng.randn(b, t, c), jnp.float32),
        jnp.asarray(lengths))


def test_simple_vq_quantizes_to_codebook():
    m = SimpleVectorQuantizer(4, 8, codebook_loss_weight=1.0,
                              commit_loss_weight=0.25, rngs=nnx.Rngs(0))
    x = masked()
    out = m(x)
    q = np.asarray(out.quantized.value)
    cb = np.asarray(m.codebooks[...])
    ind = np.asarray(out.indices.value)
    mask = np.asarray(x.mask())
    # quantized values are exactly codebook rows at valid positions
    np.testing.assert_allclose(q[mask], cb[ind[mask]], atol=1e-6)
    assert np.isfinite(float(out.loss))
    # straight-through: gradient flows to the input
    g = jax.grad(lambda v: m(Masked(v, x.lengths, 1)).quantized.value
                 .sum())(x.value)
    assert np.abs(np.asarray(g)).sum() > 0


def test_vq_indices_are_nearest():
    m = SimpleVectorQuantizer(4, 8, 1.0, 0.25, rngs=nnx.Rngs(0))
    x = masked(seed=3)
    out = m(x)
    ind = np.asarray(out.indices.value)
    cb = np.asarray(m.codebooks[...])
    xv = np.asarray(x.value)
    d = ((xv[..., None, :] - cb[None, None]) ** 2).sum(-1)
    np.testing.assert_array_equal(ind[np.asarray(x.mask())],
                                  d.argmin(-1)[np.asarray(x.mask())])


def test_best_rq_deterministic_tokens():
    m = SimpleBestRQ(4, 16, rngs=nnx.Rngs(0))
    x = masked(seed=1)
    a = np.asarray(m(x).value)
    b = np.asarray(m(x).value)
    np.testing.assert_array_equal(a, b)
    assert a.max() < 16 and a.min() >= 0


def test_nearest_centroid_matmul_form():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(5, 3), jnp.float32)
    c = jnp.asarray(rng.randn(7, 3), jnp.float32)
    got = np.asarray(nearest_centroid(x, c))
    ref = ((np.asarray(x)[:, None] - np.asarray(c)[None]) ** 2
           ).sum(-1).argmin(-1)
    np.testing.assert_array_equal(got, ref)


def test_gumbel_softmax_straight_through():
    m = GumbelSoftMaxParameterize(6, 8, 4, rngs=nnx.Rngs(0))
    x = masked(c=6)
    out = m(x, jax.random.PRNGKey(0))
    assert out["output"].value.shape == (2, 6, 4)
    probs = np.asarray(out["gumbel_prob"].value)
    valid = np.asarray(x.mask())
    np.testing.assert_allclose(probs[valid].sum(-1), 1.0, rtol=1e-5)
    assert np.all(np.asarray(out["logits"].value)[~valid] == -1000.0)


def test_soundstream_forward():
    hp = Hparams.from_yaml("""
encoder:
    num_layers: 1
    resample_rates: [1]
    resample_ksize: [1]
    init_channel: 8
    out_channels: [8]
    hidden_channels: [16]
    layer:
        kernel_size: 3
        norm: {identifier: InstanceNorm, eps: 1.0e-6}
        activation: {identifier: ReLU}
decoder:
    num_layers: 1
    resample_rates: [1]
    resample_ksize: [1]
    init_channel: 8
    out_channels: [8]
    hidden_channels: [16]
    layer:
        kernel_size: 3
        norm: {identifier: InstanceNorm, eps: 1.0e-6}
        activation: {identifier: ReLU}
quantizer:
    identifier: SimpleVectorQuantizer
    dim: 8
    codebook_size: 16
""")
    m = SoundStream(hp, input_dim=10, rngs=nnx.Rngs(0))
    x = masked(c=10)
    out = m(x)
    assert out["reconstruction"].value.shape == (2, 6, 10)
    assert np.isfinite(float(out["aux_loss"]))
