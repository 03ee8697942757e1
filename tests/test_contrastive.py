"""InfoNCE / CPC contrastive losses (`nn/contrastive.py`,
reference `training_lib/losses.py:76-215`) — static-shape masking
semantics: invalid frames excluded, positives on the diagonal."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.nn.contrastive import CPC, InfoNCE


def _masked(b=2, t=6, c=4, lengths=(6, 4), seed=0):
    rng = np.random.RandomState(seed)
    return Masked.from_lengths(
        jnp.asarray(rng.randn(b, t, c), jnp.float32),
        jnp.asarray(lengths))


def test_infonce_identical_pairs_beat_shuffled():
    hp = Hparams(dim=8, num_negatives=None)
    m = InfoNCE(hp, dim1=4, dim2=4, rngs=nnx.Rngs(0))
    q = _masked(seed=1)
    key = jax.random.PRNGKey(0)
    # Aligned q==p should score a lower loss than misaligned pairs.
    aligned = float(m(q, q, key))
    rolled = Masked(jnp.roll(q.value, 1, axis=1), q.lengths, 1)
    misaligned = float(m(q, rolled, key))
    assert np.isfinite(aligned) and np.isfinite(misaligned)
    assert aligned < misaligned


def test_infonce_padding_is_excluded():
    hp = Hparams(dim=8, num_negatives=None)
    m = InfoNCE(hp, dim1=4, dim2=4, rngs=nnx.Rngs(0))
    key = jax.random.PRNGKey(0)
    q = _masked(lengths=(6, 4), seed=2)
    # Changing padded content must not change the loss.
    v2 = q.value.at[1, 4:].set(99.0)
    a = float(m(q, q, key))
    b = float(m(Masked(v2, q.lengths, 1), Masked(v2, q.lengths, 1),
                key))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_infonce_negative_subsampling_static_shape():
    hp = Hparams(dim=8, num_negatives=6)
    m = InfoNCE(hp, dim1=4, dim2=4, rngs=nnx.Rngs(0))
    q = _masked(b=2, t=8, lengths=(8, 8), seed=3)
    out = jax.jit(lambda q, k: m(q, q, k))(q, jax.random.PRNGKey(1))
    assert np.isfinite(float(out))


def test_cpc_runs_and_prefers_alignment():
    hp = Hparams(dim=8, num_negatives=4, num_predictors=2)
    m = CPC(hp, dim1=4, dim2=4, rngs=nnx.Rngs(0))
    q = _masked(seed=4)
    key = jax.random.PRNGKey(0)
    loss = float(m(q, q, key))
    assert np.isfinite(loss)
    # jit-compatible (static shapes end-to-end)
    jloss = float(jax.jit(lambda a, b, k: m(a, b, k))(q, q, key))
    np.testing.assert_allclose(jloss, loss, rtol=1e-5)
