import jax
import jax.numpy as jnp
import numpy as np
import torch

from vae_gslm_tpu.core.augment import (compute_deltas, compute_mfcc,
                                       dct_matrix, specaug)
from vae_gslm_tpu.core.masked import Masked


def test_dct_matches_torchaudio_convention():
    # torchaudio create_dct(n_mfcc, n_mels, norm='ortho') returns
    # (n_mels, n_mfcc); verify orthonormality and first column.
    d = dct_matrix(20, 8)
    assert d.shape == (20, 8)
    np.testing.assert_allclose(d[:, 0], np.full(20, np.sqrt(1 / 20)),
                               rtol=1e-5)
    np.testing.assert_allclose(d.T @ d, np.eye(8), atol=1e-5)


def test_compute_deltas_matches_torchaudio_formula():
    x = np.random.RandomState(0).randn(2, 10, 3).astype(np.float32)
    got = np.asarray(compute_deltas(jnp.asarray(x)))
    # torchaudio compute_deltas on (B, C, T) with win_length=5
    xt = torch.tensor(x).transpose(1, 2)
    n = 2
    denom = n * (n + 1) * (2 * n + 1) / 3
    padded = torch.nn.functional.pad(xt, (n, n), mode="replicate")
    kernel = torch.arange(-n, n + 1, dtype=torch.float32)
    ref = torch.zeros_like(xt)
    for i in range(-n, n + 1):
        ref += i * padded[..., i + n: i + n + xt.shape[-1]]
    ref = (ref / denom).transpose(1, 2).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_compute_mfcc_shapes_and_cmvn():
    rng = np.random.RandomState(1)
    mel = Masked.from_lengths(
        jnp.asarray(rng.randn(2, 12, 20), jnp.float32),
        jnp.asarray([12, 8]))
    d = jnp.asarray(dct_matrix(20, 8))
    out = compute_mfcc(mel, d, delta=True, cmvn=True)
    assert out.value.shape == (2, 12, 24)
    assert np.all(np.asarray(out.value)[1, 8:] == 0)


def test_specaug_masks_and_preserves():
    rng = np.random.RandomState(2)
    x = Masked.from_lengths(
        jnp.asarray(rng.randn(2, 20, 6) + 5.0, jnp.float32),
        jnp.asarray([20, 15]))
    out = specaug(x, jax.random.PRNGKey(0), feat_drop_rate=0.5,
                  time_drop_rate=0.3)
    v = np.asarray(out.value)
    assert (v == 0).any()          # something dropped
    assert (v != 0).any()          # not everything
    # zero rates => identity
    out0 = specaug(x, jax.random.PRNGKey(0), 0.0, 0.0)
    np.testing.assert_array_equal(np.asarray(out0.value),
                                  np.asarray(x.value))
