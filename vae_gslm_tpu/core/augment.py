"""Feature-space utilities: MFCC, deltas, SpecAugment.

Parity target: ``/root/reference/utils/helpers.py:187-228``
(``compute_mfcc`` with optional CMVN and delta features, ``specaug``
feature/time dropout).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .masked import Masked

Array = jax.Array


def dct_matrix(n_mels: int, n_mfcc: int, norm: str = "ortho"
               ) -> np.ndarray:
    """DCT-II basis (n_mels, n_mfcc), torchaudio ``create_dct``
    convention."""
    n = np.arange(n_mels)[:, None]
    k = np.arange(n_mfcc)[None, :]
    dct = np.cos(np.pi / n_mels * (n + 0.5) * k)
    if norm == "ortho":
        dct[:, 0] *= 1.0 / np.sqrt(2)
        dct *= np.sqrt(2.0 / n_mels)
    else:
        dct *= 2.0
    return dct.astype(np.float32)


def compute_deltas(x: Array, win_length: int = 5) -> Array:
    """Regression deltas over time, torchaudio semantics.

    x: (B, T, C); replicate-padded window regression.
    """
    n = (win_length - 1) // 2
    denom = n * (n + 1) * (2 * n + 1) / 3
    xp = jnp.concatenate(
        [jnp.repeat(x[:, :1], n, axis=1), x,
         jnp.repeat(x[:, -1:], n, axis=1)], axis=1)
    out = jnp.zeros_like(x)
    for i in range(-n, n + 1):
        out = out + i * xp[:, i + n: i + n + x.shape[1]]
    return out / denom


def compute_mfcc(mel: Masked, dct: Array, delta: bool = False,
                 cmvn: bool = False) -> Masked:
    """log-mel → MFCC (+CMVN, +Δ/ΔΔ)."""
    mfcc = jnp.matmul(mel.value, dct,
                      preferred_element_type=jnp.float32)
    if cmvn:
        mean = mfcc.sum(1) / mel.lengths[:, None]
        mean = mean[:, None]
        var = jnp.square(mfcc - mean).sum(1) / mel.lengths[:, None]
        var = var[:, None]
        mfcc = (mfcc - mean) / jnp.sqrt(var + 1e-6)
    if delta:
        d1 = compute_deltas(mfcc)
        d2 = compute_deltas(d1)
        mfcc = jnp.concatenate([mfcc, d1, d2], axis=-1)
    return Masked(mfcc, mel.lengths, 1).apply_mask()


def specaug(x: Masked, key: Array, feat_drop_rate: float,
            time_drop_rate: float) -> Masked:
    """Random per-(b, t) feature/time dropout
    (``helpers.py:211-228``)."""
    k1, k2 = jax.random.split(key)
    b, t, c = x.value.shape
    mask = jnp.ones((b, t, c), bool)
    if feat_drop_rate > 0.0:
        feat_drop = jax.random.uniform(k1, (b, t)) < feat_drop_rate
        mask = mask & ~feat_drop[:, :, None]
        time_drop = jax.random.uniform(k2, (b, t)) < time_drop_rate
        mask = mask & ~time_drop[:, :, None]
    value = jnp.where(mask, x.value, 0.0)
    return Masked(value, x.lengths, 1)
