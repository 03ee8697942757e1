"""Contrastive losses: InfoNCE and CPC.

Parity target: ``/root/reference/training_lib/losses.py:76-215``.
The reference gathers only valid frames with boolean masking (dynamic
shapes); the TPU version keeps static shapes and masks invalid frames
out of the softmax instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.masked import Masked
from ..hparams.hp import Hparams
from .linear import Dense

Array = jax.Array
NEG_INF = -1e30


class InfoNCE(nnx.Module):
    """Frame-level InfoNCE over (possibly subsampled) valid frames
    (``losses.py:76-142``)."""

    def __init__(self, hp: Hparams, dim1: int, dim2: int,
                 *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("dim", "num_negatives")
        self.max_neg = hp.num_negatives
        self.middle_dim = hp.dim
        self.linear1 = Dense(dim1, hp.dim, rngs=rngs)
        self.linear2 = Dense(dim2, hp.dim, rngs=rngs)
        self.hp = hp

    def __call__(self, q: Masked, p: Masked, key: Array) -> Array:
        mask = q.mask().reshape(-1)                     # (BT,)
        b, t, _ = q.value.shape
        qv = q.value.reshape(b * t, -1)
        pv = p.value.reshape(b * t, -1)
        if self.max_neg is not None and self.max_neg < b * t:
            # Static-size random subset, biased to valid frames.
            r = jax.random.uniform(key, (b * t,))
            r = jnp.where(mask, r, 2.0)
            idx = jnp.argsort(r)[: self.max_neg]
            qv, pv = qv[idx], pv[idx]
            mask = mask[idx]
        logits = (self.linear1(qv) @ self.linear2(pv).T
                  ).astype(jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(self.middle_dim))
        # Invalid rows/cols excluded from the softmax.
        logits = jnp.where(mask[None, :], logits, NEG_INF)
        n = logits.shape[0]
        labels = jnp.arange(n)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return jnp.where(mask, nll, 0.0).sum()


class CPC(nnx.Module):
    """Multi-step predictive contrastive loss (``losses.py:145-215``)."""

    def __init__(self, hp: Hparams, dim1: int, dim2: int,
                 *, rngs: nnx.Rngs):
        hp.check_arg_in_hparams("num_predictors", "num_negatives", "dim")
        self.max_neg = hp.num_negatives
        self.num_predictors = hp.num_predictors
        self.middle_dim = hp.dim
        self.predictors = nnx.List([Dense(dim1, hp.dim, rngs=rngs)
                                    for _ in range(hp.num_predictors)])
        self.linearp = nnx.List([Dense(dim2, hp.dim, rngs=rngs)
                                 for _ in range(hp.num_predictors)])

    def __call__(self, q: Masked, p: Masked, key: Array) -> Array:
        losses = 0.0
        for k in range(self.num_predictors):
            if k == 0:
                qk, pk = q, p
            else:
                qk, pk = q.pop(k), p.pop_left(k)
            mask = qk.mask().reshape(-1)
            b, t, _ = qk.value.shape
            qv = self.predictors[k](qk.value.reshape(b * t, -1))
            pv = self.linearp[k](pk.value.reshape(b * t, -1))
            kk = jax.random.fold_in(key, k)
            neg_idx = jax.random.randint(kk, (b * t, self.max_neg), 0,
                                         b * t)
            neg = pv[neg_idx]                             # (BT, M, C)
            cand = jnp.concatenate([pv[:, None], neg], axis=1)
            logits = jnp.einsum("nc,nmc->nm", qv, cand).astype(
                jnp.float32)
            logits = logits / jnp.sqrt(jnp.float32(self.middle_dim))
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -logp[:, 0]
            losses = losses + jnp.where(mask, nll, 0.0).sum()
        return losses
