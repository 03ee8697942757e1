"""Masked sequence losses.

Mirrors the semantics of the reference's
``/root/reference/training_lib/losses.py:9-73`` exactly (channel-mean →
time-sum → optional time/batch reductions), expressed as pure JAX
functions so they fuse into the jitted train step.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .masked import Masked

Array = jax.Array


def masked_loss(
    x: Masked,
    y: Masked,
    fn: Callable[[Array, Array], Array],
    time_reduction: bool = False,
    batch_reduction: bool = False,
    batch_weight: Optional[Array] = None,
) -> Array:
    """Per-example loss: ``fn(x, y).mean(channels).sum(time)``.

    Reductions follow ``training_lib/losses.py:9-27``:
      - time & batch: ``sum / total_valid_length``
      - time only:    ``(per_example / length).mean()``
      - batch only:   ``per_example.mean()``
      - neither:      ``per_example.sum()``
    """
    a = x.flatten().apply_mask().value
    b = y.flatten().apply_mask().value
    out = fn(a, b).mean(-1).sum(-1)  # (B,)
    if batch_weight is not None:
        out = out * batch_weight
    lengths = x.lengths
    if time_reduction and batch_reduction:
        return out.sum() / lengths.sum()
    if time_reduction:
        return (out / lengths).mean()
    if batch_reduction:
        return out.mean()
    return out.sum()


def _l1(a: Array, b: Array) -> Array:
    return jnp.abs(a - b)


def _l2(a: Array, b: Array) -> Array:
    return jnp.square(a - b)


def masked_l1_loss(x: Masked, y: Masked, **kw) -> Array:
    return masked_loss(x, y, _l1, **kw)


def masked_l2_loss(x: Masked, y: Masked, **kw) -> Array:
    return masked_loss(x, y, _l2, **kw)


def masked_ce_loss(logits: Masked, labels: Masked,
                   reduction: str = "sum") -> Array:
    """Masked token cross-entropy (sum over valid positions).

    Reference: ``training_lib/losses.py:34-41`` (ignore_index=-100 on
    padded labels == mask-out here).
    """
    logp = jax.nn.log_softmax(logits.value.astype(jnp.float32), axis=-1)
    lab = labels.value.astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, lab[..., None], axis=-1)[..., 0]
    mask = labels.mask()
    nll = jnp.where(mask, nll, 0.0)
    if reduction == "sum":
        return nll.sum()
    if reduction == "mean":
        return nll.sum() / mask.sum()
    if reduction == "none":
        return nll
    raise ValueError(f"unknown reduction {reduction}")


def eos_loss(logits: Masked, pos_weight: float = 25.0) -> Array:
    """BCE-with-logits EOS loss, positive at the last valid frame.

    Reference: ``training_lib/losses.py:218-230``.
    """
    t = logits.value.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    labels = (pos == (logits.lengths[:, None] - 1)).astype(jnp.float32)
    x = logits.value.astype(jnp.float32)
    # Stable BCE-with-logits with pos_weight (torch semantics).
    log_sig = jax.nn.log_sigmoid(x)
    log_one_minus = jax.nn.log_sigmoid(-x)
    loss = -(pos_weight * labels * log_sig + (1.0 - labels) * log_one_minus)
    loss = jnp.where(logits.mask(), loss, 0.0)
    return loss.sum()


def gaussian_log_prob(x: Array, mean: Array, logstd: Array) -> Array:
    """Elementwise diagonal-Gaussian log density (fp32)."""
    x = x.astype(jnp.float32)
    mean = mean.astype(jnp.float32)
    logstd = logstd.astype(jnp.float32)
    log2pi = jnp.float32(jnp.log(2.0 * jnp.pi))
    return (-logstd - 0.5 * log2pi
            - 0.5 * jnp.exp(-2.0 * logstd) * jnp.square(x - mean))
