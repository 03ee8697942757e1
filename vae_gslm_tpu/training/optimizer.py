"""Optimizer + LR schedule factory (optax).

Parity target: ``/root/reference/training_lib/optimizer.py``:
Adam/AdamW by identifier; schedule pipeline warmup → flat →
{linear_decay|triangle, constant, cosine(min_lr)} → optional
``finish_steps`` floor, stepped per optimizer step; optional
norm-and-bias (ndim==1) exclusion from weight decay.

Note the reference's torch ``Adam(weight_decay=·)`` is L2-into-grad
(coupled); ``AdamW`` is decoupled.  Both are reproduced.
"""
from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from ..hparams.hp import Hparams


def make_schedule(hp: Hparams, total_steps: int, base_lr: float
                  ) -> Callable:
    """Compose the reference scheduler pipeline into one optax schedule."""
    hp.check_arg_in_hparams("identifier")
    schedules, boundaries, milestone = [], [], 0
    if hp.has("warmup_steps") and hp.warmup_steps > 0:
        w = hp.warmup_steps
        schedules.append(lambda t: base_lr * t / max(1, w))
        milestone += w
        boundaries.append(milestone)
    elif hp.has("warmup_steps"):
        # warmup_steps == 0 → LambdaLR(t/max(1,0)) == t — degenerate in
        # the reference too; treat as no warmup.
        pass
    if hp.has("flat_steps"):
        schedules.append(lambda t: base_lr)
        milestone += hp.flat_steps
        boundaries.append(milestone)
    assert total_steps > milestone
    main_steps = total_steps - milestone - hp.get("finish_steps", 0)
    ident = hp.identifier
    if ident in ("linear_decay", "triangle"):
        schedules.append(
            lambda t: base_lr * jnp.maximum(
                0.0, (main_steps - t) / main_steps))
    elif ident == "constant":
        schedules.append(lambda t: base_lr)
    elif ident == "cosine":
        min_lr = hp.get("min_lr", 0.0)
        schedules.append(
            lambda t: min_lr + (base_lr - min_lr) * 0.5
            * (1.0 + jnp.cos(jnp.pi * jnp.minimum(t, main_steps)
                             / main_steps)))
    else:
        raise NotImplementedError(ident)
    if hp.has("finish_steps"):
        # Constant absolute floor at min_lr — the cosine segment
        # anneals to eta_min == min_lr (absolute), so this is the
        # evident intent.  The reference instead passes min_lr as a
        # torch ConstantLR *factor* (``optimizer.py:100``), which
        # scales base_lr by min_lr for ConstantLR's default 5 steps
        # and then snaps back to full base_lr — a latent bug we do
        # not copy.
        assert hp.get("min_lr", 0) != 0
        schedules.append(lambda t: hp.min_lr)
        milestone += main_steps
        boundaries.append(milestone)
    if len(schedules) > 1:
        return optax.join_schedules(schedules, boundaries)
    return schedules[0]


def _wd_mask(params) -> object:
    """True (decay) for params with ndim != 1
    (``optimizer.py:115-123``)."""
    return jax.tree_util.tree_map(lambda p: p.ndim != 1, params)


def create_optimizer(hp: Hparams, total_steps: int
                     ) -> Tuple[optax.GradientTransformation, Callable]:
    """Build (transform, schedule_fn) from an ``hp.training`` block."""
    hp.check_arg_in_hparams("optimizer", "scheduler")
    ohp = hp.optimizer
    ohp.check_arg_in_hparams("identifier", "lr", "beta1", "beta2")
    schedule = make_schedule(hp.scheduler, total_steps, ohp.lr)
    eps = ohp.get("eps", 1e-8)
    exclude = ohp.get("exclude_norm_and_bias_from_weight_decay", False)
    chain = []
    if hp.has("gradient_clip_val"):
        chain.append(optax.clip_by_global_norm(hp.gradient_clip_val))
    if ohp.identifier == "Adam":
        wd = ohp.get("weight_decay", 0.0)
        if wd:
            chain.append(optax.add_decayed_weights(
                wd, mask=_wd_mask if exclude else None))
        chain.append(optax.scale_by_adam(b1=ohp.beta1, b2=ohp.beta2,
                                         eps=eps))
    elif ohp.identifier == "AdamW":
        wd = ohp.get("weight_decay", 0.01)
        chain.append(optax.scale_by_adam(b1=ohp.beta1, b2=ohp.beta2,
                                         eps=eps))
        if wd:
            chain.append(optax.add_decayed_weights(
                wd, mask=_wd_mask if exclude else None))
    else:
        raise NotImplementedError(ohp.identifier)
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain), schedule
