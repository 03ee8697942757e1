"""Activation factory (``/root/reference/modules/activations.py:5-18``)."""
from __future__ import annotations

import functools
from typing import Callable

import jax

from ..hparams.hp import Hparams


def gelu(x):
    # torch nn.GELU default is the exact (erf) formulation.
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x, slope):
    return jax.nn.leaky_relu(x, negative_slope=slope)


def get_activation(hp: Hparams) -> Callable:
    ident = hp.identifier
    if ident == "ReLU":
        return jax.nn.relu
    if ident == "SELU":
        return jax.nn.selu
    if ident == "GELU":
        return gelu
    if ident == "LeakyRELU":
        return functools.partial(leaky_relu, slope=hp.slope)
    if ident == "SiLU":
        return jax.nn.silu
    raise ValueError(f"{ident} is not a known activation")


def identity(x):
    return x
