"""Global mixed-precision policy.

The reference trains with Lightning ``precision="16-mixed"`` (fp32 params,
fp16 compute).  The TPU-native equivalent is fp32 params + bfloat16
compute on the MXU.  Modules consult the active policy at trace time, so
switching policy re-jits with the new dtypes.
"""
from __future__ import annotations

import contextlib
import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    # Norm statistics / softmax / log-prob math always run fp32.


_POLICY = Policy()


def set_policy(policy: Policy) -> None:
    global _POLICY
    _POLICY = policy


def get_policy() -> Policy:
    return _POLICY


def bf16_mixed() -> Policy:
    return Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)


@contextlib.contextmanager
def policy_scope(policy: Policy):
    global _POLICY
    prev = _POLICY
    _POLICY = policy
    try:
        yield
    finally:
        _POLICY = prev


def cast_compute(*arrays):
    """Cast arrays to the active compute dtype."""
    dt = _POLICY.compute_dtype
    out = tuple(a.astype(dt) if a is not None else None for a in arrays)
    return out if len(out) > 1 else out[0]
