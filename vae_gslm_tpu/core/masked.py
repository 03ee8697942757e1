"""Masked sequence container: the TPU-native `TensorMask` equivalent.

The reference framework threads a ``TensorMask`` (tensor + dense B×T bool
mask) through every layer (``/root/reference/utils/tensormask.py:7-228``).
On TPU we want static shapes and cheap pytrees, so the canonical
representation here is ``(value, lengths)``: the padded tensor plus an
int32 per-example valid-length vector.  The bool mask is materialised on
demand (XLA fuses the ``iota < lengths`` comparison into consumers for
free), which keeps the pytree small and `lax.scan`/`pjit` friendly.

Supported layouts (mirroring the reference): ``time_axis=1`` for
``(B, T, ...)`` and ``time_axis=2`` for ``(B, C, T)``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Masked:
    """A padded sequence batch with per-example valid lengths.

    Attributes:
      value: the padded data, ``(B, T, ...)`` or ``(B, C, T)``.
      lengths: int32 ``(B,)`` number of valid frames per example.
      time_axis: static; 1 for ``B T ...``, 2 for ``B C T``.
    """

    value: Array
    lengths: Array
    time_axis: int = dataclasses.field(
        default=1, metadata=dict(static=True)
    )

    def __post_init__(self):
        assert self.time_axis in (1, 2), "Only B T ... or B C T supported"

    # -- constructors ------------------------------------------------------
    @classmethod
    def full(cls, value: Array, time_axis: int = 1) -> "Masked":
        """All timesteps valid."""
        b = value.shape[0]
        t = value.shape[time_axis]
        lengths = jnp.full((b,), t, dtype=jnp.int32)
        return cls(value, lengths, time_axis)

    @classmethod
    def from_lengths(
        cls, value: Array, lengths: Array, time_axis: int = 1
    ) -> "Masked":
        return cls(value, jnp.asarray(lengths, jnp.int32), time_axis)

    @classmethod
    def from_mask(cls, value: Array, mask: Array, time_axis: int = 1
                  ) -> "Masked":
        lengths = mask.astype(jnp.int32).sum(-1)
        return cls(value, lengths, time_axis)

    # -- basic properties --------------------------------------------------
    @property
    def batch(self) -> int:
        return self.value.shape[0]

    @property
    def time(self) -> int:
        return self.value.shape[self.time_axis]

    @property
    def dtype(self):
        return self.value.dtype

    @property
    def shape(self):
        return self.value.shape

    def mask(self) -> Array:
        """Dense bool mask ``(B, T)``; True = valid."""
        t = self.time
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
        return pos < self.lengths[:, None]

    def expanded_mask(self) -> Array:
        """Mask broadcastable against ``value`` (bool)."""
        m = self.mask()
        if self.time_axis == 1:
            extra = self.value.ndim - 2
            return m.reshape(m.shape + (1,) * extra)
        # B C T: mask broadcasts over channel dim.
        return m[:, None, :]

    # -- masking -----------------------------------------------------------
    def apply_mask(self, fill: float = 0.0) -> "Masked":
        fill_val = jnp.asarray(fill, dtype=self.value.dtype)
        value = jnp.where(self.expanded_mask(), self.value, fill_val)
        return dataclasses.replace(self, value=value)

    # -- layout ------------------------------------------------------------
    def transpose(self) -> "Masked":
        """Swap between ``B T C`` and ``B C T``."""
        assert self.value.ndim == 3
        value = jnp.swapaxes(self.value, 1, 2)
        return Masked(value, self.lengths, time_axis=3 - self.time_axis)

    def flatten(self) -> "Masked":
        """Reshape trailing feature dims into one: ``(B, T, -1)``."""
        assert self.time_axis == 1
        b, t = self.value.shape[:2]
        return Masked(self.value.reshape(b, t, -1), self.lengths, 1)

    def expand_dim(self) -> "Masked":
        return Masked(self.value[..., None], self.lengths, self.time_axis)

    def astype(self, dtype) -> "Masked":
        return dataclasses.replace(self, value=self.value.astype(dtype))

    # -- sequence shifting (AR teacher forcing) ----------------------------
    def shift_right(self, init: Array) -> "Masked":
        """Prepend ``init`` (B, n, C) along time and drop the last n frames.

        Static-shape equivalent of the reference's
        ``push(init).pop(n)`` idiom used for AR teacher forcing
        (``/root/reference/utils/tensormask.py:104-133``,
        ``models/speech/lvtr.py:161-168``).  Note the reference `pop`
        also shortens lengths by n; we preserve that.
        """
        assert self.time_axis == 1
        n = init.shape[1]
        value = jnp.concatenate(
            [init.astype(self.value.dtype), self.value[:, :-n]], axis=1
        )
        # push adds n valid frames, pop removes n => lengths unchanged.
        return Masked(value, self.lengths, 1)

    def push(self, other: Union[Array, "Masked"]) -> "Masked":
        assert self.time_axis == 1
        if isinstance(other, Masked):
            o_val, o_len = other.value, other.lengths
        else:
            o_val = other
            o_len = jnp.full((other.shape[0],), other.shape[1], jnp.int32)
        value = jnp.concatenate([o_val.astype(self.value.dtype),
                                 self.value], axis=1)
        return Masked(value, self.lengths + o_len, 1)

    def append(self, other: Union[Array, "Masked"]) -> "Masked":
        # NOTE: like the reference, assumes `self` has no internal padding
        # when appending (used on fully-valid buffers).
        assert self.time_axis == 1
        if isinstance(other, Masked):
            o_val, o_len = other.value, other.lengths
        else:
            o_val = other
            o_len = jnp.full((other.shape[0],), other.shape[1], jnp.int32)
        value = jnp.concatenate([self.value, o_val.astype(self.value.dtype)],
                                axis=1)
        return Masked(value, self.lengths + o_len, 1)

    def pop(self, n: int = 1) -> "Masked":
        assert self.time_axis == 1
        return Masked(self.value[:, :-n], self.lengths - n, 1)

    def pop_left(self, n: int = 1) -> "Masked":
        value = (self.value[:, n:] if self.time_axis == 1
                 else self.value[:, :, n:])
        return Masked(value, self.lengths - n, self.time_axis)

    # -- channel ops -------------------------------------------------------
    def cat(self, other: Union[Array, "Masked"]) -> "Masked":
        """Concatenate along the channel (non-time) axis."""
        o = other.value if isinstance(other, Masked) else other
        axis = -1 if self.time_axis == 1 else 1
        value = jnp.concatenate([self.value, o.astype(self.value.dtype)],
                                axis=axis)
        return Masked(value, self.lengths, self.time_axis)

    def split(self, n: int) -> Tuple["Masked", "Masked"]:
        a = Masked(self.value[..., :n], self.lengths, self.time_axis)
        b = Masked(self.value[..., n:], self.lengths, self.time_axis)
        return a, b

    def squeeze(self, axis: int) -> "Masked":
        return Masked(jnp.squeeze(self.value, axis), self.lengths,
                      self.time_axis)

    # -- reductions --------------------------------------------------------
    def mean(self) -> Array:
        """Masked global mean over (batch, time), averaged over channels.

        Matches reference `TensorMask.mean`
        (``utils/tensormask.py:135-140``): sum over all masked values
        divided by channel count, then by total valid length.
        """
        assert self.time_axis == 1
        x = self.flatten().apply_mask()
        c = x.value.shape[-1]
        total = x.value.sum() / c
        return total / self.lengths.sum()

    def time_mean(self) -> Array:
        """Per-example masked mean over time: ``(B, C)``."""
        assert self.time_axis == 1
        x = self.flatten().apply_mask()
        return x.value.sum(1) / self.lengths[:, None]

    # -- misc --------------------------------------------------------------
    def abs(self) -> "Masked":
        return dataclasses.replace(self, value=jnp.abs(self.value))

    def __mul__(self, other):
        o = other.value if isinstance(other, Masked) else other
        return dataclasses.replace(self, value=self.value * o)

    def __add__(self, other):
        o = other.value if isinstance(other, Masked) else other
        return dataclasses.replace(self, value=self.value + o)

    def __sub__(self, other):
        o = other.value if isinstance(other, Masked) else other
        return dataclasses.replace(self, value=self.value - o)

    def __truediv__(self, other):
        o = other.value if isinstance(other, Masked) else other
        return dataclasses.replace(self, value=self.value / o)

    def batch_time_shuffle(self, key: jax.Array) -> "Masked":
        """Shuffle valid frames across batch and time (static shape).

        Reference: ``utils/tensormask.py:195-213``.  Implemented by
        ranking random keys, with invalid frames forced to sort last so
        that valid frames permute only among valid slots.
        """
        assert self.time_axis == 1 and self.value.ndim == 3
        b, t, c = self.value.shape
        mask = self.mask().reshape(-1)
        r = jax.random.uniform(key, (b * t,))
        # Invalid frames sort last; valid frames land first in random order.
        perm = jnp.argsort(jnp.where(mask, r, 2.0))
        flat = self.value.reshape(b * t, c)
        gathered = flat[perm]
        # Valid slot positions, in original order.
        valid_slots = jnp.argsort(jnp.where(mask, 0, 1), stable=True)
        out = jnp.zeros_like(flat).at[valid_slots].set(gathered)
        out = out.reshape(b, t, c)
        return Masked(out, self.lengths, 1).apply_mask()


def resize_length(lengths: Array, ratio: float) -> Array:
    """ceil(length * ratio) — matches reference ``resize_length``."""
    return jnp.ceil(lengths.astype(jnp.float32) * ratio).astype(jnp.int32)


def make_padding_mask(q_mask: Array, kv_mask: Array) -> Array:
    """(B, Tq, Tk) key-padding mask from (B, Tq), (B, Tk)."""
    return jnp.broadcast_to(
        kv_mask[:, None, :], (kv_mask.shape[0], q_mask.shape[1],
                              kv_mask.shape[1])
    )


def repeat_batch(x: Masked, n: int) -> Masked:
    """Tile the batch n times: ``(n*B, T, C)``.

    Reference: ``utils/helpers.py:177-184``.
    """
    value = jnp.tile(x.value, (n,) + (1,) * (x.value.ndim - 1))
    lengths = jnp.tile(x.lengths, (n,))
    return Masked(value, lengths, x.time_axis)
