import os

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.nn.linear import Dense, GaussianParameterize
from vae_gslm_tpu.training import checkpoint as ckpt


class Tiny(nnx.Module):
    def __init__(self, *, rngs):
        self.a = Dense(4, 8, rngs=rngs)
        self.b = Dense(8, 2, rngs=rngs)


def test_compact_roundtrip(tmp_path):
    m = Tiny(rngs=nnx.Rngs(0))
    p = str(tmp_path / "m.npz")
    ckpt.save_compact(m, p)
    m2 = Tiny(rngs=nnx.Rngs(1))
    assert not np.allclose(np.asarray(m.a.kernel[...]),
                           np.asarray(m2.a.kernel[...]))
    ckpt.load_compact(m2, p)
    np.testing.assert_array_equal(np.asarray(m.a.kernel[...]),
                                  np.asarray(m2.a.kernel[...]))
    np.testing.assert_array_equal(np.asarray(m.b.bias[...]),
                                  np.asarray(m2.b.bias[...]))


def test_compact_lenient_on_missing(tmp_path):
    m = Tiny(rngs=nnx.Rngs(0))
    p = str(tmp_path / "m.npz")
    ckpt.save_compact(m, p)

    class Bigger(nnx.Module):
        def __init__(self, *, rngs):
            self.a = Dense(4, 8, rngs=rngs)
            self.b = Dense(8, 2, rngs=rngs)
            self.c = Dense(2, 2, rngs=rngs)  # extra, not in ckpt

    m3 = Bigger(rngs=nnx.Rngs(2))
    before = np.asarray(m3.c.kernel[...]).copy()
    ckpt.load_compact(m3, p)  # strict=False semantics
    np.testing.assert_array_equal(np.asarray(m3.c.kernel[...]), before)
    np.testing.assert_array_equal(np.asarray(m3.a.kernel[...]),
                                  np.asarray(m.a.kernel[...]))


def test_get_last_ckpt(tmp_path):
    for step in (10, 200, 30):
        (tmp_path / f"step={step}-cpt.npz").write_bytes(b"x")
    assert ckpt.get_last_ckpt(str(tmp_path)).endswith("step=200-cpt.npz")


def test_orbax_full_state_roundtrip(tmp_path):
    state = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "opt": {"mu": np.ones((2, 3), np.float32) * 0.5},
        "step": np.asarray(42),
    }
    path = str(tmp_path / "full_state")
    ckpt.save_train_state(path, state)
    template = {
        "params": {"w": np.zeros((2, 3), np.float32)},
        "opt": {"mu": np.zeros((2, 3), np.float32)},
        "step": np.asarray(0),
    }
    restored = ckpt.restore_train_state(path, template)
    np.testing.assert_array_equal(restored["params"]["w"],
                                  state["params"]["w"])
    np.testing.assert_array_equal(restored["opt"]["mu"],
                                  state["opt"]["mu"])
    assert int(restored["step"]) == 42


def test_gaussian_head_in_compact(tmp_path):
    class M(nnx.Module):
        def __init__(self, *, rngs):
            self.head = GaussianParameterize(4, 2, rngs=rngs)

    m = M(rngs=nnx.Rngs(0))
    p = str(tmp_path / "g.npz")
    ckpt.save_compact(m, p)
    m2 = M(rngs=nnx.Rngs(5))
    ckpt.load_compact(m2, p)
    np.testing.assert_array_equal(
        np.asarray(m.head.mean_head.kernel[...]),
        np.asarray(m2.head.mean_head.kernel[...]))
