"""Torch checkpoint converter round-trip: export our params to the
reference key/layout convention, load into a fresh model, and require
identical forward outputs.  (Per-leaf layout conventions vs real torch
modules are covered by test_nn_layers / test_models.)"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from tests.test_models import TINY_LVTR, N_MELS, _batch
from vae_gslm_tpu.models.convert_torch import (export_torch_lvtr,
                                               load_torch_lvtr)
from vae_gslm_tpu.models.speech.lvtr import LVTR
from vae_gslm_tpu.core.masked import Masked


def test_lvtr_torch_roundtrip():
    m1 = LVTR(TINY_LVTR, input_dim=N_MELS, rngs=nnx.Rngs(0))
    m2 = LVTR(TINY_LVTR, input_dim=N_MELS, rngs=nnx.Rngs(123))
    sd = export_torch_lvtr(m1)
    assert len(sd) > 40
    # Distinct before conversion...
    x = _batch(2, 8)
    utt = Masked.from_lengths(jnp.zeros((2, 8, N_MELS)),
                              jnp.asarray([8, 8]))
    key = jax.random.PRNGKey(0)
    out1 = m1(x, key, utterance=utt)
    out2 = m2(x, key, utterance=utt)
    assert not np.allclose(np.asarray(out1["log_p"].value),
                           np.asarray(out2["log_p"].value))
    # ...identical after.
    load_torch_lvtr(m2, sd)
    out2b = m2(x, key, utterance=utt)
    np.testing.assert_allclose(np.asarray(out2b["log_p"].value),
                               np.asarray(out1["log_p"].value),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(out2b["rec_loss"]),
                               float(out1["rec_loss"]), rtol=1e-5)


def test_lvtr_export_covers_all_params():
    """Every trainable param of the model appears in the exported
    state_dict (by total parameter count)."""
    m = LVTR(TINY_LVTR, input_dim=N_MELS, rngs=nnx.Rngs(0))
    sd = export_torch_lvtr(m)
    n_exported = sum(int(np.prod(v.shape)) for v in sd.values())
    _, params, _ = nnx.split(m, nnx.Param, ...)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    assert n_exported == n_params, (n_exported, n_params)


def test_torch_file_roundtrip(tmp_path):
    """Save as a real torch .ckpt and load through the file-based path
    (the released-artifact format)."""
    import torch

    m1 = LVTR(TINY_LVTR, input_dim=N_MELS, rngs=nnx.Rngs(0))
    sd = {k: torch.tensor(v) for k, v in export_torch_lvtr(m1).items()}
    p = str(tmp_path / "last-cpt.ckpt")
    torch.save(sd, p)
    loaded = torch.load(p, map_location="cpu", weights_only=True)
    m2 = LVTR(TINY_LVTR, input_dim=N_MELS, rngs=nnx.Rngs(7))
    load_torch_lvtr(m2, loaded)
    x = _batch(2, 8)
    utt = Masked.from_lengths(jnp.zeros((2, 8, N_MELS)),
                              jnp.asarray([8, 8]))
    key = jax.random.PRNGKey(1)
    a = m1(x, key, utterance=utt)
    b = m2(x, key, utterance=utt)
    np.testing.assert_allclose(np.asarray(b["log_p"].value),
                               np.asarray(a["log_p"].value),
                               rtol=1e-5, atol=1e-6)
