"""Activation rematerialization (``transformer: {remat: true}``).

Each transformer layer's training forward is wrapped in
``jax.checkpoint`` (via ``nnx.remat``) so the backward recomputes the
block instead of storing activations — the standard HBM trade
(SURVEY has no reference counterpart; the torch analogue would be
``torch.utils.checkpoint``).  Gradients must be bit-compatible with
the unrematerialized path, including through the Pallas-flash custom
VJP and the shared learned T5 RPE state.
"""
import jax
import numpy as np
import pytest
from flax import nnx

from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.nn.transformer import TransformerLayerStack


def _stack(remat: bool, rpe="ALiBi", use_flash=False, seed=0):
    hp = Hparams(
        num_layers=2, bias=False, remat=remat,
        rpe={"identifier": rpe, "maxpos": 64,
             **({"num_buckets": 8, "bidirectional": False,
                 "max_distance": 32} if rpe == "T5RPE" else {})},
        layer={"ffd_size": 32, "dim": 16,
               "norm": {"identifier": "RMSNorm", "eps": 1e-6},
               "activation": {"identifier": "GELU"},
               "self_attn": {"nheads": 4, "causal": True,
                             "use_flash": use_flash}})
    return TransformerLayerStack(hp, input_dim=8, rngs=nnx.Rngs(seed))


def _grads(stack, xv):
    graphdef, params, rest = nnx.split(stack, nnx.Param, ...)

    def loss(params, xv):
        mod = nnx.merge(graphdef, params, rest)
        return (mod(Masked.full(xv)).value ** 2).mean()

    g = jax.jit(jax.grad(loss))(params, xv)
    return loss, params, g


@pytest.mark.parametrize("rpe,use_flash", [
    ("ALiBi", False),
    ("ALiBi", True),       # Pallas flash custom VJP inside checkpoint
    ("T5RPE", False),      # learned shared RPE state lifted by remat
])
def test_remat_grad_parity(rpe, use_flash):
    rng = np.random.RandomState(0)
    xv = rng.randn(2, 8, 8).astype(np.float32)
    _, p_base, g_base = _grads(_stack(False, rpe, use_flash), xv)
    _, p_rm, g_rm = _grads(_stack(True, rpe, use_flash), xv)

    key = lambda kv: str(kv[0])
    base_leaves = sorted(
        jax.tree_util.tree_leaves_with_path(g_base), key=key)
    rm_leaves = sorted(
        jax.tree_util.tree_leaves_with_path(g_rm), key=key)
    assert len(base_leaves) == len(rm_leaves)
    nonzero = 0
    for (ka, a), (kb, b) in zip(base_leaves, rm_leaves):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7, err_msg=str(ka))
        nonzero += bool(np.abs(np.asarray(a)).max() > 0)
    assert nonzero >= len(base_leaves) - 2   # grads actually flow


def test_remat_appears_in_jaxpr():
    stack = _stack(True)
    graphdef, params, rest = nnx.split(stack, nnx.Param, ...)
    xv = np.zeros((2, 8, 8), np.float32)

    def loss(params, xv):
        mod = nnx.merge(graphdef, params, rest)
        return (mod(Masked.full(xv)).value ** 2).mean()

    jaxpr = str(jax.make_jaxpr(jax.grad(loss))(params, xv))
    assert "remat" in jaxpr or "checkpoint" in jaxpr

    base = _stack(False)
    graphdef0, params0, rest0 = nnx.split(base, nnx.Param, ...)

    def loss0(params, xv):
        mod = nnx.merge(graphdef0, params, rest0)
        return (mod(Masked.full(xv)).value ** 2).mean()

    off = str(jax.make_jaxpr(jax.grad(loss0))(params0, xv))
    assert "remat" not in off and "checkpoint" not in off


def test_remat_forward_identical():
    rng = np.random.RandomState(1)
    xv = rng.randn(2, 8, 8).astype(np.float32)
    out_a = _stack(False)(Masked.full(xv)).value
    out_b = _stack(True)(Masked.full(xv)).value
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-6, atol=1e-7)
