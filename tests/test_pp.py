"""Pipeline parallelism over the virtual 8-CPU mesh (parallel/pp.py):
GPipe schedule inside shard_map — stage weights P("pipe") on the layer
axis, microbatches hopping stages via ppermute, composing with data
parallelism on a ("data", "pipe") mesh.  Beyond-reference (SURVEY
§2.9: the reference is DDP-only)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.nn.transformer import TransformerLayerStack
from vae_gslm_tpu.parallel import pp

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _stack(num_layers=4, dim=16, rpe=True):
    hp = Hparams(
        num_layers=num_layers, bias=False,
        **({"rpe": {"identifier": "ALiBi", "maxpos": 64}} if rpe
           else {}),
        layer={"ffd_size": 32, "dim": dim,
               "norm": {"identifier": "RMSNorm", "eps": 1e-6},
               "activation": {"identifier": "GELU"},
               "self_attn": {"nheads": 4, "causal": True,
                             "use_flash": True}})
    return TransformerLayerStack(hp, input_dim=8, rngs=nnx.Rngs(0))


@requires_8
@pytest.mark.parametrize("rpe", [True, False])
def test_pipeline_forward_parity(rpe):
    """4-stage pipeline over a (data=2, pipe=4) mesh reproduces the
    plain layer-loop forward."""
    m = _stack(rpe=rpe)
    mesh = pp.create_mesh_pipe(4, 2)
    assert dict(mesh.shape) == {"data": 2, "pipe": 4}

    rng = np.random.RandomState(0)
    xv = jnp.asarray(rng.randn(8, 12, 8).astype(np.float32))
    base = m(Masked.full(xv)).value

    with pp.pipeline(mesh, n_micro=2):
        got = jax.jit(lambda x: m(Masked.full(x)).value)(xv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-5, atol=1e-6)


@requires_8
def test_pipeline_padded_lengths_parity():
    m = _stack()
    mesh = pp.create_mesh_pipe(4, 2)
    rng = np.random.RandomState(1)
    xv = jnp.asarray(rng.randn(8, 12, 8).astype(np.float32))
    lengths = jnp.asarray([12, 7, 12, 3, 9, 12, 5, 12], jnp.int32)
    base = m(Masked(xv, lengths, 1)).value
    with pp.pipeline(mesh, n_micro=2):
        got = jax.jit(
            lambda x: m(Masked(x, lengths, 1)).value)(xv)
    # valid positions must match; both paths zero the padded rows
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=2e-5, atol=1e-6)


@requires_8
def test_pipeline_grad_parity():
    """Gradients through the GPipe scan/ppermute match the plain
    path for every parameter."""
    m = _stack()
    graphdef, params, rest = nnx.split(m, nnx.Param, ...)
    mesh = pp.create_mesh_pipe(4, 2)
    rng = np.random.RandomState(2)
    xv = jnp.asarray(rng.randn(8, 12, 8).astype(np.float32))

    def loss(params, x):
        mod = nnx.merge(graphdef, params, rest)
        return (mod(Masked.full(x)).value ** 2).mean()

    g_base = jax.jit(jax.grad(loss))(params, xv)
    with pp.pipeline(mesh, n_micro=2):
        g_pp = jax.jit(jax.grad(loss))(params, xv)

    key = lambda kv: str(kv[0])
    base_l = sorted(jax.tree_util.tree_leaves_with_path(g_base),
                    key=key)
    pp_l = sorted(jax.tree_util.tree_leaves_with_path(g_pp), key=key)
    nonzero = 0
    for (ka, a), (kb, b) in zip(base_l, pp_l):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6,
                                   err_msg=str(ka))
        nonzero += bool(np.abs(np.asarray(a)).max() > 0)
    assert nonzero >= len(base_l) - 2


@requires_8
def test_trainer_pipeline_parallel_matches_dp(tmp_path):
    """trainer.pipeline_parallel: 4 — the full LVTR train step (encoder
    + pipelined trunk + flow + diffusion + optimizer) reproduces the
    plain-DP metrics on the 8-device mesh."""
    from tests.test_fsdp import TRAIN_HP, _batch, VOCODER_HP
    from vae_gslm_tpu.models.vocoder.vocoder import HiFiGAN
    from vae_gslm_tpu.trainers.speech.lvtr import LVTRTrainer

    voc = tmp_path / "voc"
    HiFiGAN(Hparams.from_yaml(VOCODER_HP.replace("n_mels: 16",
                                                 "n_mels: 16")),
            rngs=nnx.Rngs(0)).save_pretrained(str(voc))

    def build(extra):
        hp = Hparams.from_yaml(TRAIN_HP.format(
            fsdp="false", log_dir=tmp_path / "log", vocoder_dir=voc))
        hp.model.transformer.num_layers = 4
        for k, v in extra.items():
            setattr(hp.trainer, k, v)
        return LVTRTrainer(hp)

    dp = build({})
    m_dp = dp.run_step(_batch())

    pptr = build({"pipeline_parallel": 4})
    assert dict(pptr.mesh.shape) == {"data": 2, "pipe": 4}
    assert pptr._pp_micro == 4
    m_pp = pptr.run_step(_batch())
    for k in m_dp:
        np.testing.assert_allclose(
            float(m_dp[k]), float(m_pp[k]), rtol=5e-3, atol=1e-5,
            err_msg=f"metric {k} diverged between DP and PP")


@requires_8
def test_depthwise_grad_correct_on_2d_mesh():
    """Regression: XLA's SPMD partitioner multiplies the WEIGHT
    gradient of a feature_group_count conv by the size of every mesh
    axis the batch is not sharded over (4.0x on a (2, 4) mesh —
    silently wrong depthwise grads under TP/PP).  Conv1d's depthwise
    shifted-multiply path must produce mesh-independent gradients."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vae_gslm_tpu.nn.conv import Conv1d

    conv = Conv1d(4, 4, 3, padding=1, groups=4, bias=False,
                  rngs=nnx.Rngs(0))
    graphdef, params = nnx.split(conv)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 16, 4).astype(np.float32))

    def loss(params, x):
        return (nnx.merge(graphdef, params)(x) ** 2).mean()

    # forward matches the grouped-conv lowering
    ref_y = jax.lax.conv_general_dilated(
        x, params["kernel"].value, (1,), [(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=4)
    np.testing.assert_allclose(np.asarray(nnx.merge(graphdef, params)(x)),
                               np.asarray(ref_y), rtol=1e-6, atol=1e-6)

    g1 = jax.grad(loss)(params, x)["kernel"].value
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4),
                ("data", "aux"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    g2 = jax.jit(jax.grad(loss))(ps, xs)["kernel"].value
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-5, atol=1e-7)


@requires_8
def test_pipeline_ineligible_falls_back():
    """Indivisible layers/batch or non-stacked-eligible configs run
    the plain path unchanged under an active pipeline context."""
    m = _stack(num_layers=3)          # 3 % 4 != 0
    mesh = pp.create_mesh_pipe(4, 2)
    xv = jnp.zeros((8, 12, 8), jnp.float32)
    base = m(Masked.full(xv)).value
    with pp.pipeline(mesh, n_micro=2):
        got = m(Masked.full(xv)).value
    np.testing.assert_allclose(np.asarray(got), np.asarray(base))
