import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.nn.flow import (CouplingStack, LinearCoupling,
                                  TensorLogdet)
from vae_gslm_tpu.nn.diffusion import (GaussianDiffusion1D,
                                       cosine_beta_schedule,
                                       linear_beta_schedule)
from vae_gslm_tpu.nn.unet import ConditionalBottleNeckUNet


def rngs(seed=0):
    return nnx.Rngs(seed)


def masked(b=2, t=6, c=4, lengths=(6, 4), seed=0):
    rng = np.random.RandomState(seed)
    v = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    return Masked.from_lengths(v, jnp.asarray(lengths))


FLOW_HP = Hparams.from_yaml("""
num_layers: 4
layer:
    hidden_dim: 16
    activation: {identifier: GELU}
    mean_only: false
    scale_range: [0.5, 2.0]
    norm: {identifier: LayerNorm, eps: 1.0e-6}
""")


def test_linear_coupling_roundtrip():
    m = LinearCoupling(4, True, FLOW_HP.layer, rngs=rngs())
    x = masked()
    out = m.forward(TensorLogdet(x, 0.0))
    back = m.reverse(out.tensor)
    np.testing.assert_allclose(np.asarray(back.value),
                               np.asarray(x.value), rtol=1e-4, atol=1e-5)


def test_coupling_stack_roundtrip_conditional():
    m = CouplingStack(4, FLOW_HP, condition_dim=8, rngs=rngs())
    x = masked()
    c = masked(c=8, seed=3)
    out = m.forward(TensorLogdet(x, 0.0), c=c)
    # logdet accumulates per transformed half: (B, T, dim/2)
    assert out.logdet.shape == x.value.shape[:-1] + (2,)
    back = m.reverse(out.tensor, c=c)
    np.testing.assert_allclose(np.asarray(back.value),
                               np.asarray(x.value), rtol=1e-4, atol=1e-4)


def test_coupling_logdet_masked():
    m = CouplingStack(4, FLOW_HP, rngs=rngs())
    x = masked()
    out = m.forward(TensorLogdet(x, 0.0))
    ld = np.asarray(out.logdet)
    assert np.all(ld[1, 4:] == 0.0)
    assert not np.all(ld[1, :4] == 0.0)


def test_coupling_logdet_is_exact_jacobian():
    """logdet per (b, t) equals log|det dF/dx| via jax.jacfwd."""
    m = CouplingStack(4, FLOW_HP, rngs=rngs())
    x = masked(b=1, t=1, lengths=(1,), seed=7)

    def f(v):
        out = m.forward(
            TensorLogdet(Masked.from_lengths(v[None, None], jnp.asarray([1])),
                         0.0))
        return out.tensor.value[0, 0]

    v0 = x.value[0, 0]
    jac = jax.jacfwd(f)(v0)
    _, ref_logdet = jnp.linalg.slogdet(jac)
    out = m.forward(TensorLogdet(x, 0.0))
    got = np.asarray(out.logdet)[0, 0].sum()
    np.testing.assert_allclose(got, float(ref_logdet), rtol=1e-4)


def test_spline_coupling_roundtrip():
    hp = Hparams.from_yaml("""
num_layers: 2
identifier: RationalQuadraticSplineCoupling
layer:
    hidden_dim: 16
    activation: {identifier: GELU}
    num_bins: 8
    tail_bound: 3.0
    norm: {identifier: LayerNorm, eps: 1.0e-6}
""")
    m = CouplingStack(4, hp, rngs=rngs())
    x = masked()
    out = m.forward(TensorLogdet(x, 0.0))
    back = m.reverse(out.tensor)
    np.testing.assert_allclose(np.asarray(back.value),
                               np.asarray(x.value), rtol=1e-3, atol=1e-4)


def test_beta_schedules_match_torch_reference():
    import torch
    ts = 100
    got = linear_beta_schedule(ts)
    ref = torch.linspace(1000 / ts * 0.0001, 1000 / ts * 0.02, ts,
                         dtype=torch.float64).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-12)
    got = cosine_beta_schedule(ts, Hparams())
    import math
    x = torch.linspace(0, ts, ts + 1, dtype=torch.float64)
    ac = torch.cos(((x / ts) + 0.008) / 1.008 * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = torch.clip(1 - ac[1:] / ac[:-1], 0, 0.999).numpy()
    np.testing.assert_allclose(got, betas, rtol=1e-12)


def _tiny_unet_hp():
    return Hparams.from_yaml("""
unet:
    condition_dim: 8
    num_layers: 2
    resample_rates: [1, 1]
    resample_ksize: [1, 1]
    init_channel: 16
    out_channels: [16, 16]
    hidden_channels: [32, 32]
    conditional: [false, true]
    skip_connection: [null, 0]
    connection_type: "concat"
    final_norm: true
    layer:
        causal_padding: true
        kernel_size: 3
        norm: {identifier: InstanceNorm, eps: 1.0e-6}
        activation: {identifier: SiLU}
        condition_type: "concat"
time_embedding:
    dim: 16
    maxpos: 50
    activation: {identifier: SiLU}
""")


def _diffusion(sampling_timesteps=None):
    hp = Hparams.from_yaml("""
timesteps: 20
loss_type: l1
input_scale: 5.0
objective: pred_noise
clamp_range: [-3.0, 1.2]
ddim_sampling_eta: 0.5
beta_schedule: {identifier: cosine}
""")
    if sampling_timesteps:
        hp.sampling_timesteps = sampling_timesteps
    model = ConditionalBottleNeckUNet(6, 5, _tiny_unet_hp(), rngs=rngs())
    return GaussianDiffusion1D(model, hp)


def test_diffusion_training_loss_finite():
    d = _diffusion()
    x = masked(c=5)
    cond = masked(c=6, seed=1)
    loss = d(x, cond, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_ddim_sample_shapes_and_clamp():
    d = _diffusion(sampling_timesteps=5)
    assert d.is_ddim_sampling
    start = masked(c=5, seed=2)
    cond = masked(c=6, seed=3)
    out = d.sample(start, cond, jax.random.PRNGKey(0))
    v = np.asarray(out.value)
    assert v.shape == (2, 6, 5)
    assert np.isfinite(v).all()
    assert v.max() <= 1.2 + 1e-5 and v.min() >= -3.0 - 1e-5
    # padded region zero
    assert np.all(v[1, 4:] == 0)


def test_ancestral_sample_runs():
    d = _diffusion()  # sampling_timesteps == timesteps -> ancestral
    assert not d.is_ddim_sampling
    start = masked(c=5, seed=2)
    cond = masked(c=6, seed=3)
    out = d.p_sample_loop(start, cond, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out.value)).all()


def test_sampling_override():
    d = _diffusion()
    d.override_sampling(sampling_timesteps=4, ddim_sampling_eta=0.1)
    assert d.sampling_timesteps == 4
    assert d.ddim_sampling_eta == 0.1
    assert d.is_ddim_sampling


def test_ddim_deterministic_under_fixed_prng():
    d = _diffusion(sampling_timesteps=5)
    start = masked(c=5, seed=2)
    cond = masked(c=6, seed=3)
    a = np.asarray(d.sample(start, cond, jax.random.PRNGKey(7)).value)
    b = np.asarray(d.sample(start, cond, jax.random.PRNGKey(7)).value)
    np.testing.assert_array_equal(a, b)
