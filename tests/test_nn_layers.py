import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from flax import nnx

from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.nn import activations, conv, linear, norms


def rngs(seed=0):
    return nnx.Rngs(seed)


def masked(b=2, t=8, c=6, lengths=(8, 5), seed=0):
    rng = np.random.RandomState(seed)
    v = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    return Masked.from_lengths(v, jnp.asarray(lengths))


# ---------------------------------------------------------------- norms
def test_rmsnorm_matches_reference_formula():
    x = np.random.RandomState(0).randn(2, 4, 6).astype(np.float32)
    m = norms.RMSNorm(6, eps=1e-6, rngs=rngs())
    m.scale[...] = jnp.asarray(np.random.RandomState(1).rand(6),
                               jnp.float32)
    got = np.asarray(m(jnp.asarray(x)))
    xt = torch.tensor(x)
    norm = xt.pow(2).mean(-1)
    expect = xt * torch.rsqrt(norm[..., None] + 1e-6)
    expect = torch.tensor(np.asarray(m.scale[...])) * expect
    np.testing.assert_allclose(got, expect.numpy(), rtol=1e-5, atol=1e-6)


def test_instancenorm_matches_reference_btc_equiv():
    # Reference InstanceNorm runs on BCT with dim=1 (unbiased var).
    x_btc = np.random.RandomState(0).randn(2, 5, 6).astype(np.float32)
    w = np.random.RandomState(1).rand(6).astype(np.float32)
    b = np.random.RandomState(2).rand(6).astype(np.float32)
    m = norms.InstanceNorm(6, eps=1e-6, rngs=rngs())
    m.weight[...] = jnp.asarray(w)
    m.bias[...] = jnp.asarray(b)
    got = np.asarray(m(jnp.asarray(x_btc)))
    xt = torch.tensor(x_btc).transpose(1, 2)  # BCT
    var, mean = torch.var_mean(xt, dim=1, keepdim=True)
    ref = (xt - mean) * torch.rsqrt(var + 1e-6)
    ref = torch.tensor(w)[..., None] * ref + torch.tensor(b)[..., None]
    np.testing.assert_allclose(got, ref.transpose(1, 2).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_layernorm_matches_torch():
    x = np.random.RandomState(0).randn(2, 5, 6).astype(np.float32)
    m = norms.LayerNorm(6, eps=1e-6, rngs=rngs())
    got = np.asarray(m(jnp.asarray(x)))
    ref = F.layer_norm(torch.tensor(x), (6,), eps=1e-6).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_norm_factory():
    hp = Hparams.from_yaml("identifier: RMSNorm\neps: 1.0e-6")
    assert isinstance(norms.get_norm(4, hp, rngs=rngs()), norms.RMSNorm)
    hp = Hparams.from_yaml("identifier: Identity")
    assert isinstance(norms.get_norm(4, hp, rngs=rngs()), norms.Identity)


# ---------------------------------------------------------------- acts
def test_gelu_matches_torch_exact():
    x = np.linspace(-3, 3, 13).astype(np.float32)
    got = np.asarray(activations.gelu(jnp.asarray(x)))
    ref = torch.nn.GELU()(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- linear
def test_dense_matches_torch_linear():
    m = linear.Dense(6, 4, rngs=rngs())
    tl = torch.nn.Linear(6, 4)
    with torch.no_grad():
        tl.weight.copy_(torch.tensor(np.asarray(m.kernel[...]).T))
        tl.bias.copy_(torch.tensor(np.asarray(m.bias[...])))
    x = np.random.RandomState(0).randn(2, 3, 6).astype(np.float32)
    got = np.asarray(m(jnp.asarray(x)))
    ref = tl(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_embedding_masks_padding():
    m = linear.Embedding(10, 4, rngs=rngs())
    ids = Masked.from_lengths(jnp.asarray([[1, 2, 3], [4, 5, 6]]),
                              jnp.asarray([3, 1]))
    out = m(ids)
    v = np.asarray(out.value)
    assert np.all(v[1, 1:] == 0)
    assert not np.all(v[1, 0] == 0)


def test_gaussian_parameterize_stats_and_sample():
    m = linear.GaussianParameterize(6, 4, rngs=rngs())
    x = masked(c=6)
    out = m(x, jax.random.PRNGKey(0), temperature=0.0)
    # temperature 0 => sample == mean
    np.testing.assert_allclose(np.asarray(out.sample.value),
                               np.asarray(out.mean.value), atol=1e-6)
    out1 = m(x, jax.random.PRNGKey(1), temperature=1.0)
    assert not np.allclose(np.asarray(out1.sample.value),
                           np.asarray(out1.mean.value))


def test_gaussian_parameterize_std_range():
    m = linear.GaussianParameterize(6, 4, std_range=(0.5, 2.0),
                                    rngs=rngs())
    x = masked(c=6)
    out = m(x, jax.random.PRNGKey(0))
    std = np.exp(np.asarray(out.logstd.value))
    # sigmoid(x)*(max-min)+min with (max,min)=(0.5,2.0) per reference
    # unpacking order: _max, _min = std_range
    assert std.min() >= min(0.5, 2.0) - 1e-5
    assert std.max() <= max(0.5, 2.0) + 1e-5


def test_gaussian_parameterize_fixed_std_and_mean():
    m = linear.GaussianParameterize(6, 4, std=0.1, mean=0.3, rngs=rngs())
    x = masked(c=6)
    out = m(x, jax.random.PRNGKey(0), temperature=0.0)
    np.testing.assert_allclose(np.asarray(out.mean.value), 0.3, atol=1e-6)
    np.testing.assert_allclose(np.exp(np.asarray(out.logstd.value)), 0.1,
                               rtol=1e-5)


def test_gaussian_parameterize_total_std():
    m = linear.GaussianParameterize(6, 4, total_std=0.2, rngs=rngs())
    x = masked(c=6)
    out = m(x, jax.random.PRNGKey(0))
    std = np.exp(np.asarray(out.logstd.value))
    np.testing.assert_allclose(std.sum(-1), 0.2 * 4, rtol=1e-4)


def test_film():
    m = linear.FiLM(4, in_dim=6, rngs=rngs())
    x = masked(c=4)
    c = masked(c=6, seed=3)
    y = m(x, c)
    assert y.value.shape == (2, 8, 4)


def test_time_aggregation():
    m = linear.TimeAggregation()
    x = masked()
    out = np.asarray(m(x))
    v = np.asarray(x.apply_mask().value)
    expect = v.sum(1) / np.array([8, 5])[:, None]
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_linear_layer_stack():
    hp = Hparams.from_yaml("""
num_layers: 2
layer:
    hidden_dim: 8
    activation: {identifier: GELU}
    norm: {identifier: LayerNorm, eps: 1.0e-6}
""")
    m = linear.LinearLayerStack(hp, input_dim=6, output_dim=3, rngs=rngs())
    out = m(masked(c=6))
    assert out.value.shape == (2, 8, 3)


# ---------------------------------------------------------------- conv
def test_conv1d_causal_matches_torch():
    k = 5
    m = conv.Conv1d(3, 4, k, padding=conv.get_padding(k, causal=True),
                    rngs=rngs())
    tc = torch.nn.Conv1d(3, 4, k, padding=0)
    with torch.no_grad():
        # ours (k, in, out) -> torch (out, in, k)
        tc.weight.copy_(torch.tensor(
            np.asarray(m.kernel[...]).transpose(2, 1, 0)))
        tc.bias.copy_(torch.tensor(np.asarray(m.bias[...])))
    x = np.random.RandomState(0).randn(2, 10, 3).astype(np.float32)
    got = np.asarray(m(jnp.asarray(x)))
    xt = torch.tensor(x).transpose(1, 2)
    xt = F.pad(xt, (2 * ((k - 1) // 2), 0))
    ref = tc(xt).transpose(1, 2).detach().numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_depthwise_conv_matches_torch():
    k = 7
    m = conv.Conv1d(4, 4, k, padding=conv.get_padding(k), groups=4,
                    rngs=rngs())
    tc = torch.nn.Conv1d(4, 4, k, padding=3, groups=4)
    with torch.no_grad():
        tc.weight.copy_(torch.tensor(
            np.asarray(m.kernel[...]).transpose(2, 1, 0)))
        tc.bias.copy_(torch.tensor(np.asarray(m.bias[...])))
    x = np.random.RandomState(0).randn(2, 10, 4).astype(np.float32)
    got = np.asarray(m(jnp.asarray(x)))
    ref = tc(torch.tensor(x).transpose(1, 2)).transpose(1, 2)
    np.testing.assert_allclose(got, ref.detach().numpy(), rtol=1e-4,
                               atol=1e-5)


def test_conv_transpose_matches_torch():
    k, s = 4, 2
    pad = conv.get_padding(k, stride=s, causal=True)  # (2, 0)
    m = conv.ConvTranspose1d(3, 5, k, stride=s, padding=pad, rngs=rngs())
    tc = torch.nn.ConvTranspose1d(3, 5, k, stride=s, padding=0)
    with torch.no_grad():
        # ours (k, out, in) -> torch (in, out, k)
        tc.weight.copy_(torch.tensor(
            np.asarray(m.kernel[...]).transpose(2, 1, 0)))
        tc.bias.copy_(torch.tensor(np.asarray(m.bias[...])))
    x = np.random.RandomState(0).randn(2, 6, 3).astype(np.float32)
    got = np.asarray(m(jnp.asarray(x)))
    full = tc(torch.tensor(x).transpose(1, 2))
    ref = full[..., pad[0]:]
    if pad[1] > 0:
        ref = ref[..., : -pad[1]]
    np.testing.assert_allclose(got, ref.transpose(1, 2).detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def _residual_hp(extra=""):
    return Hparams.from_yaml(f"""
in_channels: 6
hidden_channels: 12
kernel_size: 7
causal_padding: true
norm: {{identifier: InstanceNorm, eps: 1.0e-6}}
activation: {{identifier: ReLU}}
{extra}
""")


def test_residual_block_shapes_and_causality():
    m = conv.ResidualBlock(_residual_hp(), rngs=rngs())
    x = masked(c=6)
    y = m(x)
    assert y.value.shape == x.value.shape
    # causality: changing a late frame must not affect earlier outputs
    x2v = np.asarray(x.value).copy()
    x2v[:, 6:] += 10.0
    y2 = m(Masked.from_lengths(jnp.asarray(x2v), x.lengths))
    np.testing.assert_allclose(np.asarray(y.value)[:, :6],
                               np.asarray(y2.value)[:, :6], atol=1e-5)


def test_conditional_residual_block_concat():
    hp = _residual_hp("condition_type: concat\nin_dim: 3")
    hp.aux_in_channels = 3
    m = conv.ConditionalResidualBlock(hp, rngs=rngs())
    y = m(masked(c=6), masked(c=3, seed=5))
    assert y.value.shape == (2, 8, 6)


def test_temporal_residual_block():
    hp = _residual_hp("time_dim: 16")
    m = conv.TemporalResidualBlock(hp, rngs=rngs())
    t = jnp.asarray(np.random.RandomState(0).randn(2, 16), jnp.float32)
    y = m(masked(c=6), t)
    assert y.value.shape == (2, 8, 6)


def test_bottleneck_resnet_vae_gslm_encoder_config():
    hp = Hparams.from_yamlfile(
        "/root/reference/configs/train/speech/vae-gslm.yaml")
    enc = conv.BottleNeckResNet(hp.model.encoder, input_dim=80,
                                output_dim=4, rngs=rngs())
    x = masked(c=80, t=16, lengths=(16, 10))
    y = enc(x)
    assert y.value.shape == (2, 16, 4)
    assert enc.sample_ratio == 1.0


def test_bottleneck_unet_with_time_and_cond():
    hp = Hparams.from_yamlfile(
        "/root/reference/configs/train/speech/vae-gslm.yaml")
    unet_hp = hp.model.decoder.cond_unet.unet
    unet_hp.time_dim = 256
    unet = conv.BottleNeckResNet(unet_hp, input_dim=80, output_dim=80,
                                 rngs=rngs())
    x = masked(c=80, t=16, lengths=(16, 10))
    c = masked(c=32, t=16, lengths=(16, 10), seed=2)
    t = jnp.asarray(np.random.RandomState(1).randn(2, 256), jnp.float32)
    y = unet(x, c, t)
    assert y.value.shape == (2, 16, 80)


def test_cnn_stack_downsample_ratio():
    hp = Hparams.from_yamlfile(
        "/root/reference/configs/train/speech/vae-gslm.yaml")
    ue = hp.model.utterance_encoder
    m = conv.CNNStack(ue, input_dim=80, output_dim=128, rngs=rngs())
    assert m.sample_ratio == 1.0 / 8.0
    x = masked(c=80, t=16, lengths=(16, 10))
    y = m(x)
    assert y.value.shape == (2, 2, 128)
    assert np.asarray(y.lengths).tolist() == [2, 2]


def test_upsample_downsample_lengths():
    norm_hp = Hparams.from_yaml("identifier: Identity")
    up = conv.Upsample(4, 4, 2, norm_hp, rngs=rngs())
    down = conv.Downsample(4, 4, 2, norm_hp, rngs=rngs())
    x = masked(c=4, t=8, lengths=(8, 5))
    u = up(x)
    assert u.value.shape[1] == 16
    assert np.asarray(u.lengths).tolist() == [16, 10]
    d = down(x)
    assert np.asarray(d.lengths).tolist() == [4, 3]
