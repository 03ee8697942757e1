import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
from flax import nnx

from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.models.speech.lvtr import LVTR
from vae_gslm_tpu.models.vocoder.hfgan import (
    Generator, MultiPeriodDiscriminator, MultiResolutionDiscriminator,
    MultiScaleDiscriminator, discriminator_loss, feature_loss,
    generator_loss)
from vae_gslm_tpu.models.vocoder.hubert import (HuBERT, interpolate_linear,
                                                length_regulate)
from vae_gslm_tpu.models.vocoder.vocoder import load_torch_generator


def rngs(seed=0):
    return nnx.Rngs(seed)


TINY_LVTR = Hparams.from_yaml("""
tokens: {embedding_dim: 8, vocab_size: 11}
latent_dim: 4
encoder:
    identifier: BottleNeckResNet
    num_layers: 2
    resample_rates: [1, 1]
    resample_ksize: [1, 1]
    init_channel: 16
    out_channels: [16, 16]
    hidden_channels: [32, 32]
    final_norm: true
    layer:
        causal_padding: true
        kernel_size: 3
        norm: {identifier: InstanceNorm, eps: 1.0e-6}
        activation: {identifier: ReLU}
decoder:
    diffusion:
        timesteps: 10
        loss_type: l1
        input_scale: 5.0
        objective: pred_noise
        clamp_range: [-3.0, 1.2]
        ddim_sampling_eta: 1.0
        sampling_timesteps: 4
        beta_schedule: {identifier: cosine}
        identifier: ConditionalBottleNeckUNet
    cond_unet:
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
            connection_type: concat
            final_norm: true
            layer:
                causal_padding: true
                kernel_size: 3
                norm: {identifier: InstanceNorm, eps: 1.0e-6}
                activation: {identifier: SiLU}
                condition_type: concat
        time_embedding:
            dim: 16
            maxpos: 10
            activation: {identifier: SiLU}
transformer:
    bias: false
    rpe: {identifier: ALiBi, maxpos: 64}
    num_layers: 2
    layer:
        ffd_size: 32
        dim: 16
        norm: {identifier: RMSNorm, eps: 1.0e-6}
        activation: {identifier: GELU}
        self_attn: {nheads: 4, causal: true}
    flow:
        num_layers: 2
        conditional: true
        layer:
            hidden_dim: 8
            activation: {identifier: GELU}
            mean_only: false
            scale_range: [0.5, 2.0]
            norm: {identifier: LayerNorm, eps: 1.0e-6}
utterance_encoder:
    num_layers: 2
    resample_rates: [-2, -2]
    resample_ksize: [4, 4]
    init_channel: 8
    out_channels: [8, 8]
    layer:
        norm: {identifier: InstanceNorm, eps: 1.0e-6}
        activation: {identifier: ReLU}
    embedding_dim: 8
""")

N_MELS = 10


def _make_model():
    return LVTR(TINY_LVTR, input_dim=N_MELS, rngs=rngs())


def _batch(b=2, t=12):
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(b, t, N_MELS), jnp.float32)
    toks = jnp.asarray(rng.randint(0, 11, (b, t, 1)), jnp.float32)
    x = jnp.concatenate([toks, mel], -1)
    return Masked.from_lengths(x, jnp.asarray([t, t - 3]))


def test_lvtr_forward_stats():
    m = _make_model()
    x = _batch()
    utt = Masked.from_lengths(
        jnp.asarray(np.random.RandomState(1).randn(2, 8, N_MELS),
                    jnp.float32), jnp.asarray([8, 8]))
    out = m(x, jax.random.PRNGKey(0), utterance=utt)
    assert out["log_p"].value.shape == (2, 12, 4)
    assert out["log_q"].value.shape == (2, 12, 4)
    for k in ("rec_loss", "ce_loss", "logstd", "q_logstd"):
        assert np.isfinite(float(out[k])), k
    # padded region masked out of log_p
    assert np.all(np.asarray(out["log_p"].value)[1, 9:] == 0)


def test_lvtr_forward_deterministic_given_key():
    m = _make_model()
    x = _batch()
    utt = Masked.from_lengths(jnp.zeros((2, 8, N_MELS)),
                              jnp.asarray([8, 8]))
    a = m(x, jax.random.PRNGKey(3), utterance=utt)
    b = m(x, jax.random.PRNGKey(3), utterance=utt)
    np.testing.assert_array_equal(np.asarray(a["log_p"].value),
                                  np.asarray(b["log_p"].value))
    assert float(a["rec_loss"]) == float(b["rec_loss"])


def test_lvtr_step_prefill_and_ar():
    m = _make_model()
    b, tp = 2, 6
    x = _batch(b, tp)
    key = jax.random.PRNGKey(0)
    # encode prompt -> [token, latent]
    enc = m.encode(x, key, temperature=1.0)
    assert enc.value.shape == (b, tp, 5)
    max_len = tp + 1 + 4
    caches = m.init_cache(b, max_len, dtype=jnp.float32)
    out, caches = m.step(enc.value, caches, jnp.asarray(0), key,
                         push_init_state=True,
                         init_key=jax.random.PRNGKey(9))
    assert out.shape == (b, tp + 1, 5)
    frame = out[:, -1:]
    pos = tp + 1
    for i in range(3):
        frame, caches = m.step(frame, caches, jnp.asarray(pos + i),
                               jax.random.fold_in(key, i))
        assert frame.shape == (b, 1, 5)
        tok = np.asarray(frame[..., 0])
        assert ((tok >= 0) & (tok < 11)).all()


def test_lvtr_decode_shapes():
    m = _make_model()
    x = _batch(2, 8)
    enc = m.encode(x, jax.random.PRNGKey(0))
    # utterance-conditioned model: decode requires u_c
    utt = Masked.from_lengths(
        jnp.asarray(np.random.RandomState(2).randn(2, 8, N_MELS),
                    jnp.float32), jnp.asarray([8, 8]))
    u_c = m.encode_utterance(
        Masked.full(jnp.concatenate(
            [jnp.zeros((2, 8, 1)), utt.value], -1)))
    mel = m.decode(enc, jax.random.PRNGKey(1), u_c=u_c)
    assert mel.value.shape == (2, 8, N_MELS)
    assert np.isfinite(np.asarray(mel.value)).all()


def test_lvtr_likelihood():
    m = _make_model()
    x = _batch(2, 8)
    ll = m.likelihood(x, jax.random.PRNGKey(0))
    assert ll.shape == (2,)
    assert np.isfinite(np.asarray(ll)).all()
    assert np.asarray(ll).max() <= 0.0  # token log-probs


# -------------------------------------------------------------- hifigan
HFG_HP = Hparams.from_yaml("""
weight_norm: true
upsample_rates: [5, 4]
upsample_kernel_sizes: [10, 8]
upsample_initial_channel: 16
resblock_kernel_sizes: [3, 7]
resblock_dilation_sizes:
    - [1, 3, 5]
    - [1, 3, 5]
in_channels: 10
kernel_size: 7
""")


class TorchResBlock(nn.Module):
    def __init__(self, ch, k, dil):
        super().__init__()
        from torch.nn.utils import weight_norm

        def gp(k, d=1):
            return int(((k - 1) * d + 1 - 1) / 2)
        self.convs1 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, 1, dilation=d,
                                  padding=gp(k, d))) for d in dil])
        self.convs2 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, 1, padding=gp(k)))
            for _ in dil])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = F.leaky_relu(x, 0.1)
            xt = c1(xt)
            xt = F.leaky_relu(xt, 0.1)
            xt = c2(xt)
            x = xt + x
        return x


class TorchGenerator(nn.Module):
    def __init__(self, hp):
        super().__init__()
        from torch.nn.utils import weight_norm
        uic = hp.upsample_initial_channel
        self.num_kernels = len(hp.resblock_kernel_sizes)
        self.num_upsamples = len(hp.upsample_rates)
        self.conv_pre = weight_norm(
            nn.Conv1d(hp.in_channels, uic, hp.kernel_size, 1, padding=3))
        self.ups = nn.ModuleList()
        for i, (u, k) in enumerate(zip(hp.upsample_rates,
                                       hp.upsample_kernel_sizes)):
            self.ups.append(weight_norm(nn.ConvTranspose1d(
                uic // (2 ** i), uic // (2 ** (i + 1)), k, u,
                padding=(u // 2 + u % 2), output_padding=u % 2)))
        self.resblocks = nn.ModuleList()
        for i in range(len(self.ups)):
            ch = uic // 2 ** (i + 1)
            for kk, dd in zip(hp.resblock_kernel_sizes,
                              hp.resblock_dilation_sizes):
                self.resblocks.append(TorchResBlock(ch, kk, dd))
        self.conv_post = weight_norm(nn.Conv1d(ch, 1, hp.kernel_size, 1,
                                               padding=3))

    def forward(self, x):
        x = self.conv_pre(x)
        for i in range(self.num_upsamples):
            x = F.leaky_relu(x, 0.1)
            x = self.ups[i](x)
            xs = None
            for j in range(self.num_kernels):
                r = self.resblocks[i * self.num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / self.num_kernels
        x = F.leaky_relu(x)
        x = self.conv_post(x)
        return torch.tanh(x).squeeze(1)


def test_generator_matches_torch_reference():
    torch.manual_seed(0)
    tg = TorchGenerator(HFG_HP)
    tg.eval()
    gen = Generator(HFG_HP, rngs=rngs())
    load_torch_generator(gen, tg.state_dict())
    mel = np.random.RandomState(0).randn(2, 12, 10).astype(np.float32)
    got = gen(Masked.from_lengths(jnp.asarray(mel),
                                  jnp.asarray([12, 12])))
    assert got.value.shape == (2, 12 * 20)
    with torch.no_grad():
        ref = tg(torch.tensor(mel).transpose(1, 2)).numpy()
    np.testing.assert_allclose(np.asarray(got.value), ref, rtol=1e-3,
                               atol=1e-4)
    # lengths scaled by total upsample
    np.testing.assert_array_equal(np.asarray(got.lengths), [240, 240])
    # weight-norm fold leaves output unchanged
    gen.remove_weight_norm()
    got2 = gen(Masked.from_lengths(jnp.asarray(mel),
                                   jnp.asarray([12, 12])))
    np.testing.assert_allclose(np.asarray(got2.value),
                               np.asarray(got.value), atol=1e-5)


def test_generator_packed_small_channel_path():
    """The space-to-depth packed-conv inference path (enabled after
    ``remove_weight_norm``) matches the reference-shaped graph exactly,
    including lengths not divisible by the pack factor and the
    large-batch gate (``hfgan.py`` round-3 fast path)."""
    import os

    gen = Generator(HFG_HP, rngs=rngs())
    gen.remove_weight_norm()
    for t in (12, 11):  # 11*20 = 220 not divisible by r=16 at ch=8
        mel = np.random.RandomState(1).randn(2, t, 10).astype(np.float32)
        m = Masked.from_lengths(jnp.asarray(mel), jnp.asarray([t, t]))
        os.environ["VAE_GSLM_NO_PACKED_VOCODER"] = "1"
        try:
            ref = gen(m).value
        finally:
            os.environ.pop("VAE_GSLM_NO_PACKED_VOCODER")
        got = gen(m).value
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)
    # batch above the gate threshold falls back to the unpacked graph
    os.environ["VAE_GSLM_PACK_VOCODER_MAX_BATCH"] = "1"
    try:
        gated = gen(m).value
    finally:
        os.environ.pop("VAE_GSLM_PACK_VOCODER_MAX_BATCH")
    np.testing.assert_allclose(np.asarray(gated), np.asarray(ref),
                               atol=2e-5)


def test_discriminators_and_losses():
    wave = jnp.asarray(np.random.RandomState(0).randn(2, 800),
                       jnp.float32) * 0.1
    fake = wave + 0.01
    mpd = MultiPeriodDiscriminator(
        Hparams(periods=[2, 3], weight_norm=True), rngs=rngs())
    msd = MultiScaleDiscriminator(
        Hparams(num_scales=2, weight_norm=True), rngs=rngs())
    mrd = MultiResolutionDiscriminator(
        Hparams(resolutions=[[128, 32, 64], [256, 64, 128]],
                weight_norm=True), rngs=rngs())
    for disc in (mpd, msd, mrd):
        r_out, r_fmap = disc(wave)
        g_out, g_fmap = disc(fake)
        d = discriminator_loss(r_out, g_out)
        g = generator_loss(g_out)
        f = feature_loss(r_fmap, g_fmap)
        for v in (d, g, f):
            assert np.isfinite(float(v))
    assert feature_loss(r_fmap, r_fmap) == 0.0


# --------------------------------------------------------------- hubert
def test_length_regulate():
    x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 3, 2))
    dur = jnp.asarray([[2, 1, 3]])
    out = length_regulate(x, dur, max_len=8)
    v = np.asarray(out.value)
    assert np.asarray(out.lengths).tolist() == [6]
    np.testing.assert_array_equal(
        v[0, :6, 0], [0, 0, 2, 4, 4, 4])
    assert np.all(v[0, 6:] == 0)


def test_interpolate_linear_matches_torch():
    x = np.random.RandomState(0).randn(2, 10, 3).astype(np.float32)
    m = Masked.from_lengths(jnp.asarray(x), jnp.asarray([10, 7]))
    out = interpolate_linear(m, 2.0)
    ref = F.interpolate(torch.tensor(x).transpose(1, 2), size=20,
                        mode="linear").transpose(1, 2).numpy()
    np.testing.assert_allclose(np.asarray(out.value), ref, rtol=1e-4,
                               atol=1e-5)
    assert np.asarray(out.lengths).tolist() == [20, 14]


def test_hubert_decoder_forward_and_decode():
    hp = Hparams.from_yaml("""
embedding_dim: 8
hubert: {vocab_size: 11, deduplicate: false, sample_rate: 50}
embed_encoder:
    num_layers: 2
    layer:
        in_channels: 8
        hidden_channels: 16
        kernel_size: 3
        causal_padding: true
        norm: {identifier: InstanceNorm, eps: 1.0e-6}
        activation: {identifier: ReLU}
decoder:
    diffusion:
        timesteps: 10
        sampling_timesteps: 3
        loss_type: l1
        objective: pred_noise
        beta_schedule: {identifier: cosine}
    cond_unet:
        unet:
            condition_dim: 8
            num_layers: 2
            resample_rates: [1, 1]
            resample_ksize: [1, 1]
            init_channel: 16
            out_channels: [16, 16]
            hidden_channels: [32, 32]
            conditional: [true, true]
            final_norm: true
            layer:
                kernel_size: 3
                norm: {identifier: InstanceNorm, eps: 1.0e-6}
                activation: {identifier: SiLU}
                condition_type: concat
        time_embedding:
            dim: 16
            maxpos: 10
            activation: {identifier: SiLU}
""")
    m = HuBERT(hp, input_dim=N_MELS, mel_sample_rate=50.0, rngs=rngs())
    toks = Masked.from_lengths(
        jnp.asarray(np.random.RandomState(0).randint(0, 11, (2, 9))),
        jnp.asarray([9, 6]))
    mel = Masked.from_lengths(
        jnp.asarray(np.random.RandomState(1).randn(2, 9, N_MELS),
                    jnp.float32), jnp.asarray([9, 6]))
    out = m(toks, mel, jax.random.PRNGKey(0))
    assert np.isfinite(float(out["diffusion_loss"]))
    cond = m.encode(toks)
    dec = m.decode(cond, jax.random.PRNGKey(1))
    assert dec.value.shape == (2, 9, N_MELS)
