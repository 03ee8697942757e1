"""Golden side-by-side parity against the reference's OWN torch code.

Unlike the per-module torch-parity tests (which reimplement torch
semantics inline), these tests import ``/root/reference``'s actual
modules (via ``tests/reference_compat.py`` — lightning/torchaudio
typing stubs only), build the reference models under the installed
torch, convert their ``state_dict`` through
``vae_gslm_tpu/models/convert_torch.py``, and require matching
outputs.  This is the strongest offline correctness claim available:
"our program matches the reference program" on its deployment
checkpoint format.

Parity targets (reference file:line):
  * LVTR likelihood (tokens + flow): models/speech/lvtr.py:337-388
  * LVTR likelihood (continuous + flow log_p branch): same
  * LVTR AR step / KV cache decode loop: models/speech/lvtr.py:227-286
    + trainers/speech/sampler.py:50-62
  * LVTR diffusion denoiser: modules/diffusion/ddpm.py:245-255
  * HiFi-GAN Generator: models/vocoder/hfgan.py:91-163
  * HuBERT token→mel: models/vocoder/hubert.py:42-168
  * DiscreteAR likelihood: models/speech/discrete.py:131-257
  * masked losses: training_lib/losses.py:9-73
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
from flax import nnx

from tests.reference_compat import ref_import, ref_hparams
from tests.test_models import HFG_HP, N_MELS, TINY_LVTR
from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.models.convert_torch import (load_torch_discrete_ar,
                                               load_torch_hubert_decoder,
                                               load_torch_lvtr)
from vae_gslm_tpu.models.speech.lvtr import LVTR

ATOL = 2e-5
RTOL = 1e-4


def allclose(name, ref, ours, atol=ATOL, rtol=RTOL):
    ref = np.asarray(ref.detach().numpy() if torch.is_tensor(ref)
                     else ref)
    ours = np.asarray(ours)
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=atol,
                               err_msg=name)


def _lvtr_pair(hp_ours, seed=0):
    """Reference LVTR + our LVTR with the reference's weights."""
    ref_mod = ref_import("models.speech.lvtr")
    torch.manual_seed(seed)
    ref = ref_mod.LVTR(ref_hparams(hp_ours), input_dim=N_MELS)
    ref.eval()
    ours = LVTR(hp_ours, input_dim=N_MELS, rngs=nnx.Rngs(seed + 99))
    load_torch_lvtr(ours, ref.state_dict())
    return ref, ours


def _pin_init(ref, ours, init):
    """Pin both models' random uniform initial AR state to the same
    value (the one sampled quantity in the likelihood paths)."""
    tinit = torch.tensor(init)
    jinit = jnp.asarray(init)
    ref.initial_state = lambda bsize, device=None, nfeat=None: tinit
    ours.initial_state = lambda key, bsize, nfeat=None: jinit


def _mel_tok_batch(b=2, t=12, vocab=11, seed=0):
    rng = np.random.RandomState(seed)
    mel = rng.randn(b, t, N_MELS).astype(np.float32)
    toks = rng.randint(0, vocab, (b, t, 1)).astype(np.float32)
    x = np.concatenate([toks, mel], -1)
    lengths = np.asarray([t, t - 3][:b], np.int64)
    return x, lengths


def _tm(x, lengths):
    tm = ref_import("utils.tensormask")
    return tm.TensorMask.fromlength(torch.tensor(x),
                                    torch.tensor(lengths))


def _mj(x, lengths):
    return Masked.from_lengths(jnp.asarray(x), jnp.asarray(lengths))


# ------------------------------------------------------------------ LVTR
def test_lvtr_likelihood_parity_tokens_flow():
    ref, ours = _lvtr_pair(TINY_LVTR)
    x, lengths = _mel_tok_batch()
    init = (np.random.RandomState(1).rand(2, 1, 8) * 2 - 1).astype(
        np.float32)
    _pin_init(ref, ours, init)
    with torch.no_grad():
        ll_ref = ref.likelihood(_tm(x, lengths), temperature=0.0)
    ll_ours = ours.likelihood(_mj(x, lengths), jax.random.PRNGKey(0),
                              temperature=0.0)
    allclose("likelihood(tokens)", ll_ref, ll_ours)


def _no_token_hp():
    d = TINY_LVTR.to_dict()
    del d["tokens"]
    import json
    return Hparams.from_json(json.dumps(d))


def test_lvtr_likelihood_parity_continuous_flow():
    """No-token config exercises the flow-corrected continuous log_p
    branch that the token branch overrides (lvtr.py:356-375)."""
    hp = _no_token_hp()
    ref, ours = _lvtr_pair(hp, seed=3)
    x, lengths = _mel_tok_batch()
    x = x[..., 1:]  # mel only
    init = (np.random.RandomState(2).rand(2, 1, 4) * 2 - 1).astype(
        np.float32)
    _pin_init(ref, ours, init)
    with torch.no_grad():
        ll_ref = ref.likelihood(_tm(x, lengths), temperature=0.0)
    ll_ours = ours.likelihood(_mj(x, lengths), jax.random.PRNGKey(0),
                              temperature=0.0)
    allclose("likelihood(continuous)", ll_ref, ll_ours)


def test_lvtr_ar_step_kv_cache_parity():
    """Multi-step AR decode: prefill with the prompt (+pinned initial
    state), then 4 single-frame steps threading the reference's
    dynamic past_kv against our static KV cache.  temperature=0 makes
    latents deterministic; token_temperature→0 makes the token
    multinomial an argmax on both sides (trainers/speech/sampler.py:50-62)."""
    ref, ours = _lvtr_pair(TINY_LVTR, seed=5)
    b, tp, nsteps = 2, 5, 4
    x, _ = _mel_tok_batch(b, tp)
    lengths = np.asarray([tp, tp], np.int64)
    init = (np.random.RandomState(3).rand(b, 1, 8) * 2 - 1).astype(
        np.float32)
    _pin_init(ref, ours, init)

    with torch.no_grad():
        enc_r = ref.encode(_tm(x, lengths), temperature=0.0)
    enc_j = ours.encode(_mj(x, lengths), jax.random.PRNGKey(0),
                        temperature=0.0)
    allclose("encode(temp0)", enc_r.value, enc_j.value)

    # reference: dynamic KV threading
    with torch.no_grad():
        out_r = ref.step(enc_r.value, past_kv=None, temperature=0.0,
                         token_temperature=1e-4, push_init_state=True)
        frames_r = [out_r["output"][:, -1:]]
        kv = out_r["kv"]
        for _ in range(nsteps - 1):
            out_r = ref.step(frames_r[-1], past_kv=kv, temperature=0.0,
                             token_temperature=1e-4)
            kv = out_r["kv"]
            frames_r.append(out_r["output"])

    # ours: static cache + positions
    max_len = tp + 1 + nsteps
    caches = ours.init_cache(b, max_len, dtype=jnp.float32)
    key = jax.random.PRNGKey(7)
    out_j, caches = ours.step(enc_j.value, caches, jnp.asarray(0), key,
                              temperature=0.0, token_temperature=1e-4,
                              push_init_state=True,
                              init_key=jax.random.PRNGKey(1))
    frames_j = [out_j[:, -1:]]
    pos = tp + 1
    for i in range(nsteps - 1):
        f, caches = ours.step(frames_j[-1], caches, jnp.asarray(pos + i),
                              jax.random.fold_in(key, i),
                              temperature=0.0, token_temperature=1e-4)
        frames_j.append(f)

    for i, (fr, fj) in enumerate(zip(frames_r, frames_j)):
        fr = fr.detach().numpy()
        fj = np.asarray(fj)
        np.testing.assert_array_equal(fj[..., 0], fr[..., 0],
                                      err_msg=f"step {i} token")
        allclose(f"step {i} latent", fr[..., 1:], fj[..., 1:],
                 atol=1e-4)


def test_lvtr_ar_long_horizon_windowed_parity(monkeypatch):
    """Long-horizon golden rollout (VERDICT r3 item 6): the PRODUCT
    sampler — ``ARTRSampler``'s per-layer windowed segmented-scan
    decode, the machinery the 500-step flagship run uses — must
    reproduce the reference's dynamic-concat AR loop
    (trainers/speech/sampler.py:50-62) token-for-token across 200
    steps, crossing three 64-frame attention-window rollovers
    (``_n_segments(200) == 4``).  temperature=0 pins the latents;
    token_temperature→0 makes the multinomial an argmax on both
    sides; the uniform initial AR state is pinned on both."""
    from vae_gslm_tpu.inference.speech.sampler import (ARTRSampler,
                                                       _n_segments)

    hp = Hparams.from_dict(TINY_LVTR.to_dict())
    hp.transformer.rpe.maxpos = 512      # 205 positions > TINY's 64
    ref, ours = _lvtr_pair(hp, seed=13)
    b, tp, nsteps = 2, 5, 200
    x, _ = _mel_tok_batch(b, tp, seed=7)
    lengths = np.asarray([tp, tp], np.int64)
    init = (np.random.RandomState(5).rand(b, 1, 8) * 2 - 1).astype(
        np.float32)
    tinit = torch.tensor(init)
    ref.initial_state = lambda bsize, device=None, nfeat=None: tinit
    jinit = jnp.asarray(init)
    # Class-level pin: ARTRSampler's jitted run rebuilds the model via
    # nnx.merge, so an instance-attribute pin would not survive.
    monkeypatch.setattr(
        LVTR, "initial_state",
        lambda self, key, bsize, nfeat=None: jinit)

    with torch.no_grad():
        enc_r = ref.encode(_tm(x, lengths), temperature=0.0)
        out_r = ref.step(enc_r.value, past_kv=None, temperature=0.0,
                         token_temperature=1e-4, push_init_state=True)
        frames_r = [out_r["output"][:, -1:]]
        kv = out_r["kv"]
        for _ in range(nsteps - 1):
            out_r = ref.step(frames_r[-1], past_kv=kv, temperature=0.0,
                             token_temperature=1e-4)
            kv = out_r["kv"]
            frames_r.append(out_r["output"])
    gen_r = torch.cat(frames_r, dim=1).numpy()      # (b, nsteps, C)

    monkeypatch.setenv("VAE_GSLM_HYBRID_DECODE", "0")
    monkeypatch.setenv("VAE_GSLM_MEGA_DECODE", "0")
    assert _n_segments(nsteps) == 4                 # window rollovers
    sampler = ARTRSampler(ours)                     # fp32 KV cache
    out = sampler(nsteps, _mj(x, lengths), jax.random.PRNGKey(0),
                  temperature=0.0, token_temperature=1e-4,
                  encoder_temperature=0.0)
    gen_j = np.asarray(out["frames"].value)[:, tp:]
    assert gen_j.shape == gen_r.shape
    np.testing.assert_array_equal(gen_j[..., 0], gen_r[..., 0],
                                  err_msg="200-step token stream")
    # fp32 drift compounds through 200 recursive steps; budget is the
    # observed platform (torch-CPU vs XLA-CPU) drift with margin.
    allclose("200-step latents", gen_r[..., 1:], gen_j[..., 1:],
             atol=2e-3, rtol=1e-2)


def test_lvtr_ar_long_horizon_mega_golden(monkeypatch):
    """Long-horizon golden THROUGH THE MEGA SERVING PATH (VERDICT r4
    item 4): the one-kernel-per-step trunk decode with int8 weights +
    the int8 three-tier cold/tail/stage cache (``ops/mega_step.py``,
    forced via VAE_GSLM_MEGA_DECODE=1, kernel in interpret mode on
    CPU) vs the reference's dynamic-concat torch AR loop
    (trainers/speech/sampler.py:50-62) — 150 steps at temperature 0,
    crossing ~18 8-row stage→tail merges and the IN-GENERATION
    tail→cold flush at step ~121 (prefill 7 rows, flush at pos 128).

    The mega path quantizes by design, so the assert is a div@-style
    bound rather than the fp path's exact 200-step equality
    (test_lvtr_ar_long_horizon_windowed_parity): measured agreement
    on this seed is 1.000 with first-32-step latent error 3.4e-3;
    the budget below carries 4x margin for platform drift."""
    from tests.test_lvtr_step_parity import _mega_lvtr_hp
    from vae_gslm_tpu.inference.speech.sampler import ARTRSampler

    hp = _mega_lvtr_hp()
    ref, ours = _lvtr_pair(hp, seed=21)
    b, tp, nsteps = 2, 6, 150
    x, _ = _mel_tok_batch(b, tp, seed=7)
    lengths = np.asarray([tp, tp], np.int64)
    init = (np.random.RandomState(5).rand(b, 1, 8) * 2 - 1).astype(
        np.float32)
    tinit = torch.tensor(init)
    ref.initial_state = lambda bsize, device=None, nfeat=None: tinit
    jinit = jnp.asarray(init)
    monkeypatch.setattr(
        LVTR, "initial_state",
        lambda self, key, bsize, nfeat=None: jinit)

    with torch.no_grad():
        enc_r = ref.encode(_tm(x, lengths), temperature=0.0)
        out_r = ref.step(enc_r.value, past_kv=None, temperature=0.0,
                         token_temperature=1e-4, push_init_state=True)
        frames_r = [out_r["output"][:, -1:]]
        kv = out_r["kv"]
        for _ in range(nsteps - 1):
            out_r = ref.step(frames_r[-1], past_kv=kv,
                             temperature=0.0, token_temperature=1e-4)
            kv = out_r["kv"]
            frames_r.append(out_r["output"])
    gen_r = torch.cat(frames_r, dim=1).numpy()

    monkeypatch.setenv("VAE_GSLM_MEGA_DECODE", "1")
    monkeypatch.setenv("VAE_GSLM_HYBRID_DECODE", "0")
    sampler = ARTRSampler(ours, kv_dtype=jnp.int8,
                          quantize_weights=True)
    assert ours.transformer.build_mega_decode() is not None
    out = sampler(nsteps, _mj(x, lengths), jax.random.PRNGKey(0),
                  temperature=0.0, token_temperature=1e-4,
                  encoder_temperature=0.0)
    gen_j = np.asarray(out["frames"].value)[:, tp:]
    assert gen_j.shape == gen_r.shape

    tok_r, tok_j = gen_r[..., 0], gen_j[..., 0]
    neq = tok_r != tok_j
    first = np.where(neq.any(1), neq.argmax(1), nsteps)
    # tokens must survive past the step-121 flush on every sequence
    assert first.min() >= 135, f"div@ {first} (flush at ~121)"
    assert (tok_r == tok_j).mean() >= 0.95
    # pre-chaos latent budget (int8 weight + cache quantization)
    lat_err = np.abs(gen_j[:, :32, 1:] - gen_r[:, :32, 1:]).max()
    assert lat_err < 1.5e-2, lat_err


def test_lvtr_diffusion_denoiser_parity():
    """Deterministic denoiser prediction at fixed (x_t, t, cond)
    (modules/diffusion/ddpm.py:245-255)."""
    ref, ours = _lvtr_pair(TINY_LVTR, seed=8)
    rng = np.random.RandomState(4)
    b, t = 2, 10
    cond_in = ref.decoder.model.cond_net.in_features
    x = rng.randn(b, t, N_MELS).astype(np.float32)
    cond = rng.randn(b, t, cond_in).astype(np.float32)
    tt = np.asarray([3, 7], np.int64)
    lengths = np.asarray([t, t - 2], np.int64)
    with torch.no_grad():
        pn_r, x0_r, *_ = ref.decoder.model_predictions(
            _tm(x, lengths), torch.tensor(tt), _tm(cond, lengths))
    pn_j, x0_j = ours.decoder.model_predictions(
        _mj(x, lengths), jnp.asarray(tt), _mj(cond, lengths))
    allclose("pred_noise", pn_r.value, pn_j.value, atol=1e-4)
    allclose("pred_x0", x0_r.value, x0_j.value, atol=1e-4)


# ------------------------------------------------------------- HiFi-GAN
def test_hfgan_generator_parity():
    hfgan_ref = ref_import("models.vocoder.hfgan")
    from vae_gslm_tpu.models.vocoder.hfgan import Generator
    from vae_gslm_tpu.models.vocoder.vocoder import load_torch_generator

    torch.manual_seed(11)
    ref = hfgan_ref.Generator(ref_hparams(HFG_HP))
    ref.eval()
    ours = Generator(HFG_HP, rngs=nnx.Rngs(0))
    load_torch_generator(ours, ref.state_dict())

    rng = np.random.RandomState(5)
    b, t = 2, 17
    mel = rng.randn(b, t, 10).astype(np.float32)
    lengths = np.asarray([t, t - 4], np.int64)
    with torch.no_grad():
        y_r = ref(_tm(mel, lengths))
    y_j = ours(_mj(mel, lengths))
    assert np.array_equal(np.asarray(y_j.lengths),
                          y_r.length.numpy())
    allclose("generator wave", y_r.value, y_j.value, atol=1e-5)


# ------------------------------------------------- HuBERT token→mel
HUB_HP = Hparams.from_yaml("""
embedding_dim: 8
hubert: {vocab_size: 32, deduplicate: false, sample_rate: 50}
embed_encoder:
    num_layers: 1
    layer:
        in_channels: 8
        hidden_channels: 16
        kernel_size: 3
        causal_padding: true
        norm: {identifier: InstanceNorm, eps: 1.0e-6}
        activation: {identifier: ReLU}
decoder:
    diffusion:
        timesteps: 8
        sampling_timesteps: 3
        loss_type: l1
        objective: pred_noise
        beta_schedule: {identifier: cosine}
    cond_unet:
        unet:
            condition_dim: 8
            num_layers: 1
            resample_rates: [1]
            resample_ksize: [1]
            init_channel: 16
            out_channels: [16]
            hidden_channels: [32]
            conditional: [true]
            final_norm: true
            layer:
                kernel_size: 3
                norm: {identifier: InstanceNorm, eps: 1.0e-6}
                activation: {identifier: SiLU}
                condition_type: concat
        time_embedding:
            dim: 16
            maxpos: 8
            activation: {identifier: SiLU}
""")


def test_hubert_decoder_parity():
    hub_ref = ref_import("models.vocoder.hubert")
    from vae_gslm_tpu.models.vocoder.hubert import HuBERT

    torch.manual_seed(13)
    ref = hub_ref.HuBERT(ref_hparams(HUB_HP), input_dim=N_MELS,
                         mel_sample_rate=50)
    ref.eval()
    ours = HuBERT(HUB_HP, input_dim=N_MELS, mel_sample_rate=50,
                  rngs=nnx.Rngs(0))
    load_torch_hubert_decoder(ours, ref.state_dict())

    rng = np.random.RandomState(6)
    b, t = 2, 9
    toks = rng.randint(0, 32, (b, t)).astype(np.int64)
    lengths = np.asarray([t, t - 2], np.int64)
    tm = ref_import("utils.tensormask")
    with torch.no_grad():
        cond_r = ref.embed_encoder(
            ref.embedding(tm.TensorMask.fromlength(
                torch.tensor(toks), torch.tensor(lengths))))
    cond_j = ours.embed_encoder(
        ours.embedding(Masked.from_lengths(jnp.asarray(toks),
                                           jnp.asarray(lengths))))
    allclose("hubert condition", cond_r.value, cond_j.value)

    # denoiser head at fixed (x_t, t, cond)
    x = rng.randn(b, t, N_MELS).astype(np.float32)
    tt = np.asarray([2, 5], np.int64)
    with torch.no_grad():
        pn_r, x0_r, *_ = ref.decoder.model_predictions(
            _tm(x, lengths), torch.tensor(tt),
            tm.TensorMask(cond_r.value, cond_r.mask))
    pn_j, x0_j = ours.decoder.model_predictions(
        _mj(x, lengths), jnp.asarray(tt),
        Masked(cond_j.value, cond_j.lengths, 1))
    allclose("hubert pred_noise", pn_r.value, pn_j.value, atol=1e-4)
    allclose("hubert pred_x0", x0_r.value, x0_j.value, atol=1e-4)


# ------------------------------------------------------------ DiscreteAR
DISC_HP = Hparams.from_yaml("""
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
""")
DISC_VQ = Hparams(num_quantizers=1, codebook_size=32, dim=8)


class _DummyCodec:
    """Stands in for HuBERTIO: encode_mel is documented identity
    (models/vocoder/vocoder.py:114-119)."""

    def encode_mel(self, x):
        return x

    def parameters(self):
        return []


def test_discrete_ar_likelihood_parity():
    disc_ref = ref_import("models.speech.discrete")
    from vae_gslm_tpu.models.speech.discrete import DiscreteAR

    torch.manual_seed(17)
    ref = disc_ref.DiscreteAR(ref_hparams(DISC_HP),
                              ref_hparams(DISC_VQ))
    ref.soundstream = _DummyCodec()
    ref.eval()
    ours = DiscreteAR(DISC_HP, DISC_VQ, rngs=nnx.Rngs(0))
    load_torch_discrete_ar(ours, ref.state_dict())

    rng = np.random.RandomState(7)
    b, t = 2, 11
    toks = rng.randint(0, 32, (b, t)).astype(np.int64)
    lengths = np.asarray([t, t - 3], np.int64)
    tm = ref_import("utils.tensormask")
    with torch.no_grad():
        ll_r = ref.likelihood(tm.TensorMask.fromlength(
            torch.tensor(toks), torch.tensor(lengths)))
    ll_j = ours.likelihood(Masked.from_lengths(jnp.asarray(toks),
                                               jnp.asarray(lengths)))
    allclose("discrete likelihood", ll_r, ll_j)


# --------------------------------------------------------------- losses
def test_masked_losses_parity():
    losses_ref = ref_import("training_lib.losses")
    from vae_gslm_tpu.core import losses as losses_ours

    tm = ref_import("utils.tensormask")
    rng = np.random.RandomState(8)
    b, t, c = 3, 10, 6
    x = rng.randn(b, t, c).astype(np.float32)
    y = rng.randn(b, t, c).astype(np.float32)
    lengths = np.asarray([t, t - 2, t - 5], np.int64)

    for fn_r, fn_j in ((losses_ref.masked_l1_loss,
                        losses_ours.masked_l1_loss),
                       (losses_ref.masked_l2_loss,
                        losses_ours.masked_l2_loss)):
        with torch.no_grad():
            lr = fn_r(_tm(x, lengths), _tm(y, lengths))
        lj = fn_j(_mj(x, lengths), _mj(y, lengths))
        allclose(fn_r.__name__, lr, lj)

    logits = rng.randn(b, t, 9).astype(np.float32)
    labels = rng.randint(0, 9, (b, t)).astype(np.int64)
    with torch.no_grad():
        ce_r = losses_ref.masked_ce_loss(
            _tm(logits, lengths),
            tm.TensorMask.fromlength(torch.tensor(labels),
                                     torch.tensor(lengths)))
    ce_j = losses_ours.masked_ce_loss(
        _mj(logits, lengths),
        Masked.from_lengths(jnp.asarray(labels), jnp.asarray(lengths)))
    allclose("masked_ce_loss", ce_r, ce_j)


# ---------------------------------------------------------------- LVTTS
LVTTS_HP = Hparams.from_yaml("""
latent_dim: 4
text:
    embedding_dim: 8
    encoder:
        bias: false
        num_layers: 1
        rpe: {identifier: ALiBi, maxpos: 64}
        layer:
            ffd_size: 32
            dim: 16
            norm: {identifier: RMSNorm, eps: 1.0e-6}
            activation: {identifier: GELU}
            self_attn: {nheads: 4, causal: false}
eos:
    num_layers: 1
    layer:
        hidden_dim: 16
        activation: {identifier: GELU}
        norm: {identifier: LayerNorm, eps: 1.0e-6}
spkr:
    embedding_dim: 8
    num_layers: 1
    resample_rates: [-2]
    resample_ksize: [4]
    init_channel: 16
    out_channels: [16]
    hidden_channels: [32]
    layer:
        kernel_size: 3
        norm: {identifier: InstanceNorm, eps: 1.0e-6}
        activation: {identifier: ReLU}
encoder:
    identifier: BottleNeckResNet
    num_layers: 1
    resample_rates: [1]
    resample_ksize: [1]
    init_channel: 16
    out_channels: [16]
    hidden_channels: [32]
    final_norm: true
    layer:
        causal_padding: true
        kernel_size: 3
        norm: {identifier: InstanceNorm, eps: 1.0e-6}
        activation: {identifier: ReLU}
decoder:
    diffusion:
        timesteps: 8
        sampling_timesteps: 3
        loss_type: l1
        input_scale: 5.0
        objective: pred_noise
        clamp_range: [-3.0, 1.2]
        beta_schedule: {identifier: cosine}
        identifier: ConditionalBottleNeckUNet
    cond_unet:
        unet:
            condition_dim: 8
            num_layers: 1
            resample_rates: [1]
            resample_ksize: [1]
            init_channel: 16
            out_channels: [16]
            hidden_channels: [32]
            conditional: [true]
            final_norm: true
            layer:
                causal_padding: true
                kernel_size: 3
                norm: {identifier: InstanceNorm, eps: 1.0e-6}
                activation: {identifier: SiLU}
                condition_type: concat
        time_embedding:
            dim: 16
            maxpos: 8
            activation: {identifier: SiLU}
transformer:
    bias: false
    rpe: {identifier: ALiBi, maxpos: 64}
    num_layers: 1
    layer:
        ffd_size: 32
        dim: 16
        norm: {identifier: RMSNorm, eps: 1.0e-6}
        activation: {identifier: GELU}
        self_attn: {nheads: 4, causal: true}
        cross_attn: {nheads: 4}
""")


def test_lvtts_parity():
    """Text encoder + speaker embedding + cross-attention trunk + eos
    head against the reference's own LVTTS
    (models/tts/lvtr.py:15-95)."""
    from vae_gslm_tpu.data.symbols import Symbols
    from vae_gslm_tpu.models.convert_torch import load_torch_lvtts
    from vae_gslm_tpu.models.tts.lvtr import LVTTS

    lv_ref = ref_import("models.tts.lvtr")
    ref_sym_mod = ref_import("data.symbols")
    tm = ref_import("utils.tensormask")

    syms = {"a", "b", "c", "hello", "world"}
    our_sym = Symbols(syms, " ")
    ref_sym = ref_sym_mod.Symbols(syms, " ")
    assert our_sym.num_symbols == ref_sym.num_symbols

    torch.manual_seed(23)
    ref = lv_ref.LVTTS(ref_hparams(LVTTS_HP), ref_sym,
                       input_dim=N_MELS)
    ref.eval()
    ours = LVTTS(LVTTS_HP, our_sym, input_dim=N_MELS,
                 rngs=nnx.Rngs(0))
    load_torch_lvtts(ours, ref.state_dict())

    rng = np.random.RandomState(9)
    b, tt, ts = 2, 6, 12
    text_ids = rng.randint(2, our_sym.num_symbols - 1, (b, tt))
    spkr = rng.randn(b, ts, N_MELS).astype(np.float32)
    t_len = np.asarray([tt, tt - 2], np.int64)
    s_len = np.asarray([ts, ts - 3], np.int64)

    with torch.no_grad():
        (text_r, spkr_r) = ref.encode_condition(
            tm.TensorMask.fromlength(torch.tensor(text_ids),
                                     torch.tensor(t_len)),
            tm.TensorMask.fromlength(torch.tensor(spkr),
                                     torch.tensor(s_len)))
    text_j, spkr_j = ours.encode_condition(
        Masked.from_lengths(jnp.asarray(text_ids), jnp.asarray(t_len)),
        Masked.from_lengths(jnp.asarray(spkr), jnp.asarray(s_len)))
    allclose("text memory", text_r.value, text_j.value)
    allclose("spkr embedding", spkr_r, spkr_j)

    # cross-attention trunk + eos head on a fixed trunk input
    # (trunk input dim = latent_dim: the stack's in-linear maps 4->16)
    x = rng.randn(b, 8, 4).astype(np.float32)
    x_len = np.asarray([8, 6], np.int64)
    with torch.no_grad():
        trunk_r = ref.transformer[0](_tm(x, x_len), text_r)
        eos_r = ref.eos_head(trunk_r).value.squeeze(-1)
    trunk_j = ours.transformer(_mj(x, x_len), text_j)
    eos_j = ours.eos_head(trunk_j).value[..., 0]
    allclose("cross-attn trunk", trunk_r.value, trunk_j.value)
    allclose("eos logits", eos_r, eos_j)
