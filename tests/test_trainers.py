"""Smoke tests for the remaining task trainers: HiFi-GAN GAN loop,
DiscreteAR token LM, HuBERT decoder, SoundStream, LVTTS (+TTS sampler).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.data import audio as audio_lib
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.models.vocoder.vocoder import HiFiGAN, HuBERTIO
from vae_gslm_tpu.training.logging import ExperimentLogger

SR = 16000

VOCODER_HP = """
feature:
    sample_rate: 16000
    n_fft: 513
    win_length: 400
    hop_length: 320
    n_mels: 20
    f_min: 0
    f_max: 8000
    power: 1.0
    log_scale: true
model:
    generator:
        weight_norm: true
        upsample_rates: [5, 4, 4, 2, 2]
        upsample_kernel_sizes: [10, 8, 8, 4, 4]
        upsample_initial_channel: 64
        resblock_kernel_sizes: [3]
        resblock_dilation_sizes:
            - [1, 2]
        in_channels: 20
        kernel_size: 7
"""

HUBERT_MODEL_HP = """
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
"""


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("tr_corpus")
    rng = np.random.RandomState(0)
    lines, tlines = [], []
    for i in range(4):
        n = int(SR * 0.6)
        t = np.arange(n) / SR
        wave = (0.2 * np.sin(2 * np.pi * (180 + 30 * i) * t)).astype(
            np.float32)
        name = f"utt{i}.wav"
        audio_lib.save_wav(str(root / name), wave, SR)
        toks = rng.randint(0, 32, size=int(0.6 * 50))
        lines.append(f"{name}|{' '.join(map(str, toks))}")
        tlines.append(f"{name}|dummy|hello world sample {i}")
    (root / "tokens.txt").write_text("\n".join(lines) + "\n")
    (root / "text.txt").write_text("\n".join(tlines) + "\n")
    return root


@pytest.fixture(scope="module")
def vocoder_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("voc")
    HiFiGAN(Hparams.from_yaml(VOCODER_HP),
            rngs=nnx.Rngs(0)).save_pretrained(str(d))
    return d


@pytest.fixture(scope="module")
def hubert_codec_dir(tmp_path_factory, vocoder_dir):
    d = tmp_path_factory.mktemp("hubert_codec")
    hp = Hparams(model=Hparams.from_yaml(HUBERT_MODEL_HP).to_dict(),
                 vocoder={"path": str(vocoder_dir)})
    codec = HuBERTIO(hp, rngs=nnx.Rngs(0))
    codec.save_pretrained(str(d))
    return d


def _hfgan_hp(corpus):
    return Hparams.from_yaml(f"""
trainer:
    identifier: "trainers.vocoder.hfgan.HiFiGANTrainer"
    total_steps: 4
    limit_val_batches: 1
    precision: "32"
    distributed: false
logging: {{log_dir: "unused", num_samples: 1}}
{VOCODER_HP.replace("model:", "model:", 1)}
model:
    generator:
        weight_norm: true
        upsample_rates: [5, 4, 4, 2, 2]
        upsample_kernel_sizes: [10, 8, 8, 4, 4]
        upsample_initial_channel: 64
        resblock_kernel_sizes: [3]
        resblock_dilation_sizes:
            - [1, 2]
        in_channels: 20
        kernel_size: 7
    mrd:
        weight_norm: true
        resolutions:
            - [128, 32, 64]
    mpd: {{weight_norm: true, periods: [2, 3]}}
training:
    generator:
        optimizer: {{identifier: Adam, lr: 1.0e-4, beta1: 0.8, beta2: 0.98}}
        scheduler: {{identifier: triangle, flat_steps: 1}}
    discriminator:
        optimizer: {{identifier: Adam, lr: 1.0e-4, beta1: 0.8, beta2: 0.98}}
        scheduler: {{identifier: triangle, flat_steps: 1}}
    mel_loss_weight: 40.0
data:
    train:
        path: "{corpus}/tokens.txt"
        wavdir: "{corpus}"
        segment_size: 0.2
        sample_rate: 16000
        with_text: false
        num_workers: 2
        batch_size: 2
        post_pad: {{audio: {{length: 0.2}}}}
        sampler: {{type: standard, shuffle: true}}
    val:
        path: "{corpus}/tokens.txt"
        wavdir: "{corpus}"
        segment_size: 0.3
        sample_rate: 16000
        with_text: false
        num_workers: 2
        batch_size: 2
        post_pad: {{audio: {{length: 0.3}}}}
        sampler: {{type: standard, shuffle: false}}
""")


def test_hifigan_trainer_steps(corpus, vocoder_dir, tmp_path_factory):
    hp = _hfgan_hp(corpus)
    from vae_gslm_tpu.trainers.vocoder.hfgan import HiFiGANTrainer
    trainer = HiFiGANTrainer(hp)
    logger = ExperimentLogger(
        str(tmp_path_factory.mktemp("hfgan_exp")))
    trainer.fit(logger, max_steps=2, val_check_interval=10 ** 9,
                log_every=1)
    assert trainer.global_step == 2
    trainer.checkpoint()
    ckpt = os.path.join(logger.ckpt_path, "last-cpt.npz")
    assert os.path.exists(ckpt)
    # The compact checkpoint loads back as a pretrained vocoder.
    voc = HiFiGAN.from_pretrained(logger.ckpt_path)
    mel = Masked.from_lengths(jnp.zeros((1, 10, 20)), jnp.asarray([10]))
    wave = voc.decode(mel)
    assert wave.value.shape == (1, 10 * 320)
    logger.close()


def _discrete_hp(corpus, codec_dir):
    return Hparams.from_yaml(f"""
trainer:
    identifier: "trainers.speech.discrete.DiscreteARTrainer"
    total_steps: 4
    limit_val_batches: 1
    distributed: false
logging:
    log_dir: "unused"
    num_samples: 1
    temperature: 1.0
    sample_length: 0.4
    sample_prior_length: 0.2
    plot_attn: false
hubert: {{path: "{codec_dir}"}}
model:
    transformer:
        bias: false
        rpe: {{identifier: ALiBi, maxpos: 64}}
        num_layers: 1
        layer:
            ffd_size: 32
            dim: 16
            norm: {{identifier: RMSNorm, eps: 1.0e-6}}
            activation: {{identifier: GELU}}
            self_attn: {{nheads: 4, causal: true}}
training:
    gradient_accumulation: 1
    optimizer:
        identifier: AdamW
        lr: 1.0e-4
        beta1: 0.9
        beta2: 0.98
    scheduler: {{identifier: cosine, min_lr: 1.0e-5, flat_steps: 1}}
data:
    train:
        path: "{corpus}/tokens.txt"
        wavdir: "{corpus}"
        sample_rate: 16000
        with_text: false
        with_tokens: true
        num_workers: 2
        batch_size: 2
        token_segment_size: 20
        post_pad:
            tokens: {{num_tokens: 20}}
            mel: {{length: 0.4}}
        sampler: {{type: standard, shuffle: true}}
    val:
        path: "{corpus}/tokens.txt"
        wavdir: "{corpus}"
        sample_rate: 16000
        with_text: false
        with_tokens: true
        num_workers: 2
        batch_size: 2
        token_segment_size: 20
        post_pad:
            tokens: {{num_tokens: 20}}
            mel: {{length: 0.4}}
        sampler: {{type: standard, shuffle: false}}
""")


def test_discrete_ar_trainer_and_sampler(corpus, hubert_codec_dir,
                                         tmp_path_factory):
    from vae_gslm_tpu.trainers.speech.discrete import DiscreteARTrainer
    trainer = DiscreteARTrainer(_discrete_hp(corpus, hubert_codec_dir))
    logger = ExperimentLogger(str(tmp_path_factory.mktemp("dar_exp")))
    trainer.fit(logger, max_steps=2, val_check_interval=10 ** 9,
                log_every=1)
    assert trainer.global_step == 2
    # AR token sampling + decode through the frozen codec.
    trainer.sync_model()
    prior = Masked.from_lengths(
        jnp.asarray(np.random.RandomState(0).randint(0, 32, (2, 10))),
        jnp.asarray([10, 10]))
    full = trainer.sampler(5, prior, jax.random.PRNGKey(0),
                           temperature=1.0)
    assert full.value.shape == (2, 15)
    toks = np.asarray(full.value)
    assert ((toks >= 0) & (toks < 32)).all()
    audio = trainer.model.decode(full, key=jax.random.PRNGKey(1))
    assert audio.value.shape[1] == 15 * 320
    logger.close()


def test_fit_accumulates_across_epoch_boundary(corpus, hubert_codec_dir,
                                               tmp_path_factory):
    """Regression: a dataset yielding fewer batches per epoch than the
    grad-accum count (here 1 batch/epoch, accum 2) must still make
    optimizer progress — the accumulator used to reset every epoch and
    fit() spun forever (4 h of data loading, zero steps in a CLI
    drive)."""
    from vae_gslm_tpu.trainers.speech.discrete import DiscreteARTrainer
    hp = _discrete_hp(corpus, hubert_codec_dir)
    hp.data.train.batch_size = 4         # 4 utts -> 1 batch/epoch
    hp.training.gradient_accumulation = 2
    trainer = DiscreteARTrainer(hp)
    logger = ExperimentLogger(str(tmp_path_factory.mktemp("acc_exp")))
    trainer.fit(logger, max_steps=1, val_check_interval=10 ** 9,
                log_every=1)
    assert trainer.global_step == 1
    logger.close()


def test_hubert_decoder_trainer(corpus, vocoder_dir, tmp_path_factory):
    hp = Hparams.from_yaml(f"""
trainer:
    identifier: "trainers.vocoder.hubert.HuBERTDecoderTrainer"
    total_steps: 4
    limit_val_batches: 1
    distributed: false
logging: {{log_dir: "unused", num_samples: 0}}
vocoder: {{path: "{vocoder_dir}"}}
model:
{chr(10).join('    ' + line for line in HUBERT_MODEL_HP.splitlines())}
training:
    gradient_accumulation: 1
    optimizer:
        identifier: AdamW
        lr: 1.0e-4
        beta1: 0.9
        beta2: 0.98
    scheduler: {{identifier: cosine, min_lr: 1.0e-5, flat_steps: 1}}
data:
    train:
        path: "{corpus}/tokens.txt"
        wavdir: "{corpus}"
        sample_rate: 16000
        with_text: false
        with_tokens: true
        num_workers: 2
        batch_size: 2
        token_segment_size: 20
        post_pad:
            tokens: {{num_tokens: 20}}
            mel: {{length: 0.4}}
        sampler: {{type: standard, shuffle: true}}
    val:
        path: "{corpus}/tokens.txt"
        wavdir: "{corpus}"
        sample_rate: 16000
        with_text: false
        with_tokens: true
        num_workers: 2
        batch_size: 2
        token_segment_size: 20
        post_pad:
            tokens: {{num_tokens: 20}}
            mel: {{length: 0.4}}
        sampler: {{type: standard, shuffle: false}}
""")
    from vae_gslm_tpu.trainers.vocoder.hubert import HuBERTDecoderTrainer
    trainer = HuBERTDecoderTrainer(hp)
    logger = ExperimentLogger(str(tmp_path_factory.mktemp("hub_exp")))
    trainer.fit(logger, max_steps=2, val_check_interval=10 ** 9,
                log_every=1)
    assert trainer.global_step == 2
    logger.close()


def _tts_hp(corpus, vocoder_dir):
    return Hparams.from_yaml(f"""
trainer:
    identifier: "trainers.tts.lvtts.LVTTSTrainer"
    total_steps: 4
    limit_val_batches: 1
    distributed: false
logging:
    log_dir: "unused"
    num_samples: 0
    temperature: 1.0
    max_sample_length: 0.4
    min_sample_length: 0.1
    plot_attn: false
vocoder: {{path: "{vocoder_dir}"}}
model:
    latent_dim: 4
    text: {{embedding_dim: 8, encoder: {{
        bias: false,
        num_layers: 1,
        rpe: {{identifier: ALiBi, maxpos: 64}},
        layer: {{
            ffd_size: 32, dim: 16,
            norm: {{identifier: RMSNorm, eps: 1.0e-6}},
            activation: {{identifier: GELU}},
            self_attn: {{nheads: 4, causal: false}}}}}}}}
    eos:
        num_layers: 1
        layer:
            hidden_dim: 16
            activation: {{identifier: GELU}}
            norm: {{identifier: LayerNorm, eps: 1.0e-6}}
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
            norm: {{identifier: InstanceNorm, eps: 1.0e-6}}
            activation: {{identifier: ReLU}}
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
            norm: {{identifier: InstanceNorm, eps: 1.0e-6}}
            activation: {{identifier: ReLU}}
    decoder:
        diffusion:
            timesteps: 8
            sampling_timesteps: 3
            loss_type: l1
            input_scale: 5.0
            objective: pred_noise
            clamp_range: [-3.0, 1.2]
            beta_schedule: {{identifier: cosine}}
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
                    norm: {{identifier: InstanceNorm, eps: 1.0e-6}}
                    activation: {{identifier: SiLU}}
                    condition_type: concat
            time_embedding:
                dim: 16
                maxpos: 8
                activation: {{identifier: SiLU}}
    transformer:
        bias: false
        rpe: {{identifier: ALiBi, maxpos: 64}}
        num_layers: 1
        layer:
            ffd_size: 32
            dim: 16
            norm: {{identifier: RMSNorm, eps: 1.0e-6}}
            activation: {{identifier: GELU}}
            self_attn: {{nheads: 4, causal: true}}
            cross_attn: {{nheads: 4}}
training:
    gradient_accumulation: 1
    optimizer:
        identifier: AdamW
        lr: 1.0e-4
        beta1: 0.9
        beta2: 0.98
    scheduler: {{identifier: cosine, min_lr: 1.0e-5, flat_steps: 1}}
    mel_rescale: {{mean: -1.5, std: 2.0}}
data:
    train:
        path: "{corpus}/text.txt"
        wavdir: "{corpus}"
        sample_rate: 16000
        with_text: true
        delimiter: " "
        num_workers: 2
        batch_size: 2
        random_crop_mel: {{min_seg_sec: 0.2, max_seg_sec: 0.3}}
        pad_text: {{length: 8}}
        post_pad:
            text: {{length: 8}}
            mel: {{length: 0.6}}
        sampler: {{type: standard, shuffle: true}}
    val:
        path: "{corpus}/text.txt"
        wavdir: "{corpus}"
        sample_rate: 16000
        with_text: true
        delimiter: " "
        num_workers: 2
        batch_size: 2
        random_crop_mel: {{min_seg_sec: 0.2, max_seg_sec: 0.3}}
        pad_text: {{length: 8}}
        post_pad:
            text: {{length: 8}}
            mel: {{length: 0.6}}
        sampler: {{type: standard, shuffle: false}}
""")


def test_lvtts_trainer_and_sampler(corpus, vocoder_dir,
                                   tmp_path_factory):
    from vae_gslm_tpu.trainers.tts.lvtts import LVTTSTrainer
    hp = _tts_hp(corpus, vocoder_dir)
    trainer = LVTTSTrainer(hp)
    logger = ExperimentLogger(str(tmp_path_factory.mktemp("tts_exp")))
    trainer.fit(logger, max_steps=2, val_check_interval=10 ** 9,
                log_every=1)
    assert trainer.global_step == 2
    assert os.path.exists(os.path.join(logger.ckpt_path,
                                       "symbols.json"))
    # EOS-stopped TTS sampling at fixed batch.
    trainer.sync_model()
    text = Masked.from_lengths(
        jnp.asarray(np.random.RandomState(0).randint(1, 8, (2, 6))),
        jnp.asarray([6, 4]))
    spkr = Masked.from_lengths(
        jnp.asarray(np.random.RandomState(1).randn(2, 10, 20),
                    jnp.float32), jnp.asarray([10, 10]))
    out = trainer.sampler(text, spkr, jax.random.PRNGKey(0),
                          max_frames=8, min_frames=2)
    assert out["output"].value.shape[0] == 2
    assert np.isfinite(np.asarray(out["output"].value)).all()
    # Attention-map collection during sampling (reference
    # trainers/tts/sampler.py:26-60 parity): per-layer self/cross maps
    # plus the text-encoder maps, rows softmax-normalized.
    out = trainer.sampler(text, spkr, jax.random.PRNGKey(0),
                          max_frames=8, min_frames=2, return_attn=True)
    sa = np.asarray(out["self_attn"])    # (B, L, H, Q, KV)
    ca = np.asarray(out["cross_attn"])
    ta = np.asarray(out["text_self_attn"])
    assert sa.shape == (2, 1, 4, 9, 9)
    assert ca.shape == (2, 1, 4, 9, 6)
    assert ta.shape == (2, 1, 4, 6, 6)
    np.testing.assert_allclose(sa.sum(-1), 1.0, atol=2e-2)
    np.testing.assert_allclose(ca[0].sum(-1), 1.0, atol=2e-2)
    # Validation sampling path incl. attention figures.
    trainer.hp.logging.num_samples = 1
    trainer.hp.logging.plot_attn = True
    trainer.validation_run(step=3)
    logger.close()


def test_discrete_inferer_end_to_end(corpus, hubert_codec_dir,
                                     tmp_path_factory):
    """SpeechInferer on a DiscreteAR checkpoint (the `hubert` branch:
    token prompt -> AR token continuation -> codec decode -> wav)."""
    from vae_gslm_tpu.inference.speech.inferer import SpeechInferer
    from vae_gslm_tpu.trainers.speech.discrete import DiscreteARTrainer

    root = tmp_path_factory.mktemp("dar_infer")
    trainer = DiscreteARTrainer(_discrete_hp(corpus, hubert_codec_dir))
    logger = ExperimentLogger(str(root / "exp"))
    trainer.fit(logger, max_steps=1, val_check_interval=10 ** 9,
                log_every=1)
    ckpt_dir = root / "ckpt"
    ckpt_dir.mkdir()
    trainer.save_checkpoint(str(ckpt_dir / "last-cpt.npz"))
    trainer.hp.save(str(ckpt_dir / "hp.yaml"))
    logger.close()

    out_dir = root / "wavs"
    ihp = Hparams.from_yaml(f"""
identifier: "inference.speech.inferer.SpeechInferer"
precision: "32"
output_dir: "{out_dir}"
temperature: 1.0
sample_length: 0.3
sample_prior_length: 0.2
ckpt_path: "{ckpt_dir}"
model: {{identifier: "models.speech.discrete.DiscreteAR"}}
data:
    path: "{corpus}/tokens.txt"
    wavdir: "{corpus}"
    sample_rate: 16000
    with_text: false
    with_tokens: true
    num_workers: 2
    batch_size: 2
    min_audio_length: 0.4
    bits_per_second: 32000
    post_pad:
        tokens: {{num_tokens: 25}}
        mel: {{length: 0.5}}
    sampler: {{type: standard, shuffle: false}}
""")
    inferer = SpeechInferer(ihp)
    n = inferer.run(seed=0, max_batches=1)
    assert n >= 1
    import glob
    wavs = sorted(glob.glob(str(out_dir / "*.wav")))
    assert len(wavs) == n
    from vae_gslm_tpu.data import audio as audio_lib
    wave, sr = audio_lib.load_audio(wavs[0])
    assert sr == 16000 and len(wave) > 0
    assert np.isfinite(wave).all()


SOUNDSTREAM_CONV = """
    num_layers: 1
    resample_rates: [1]
    resample_ksize: [1]
    init_channel: 16
    out_channels: [16]
    hidden_channels: [32]
    layer:
        kernel_size: 3
        norm: {identifier: InstanceNorm, eps: 1.0e-6}
        activation: {identifier: ReLU}
"""


def _ss_indent(block):
    return "\n".join("    " + ln for ln in block.strip("\n").splitlines())


def test_soundstream_trainer_learns(corpus, vocoder_dir,
                                    tmp_path_factory):
    """Behavioral coverage for the SoundStream trainer (VERDICT r1
    item 9): a short fit on real synthetic mels must reduce the
    reconstruction loss and actually use multiple VQ codes."""
    import jax

    hp = Hparams.from_yaml(f"""
trainer:
    identifier: "trainers.speech.soundstream.SoundStreamTrainer"
    total_steps: 40
    limit_val_batches: 1
    distributed: false
logging: {{log_dir: "unused", num_samples: 0}}
vocoder: {{path: "{vocoder_dir}"}}
model:
    encoder:
{_ss_indent(SOUNDSTREAM_CONV)}
    decoder:
{_ss_indent(SOUNDSTREAM_CONV)}
    quantizer:
        identifier: SimpleVectorQuantizer
        dim: 16
        codebook_size: 8
training:
    gradient_accumulation: 1
    optimizer:
        identifier: Adam
        lr: 5.0e-3
        beta1: 0.9
        beta2: 0.98
    scheduler: {{identifier: constant, flat_steps: 1}}
data:
    train:
        path: "{corpus}/tokens.txt"
        wavdir: "{corpus}"
        sample_rate: 16000
        with_text: false
        with_tokens: false
        num_workers: 2
        batch_size: 2
        segment_size: 0.4
        post_pad: {{mel: {{length: 0.4}}}}
        sampler: {{type: standard, shuffle: true}}
    val:
        path: "{corpus}/tokens.txt"
        wavdir: "{corpus}"
        sample_rate: 16000
        with_text: false
        with_tokens: false
        num_workers: 2
        batch_size: 2
        segment_size: 0.4
        post_pad: {{mel: {{length: 0.4}}}}
        sampler: {{type: standard, shuffle: false}}
""")
    from vae_gslm_tpu.trainers.speech.soundstream import (
        SoundStreamTrainer)
    trainer = SoundStreamTrainer(hp)

    loader = trainer.train_dataloader()
    first_batch = None
    losses = []
    steps = 0
    while steps < 40:
        for batch in loader:
            stacked = jax.tree_util.tree_map(lambda v: v[None], batch)
            if first_batch is None:
                first_batch = batch
            m = trainer.run_step(stacked)
            trainer.global_step += 1
            losses.append(float(m["rec_loss"]))
            steps += 1
            if steps >= 40:
                break

    assert np.isfinite(losses).all()
    early = np.mean(losses[:5])
    late = np.mean(losses[-5:])
    assert late < 0.7 * early, (early, late)

    # VQ bottleneck actually quantizes: several distinct codes in use.
    trainer.sync_model()
    out = trainer.model.quantizer(
        trainer.model.encoder(first_batch["mel"]))
    used = np.unique(np.asarray(out.indices.value))
    assert len(used) >= 2, used
    # and the reconstruction path runs from the quantized codes
    rec = trainer.model(first_batch["mel"])["reconstruction"]
    assert rec.value.shape == first_batch["mel"].value.shape


def test_preemption_checkpoint(corpus, vocoder_dir, tmp_path_factory):
    """SIGTERM during fit -> full-state checkpoint at the next step
    boundary + clean return; resume restores the exact step (TPU
    preemption handling, beyond the reference's none)."""
    import os
    import signal

    hp = Hparams.from_yaml(f"""
trainer:
    identifier: "trainers.vocoder.hubert.HuBERTDecoderTrainer"
    total_steps: 1000
    limit_val_batches: 0
    distributed: false
logging: {{log_dir: "unused", num_samples: 0}}
vocoder: {{path: "{vocoder_dir}"}}
model:
{chr(10).join('    ' + line for line in HUBERT_MODEL_HP.splitlines())}
training:
    gradient_accumulation: 1
    optimizer:
        identifier: AdamW
        lr: 1.0e-4
        beta1: 0.9
        beta2: 0.98
    scheduler: {{identifier: cosine, min_lr: 1.0e-5, flat_steps: 1}}
data:
    train:
        path: "{corpus}/tokens.txt"
        wavdir: "{corpus}"
        sample_rate: 16000
        with_text: false
        with_tokens: true
        num_workers: 2
        batch_size: 2
        token_segment_size: 20
        post_pad:
            tokens: {{num_tokens: 20}}
            mel: {{length: 0.4}}
        sampler: {{type: standard, shuffle: true}}
    val:
        path: "{corpus}/tokens.txt"
        wavdir: "{corpus}"
        sample_rate: 16000
        with_text: false
        with_tokens: true
        num_workers: 2
        batch_size: 2
        token_segment_size: 20
        post_pad:
            tokens: {{num_tokens: 20}}
            mel: {{length: 0.4}}
        sampler: {{type: standard, shuffle: false}}
""")
    from vae_gslm_tpu.trainers.vocoder.hubert import HuBERTDecoderTrainer
    trainer = HuBERTDecoderTrainer(hp)

    # deliver a REAL SIGTERM after the second run_step
    orig_run_step = trainer.run_step
    calls = {"n": 0}

    def counting_run_step(batch):
        calls["n"] += 1
        if calls["n"] == 2:
            os.kill(os.getpid(), signal.SIGTERM)
        return orig_run_step(batch)

    trainer.run_step = counting_run_step
    logger = ExperimentLogger(str(tmp_path_factory.mktemp("pre_exp")))
    prev_handler = signal.getsignal(signal.SIGTERM)
    trainer.fit(logger, val_check_interval=10 ** 9, log_every=1)
    # returned early (not 1000 steps), with the handler restored
    assert trainer.global_step == 2
    assert signal.getsignal(signal.SIGTERM) is prev_handler
    full = os.path.join(logger.ckpt_path, "full_state")
    assert os.path.exists(full)
    trainer2 = HuBERTDecoderTrainer(hp)
    trainer2.resume(full)
    assert trainer2.global_step == 2
    logger.close()


def test_hfgan_full_state_resume(corpus, vocoder_dir,
                                 tmp_path_factory):
    """Exact GAN-loop resume: both param sets + BOTH optimizer states
    + step restore from the orbax full state (the reference can only
    warm-start the generator)."""
    hp = _hfgan_hp(corpus)
    from vae_gslm_tpu.trainers.vocoder.hfgan import HiFiGANTrainer
    trainer = HiFiGANTrainer(hp)
    logger = ExperimentLogger(str(tmp_path_factory.mktemp("hfg_fs")))
    trainer.fit(logger, max_steps=2, val_check_interval=10 ** 9,
                log_every=1)
    trainer.checkpoint()
    full = os.path.join(logger.ckpt_path, "full_state")
    assert os.path.exists(full)
    import jax
    ref_g = np.asarray(jax.tree_util.tree_leaves(trainer.g_params)[0])
    ref_d = np.asarray(jax.tree_util.tree_leaves(trainer.d_params)[0])

    t2 = HiFiGANTrainer(hp)
    assert not np.allclose(
        ref_g, np.asarray(jax.tree_util.tree_leaves(t2.g_params)[0]))
    t2.resume(full)
    assert t2.global_step == 2
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(t2.g_params)[0]), ref_g)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(t2.d_params)[0]), ref_d)
    # optimizer state (adam moments) restored too
    m_ref = np.asarray(jax.tree_util.tree_leaves(trainer.opt_g)[1])
    m_got = np.asarray(jax.tree_util.tree_leaves(t2.opt_g)[1])
    np.testing.assert_array_equal(m_got, m_ref)
    logger.close()


def test_discrete_sampler_stacked_matches_per_layer(
        corpus, hubert_codec_dir):
    """DiscreteARSampler's fused layer-scan decode reproduces the
    per-layer path token-for-token (same PRNG contract)."""
    import jax
    import jax.numpy as jnp

    from vae_gslm_tpu.inference.speech.sampler import DiscreteARSampler
    from vae_gslm_tpu.trainers.speech.discrete import DiscreteARTrainer

    hp = _discrete_hp(corpus, hubert_codec_dir)
    trainer = DiscreteARTrainer(hp)
    model = trainer.model
    assert model.transformer.supports_stacked_decode()
    rng = np.random.RandomState(0)
    b, tp = 2, 6
    prior = Masked.from_lengths(
        jnp.asarray(rng.randint(0, 32, (b, tp))),
        jnp.asarray([tp, tp]))
    key = jax.random.PRNGKey(4)

    s1 = DiscreteARSampler(model, kv_dtype=jnp.int8)
    out1 = s1(8, prior, key, temperature=0.8)

    import vae_gslm_tpu.nn.transformer as tr
    orig = tr.TransformerLayerStack.supports_stacked_decode
    tr.TransformerLayerStack.supports_stacked_decode = \
        lambda self: False
    try:
        s2 = DiscreteARSampler(model, kv_dtype=jnp.int8)
        out2 = s2(8, prior, key, temperature=0.8)
    finally:
        tr.TransformerLayerStack.supports_stacked_decode = orig

    np.testing.assert_array_equal(np.asarray(out1.value),
                                  np.asarray(out2.value))


def test_discrete_sampler_hybrid_matches_per_layer(
        corpus, hubert_codec_dir, monkeypatch):
    """DiscreteARSampler's hybrid cold/tail Pallas decode path (forced
    via VAE_GSLM_HYBRID_DECODE=1; kernel in interpret mode on CPU)
    reproduces the per-layer path token-for-token (same PRNG
    contract) — the token-LM counterpart of
    tests/test_lvtr_step_parity.py::test_sampler_hybrid_path_matches_per_layer."""
    import jax
    import jax.numpy as jnp

    from vae_gslm_tpu.inference.speech.sampler import DiscreteARSampler
    from vae_gslm_tpu.trainers.speech.discrete import DiscreteARTrainer

    hp = _discrete_hp(corpus, hubert_codec_dir)
    trainer = DiscreteARTrainer(hp)
    model = trainer.model
    assert model.transformer.supports_stacked_decode()
    rng = np.random.RandomState(0)
    b, tp = 2, 6
    prior = Masked.from_lengths(
        jnp.asarray(rng.randint(0, 32, (b, tp))),
        jnp.asarray([tp, tp]))
    key = jax.random.PRNGKey(4)

    monkeypatch.setenv("VAE_GSLM_HYBRID_DECODE", "1")
    s_h = DiscreteARSampler(model, kv_dtype=jnp.int8)
    out_h = s_h(8, prior, key, temperature=0.8)

    monkeypatch.setenv("VAE_GSLM_HYBRID_DECODE", "0")
    s_p = DiscreteARSampler(model, kv_dtype=jnp.int8)
    out_p = s_p(8, prior, key, temperature=0.8)

    np.testing.assert_array_equal(np.asarray(out_h.value),
                                  np.asarray(out_p.value))
    np.testing.assert_array_equal(np.asarray(out_h.lengths),
                                  np.asarray(out_p.lengths))


def test_tts_sampler_stacked_matches_per_layer(corpus, vocoder_dir):
    """ARTRTTSSampler's fused layer-scan decode (stacked weights +
    precomputed per-layer memory K/V for cross-attention) reproduces
    the per-layer path frame-for-frame and EOS-length-for-length
    (same PRNG contract)."""
    import jax

    from vae_gslm_tpu.inference.tts.sampler import ARTRTTSSampler
    from vae_gslm_tpu.trainers.tts.lvtts import LVTTSTrainer

    hp = _tts_hp(corpus, vocoder_dir)
    trainer = LVTTSTrainer(hp)
    model = trainer.model
    assert model.transformer.supports_stacked_decode(allow_cross=True)
    assert not model.transformer.supports_stacked_decode()
    text = Masked.from_lengths(
        jnp.asarray(np.random.RandomState(0).randint(1, 8, (2, 6))),
        jnp.asarray([6, 4]))
    spkr = Masked.from_lengths(
        jnp.asarray(np.random.RandomState(1).randn(2, 10, 20),
                    jnp.float32), jnp.asarray([10, 10]))
    key = jax.random.PRNGKey(0)

    s_f = ARTRTTSSampler(model)
    out_f = s_f(text, spkr, key, max_frames=8, min_frames=2)

    import vae_gslm_tpu.nn.transformer as tr
    orig = tr.TransformerLayerStack.supports_stacked_decode
    tr.TransformerLayerStack.supports_stacked_decode = \
        lambda self, allow_cross=False: False
    try:
        s_p = ARTRTTSSampler(model)
        out_p = s_p(text, spkr, key, max_frames=8, min_frames=2)
    finally:
        tr.TransformerLayerStack.supports_stacked_decode = orig

    np.testing.assert_array_equal(np.asarray(out_f["lengths"]),
                                  np.asarray(out_p["lengths"]))
    np.testing.assert_allclose(
        np.asarray(out_f["frames"].value),
        np.asarray(out_p["frames"].value), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_f["output"].value),
        np.asarray(out_p["output"].value), rtol=1e-3, atol=1e-4)
