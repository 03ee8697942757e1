"""End-to-end smoke: train the VAE-GSLM a few steps on synthetic data,
export the compact checkpoint, then run speech-continuation inference —
the full driver-config-4/5 path at toy scale.
"""
import os

import numpy as np
import pytest
from flax import nnx

from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.data import audio as audio_lib
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.models.vocoder.vocoder import HiFiGAN
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

TRAIN_HP = """
trainer:
    identifier: "trainers.speech.lvtr.LVTRTrainer"
    total_steps: 4
    val_check_interval: 1000
    limit_val_batches: 1
    precision: "32"
    distributed: false
logging:
    log_dir: "{log_dir}"
    num_samples: 1
    temperature: 1.0
    sample_length: 0.4
    sample_prior_length: 0.2
    plot_attn: false
vocoder:
    path: "{vocoder_dir}"
hubert:
    sample_rate: 50
model:
    tokens: {{embedding_dim: 8, vocab_size: 32}}
    latent_dim: 4
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
            ddim_sampling_eta: 1.0
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
        rpe: {{identifier: ALiBi, maxpos: 128}}
        num_layers: 1
        layer:
            ffd_size: 32
            dim: 16
            norm: {{identifier: RMSNorm, eps: 1.0e-6}}
            activation: {{identifier: GELU}}
            self_attn: {{nheads: 4, causal: true}}
        flow:
            num_layers: 2
            conditional: true
            layer:
                hidden_dim: 8
                activation: {{identifier: GELU}}
                mean_only: false
                scale_range: [0.5, 2.0]
                norm: {{identifier: LayerNorm, eps: 1.0e-6}}
training:
    gradient_accumulation: 2
    gradient_clip_val: 1.0
    optimizer:
        identifier: AdamW
        lr: 1.0e-4
        beta1: 0.9
        beta2: 0.98
        weight_decay: 0.1
        exclude_norm_and_bias_from_weight_decay: true
    scheduler:
        identifier: cosine
        min_lr: 1.0e-5
        warmup_kld: 0
        flat_steps: 1
    token_kld_weight: 0.5
    fixed_beta: 0.04
    scale_rec_beta: false
    mel_rescale: {{mean: -1.5, std: 2.0}}
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
        random_crop_mel_utt: {{min_seg_sec: 0.2, max_seg_sec: 0.3}}
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
        random_crop_mel_utt: {{min_seg_sec: 0.2, max_seg_sec: 0.3}}
        post_pad:
            tokens: {{num_tokens: 20}}
            mel: {{length: 0.4}}
        sampler: {{type: standard, shuffle: false}}
"""

INFER_HP = """
identifier: "inference.speech.inferer.SpeechInferer"
precision: "32"
output_dir: "{out_dir}"
temperature: 0.85
token_temperature: 0.85
sample_length: 0.4
sample_prior_length: 0.2
ckpt_path: "{ckpt_dir}"
diffusion: {{sampling_timesteps: 3, ddim_sampling_eta: 0.5}}
kv_cache_dtype: "int8"
vocoder: {{path: "{vocoder_dir}"}}
model: {{identifier: "models.speech.lvtr.LVTR"}}
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
trainer: {{distributed: false}}
vad: {{auth_token: null}}
"""


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_corpus")
    rng = np.random.RandomState(0)
    lines = []
    for i in range(4):
        n = int(SR * 0.6)
        t = np.arange(n) / SR
        wave = (0.2 * np.sin(2 * np.pi * (200 + 40 * i) * t)
                ).astype(np.float32)
        name = f"utt{i}.wav"
        audio_lib.save_wav(str(root / name), wave, SR)
        toks = rng.randint(0, 32, size=int(0.6 * 50))
        lines.append(f"{name}|{' '.join(map(str, toks))}")
    (root / "tokens.txt").write_text("\n".join(lines) + "\n")
    return root


@pytest.fixture(scope="module")
def vocoder_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocoder_ckpt")
    hp = Hparams.from_yaml(VOCODER_HP)
    voc = HiFiGAN(hp, rngs=nnx.Rngs(0))
    voc.save_pretrained(str(d))
    return d


def test_e2e_train_then_infer(corpus, vocoder_dir, tmp_path_factory):
    log_dir = tmp_path_factory.mktemp("exp")
    cfg = TRAIN_HP.format(log_dir=log_dir, vocoder_dir=vocoder_dir,
                          corpus=corpus)
    hp = Hparams.from_yaml(cfg)
    from vae_gslm_tpu.trainers.speech.lvtr import LVTRTrainer
    trainer = LVTRTrainer(hp)
    logger = ExperimentLogger(str(log_dir))
    trainer.fit(logger, max_steps=3, val_check_interval=10 ** 9,
                log_every=1)
    assert trainer.global_step == 3
    ckpt_dir = logger.ckpt_path
    assert os.path.exists(os.path.join(ckpt_dir, "last-cpt.npz"))
    assert os.path.exists(os.path.join(ckpt_dir, "hp.yaml"))
    # metrics were logged
    metrics_file = os.path.join(logger.log_path, "metrics.jsonl")
    assert os.path.getsize(metrics_file) > 0
    logger.close()

    # ---------------- inference from the exported checkpoint ----------
    out_dir = tmp_path_factory.mktemp("samples")
    icfg = INFER_HP.format(out_dir=out_dir, ckpt_dir=ckpt_dir,
                           vocoder_dir=vocoder_dir, corpus=corpus)
    ihp = Hparams.from_yaml(icfg)
    from vae_gslm_tpu.inference.speech.inferer import SpeechInferer
    inferer = SpeechInferer(ihp)
    n = inferer.run(max_batches=1)
    assert n >= 1
    wavs = [f for f in os.listdir(out_dir) if f.endswith(".wav")]
    assert len(wavs) == n
    wave, sr = audio_lib.load_audio(os.path.join(out_dir, wavs[0]))
    assert sr == SR
    assert len(wave) > 0 and np.isfinite(wave).all()


def test_full_state_resume(corpus, vocoder_dir, tmp_path_factory):
    """Exact-resume track: orbax full state restores params/opt/step."""
    log_dir = tmp_path_factory.mktemp("exp_resume")
    cfg = TRAIN_HP.format(log_dir=log_dir, vocoder_dir=vocoder_dir,
                          corpus=corpus)
    hp = Hparams.from_yaml(cfg)
    from vae_gslm_tpu.trainers.speech.lvtr import LVTRTrainer
    trainer = LVTRTrainer(hp)
    logger = ExperimentLogger(str(log_dir))
    trainer.fit(logger, max_steps=2, val_check_interval=10 ** 9,
                log_every=1)
    full = os.path.join(logger.ckpt_path, "full_state")
    assert os.path.exists(full), "orbax full state was not written"
    import jax

    ref_leaf = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0])
    trainer2 = LVTRTrainer(hp)
    new_leaf = np.asarray(jax.tree_util.tree_leaves(trainer2.params)[0])
    assert not np.allclose(ref_leaf, new_leaf)
    trainer2.resume(full)
    assert trainer2.global_step == 2
    res_leaf = np.asarray(
        jax.tree_util.tree_leaves(trainer2.params)[0])
    np.testing.assert_array_equal(res_leaf, ref_leaf)
    logger.close()


def test_likelihood_estimator_e2e(corpus, vocoder_dir,
                                  tmp_path_factory):
    # reuse a fresh 0-step checkpoint
    log_dir = tmp_path_factory.mktemp("exp2")
    cfg = TRAIN_HP.format(log_dir=log_dir, vocoder_dir=vocoder_dir,
                          corpus=corpus)
    hp = Hparams.from_yaml(cfg)
    from vae_gslm_tpu.trainers.speech.lvtr import LVTRTrainer
    trainer = LVTRTrainer(hp)
    logger = ExperimentLogger(str(log_dir))
    trainer.logger = logger
    trainer.checkpoint()
    ckpt_dir = logger.ckpt_path
    logger.close()
    icfg = INFER_HP.format(out_dir=tmp_path_factory.mktemp("s2"),
                           ckpt_dir=ckpt_dir,
                           vocoder_dir=vocoder_dir, corpus=corpus)
    ihp = Hparams.from_yaml(icfg)
    ihp.identifier = "inference.speech.likelihood.LikelihoodEstimator"
    from vae_gslm_tpu.inference.speech.likelihood import \
        LikelihoodEstimator
    est = LikelihoodEstimator(ihp)
    scores = est.run(max_batches=2)
    assert scores.shape[0] >= 2
    assert np.isfinite(scores).all()
    assert (scores <= 0).all()

    # ---- reconstruction evaluator on the same checkpoint -------------
    rhp = Hparams.from_yaml(icfg)
    rhp.identifier = (
        "inference.speech.reconstruction.ReconstructionEvaluator")
    rhp.tasks = ["f0mse", "mcd"]
    from vae_gslm_tpu.inference.speech.reconstruction import \
        ReconstructionEvaluator
    ev = ReconstructionEvaluator(rhp)
    out = ev.run(max_batches=1)
    assert "mcd" in out and np.isfinite(out["mcd"])


def test_metric_aggregation_across_microbatches(corpus, vocoder_dir,
                                                tmp_path_factory):
    """run_step metrics must aggregate over the grad-accum axis like
    the reference's full-batch logging (sum for token-sums, length-
    weighted mean otherwise) — not report the last micro-batch only
    (VERDICT r1 item 8).  Uses a deterministic stand-in loss so
    accum=2 on [A, B] is comparable to accum=1 on [A;B]."""
    import jax
    import jax.numpy as jnp

    log_dir = tmp_path_factory.mktemp("exp_agg")
    cfg = TRAIN_HP.format(log_dir=log_dir, vocoder_dir=vocoder_dir,
                          corpus=corpus)
    hp = Hparams.from_yaml(cfg)
    from vae_gslm_tpu.trainers.speech.lvtr import LVTRTrainer
    trainer = LVTRTrainer(hp)

    def fake_loss_fn(params, rest, batch, kld_weight, key):
        mel = batch["mel"]
        msum = (mel.value * mel.mask()[..., None]).sum()
        n = mel.lengths.sum()
        loss = jax.tree_util.tree_leaves(params)[0].sum() * 1e-6
        return loss, {"kld": msum, "rec_loss": 2.0 * msum,
                      "length": n, "log_p": msum / n,
                      "log_q": msum / n + 1.0,
                      "logstd": -msum / n,
                      "q_logstd": msum / n * 0.5,
                      "q_mean_abs": (msum + 5.0 * n) / n,
                      "token_kld": 3.0 * msum}
    trainer._loss_fn = fake_loss_fn

    rng = np.random.RandomState(0)
    n_mels = 20

    def micro(b, t, lengths, seed):
        r = np.random.RandomState(seed)
        return {
            "mel": Masked.from_lengths(
                np.asarray(r.randn(b, t, n_mels), np.float32),
                np.asarray(lengths)),
        }

    A = micro(2, 10, [10, 7], 1)
    B = micro(2, 10, [4, 9], 2)
    import jax.tree_util as jtu
    stacked2 = jtu.tree_map(lambda a, b: jnp.stack([a, b]), A, B)
    combined = jtu.tree_map(
        lambda a, b: jnp.concatenate([a, b])[None], A, B)

    trainer.rng = jax.random.PRNGKey(0)
    m2 = {k: float(v) for k, v in trainer.run_step(stacked2).items()}
    trainer.rng = jax.random.PRNGKey(0)
    trainer.global_step = 0
    m1 = {k: float(v) for k, v in trainer.run_step(combined).items()}

    def msum_of(mb):
        mel = mb["mel"]
        return float((np.asarray(mel.value)
                      * np.asarray(mel.mask())[..., None]).sum())

    sA, sB = msum_of(A), msum_of(B)
    nA, nB = 17, 13
    # sums normalized by the TOTAL token count
    assert np.isclose(m2["kld"], (sA + sB) / (nA + nB), rtol=1e-4)
    assert np.isclose(m2["rec_loss"], 2 * (sA + sB) / (nA + nB),
                      rtol=1e-4)
    assert np.isclose(m2["token_kld"], 3 * (sA + sB) / (nA + nB),
                      rtol=1e-4)
    # length-weighted means over the accum axis
    expect_logp = (sA / nA * nA + sB / nB * nB) / (nA + nB)
    assert np.isclose(m2["log_p"], expect_logp, rtol=1e-4)
    # the old bug: last micro-batch only
    assert not np.isclose(m2["log_p"], sB / nB, rtol=1e-4)
    # accum=2 split == accum=1 combined on identical data
    for k in ("kld", "rec_loss", "token_kld", "log_p", "log_q",
              "logstd", "q_logstd", "q_mean_abs"):
        assert np.isclose(m2[k], m1[k], rtol=1e-4), (k, m2[k], m1[k])


def test_fused_accumulation_matches_scan(corpus, vocoder_dir,
                                         tmp_path_factory):
    """training.fuse_accumulation collapses (accum, B) -> (1, accum*B);
    with a deterministic loss the metrics (and therefore the summed
    gradients, which the metric sums are built from) match the scanned
    accum path exactly."""
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    log_dir = tmp_path_factory.mktemp("exp_fuse")
    cfg = TRAIN_HP.format(log_dir=log_dir, vocoder_dir=vocoder_dir,
                          corpus=corpus)
    hp = Hparams.from_yaml(cfg)
    from vae_gslm_tpu.trainers.speech.lvtr import LVTRTrainer

    def fake_loss_fn(params, rest, batch, kld_weight, key):
        mel = batch["mel"]
        msum = (mel.value * mel.mask()[..., None]).sum()
        n = mel.lengths.sum()
        loss = (jax.tree_util.tree_leaves(params)[0].sum()
                * 1e-6 * msum)
        return loss, {"kld": msum, "rec_loss": 2.0 * msum,
                      "length": n, "log_p": msum / n,
                      "log_q": msum / n + 1.0,
                      "logstd": -msum / n,
                      "q_logstd": msum / n * 0.5,
                      "q_mean_abs": (msum + 5.0 * n) / n,
                      "token_kld": 3.0 * msum}

    rng = np.random.RandomState(3)
    n_mels = 20

    def micro(b, t, lengths, seed):
        r = np.random.RandomState(seed)
        return {"mel": Masked.from_lengths(
            np.asarray(r.randn(b, t, n_mels), np.float32),
            np.asarray(lengths))}

    A = micro(2, 10, [10, 7], 5)
    B = micro(2, 10, [4, 9], 6)
    stacked = jtu.tree_map(lambda a, b: jnp.stack([a, b]), A, B)

    results = {}
    for fuse in (False, True):
        trainer = LVTRTrainer(hp)
        trainer._loss_fn = fake_loss_fn
        trainer._fuse_accum = fuse
        trainer.rng = jax.random.PRNGKey(0)
        results[fuse] = {k: float(v)
                         for k, v in trainer.run_step(stacked).items()}
    for k in ("kld", "rec_loss", "token_kld", "log_p", "log_q",
              "logstd", "q_logstd", "q_mean_abs", "grad_norm"):
        assert np.isclose(results[False][k], results[True][k],
                          rtol=1e-4), (k, results[False][k],
                                       results[True][k])
