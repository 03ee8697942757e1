"""CLI smoke tests: python -m vae_gslm_tpu.scripts.{train,infer,
preprocess_mels} on tiny configs via subprocess (the real entry paths)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from flax import nnx

from tests.test_e2e_lvtr import INFER_HP, TRAIN_HP, VOCODER_HP
from vae_gslm_tpu.data import audio as audio_lib
from vae_gslm_tpu.hparams.hp import Hparams
from vae_gslm_tpu.models.vocoder.vocoder import HiFiGAN

SR = 16000


def _run(args, cwd):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=2")
    env["VAE_GSLM_FORCE_CPU"] = "1"
    return subprocess.run(
        [sys.executable, "-m"] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=560)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    corpus = root / "corpus"
    corpus.mkdir()
    rng = np.random.RandomState(0)
    lines = []
    for i in range(4):
        n = int(SR * 0.6)
        t = np.arange(n) / SR
        wave = (0.2 * np.sin(2 * np.pi * (220 + 20 * i) * t)).astype(
            np.float32)
        name = f"utt{i}.wav"
        audio_lib.save_wav(str(corpus / name), wave, SR)
        toks = rng.randint(0, 32, size=int(0.6 * 50))
        lines.append(f"{name}|{' '.join(map(str, toks))}")
    (corpus / "tokens.txt").write_text("\n".join(lines) + "\n")
    voc = root / "vocoder"
    HiFiGAN(Hparams.from_yaml(VOCODER_HP),
            rngs=nnx.Rngs(0)).save_pretrained(str(voc))
    return root, corpus, voc


def test_train_cli(setup):
    root, corpus, voc = setup
    log_dir = root / "exp"
    cfg = root / "train.yaml"
    # num_samples 0: end-of-fit val AUDIO generation (AR sampler +
    # diffusion + vocoder — the bulk of this subprocess's compile
    # time) is covered in-process by test_e2e_train_then_infer; this
    # test is about the CLI entry path, flags and checkpoint layout.
    cfg.write_text(TRAIN_HP.format(
        log_dir=log_dir, vocoder_dir=voc, corpus=corpus
    ).replace("num_samples: 1", "num_samples: 0"))
    r = _run(["vae_gslm_tpu.scripts.train", "-c", str(cfg),
              "--max_steps", "2"], cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-3000:]
    ckpt = log_dir / "ckpt" / "version_0"
    assert (ckpt / "last-cpt.npz").exists()
    assert (ckpt / "hp.yaml").exists()

    # ---- infer CLI from the produced checkpoint
    out_dir = root / "samples"
    icfg = root / "infer.yaml"
    icfg.write_text(INFER_HP.format(out_dir=out_dir, ckpt_dir=ckpt,
                                    vocoder_dir=voc, corpus=corpus))
    r = _run(["vae_gslm_tpu.scripts.infer", "-c", str(icfg),
              "--max_batches", "1"], cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-3000:]
    wavs = [f for f in os.listdir(out_dir) if f.endswith(".wav")]
    assert wavs


def test_preprocess_mels_cli(setup):
    root, corpus, voc = setup
    cfg = root / "prep.yaml"
    cfg.write_text(f"""
mel:
    sample_rate: 16000
    n_fft: 513
    win_length: 400
    hop_length: 320
    n_mels: 20
    f_min: 0
    f_max: 8000
    power: 1.0
    log_scale: true
data:
    path: "{corpus}/tokens.txt"
    wavdir: "{corpus}"
    sample_rate: 16000
    with_text: false
    num_workers: 2
""")
    out = root / "mels"
    r = _run(["vae_gslm_tpu.scripts.preprocess_mels", "-c", str(cfg),
              "-o", str(out)], cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-3000:]
    npys = [f for f in os.listdir(out) if f.endswith(".npy")]
    assert len(npys) == 4
    mel = np.load(out / npys[0])
    assert mel.ndim == 2 and mel.shape[1] == 20
