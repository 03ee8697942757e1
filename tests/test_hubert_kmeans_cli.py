"""End-to-end tokenizer CLI: hubert_kmeans on a locally-saved (random)
HF HuBERT checkpoint — exercises feature extraction, k-means training,
centroid save, and tokenization output format."""
import os
import subprocess
import sys

import numpy as np
import pytest

from vae_gslm_tpu.data import audio as audio_lib

transformers = pytest.importorskip("transformers")
SR = 16000


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("hk")
    # Tiny random HF hubert saved locally.
    cfg = transformers.HubertConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=64, conv_dim=[16] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        conv_stride=[5, 2, 2, 2, 2, 2, 2], conv_bias=True,
        feat_extract_norm="layer", do_stable_layer_norm=True,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4)
    model = transformers.HubertModel(cfg)
    hf_dir = root / "hubert_tiny"
    model.save_pretrained(str(hf_dir))
    wavdir = root / "wavs"
    wavdir.mkdir()
    lines = []
    rng = np.random.RandomState(0)
    for i in range(4):
        n = SR  # 1 s
        wave = (0.2 * np.sin(2 * np.pi * (200 + 50 * i)
                             * np.arange(n) / SR)
                + 0.02 * rng.randn(n)).astype(np.float32)
        name = f"u{i}.wav"
        audio_lib.save_wav(str(wavdir / name), wave, SR)
        lines.append(name)
    meta = root / "metadata.txt"
    meta.write_text("\n".join(lines) + "\n")
    return root, hf_dir, wavdir, meta


def _run(args):
    env = dict(os.environ)
    env["VAE_GSLM_FORCE_CPU"] = "1"
    return subprocess.run([sys.executable, "-m"] + args,
                          cwd="/root/repo", env=env,
                          capture_output=True, text=True, timeout=560)


def test_hubert_kmeans_cli_train_and_tokenize(setup):
    root, hf_dir, wavdir, meta = setup
    out = root / "tokens_v16.txt"
    r = _run(["vae_gslm_tpu.scripts.hubert_kmeans",
              "-i", str(meta), "-w", str(wavdir), "-o", str(out),
              "-m", str(hf_dir), "-v", "16", "-p", "1.0"])
    assert r.returncode == 0, r.stderr[-3000:]
    cents = root / "kmeans_v16.npy"
    assert cents.exists()
    c = np.load(cents)
    assert c.shape == (16, 32)
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 4
    for line in lines:
        name, toks = line.split("|")
        ids = [int(t) for t in toks.split()]
        assert len(ids) > 30  # ~49 frames for 1 s
        assert all(0 <= t < 16 for t in ids)

    # Mode B: reuse centroids -> identical tokens (deterministic).
    out2 = root / "tokens2.txt"
    r = _run(["vae_gslm_tpu.scripts.hubert_kmeans",
              "-i", str(meta), "-w", str(wavdir), "-o", str(out2),
              "-m", str(hf_dir), "-v", "16",
              "-c", str(cents)])
    assert r.returncode == 0, r.stderr[-3000:]
    assert out.read_text() == out2.read_text()
