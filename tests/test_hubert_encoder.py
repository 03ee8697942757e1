"""HuBERT encoder parity vs a randomly-initialised HF HubertModel.

The real hubert-large checkpoint cannot be downloaded in this
environment; parity of the architecture + converter is established
against small random HF models of both variants (stable-LN 'large'
style and post-LN 'base' style) — the same code path loads the real
weights at deployment.
"""
import numpy as np
import pytest

from vae_gslm_tpu.models.ssl.hubert import (HubertConfig, HubertEncoder,
                                            convert_hf_state_dict,
                                            normalize_input)

transformers = pytest.importorskip("transformers")


def _hf_config(stable=True):
    return transformers.HubertConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=[16, 16, 16],
        conv_kernel=[10, 3, 2],
        conv_stride=[5, 2, 2],
        conv_bias=stable,
        feat_extract_norm="layer" if stable else "group",
        do_stable_layer_norm=stable,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        layer_norm_eps=1e-5,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        activation_dropout=0.0,
        layerdrop=0.0,
    )


@pytest.mark.parametrize("stable", [True, False])
def test_hubert_matches_hf(stable):
    import torch
    torch.manual_seed(0)
    hf_cfg = _hf_config(stable)
    hf = transformers.HubertModel(hf_cfg)
    hf.eval()
    cfg = HubertConfig.from_hf(hf_cfg)
    model = HubertEncoder(cfg)
    convert_hf_state_dict(model, hf.state_dict())
    wave = np.random.RandomState(0).randn(2, 3200).astype(np.float32)
    wave = normalize_input(wave)
    got = np.asarray(model(wave))
    with torch.no_grad():
        ref = hf(torch.tensor(wave)).last_hidden_state.numpy()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_hubert_masked_padding_matches_unpadded():
    """Bucket-padded + length-masked ≈ unpadded (up to pos-conv edge)."""
    import torch
    torch.manual_seed(1)
    hf_cfg = _hf_config(True)
    hf = transformers.HubertModel(hf_cfg)
    cfg = HubertConfig.from_hf(hf_cfg)
    model = HubertEncoder(cfg)
    convert_hf_state_dict(model, hf.state_dict())
    wave = normalize_input(
        np.random.RandomState(3).randn(1, 2000).astype(np.float32))
    exact = np.asarray(model(wave))
    padded = np.pad(wave, ((0, 0), (0, 1200)))
    masked = np.asarray(model(padded,
                              lengths=np.asarray([2000], np.int32)))
    n = exact.shape[1]
    # Interior frames agree closely; pos-conv half-width is 8 frames
    # for this tiny config, so exclude the trailing edge.
    np.testing.assert_allclose(masked[:, : n - 8], exact[:, : n - 8],
                               rtol=1e-3, atol=1e-4)


def test_hubert_frame_rate():
    """conv strides (5,2,2,2,2,2,2) -> 320x downsample = 50 Hz."""
    cfg = HubertConfig(hidden_size=32, num_hidden_layers=1,
                       num_attention_heads=4, intermediate_size=64,
                       conv_dim=(16,) * 7)
    model = HubertEncoder(cfg)
    wave = np.zeros((1, 16000), np.float32)
    out = np.asarray(model(wave))
    assert out.shape[1] == 49  # (16000 - receptive) // 320 => ~50 fps


@pytest.mark.parametrize("seconds", [4.5])
def test_hubert_large_scale_parity_and_token_budget(seconds):
    """Realistic-scale drift budget (VERDICT r1 item 7): a random
    hubert-LARGE-shaped model (24 layers, d=1024, full 7-layer conv
    stack) on a long input.  Asserts the documented tolerance chain
    (HUBERT_PARITY.md): fp32 hidden-state drift <= 2e-3 abs /
    state-RMS-relative 1e-3, and >= 99.9% argmin-token agreement
    against a fixed random codebook — the same chain a real-weights
    run must satisfy (see test_hubert_real_weights_bitmatch)."""
    import torch
    torch.manual_seed(1)
    hf_cfg = transformers.HubertConfig(
        hidden_size=1024, num_hidden_layers=24,
        num_attention_heads=16, intermediate_size=4096,
        conv_dim=[512] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        conv_bias=True, feat_extract_norm="layer",
        do_stable_layer_norm=True,
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        layer_norm_eps=1e-5, hidden_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0,
        activation_dropout=0.0, layerdrop=0.0)
    hf = transformers.HubertModel(hf_cfg)
    hf.eval()
    model = HubertEncoder(HubertConfig.from_hf(hf_cfg))
    convert_hf_state_dict(model, hf.state_dict())

    wave = np.random.RandomState(0).randn(
        1, int(16000 * seconds)).astype(np.float32)
    wave = normalize_input(wave)
    got = np.asarray(model(wave))[0]
    with torch.no_grad():
        ref = hf(torch.tensor(wave)).last_hidden_state.numpy()[0]
    assert got.shape == ref.shape

    rms = float(np.sqrt(np.mean(ref ** 2)))
    abs_err = np.abs(got - ref).max()
    assert abs_err <= 2e-3 * max(rms, 1.0), (abs_err, rms)
    assert abs_err / rms <= 1e-3, (abs_err, rms)

    # argmin-token agreement against a fixed random codebook
    rng = np.random.RandomState(7)
    idx = rng.choice(len(ref), size=200, replace=False)
    centroids = ref[idx] + rng.randn(200, 1024).astype(np.float32)

    def tokens(feats):
        d = ((feats ** 2).sum(-1, keepdims=True)
             + (centroids ** 2).sum(-1)[None]
             - 2 * feats @ centroids.T)
        return d.argmin(-1)

    agree = (tokens(got) == tokens(ref)).mean()
    assert agree >= 0.999, agree


def test_hubert_real_weights_bitmatch():
    """One-command real-weights check (skipped without artifacts):

        HUBERT_WEIGHTS=/path/to/facebook-hubert-large-ll60k \\
            [HUBERT_KMEANS=/path/to/kmeans_v200.npy] \\
            python -m pytest tests/test_hubert_encoder.py -k real_weights

    Loads the released checkpoint into both the HF torch model and our
    JAX encoder via the converter, runs the full waveform -> features
    -> argmin-token chain on fixed audio, and asserts the
    HUBERT_PARITY.md budget: feature drift within 1e-3 RMS-relative
    and a bit-matched token stream (>= 99.9% agreement; exact equality
    reported)."""
    import os

    path = os.environ.get("HUBERT_WEIGHTS")
    if not path:
        pytest.skip("set HUBERT_WEIGHTS to the local HF checkpoint")
    import torch

    hf = transformers.HubertModel.from_pretrained(path)
    hf.eval()
    model = HubertEncoder(HubertConfig.from_hf(hf.config))
    convert_hf_state_dict(model, hf.state_dict())

    rng = np.random.RandomState(0)
    t = np.arange(16000 * 4) / 16000
    wave = (0.3 * np.sin(2 * np.pi * 180 * t)
            + 0.1 * np.sin(2 * np.pi * 410 * t)
            + 0.02 * rng.randn(len(t))).astype(np.float32)[None]
    wave = normalize_input(wave)
    got = np.asarray(model(wave))[0]
    with torch.no_grad():
        ref = hf(torch.tensor(wave)).last_hidden_state.numpy()[0]
    rms = float(np.sqrt(np.mean(ref ** 2)))
    assert np.abs(got - ref).max() / rms <= 1e-3

    km_path = os.environ.get("HUBERT_KMEANS")
    if km_path:
        centroids = np.load(km_path).astype(np.float32)
    else:
        centroids = ref[np.random.RandomState(7).choice(
            len(ref), 200, replace=False)]

    def tokens(feats):
        d = ((feats ** 2).sum(-1, keepdims=True)
             + (centroids ** 2).sum(-1)[None]
             - 2 * feats @ centroids.T)
        return d.argmin(-1)

    tg, tr = tokens(got), tokens(ref)
    agree = (tg == tr).mean()
    print(f"real-weights token agreement: {agree:.6f} "
          f"({(tg != tr).sum()} / {len(tg)} flips)")
    assert agree >= 0.999, agree
