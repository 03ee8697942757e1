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
