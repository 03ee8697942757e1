import math

import jax.numpy as jnp
import numpy as np
import torch

from vae_gslm_tpu.core.masked import Masked
from vae_gslm_tpu.data.features import (MelSpecFeatureProcessor,
                                        hann_window, melscale_fbanks,
                                        stft_magnitude)
from vae_gslm_tpu.hparams.hp import Hparams


FEATURE_HP = Hparams.from_yaml("""
sample_rate: 16000
n_fft: 1025
win_length: 1024
hop_length: 320
n_mels: 80
f_min: 0
f_max: 8000
power: 1.0
log_scale: true
""")


def _torch_mag(x, n_fft, hop, win_length):
    spec = torch.stft(torch.tensor(x), n_fft=n_fft, hop_length=hop,
                      win_length=win_length,
                      window=torch.hann_window(win_length),
                      center=True, pad_mode="reflect", normalized=False,
                      onesided=True, return_complex=True)
    return spec.abs().numpy()  # (B, bins, frames)


def test_hann_matches_torch():
    np.testing.assert_allclose(hann_window(1024),
                               torch.hann_window(1024).numpy(), atol=1e-6)


def test_stft_magnitude_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16000).astype(np.float32) * 0.3
    got = np.asarray(stft_magnitude(jnp.asarray(x), 1025, 320, 1024))
    ref = _torch_mag(x, 1025, 320, 1024).transpose(0, 2, 1)
    assert got.shape == ref.shape  # (B, frames, bins)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_stft_fft_method_matches_matmul():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 6400).astype(np.float32)
    a = np.asarray(stft_magnitude(jnp.asarray(x), 1025, 320, 1024,
                                  method="matmul"))
    b = np.asarray(stft_magnitude(jnp.asarray(x), 1025, 320, 1024,
                                  method="fft"))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-4)


def test_melscale_fbanks_properties():
    fb = melscale_fbanks(513, 0.0, 8000.0, 80, 16000)
    assert fb.shape == (513, 80)
    assert fb.min() >= 0
    # Triangles: each filter sums > 0 and peaks at <= 1
    assert np.all(fb.sum(0) > 0)
    assert fb.max() <= 1.0 + 1e-6
    # Filter centre frequencies increase
    centers = fb.argmax(0)
    assert np.all(np.diff(centers) >= 0)


def test_melscale_fbanks_match_htk_formula():
    # Independent check: centre of filter m is mel-spaced point m+1.
    n_freqs, n_mels, sr = 513, 80, 16000
    fb = melscale_fbanks(n_freqs, 0.0, 8000.0, n_mels, sr)
    all_freqs = np.linspace(0, sr // 2, n_freqs)
    mel_pts = np.linspace(0.0, 2595.0 * math.log10(1 + 8000.0 / 700.0),
                          n_mels + 2)
    hz_pts = 700.0 * (10 ** (mel_pts / 2595.0) - 1)
    for m in (0, 40, 79):
        c = all_freqs[fb[:, m].argmax()]
        assert abs(c - hz_pts[m + 1]) <= (all_freqs[1] - all_freqs[0]) * 1.1


def test_mel_processor_50fps_and_log():
    proc = MelSpecFeatureProcessor(FEATURE_HP)
    assert proc.sample_rate == 50.0
    assert proc.sample_ratio == 1.0 / 320.0
    t = np.linspace(0, 1, 16000, endpoint=False)
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    mel = np.asarray(proc.encode_single(x))
    # 1 + (16000 + 2*(1025//2) - 1025)//320 = 50 frames (matches torch)
    assert mel.shape == (50, 80)
    assert mel.min() >= math.log(1e-6) - 1e-5
    # 440 Hz peak lands in a plausible low-mel band
    peak_band = mel.mean(0).argmax()
    assert 5 <= peak_band <= 25


def test_mel_processor_masked_encode():
    proc = MelSpecFeatureProcessor(FEATURE_HP)
    rng = np.random.RandomState(0)
    wave = rng.randn(2, 16000).astype(np.float32) * 0.1
    sig = Masked.from_lengths(jnp.asarray(wave), jnp.asarray([16000, 8000]))
    out = proc.encode(sig)
    assert out.value.shape[0] == 2
    np.testing.assert_array_equal(np.asarray(out.lengths), [50, 25])


def test_mel_full_pipeline_matches_torch_reference_1e3():
    """End-to-end ≤1e-3 parity in log-mel space vs a torch recomputation
    of the reference pipeline (torch.stft + HTK fbanks + log clamp)."""
    proc = MelSpecFeatureProcessor(FEATURE_HP)
    rng = np.random.RandomState(3)
    x = (rng.randn(1, 32000).astype(np.float32) * 0.1)
    got = np.asarray(proc.encode_single(x[0]))
    mag = _torch_mag(x, 1025, 320, 1024)[0].T  # (frames, bins)
    fb = melscale_fbanks(513, 0.0, 8000.0, 80, 16000)
    mel = mag @ fb
    ref = np.log(np.clip(mel, 1e-6, None))
    np.testing.assert_allclose(got, ref, atol=1e-3)
