"""Eval substitutes (`inference/eval_utils.py`): NCCF f0, DCT-cepstral
MCD, edit-distance WER/CER — replacing the reference's
torchcrepe/pysptk/jiwer dependencies
(/root/reference/inference/speech/reconstruction.py:99-156)."""
import numpy as np

from vae_gslm_tpu.inference.eval_utils import (cer, edit_distance,
                                               f0_autocorr, f0_mse,
                                               mcd, mel_cepstrum,
                                               normalize_text, wer)


def _tone(freq, sr=16000, sec=0.5):
    t = np.arange(int(sr * sec)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_f0_autocorr_recovers_tone():
    sr = 16000
    f0, conf = f0_autocorr(_tone(220.0, sr), sr)
    voiced = conf > 0.5
    assert voiced.mean() > 0.8
    est = np.median(f0[voiced])
    assert abs(est - 220.0) / 220.0 < 0.03, est


def test_f0_mse_zero_for_identical_and_positive_for_shifted():
    sr = 16000
    a = _tone(200.0, sr)
    assert f0_mse(a, a.copy(), sr) < 1e-6
    b = _tone(300.0, sr)
    # log2(300/200)^2 = 0.585^2 ~ 0.342
    v = f0_mse(a, b, sr)
    assert 0.2 < v < 0.5, v
    # unvoiced (noise with low periodicity) -> nan
    rng = np.random.RandomState(0)
    assert np.isnan(f0_mse(rng.randn(8000).astype(np.float32) * 1e-3,
                           rng.randn(8000).astype(np.float32) * 1e-3,
                           sr, threshold=0.99))


def test_mel_cepstrum_is_dct_ii():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 80).astype(np.float64)
    c = mel_cepstrum(x, order=13)
    # matches an explicit DCT-II with sqrt(2/N) scaling
    n = 80
    k = np.arange(13)[:, None]
    m = np.arange(n)[None, :]
    basis = np.cos(np.pi * k * (2 * m + 1) / (2 * n)) * np.sqrt(2.0 / n)
    np.testing.assert_allclose(c, x @ basis.T, atol=1e-12)
    # basis rows (k >= 1) are orthogonal
    gram = basis @ basis.T
    off = gram - np.diag(np.diag(gram))
    assert np.abs(off).max() < 1e-10


def test_mcd_zero_and_monotone():
    rng = np.random.RandomState(1)
    g = rng.randn(20, 80).astype(np.float64)
    assert mcd(g, g.copy()) < 1e-9
    small = mcd(g, g + 0.01 * rng.randn(20, 80))
    big = mcd(g, g + 0.5 * rng.randn(20, 80))
    assert 0 < small < big


def test_normalize_text_and_edit_distance():
    assert normalize_text("It's a Test, isn't it?") == \
        "it is a test is not it"
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], [1, 2]) == 2


def test_wer_cer_known_values():
    refs = ["the cat sat on the mat"]
    # 1 substitution + 1 deletion over 6 reference words
    hyps = ["the dog sat on mat"]
    np.testing.assert_allclose(wer(refs, hyps), 2 / 6)
    assert wer(refs, refs) == 0.0
    assert cer(["abc"], ["abd"]) == 1 / 3
