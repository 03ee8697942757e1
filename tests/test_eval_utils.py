"""Eval substitutes (`inference/eval_utils.py`): NCCF f0, DCT-cepstral
MCD, edit-distance WER/CER — replacing the reference's
torchcrepe/pysptk/jiwer dependencies
(/root/reference/inference/speech/reconstruction.py:99-156)."""
import numpy as np

from vae_gslm_tpu.inference import eval_utils
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


# ----------------------------------------------- real-package dispatch
import sys
import types

import pytest


def test_crepe_branch_via_stub(monkeypatch):
    """When torchcrepe is installed, crepe_f0 routes through
    torchcrepe.predict with the reference's arguments (tiny model,
    periodicity, 50-550 Hz band: /root/reference/utils/crepe.py,
    reconstruction.py:18-19)."""
    import torch

    calls = {}

    def predict(audio, sr, hop_length=None, fmin=None, fmax=None,
                model=None, device=None, return_periodicity=False):
        calls.update(sr=sr, hop=hop_length, fmin=fmin, fmax=fmax,
                     model=model, device=device,
                     periodicity=return_periodicity,
                     n=audio.shape[1])
        t = 1 + audio.shape[1] // hop_length
        return (torch.full((1, t), 220.0), torch.full((1, t), 0.9))

    stub = types.ModuleType("torchcrepe")
    stub.predict = predict
    monkeypatch.setitem(sys.modules, "torchcrepe", stub)

    wave = np.zeros(3200, np.float32)
    f0, conf = eval_utils.crepe_f0(wave, 16000, hop=320)
    assert calls == {"sr": 16000, "hop": 320, "fmin": 50.0,
                     "fmax": 550.0, "model": "tiny", "device": "cpu",
                     "periodicity": True, "n": 3200}
    assert (f0 == 220.0).all() and (conf == 0.9).all()


def test_mcd_wav_pysptk_branch_via_stub(monkeypatch):
    """mcd_wav replicates /root/reference/utils/mcd.py exactly:
    hamming window, mcep(eps=1e-8, etype=1) per 1024/256 frame,
    mean 10/ln10*sqrt(2*sum(diff^2)).  Validated against an
    independent computation over a recording stub of mcep."""
    mcep_calls = []

    def mcep(frame, dim, alpha, eps=None, etype=None):
        assert dim == 23 and alpha == 0.42
        assert eps == 1e-8 and etype == 1
        mcep_calls.append(len(frame))
        # deterministic fake cepstrum from the frame content
        return np.arange(dim + 1) * float(np.mean(frame ** 2))

    sptk = types.SimpleNamespace(hamming=np.hamming, mcep=mcep)
    stub = types.ModuleType("pysptk")
    stub.sptk = sptk
    monkeypatch.setitem(sys.modules, "pysptk", stub)

    rng = np.random.RandomState(0)
    a = rng.randn(4096).astype(np.float64)
    b = rng.randn(4096).astype(np.float64)
    got = eval_utils.mcd_wav(a, b)
    assert all(n == 1024 for n in mcep_calls)

    # independent reference computation with the same stub mcep
    def wav2mcep(x):
        win = np.hamming(1024)
        nf = (len(x) - 1024) // 256 + 1
        return np.stack([mcep(x[256 * i: 256 * i + 1024] * win,
                              23, 0.42, eps=1e-8, etype=1)
                         for i in range(nf)])
    ma, mb = wav2mcep(a), wav2mcep(b)
    exp = np.mean(10.0 / np.log(10.0)
                  * np.sqrt(2 * np.sum((ma - mb) ** 2, 1)))
    np.testing.assert_allclose(got, exp, rtol=1e-9)


def _mini_jiwer_pipeline(text: str):
    """Independent replication of the reference's jiwer Compose
    (reconstruction.py:55-63): ToLowerCase, RemoveWhiteSpace(
    replace_by_space), RemoveMultipleSpaces,
    ExpandCommonEnglishContractions, RemovePunctuation, Strip,
    ReduceToListOfListOfChars."""
    import re
    t = text.lower()
    t = re.sub(r"\s", " ", t)
    t = re.sub(r" +", " ", t)
    for pat, rep in [(r"won't", "will not"), (r"can't", "can not"),
                     (r"n't", " not"), (r"'re", " are"),
                     (r"'ve", " have"), (r"'ll", " will"),
                     (r"'d", " would"), (r"'m", " am"),
                     (r"it's", "it is")]:
        t = re.sub(pat, rep, t)
    t = re.sub(r"[^\w\s]", "", t)
    t = re.sub(r"\s+", " ", t).strip()
    return list(t)


def test_asr_error_rate_matches_jiwer_semantics():
    """The native fallback numerically equals an independent
    replication of the reference's jiwer char-error pipeline on a
    corpus covering contractions, punctuation, spacing and case."""
    refs = ["Hello, World!", "I can't   do it.", "it's A TEST",
            "won't you won't", "n o r m a l"]
    hyps = ["hello world", "I can not do it", "its a test!",
            "will not you wont", "normal"]
    got = eval_utils.asr_error_rate(refs, hyps)
    errs = total = 0
    for r, h in zip(refs, hyps):
        rc, hc = _mini_jiwer_pipeline(r), _mini_jiwer_pipeline(h)
        errs += eval_utils.edit_distance(rc, hc)
        total += len(rc)
    np.testing.assert_allclose(got, errs / total, rtol=1e-9)


def test_jiwer_branch_via_stub(monkeypatch):
    """With jiwer installed, asr_error_rate builds the reference's
    exact Compose list and calls jiwer.cer with it."""
    seen = {}

    class _T:
        def __init__(self, name, **kw):
            self.name = name
            self.kw = kw

    stub = types.ModuleType("jiwer")
    for n in ("ToLowerCase", "RemoveMultipleSpaces",
              "ExpandCommonEnglishContractions", "RemovePunctuation",
              "Strip", "ReduceToListOfListOfChars"):
        setattr(stub, n, lambda n=n, **kw: _T(n, **kw))
    stub.RemoveWhiteSpace = lambda replace_by_space=False: _T(
        "RemoveWhiteSpace", replace_by_space=replace_by_space)
    stub.Compose = lambda ts: ("compose", [t.name for t in ts])

    def cer_fn(refs, hyps, reference_transform=None,
               hypothesis_transform=None):
        seen.update(refs=refs, hyps=hyps, rt=reference_transform,
                    ht=hypothesis_transform)
        return 0.123

    stub.cer = cer_fn
    monkeypatch.setitem(sys.modules, "jiwer", stub)
    out = eval_utils.asr_error_rate(["a"], ["b"])
    assert out == 0.123
    assert seen["rt"] == ("compose", [
        "ToLowerCase", "RemoveWhiteSpace", "RemoveMultipleSpaces",
        "ExpandCommonEnglishContractions", "RemovePunctuation",
        "Strip", "ReduceToListOfListOfChars"])
    assert seen["rt"] == seen["ht"]


def test_f0_autocorr_accuracy_over_sweep():
    """Native NCCF tracker accuracy on known-truth tones across the
    speech band: < 2 Hz absolute error at every tested pitch."""
    sr = 16000
    for true_f0 in (100.0, 150.0, 220.0, 330.0, 440.0):
        t = np.arange(int(sr * 0.5)) / sr
        wave = (0.5 * np.sin(2 * np.pi * true_f0 * t)).astype(
            np.float32)
        f0, conf = eval_utils.f0_autocorr(wave, sr)
        voiced = conf > 0.5
        assert voiced.mean() > 0.9, true_f0
        err = np.abs(np.median(f0[voiced]) - true_f0)
        assert err < 2.0, (true_f0, err)


# ------------------------------------------------------- native mcep
def test_native_mcep_exact_recovery_on_representable_spectrum():
    """When the warped log-periodogram lies exactly in the span of the
    order-K warped-cosine basis, the UELS criterion attains its global
    minimum E=0 at R=0, so mcep must recover the generating
    coefficients exactly (the same optimum pysptk's solver reaches —
    /root/reference/utils/mcd.py:10-16 contract)."""
    rng = np.random.RandomState(3)
    n_fft, order, alpha = 256, 12, 0.42
    nbin = n_fft // 2 + 1
    omega = 2 * np.pi * np.arange(nbin) / n_fft
    beta = eval_utils._mel_warp(omega, alpha)
    psi = np.cos(np.outer(beta, np.arange(order + 1)))
    mc_true = np.concatenate([[0.3], 0.2 * rng.randn(order)])
    mc_true *= 1.0 / (1 + np.arange(order + 1))       # decaying
    target_mag = np.exp(mc_true @ psi.T)              # |X(w)|
    # zero-phase real signal with exactly this |rfft| (eps shifts the
    # periodogram by 1e-8 — far below the recovery tolerance)
    x = np.fft.irfft(target_mag, n_fft)
    mc = eval_utils.mcep(x, order=order, alpha=alpha)
    np.testing.assert_allclose(mc, mc_true, atol=2e-4)


def test_native_mcep_stationarity_on_noise_frames():
    """On arbitrary (speech-like) frames the solution must be a
    stationary point of the UELS criterion: grad_k = 2*sum_w w*(1 -
    e^R)*psi_k = 0.  Convexity of E then makes it the unique global
    minimum — the defining property shared with SPTK's mcep."""
    rng = np.random.RandomState(7)
    n_fft, order, alpha = 1024, 23, 0.42
    # coloured noise: lowpassed gaussians, hamming windowed
    x = rng.randn(4, n_fft)
    x = np.cumsum(x, axis=-1) * 0.05 + x
    frames = x * np.hamming(n_fft)
    # tight tolerance to verify full convergence (the dd=1e-5 default
    # matches SPTK's stop rule and leaves |grad| ~1e-4)
    mc = eval_utils.mcep(frames, order=order, alpha=alpha,
                         itr_max=100, dd=1e-10)
    assert mc.shape == (4, order + 1)
    spec = np.abs(np.fft.rfft(frames, n_fft, axis=-1)) ** 2 + 1e-8
    nbin = n_fft // 2 + 1
    w = np.full(nbin, 2.0 / n_fft)
    w[0] = w[-1] = 1.0 / n_fft
    beta = eval_utils._mel_warp(
        2 * np.pi * np.arange(nbin) / n_fft, alpha)
    psi = np.cos(np.outer(beta, np.arange(order + 1)))
    r = np.log(spec) - 2.0 * (mc @ psi.T)
    grad = 2.0 * ((1.0 - np.exp(r)) * w) @ psi
    # scale-free stationarity: |grad| small vs the criterion curvature
    assert np.abs(grad).max() < 1e-6


def test_native_mcep_batch_matches_single_frame():
    rng = np.random.RandomState(11)
    frames = rng.randn(3, 512) * np.hanning(512)
    batch = eval_utils.mcep(frames, order=10)
    for i in range(3):
        single = eval_utils.mcep(frames[i], order=10)
        np.testing.assert_allclose(batch[i], single, atol=1e-8)


def test_mcd_wav_native_end_to_end():
    """Without pysptk installed, mcd_wav runs the native UELS solver:
    identical waves give MCD 0; a quieter copy gives a positive MCD
    driven by the gain term; result is finite and reasonable."""
    rng = np.random.RandomState(0)
    a = rng.randn(3200).astype(np.float64) * 0.1
    assert eval_utils.mcd_wav(a, a.copy()) < 1e-6
    val = eval_utils.mcd_wav(a, a * 0.5)
    # pure gain change: diff only in c0 = ln(0.5) per frame →
    # MCD = 10/ln10 * sqrt(2) * ln 2 ≈ 4.257 dB
    exp = 10.0 / np.log(10.0) * np.sqrt(2.0) * np.log(2.0)
    np.testing.assert_allclose(val, exp, rtol=0.02)
