"""CPU-side audio IO and signal utilities (numpy).

Replaces the torchaudio IO path of the reference
(``data/dataset.py:183-190``, ``utils/helpers.py:35-77``).  WAV decoding
is native (scipy); other codecs are gated with a clear error since no
decoder binaries exist in this image.  Resampling is polyphase
(scipy.signal.resample_poly) against the reference's sinc-interpolation
resampler pool (16k/44.1k/48k/24k).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

SAMPLE_RATE_POOL = [16000, 44100, 48000, 24000]


def load_audio(path: str) -> Tuple[np.ndarray, int]:
    """Load an audio file → (float32 mono-able array (C, T) or (T,), sr).

    Uses the native C++ decoder (``native/dataio.cc``) when available,
    otherwise scipy (WAV only).  FLAC (the reference's LibriSpeech
    format, decoded there via torchaudio — ``data/dataset.py:183``) is
    handled by the native decoder."""
    from . import native
    if path.lower().endswith(".flac"):
        nat = native.flac_read(path)
        if nat is not None:
            return nat
        raise ValueError(
            f"FLAC decode needs the native library (g++ build of "
            f"native/dataio.cc) and a well-formed file: {path}")
    if not path.lower().endswith(".wav"):
        raise ValueError(
            f"Only WAV/FLAC decoding is available in this build: "
            f"{path}. Convert other codecs to WAV first.")
    nat = native.wav_read(path)
    if nat is not None:
        return nat  # already mono float32
    from scipy.io import wavfile
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:  # (T, C) → (C, T)
        data = data.T
    return data, int(sr)


def save_wav(path: str, wave: np.ndarray, sample_rate: int) -> None:
    from scipy.io import wavfile
    wave = np.clip(np.asarray(wave, np.float32), -1.0, 1.0)
    wavfile.write(path, sample_rate, (wave * 32767.0).astype(np.int16))


def to_mono(audio: np.ndarray) -> np.ndarray:
    if audio.ndim == 2:
        return audio.mean(0)
    return audio


def resample(audio: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    if orig_sr == new_sr:
        return audio
    from . import native
    nat = native.resample(audio, orig_sr, new_sr)
    if nat is not None:
        return nat
    from scipy.signal import resample_poly
    g = math.gcd(orig_sr, new_sr)
    return resample_poly(audio, new_sr // g, orig_sr // g).astype(
        np.float32)


def dither(audio: np.ndarray, rng: np.random.RandomState,
           scale: float = 1.0 / 32768.0) -> np.ndarray:
    """Simple TPDF dither (reference uses torchaudio.functional.dither)."""
    noise = (rng.rand(*audio.shape) - rng.rand(*audio.shape)) * scale
    return (audio + noise).astype(np.float32)


def random_crop_1d(signal: np.ndarray, sample_rate: float,
                   min_crop_length_sec: float,
                   rng: np.random.RandomState,
                   return_start_end: bool = False):
    """Crop along the first dimension (``utils/helpers.py:35-51``)."""
    min_crop = int(min_crop_length_sec * sample_rate)
    if min_crop >= len(signal):
        if return_start_end:
            return signal, 0, len(signal)
        return signal
    start = int(rng.randint(0, len(signal) - min_crop + 1))
    out = signal[start: start + min_crop]
    if return_start_end:
        return out, start, start + min_crop
    return out


def pad_1d(signal: np.ndarray, sample_rate: float, length_sec: float,
           padding_mode: str = "constant") -> np.ndarray:
    """Pad first dim to length (``utils/helpers.py:54-67``)."""
    length = int(length_sec * sample_rate)
    if len(signal) >= length:
        return signal
    pad = [(0, length - len(signal))] + [(0, 0)] * (signal.ndim - 1)
    mode = "constant" if padding_mode == "constant" else padding_mode
    return np.pad(signal, pad, mode=mode)


def truncate_1d(signal: np.ndarray, sample_rate: float,
                length_sec: float) -> np.ndarray:
    length = int(length_sec * sample_rate)
    if len(signal) < length:
        return signal
    return signal[:length]
