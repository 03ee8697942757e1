"""ctypes bindings for the native data-IO library (``native/dataio.cc``).

Builds ``libdataio.so`` on first use if a compiler is available; all
entry points fall back to the numpy implementations in
``vae_gslm_tpu.data.audio`` when the library is missing, so the
framework never hard-depends on the native path.  Disable with
``VAE_GSLM_NO_NATIVE=1``.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
             "-o", out],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        log.debug("native build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("VAE_GSLM_NO_NATIVE"):
        return None
    root = _repo_root()
    so = os.path.join(root, "native", "libdataio.so")
    src = os.path.join(root, "native", "dataio.cc")
    if not os.path.exists(so):
        if not (os.path.exists(src) and _build(src, so)):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.wav_read.restype = ctypes.c_int
    lib.wav_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64)]
    lib.flac_read.restype = ctypes.c_int
    lib.flac_read.argtypes = list(lib.wav_read.argtypes)
    lib.resample_sinc.restype = ctypes.c_int64
    lib.resample_sinc.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.mel_frames.restype = ctypes.c_int64
    lib.mel_frames.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    _LIB = lib
    return _LIB


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def wav_read(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Mono float32 decode; None if the native path is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    sr = ctypes.c_int32(0)
    n = ctypes.c_int64(0)
    rc = lib.wav_read(path.encode(), None, 0, ctypes.byref(sr),
                      ctypes.byref(n))
    if rc != 0:
        return None
    out = np.empty(n.value, np.float32)
    rc = lib.wav_read(path.encode(), _fptr(out), n.value,
                      ctypes.byref(sr), ctypes.byref(n))
    if rc != 0:
        return None
    return out, int(sr.value)


def flac_read(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Mono float32 FLAC decode via the native decoder; None if the
    native library is unavailable or the file fails to parse."""
    lib = get_lib()
    if lib is None:
        return None
    sr = ctypes.c_int32(0)
    n = ctypes.c_int64(0)
    # Query pass: reports STREAMINFO total samples, or (for streams
    # with unknown total) the count from a counting decode.
    rc = lib.flac_read(path.encode(), None, 0, ctypes.byref(sr),
                       ctypes.byref(n))
    if rc != 0:
        return None
    out = np.empty(max(n.value, 1), np.float32)
    rc = lib.flac_read(path.encode(), _fptr(out), out.shape[0],
                       ctypes.byref(sr), ctypes.byref(n))
    if rc != 0:
        return None
    return out[:n.value], int(sr.value)


def resample(x: np.ndarray, sr_in: int, sr_out: int
             ) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    max_out = int(len(x) * sr_out / sr_in) + 16
    out = np.empty(max_out, np.float32)
    n = lib.resample_sinc(_fptr(x), len(x), sr_in, sr_out, _fptr(out),
                          max_out)
    if n < 0:
        return None
    return out[:n]


def mel_frames(x: np.ndarray, frame_len: int, hop: int, pad: int
               ) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    max_frames = 1 + (len(x) + 2 * pad) // hop
    out = np.empty((max_frames, frame_len), np.float32)
    n = lib.mel_frames(_fptr(x), len(x), frame_len, hop, pad,
                       _fptr(out), max_frames)
    if n < 0:
        return None
    return out[:n]
