"""Native C++ data-IO parity vs the numpy/scipy implementations."""
import numpy as np
import pytest

from vae_gslm_tpu.data import audio as audio_lib
from vae_gslm_tpu.data import native

SR = 16000


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no compiler)")
    return lib


def test_wav_read_matches_scipy(lib, tmp_path):
    rng = np.random.RandomState(0)
    x = (0.5 * rng.randn(12345)).clip(-1, 1).astype(np.float32)
    p = str(tmp_path / "t.wav")
    audio_lib.save_wav(p, x, SR)
    out = native.wav_read(p)
    assert out is not None
    wave, sr = out
    assert sr == SR
    from scipy.io import wavfile
    sr2, ref = wavfile.read(p)
    ref = ref.astype(np.float32) / 32768.0
    np.testing.assert_allclose(wave, ref, atol=1e-6)


def test_wav_read_stereo_mixdown(lib, tmp_path):
    from scipy.io import wavfile
    rng = np.random.RandomState(1)
    st = (rng.randn(1000, 2) * 8000).astype(np.int16)
    p = str(tmp_path / "st.wav")
    wavfile.write(p, SR, st)
    wave, sr = native.wav_read(p)
    ref = (st.astype(np.float32) / 32768.0).mean(-1)
    np.testing.assert_allclose(wave, ref, atol=1e-6)


def test_resample_close_to_scipy(lib):
    from scipy.signal import resample_poly
    rng = np.random.RandomState(2)
    t = np.arange(44100) / 44100
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32) \
        + 0.1 * rng.randn(44100).astype(np.float32)
    got = native.resample(x, 44100, 16000)
    ref = resample_poly(x, 160, 441).astype(np.float32)
    n = min(len(got), len(ref))
    # interior agreement (filters differ slightly at edges)
    err = np.abs(got[100:n - 100] - ref[100:n - 100])
    assert err.mean() < 5e-3
    assert abs(len(got) - len(ref)) <= 2


def test_resample_preserves_tone(lib):
    t = np.arange(24000) / 24000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = native.resample(x, 24000, 16000)
    # Dominant frequency preserved
    spec = np.abs(np.fft.rfft(y[500:-500] * np.hanning(len(y) - 1000)))
    peak = spec.argmax() * 16000 / (len(y) - 1000)
    assert abs(peak - 440) < 5


def test_mel_frames_matches_python(lib):
    rng = np.random.RandomState(3)
    x = rng.randn(5000).astype(np.float32)
    frames = native.mel_frames(x, 1025, 320, 512)
    ref = np.pad(x, 512, mode="reflect")
    n = 1 + (len(ref) - 1025) // 320
    idx = np.arange(n)[:, None] * 320 + np.arange(1025)[None]
    np.testing.assert_allclose(frames[:n], ref[idx], atol=1e-6)


def test_load_audio_uses_native(lib, tmp_path):
    x = (0.3 * np.sin(np.linspace(0, 60, 8000))).astype(np.float32)
    p = str(tmp_path / "n.wav")
    audio_lib.save_wav(p, x, SR)
    wave, sr = audio_lib.load_audio(p)
    assert sr == SR
    np.testing.assert_allclose(wave, x, atol=1e-3)
