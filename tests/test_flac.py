"""Native FLAC decoder round-trip tests (lossless: decoded mono mixdown
must equal the encoded integers exactly, up to the documented float32
scaling)."""
import numpy as np
import pytest

from vae_gslm_tpu.data import native
from vae_gslm_tpu.data.audio import load_audio
from tests.flac_helper import write_flac

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native dataio library unavailable")


def expected_mono(samples: np.ndarray, bps: int = 16) -> np.ndarray:
    s = np.atleast_2d(np.asarray(samples, np.float64))
    return (s.mean(0) / (1 << (bps - 1))).astype(np.float32)


def roundtrip(tmp_path, samples, sr=16000, **kw):
    p = str(tmp_path / "t.flac")
    write_flac(p, samples, sr, **kw)
    got = native.flac_read(p)
    assert got is not None, "native decode failed"
    audio, got_sr = got
    assert got_sr == sr
    ref = expected_mono(samples)
    assert audio.shape == ref.shape, (audio.shape, ref.shape)
    np.testing.assert_allclose(audio, ref, atol=2e-7)
    return audio


def test_mono_fixed_predictors(tmp_path):
    rng = np.random.RandomState(0)
    t = np.arange(3000)
    x = (6000 * np.sin(2 * np.pi * t * 220 / 16000)
         + rng.randint(-50, 50, len(t))).astype(np.int64)
    for order in (0, 1, 2):
        roundtrip(tmp_path, x, subframe=f"fixed{order}")


def test_mono_verbatim_and_constant(tmp_path):
    rng = np.random.RandomState(1)
    roundtrip(tmp_path, rng.randint(-32768, 32767, 1000),
              subframe="verbatim")
    roundtrip(tmp_path, np.full(700, -123, np.int64),
              subframe="constant")


def test_stereo_decorrelation_modes(tmp_path):
    rng = np.random.RandomState(2)
    t = np.arange(2000)
    left = (5000 * np.sin(2 * np.pi * t * 150 / 16000)).astype(np.int64)
    right = (4000 * np.sin(2 * np.pi * t * 190 / 16000)
             + rng.randint(-20, 20, len(t))).astype(np.int64)
    stereo = np.stack([left, right])
    for mode in ("independent", "left_side", "mid_side"):
        roundtrip(tmp_path, stereo, stereo=mode, subframe="fixed2")


def test_lpc_subframes(tmp_path):
    """Quantized-LPC subframes (the dominant mode in real encoder
    output, e.g. LibriSpeech) round-trip losslessly."""
    rng = np.random.RandomState(4)
    t = np.arange(2500)
    x = (8000 * np.sin(2 * np.pi * t * 330 / 16000)
         + rng.randint(-100, 100, len(t))).astype(np.int64)
    roundtrip(tmp_path, x, subframe="lpc2")
    stereo = np.stack([x, (x * 3) // 4])
    roundtrip(tmp_path, stereo, stereo="mid_side", subframe="lpc2")


def test_many_frames_multibyte_frame_number(tmp_path):
    """>=128 frames exercises the 2-byte UTF-8 frame-number path."""
    rng = np.random.RandomState(3)
    x = rng.randint(-2000, 2000, 200 * 64).astype(np.int64)
    roundtrip(tmp_path, x, block=64, subframe="fixed1")


def test_load_audio_flac_dispatch(tmp_path):
    x = (3000 * np.sin(2 * np.pi * np.arange(1600) * 100 / 8000)
         ).astype(np.int64)
    p = str(tmp_path / "s.flac")
    write_flac(p, x, 8000)
    audio, sr = load_audio(p)
    assert sr == 8000
    np.testing.assert_allclose(audio, expected_mono(x), atol=2e-7)


def test_wasted_bits(tmp_path):
    """Subframes with stripped low zero bits are shifted back."""
    rng = np.random.RandomState(5)
    x = (rng.randint(-4000, 4000, 1500) << 2).astype(np.int64)
    roundtrip(tmp_path, x, subframe="fixed1", wasted=2)
    roundtrip(tmp_path, x, subframe="verbatim", wasted=1)
