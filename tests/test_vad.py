"""VAD post-processing: energy fallback, the trailing-segment trim
rule, and the pyannote pipeline branch (exercised against a stub
pyannote package so the non-fallback path isn't dead code; VERDICT r1
item 10).  Parity target:
/root/reference/inference/speech/inferer.py:68-79,172-190."""
import os
import sys
import types

import numpy as np
import pytest

from vae_gslm_tpu.inference.speech.inferer import (SpeechInferer,
                                                   build_pyannote_vad,
                                                   energy_vad_segments,
                                                   vad_trim)

SR = 16000


def _wave_with_gaps():
    """1.0 s speech, 0.5 s silence, 0.3 s speech."""
    t1 = np.arange(int(SR * 1.0)) / SR
    t2 = np.arange(int(SR * 0.3)) / SR
    return np.concatenate([
        0.3 * np.sin(2 * np.pi * 220 * t1),
        np.zeros(int(SR * 0.5)),
        0.3 * np.sin(2 * np.pi * 220 * t2),
    ]).astype(np.float32)


def test_energy_vad_segments():
    segs = energy_vad_segments(_wave_with_gaps(), SR)
    assert len(segs) == 2
    assert abs(segs[0][0] - 0.0) < 0.1
    assert abs(segs[0][1] - 1.0) < 0.1
    assert abs(segs[1][0] - 1.5) < 0.1
    assert abs(segs[1][1] - 1.8) < 0.1


def test_vad_trim_trailing_rule():
    wave = _wave_with_gaps()
    # last segment < 1.5 s -> trim back to the previous segment's end
    trimmed = vad_trim(wave, SR, [[0.0, 1.0], [1.5, 1.8]])
    assert len(trimmed) == int(1.0 * SR) + 4000
    # last segment >= 1.5 s -> keep it (+4000 sample margin, clamped)
    kept = vad_trim(wave, SR, [[0.0, 1.8]])
    assert len(kept) == len(wave)
    # single short segment: nothing earlier to fall back to -> keep
    single = vad_trim(wave, SR, [[1.5, 1.8]])
    assert len(single) == len(wave)  # 1.8 s end + margin clamps
    # no segments -> unchanged
    assert len(vad_trim(wave, SR, [])) == len(wave)


# ------------------------------------------------------- pyannote stub
class _Turn:
    def __init__(self, start, end):
        self.start = start
        self.end = end


class _Annotation:
    def __init__(self, segs):
        self._segs = segs

    def get_timeline(self):
        return [_Turn(s, e) for s, e in self._segs]


@pytest.fixture()
def fake_pyannote(monkeypatch):
    """Install a minimal pyannote.audio that records its calls and
    answers with energy-VAD segments of the file it is given."""
    calls = {}

    class FakeModel:
        @classmethod
        def from_pretrained(cls, name, use_auth_token=None):
            calls["model"] = (name, use_auth_token)
            return cls()

    class FakeVAD:
        def __init__(self, segmentation=None):
            calls["segmentation"] = segmentation

        def instantiate(self, params):
            calls["params"] = params

        def __call__(self, path):
            from vae_gslm_tpu.data import audio as audio_lib

            assert os.path.exists(path)
            wave, sr = audio_lib.load_audio(path)
            calls["wav_len"] = len(wave)
            return _Annotation(energy_vad_segments(wave, sr))

    root = types.ModuleType("pyannote")
    audio = types.ModuleType("pyannote.audio")
    audio.Model = FakeModel
    pipelines = types.ModuleType("pyannote.audio.pipelines")
    pipelines.VoiceActivityDetection = FakeVAD
    monkeypatch.setitem(sys.modules, "pyannote", root)
    monkeypatch.setitem(sys.modules, "pyannote.audio", audio)
    monkeypatch.setitem(sys.modules, "pyannote.audio.pipelines",
                        pipelines)
    return calls


def test_pyannote_branch(fake_pyannote):
    pipe = build_pyannote_vad("hf_token")
    assert pipe is not None
    assert fake_pyannote["model"] == ("pyannote/segmentation-3.0",
                                      "hf_token")
    assert fake_pyannote["params"] == {"min_duration_on": 0.0,
                                       "min_duration_off": 0.0}

    # _segments round-trips the wave through a temp wav into the
    # pipeline and extracts (start, end) pairs from the timeline.
    holder = types.SimpleNamespace(vad_pipeline=pipe)
    wave = _wave_with_gaps()
    segs = SpeechInferer._segments(holder, wave, SR)
    assert fake_pyannote["wav_len"] == len(wave)
    assert len(segs) == 2
    trimmed = vad_trim(wave, SR, segs)
    assert len(trimmed) < len(wave)


def test_build_pyannote_vad_absent_returns_none():
    assert "pyannote" not in sys.modules  # sandbox has no pyannote
    assert build_pyannote_vad("tok") is None
