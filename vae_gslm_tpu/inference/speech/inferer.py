"""Speech-continuation inference entry point.

Parity target: ``/root/reference/inference/speech/inferer.py`` —
dispatch LVTR vs DiscreteAR by ``hp.model.identifier``, override
diffusion ``sampling_timesteps``/``ddim_sampling_eta`` at inference,
slice a ``sample_prior_length``-second prompt, run the AR sampler for
``sample_length`` seconds, vocode, save wavs, optional VAD trim of the
trailing segment (<1.5 s rule, +4000-sample margin).

VAD uses pyannote when available (same auth-token gate as the
reference); absent that, an energy-based fallback implements the same
trailing-segment trim rule so the post-processing path stays exercised.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np

from ...core.masked import Masked
from ...data import audio as audio_lib
from ...data.dataset import DiscreteTokenDataset, MelSpecDataset
from ...hparams.hp import Hparams
from ...models.vocoder.vocoder import HiFiGAN, HuBERTIO
from ..inferer import BaseInferer
from .sampler import ARTRSampler, DiscreteARSampler

log = logging.getLogger(__name__)


def energy_vad_segments(wave: np.ndarray, sr: int,
                        frame: float = 0.03,
                        threshold_db: float = -40.0,
                        min_gap: float = 0.2):
    """Energy-based VAD: list of (start_sec, end_sec) speech segments."""
    n = int(sr * frame)
    if len(wave) < n:
        return []
    frames = wave[: len(wave) // n * n].reshape(-1, n)
    db = 10 * np.log10(np.mean(frames ** 2, -1) + 1e-10)
    active = db > threshold_db
    segs = []
    start = None
    for i, a in enumerate(active):
        if a and start is None:
            start = i
        elif not a and start is not None:
            segs.append([start * frame, i * frame])
            start = None
    if start is not None:
        segs.append([start * frame, len(active) * frame])
    merged = []
    for s in segs:
        if merged and s[0] - merged[-1][1] < min_gap:
            merged[-1][1] = s[1]
        else:
            merged.append(s)
    return merged


def build_pyannote_vad(auth_token: str):
    """Construct the pyannote VAD pipeline
    (``/root/reference/inference/speech/inferer.py:68-79``).

    Returns None when pyannote isn't installed so callers can fall
    back to :func:`energy_vad_segments`.  Factored out of __init__ so
    the pyannote branch is unit-testable against a stub package."""
    try:
        from pyannote.audio import Model
        from pyannote.audio.pipelines import VoiceActivityDetection
    except ImportError:
        return None
    model = Model.from_pretrained("pyannote/segmentation-3.0",
                                  use_auth_token=auth_token)
    pipeline = VoiceActivityDetection(segmentation=model)
    pipeline.instantiate(
        {"min_duration_on": 0.0, "min_duration_off": 0.0})
    return pipeline


def vad_trim(wave: np.ndarray, sr: int, segments) -> np.ndarray:
    """Trailing-segment trim rule (``speech/inferer.py:176-190``)."""
    if len(segments) < 1:
        return wave
    start, end = segments[-1]
    if (end - start) < 1.5 and len(segments) >= 2:
        end = segments[-2][1]
    end = int(end * sr)
    end = min(end + 4000, len(wave))
    return wave[:end]


class SpeechInferer(BaseInferer):
    def __init__(self, hp: Hparams):
        super().__init__(hp)
        # Multi-chip serving: shard the sampling batch over the
        # inferer's data mesh.  Single chip keeps mesh=None — the
        # mega/stacked fused decode paths (the B<=16 serving defaults)
        # are single-mesh only, and a 1-device mesh would disable
        # them.  `data_parallel: false` opts out.
        self._use_mesh = bool(hp.get("data_parallel", True))
        self.mel_rescale = None
        if self.hp_model.training.has("mel_rescale"):
            self.mel_rescale = self.hp_model.training.mel_rescale
        ident = hp.model.identifier
        if ident.endswith("discrete.DiscreteAR"):
            self.type = "hubert"
            self.hp_model.hubert.check_arg_in_hparams("path")
            codec = HuBERTIO.from_pretrained(
                self.hp_model.hubert.path, hp_rescale=self.mel_rescale)
            self.deduplicate = codec.model.deduplicate
            self.load_model(hp_vq=codec.hp_vq)
            self.model.set_soundstream(codec)
            self.codec = codec
            self.input_key = ("dedup_tokens" if self.deduplicate
                              else "tokens")
            self.sampler = DiscreteARSampler(
                self.model, mesh=self._serving_mesh())
        else:
            self.type = "lvtr"
            self.vocoder = HiFiGAN.from_pretrained(
                self.hp_model.vocoder.path, hp_rescale=self.mel_rescale)
            self.load_model(input_dim=self.vocoder.hp.n_mels)
            self.input_key = "mel"
            kv_dtype = None
            if hp.get("kv_cache_dtype", None) == "int8":
                import jax.numpy as jnp
                kv_dtype = jnp.int8
            self.sampler = ARTRSampler(
                self.model, kv_dtype=kv_dtype,
                quantize_weights=hp.get("weight_dtype", None) == "int8",
                mesh=self._serving_mesh())
        self.use_tokens = getattr(self.model, "use_tokens", False)
        if self.use_tokens:
            self.hp_hubert = Hparams(
                deduplicate=False,
                sample_rate=self.hp_model.hubert.sample_rate)
        # Diffusion overrides (``speech/inferer.py:54-67``).
        if hp.has("diffusion"):
            dec = (self.codec.model.decoder if self.type == "hubert"
                   else self.model.decoder)
            dec.override_sampling(
                hp.diffusion.get("sampling_timesteps", None),
                hp.diffusion.get("ddim_sampling_eta", None))
        self.vad_pipeline = None
        self.use_vad = hp.has("vad")
        if self.use_vad and hp.vad.get("auth_token", None) is not None:
            self.vad_pipeline = build_pyannote_vad(hp.vad.auth_token)
            if self.vad_pipeline is None:
                log.warning("pyannote unavailable; using energy VAD")
        self.sampled = 0

    def _serving_mesh(self):
        if self._use_mesh and self.mesh.devices.size > 1:
            return self.mesh
        return None

    # ----------------------------------------------------------------
    def test_dataloader(self):
        if self.type == "hubert":
            dataset = DiscreteTokenDataset(
                self.hp.data, self.codec.hp,
                self.codec.model.hp.hubert, self.mel_rescale)
            self.token_sample_rate = dataset.token_sample_rate
        elif self.use_tokens:
            dataset = DiscreteTokenDataset(
                self.hp.data, self.vocoder.hp, self.hp_hubert,
                self.mel_rescale)
            self.token_sample_rate = dataset.token_sample_rate
        else:
            dataset = MelSpecDataset(self.hp.data, self.vocoder.hp,
                                     self.mel_rescale)
        self.mel_sample_rate = dataset.melspec.sample_rate
        self.hp.data.sampler.drop_last = False
        self.hp.trainer = self.hp.get("trainer", Hparams(
            distributed=False))
        return self.get_dataloader(self.hp.data, dataset)

    def _segments(self, wave: np.ndarray, sr: int):
        if self.vad_pipeline is not None:
            import tempfile
            with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                audio_lib.save_wav(f.name, wave, sr)
                vad = self.vad_pipeline(f.name)
            return [[t.start, t.end] for t in vad.get_timeline()]
        return energy_vad_segments(wave, sr)

    def test_step(self, batch, key) -> np.ndarray:
        hp = self.hp
        if self.type == "hubert":
            if self.deduplicate:
                # Dedup mode counts in tokens, not seconds
                # (``speech/inferer.py:118-125``).
                prior = batch["dedup_tokens"]
                prior_length = hp.sample_prior_tokens
                length = hp.sample_tokens
            else:
                prior = batch["tokens"]
                prior_length = int(hp.sample_prior_length
                                   * self.token_sample_rate)
                length = int(hp.sample_length * self.token_sample_rate)
            prior_v = prior.value[:, :prior_length]
            if self.model.f0 is not None:
                # [token, f0] channels (``speech/inferer.py:131-133``).
                f0 = batch["f0"].value[:, :prior_length]
                prior_v = np.concatenate(
                    [np.asarray(prior_v, np.float32)[..., None],
                     np.asarray(f0, np.float32)[..., None]], -1)
            prior = Masked(
                prior_v,
                np.minimum(np.asarray(prior.lengths), prior_length), 1)
            full = self.sampler(length, prior, key,
                                temperature=hp.temperature)
            dec_kw = {}
            if self.model.codec.model.hp.has("spkr"):
                # Speaker-conditioned codec decodes with the prompt mel
                # (``speech/inferer.py:134-147``).
                mel_len = int(hp.sample_prior_length
                              * self.mel_sample_rate)
                mel = batch["mel"]
                dec_kw["spkr"] = Masked(
                    mel.value[:, :mel_len],
                    np.minimum(np.asarray(mel.lengths), mel_len), 1)
            audio = self.model.decode(full,
                                      key=jax.random.fold_in(key, 1),
                                      **dec_kw)
        else:
            mel = batch["mel"]
            prior_length = int(hp.sample_prior_length
                               * self.mel_sample_rate)
            prior_v = mel.value[:, :prior_length]
            if self.use_tokens:
                toks = batch["tokens"].value[:, :prior_length, None]
                prior_v = np.concatenate(
                    [np.asarray(toks, np.float32), prior_v], -1)
            prior = Masked(
                prior_v,
                np.minimum(np.asarray(mel.lengths), prior_length), 1)
            length = int(hp.sample_length * self.mel_sample_rate
                         * self.model.sample_ratio)
            samples = self.sampler(
                length, prior, key,
                temperature=hp.temperature,
                token_temperature=hp.get("token_temperature", 1.0),
                truncated_norm=hp.get("truncated_norm", None),
                encoder_temperature=hp.get("encoder_temperature", 1.0))
            audio = self.vocoder.decode(samples["output"])
        return audio

    def run(self, seed: int = 0,
            max_batches: Optional[int] = None) -> int:
        os.makedirs(self.hp.output_dir, exist_ok=True)
        loader = self.test_dataloader()
        key = jax.random.PRNGKey(seed)
        sr = self.hp.data.sample_rate
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            key, k = jax.random.split(key)
            audio = self.test_step(batch, k)
            waves = np.asarray(audio.value)
            lens = np.asarray(audio.lengths)
            for b in range(waves.shape[0]):
                self.sampled += 1
                fn = os.path.join(self.hp.output_dir,
                                  f"{self.sampled}.wav")
                wave = waves[b, : lens[b]]
                audio_lib.save_wav(fn, wave, sr)
                if self.use_vad:
                    segs = self._segments(wave, sr)
                    trimmed = vad_trim(wave, sr, segs)
                    if len(trimmed) < len(wave):
                        audio_lib.save_wav(fn, trimmed, sr)
        return self.sampled
