"""Text-to-speech inference.

Parity target: ``/root/reference/inference/tts/inferer.py`` — load
symbols + LVTTS from the checkpoint dir, EOS-stopped AR sampling
conditioned on text + a speaker-reference mel crop, save
``N.wav``/``N_c.wav``/``N.txt`` triples.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ...core.masked import Masked
from ...data import audio as audio_lib
from ...data.dataset import MelSpecDataset
from ...data.symbols import Symbols
from ...hparams.hp import Hparams
from ...models.vocoder.vocoder import HiFiGAN
from ..inferer import BaseInferer
from .sampler import ARTRTTSSampler


class TTSInferer(BaseInferer):
    def __init__(self, hp: Hparams):
        super().__init__(hp)
        hp.check_arg_in_hparams("max_sample_length", "min_sample_length",
                                "temperature", "eos_threshold")
        self.mel_rescale = None
        if self.hp_model.training.has("mel_rescale"):
            self.mel_rescale = self.hp_model.training.mel_rescale
        self.vocoder = HiFiGAN.from_pretrained(
            self.hp_model.vocoder.path, hp_rescale=self.mel_rescale)
        self.symbols = Symbols.load(
            os.path.join(hp.ckpt_path, "symbols.json"))
        self.load_model(symbols=self.symbols,
                        input_dim=self.vocoder.hp.n_mels)
        self.sampler = ARTRTTSSampler(self.model)
        if hp.has("diffusion"):
            self.model.decoder.override_sampling(
                hp.diffusion.get("sampling_timesteps", None),
                hp.diffusion.get("ddim_sampling_eta", None))
        self.sampled = 0

    def test_dataloader(self):
        dataset = MelSpecDataset(self.hp.data, self.vocoder.hp,
                                 self.mel_rescale)
        self.mel_sample_rate = dataset.melspec.sample_rate
        dataset.symbols = self.symbols
        self.hp.trainer = self.hp.get("trainer",
                                      Hparams(distributed=False))
        return self.get_dataloader(self.hp.data, dataset)

    def test_step(self, batch, key):
        max_frames = int(self.hp.max_sample_length
                         * self.mel_sample_rate
                         * self.model.sample_ratio)
        min_frames = int(self.hp.min_sample_length
                         * self.mel_sample_rate
                         * self.model.sample_ratio)
        samples = self.sampler(
            batch["text"], batch["cropped_mel"], key,
            max_frames=max_frames, min_frames=min_frames,
            temperature=self.hp.temperature,
            eos_threshold=self.hp.eos_threshold)
        audio = self.vocoder.decode(samples["output"])
        cond = self.vocoder.decode(batch["mel"])
        return audio, cond

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
            audio, cond = self.test_step(batch, k)
            waves = np.asarray(audio.value)
            lens = np.asarray(audio.lengths)
            c_waves = np.asarray(cond.value)
            c_lens = np.asarray(cond.lengths)
            texts = batch.get("text_written_form",
                              [""] * len(waves))
            for b in range(len(waves)):
                self.sampled += 1
                base = os.path.join(self.hp.output_dir,
                                    str(self.sampled))
                audio_lib.save_wav(f"{base}.wav",
                                   waves[b, : lens[b]], sr)
                audio_lib.save_wav(f"{base}_c.wav",
                                   c_waves[b, : c_lens[b]], sr)
                with open(f"{base}.txt", "w") as f:
                    f.write(texts[b])
        return self.sampled
