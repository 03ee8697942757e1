"""Token-LM-only continuation inferer.

Parity target: ``/root/reference/inference/speech/hubert.py`` — the
older DiscreteAR-specific entry point; additionally writes the decoded
prior as ``N_ov.wav`` next to each continuation.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ...core.masked import Masked
from ...data import audio as audio_lib
from ...hparams.hp import Hparams
from .inferer import SpeechInferer as _SpeechInferer


class SpeechInferer(_SpeechInferer):
    def __init__(self, hp: Hparams):
        # Force the DiscreteAR branch regardless of hp.model ident.
        hp.model.identifier = "models.speech.discrete.DiscreteAR"
        super().__init__(hp)

    def run(self, seed: int = 0,
            max_batches: Optional[int] = None) -> int:
        os.makedirs(self.hp.output_dir, exist_ok=True)
        loader = self.test_dataloader()
        key = jax.random.PRNGKey(seed)
        sr = self.hp.data.sample_rate
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            key, k, k2 = jax.random.split(key, 3)
            prior_length = int(self.hp.sample_prior_length
                               * self.token_sample_rate)
            toks = batch["tokens"]
            prior = Masked(
                toks.value[:, :prior_length],
                np.minimum(np.asarray(toks.lengths), prior_length), 1)
            prior_decoded = self.model.decode(prior, key=k2)
            audio = self.test_step(batch, k)
            waves = np.asarray(audio.value)
            lens = np.asarray(audio.lengths)
            p_waves = np.asarray(prior_decoded.value)
            p_lens = np.asarray(prior_decoded.lengths)
            for b in range(len(waves)):
                self.sampled += 1
                base = os.path.join(self.hp.output_dir,
                                    str(self.sampled))
                audio_lib.save_wav(f"{base}.wav", waves[b, : lens[b]],
                                   sr)
                audio_lib.save_wav(f"{base}_ov.wav",
                                   p_waves[b, : p_lens[b]], sr)
        return self.sampled
