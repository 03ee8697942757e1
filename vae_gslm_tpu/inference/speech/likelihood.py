"""Pseudo-likelihood estimator.

Parity target: ``/root/reference/inference/speech/likelihood.py`` —
batch ``model.likelihood`` over the eval set into per-utterance scores
(token log-prob for the tokenised LVTR, latent log-density otherwise).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ...core.masked import Masked
from ...hparams.hp import Hparams
from ...models.vocoder.vocoder import HiFiGAN, HuBERTIO
from ...data.dataset import DiscreteTokenDataset, MelSpecDataset
from ..inferer import BaseInferer


class LikelihoodEstimator(BaseInferer):
    def __init__(self, hp: Hparams):
        super().__init__(hp)
        self.mel_rescale = None
        if self.hp_model.training.has("mel_rescale"):
            self.mel_rescale = self.hp_model.training.mel_rescale
        if hp.model.identifier.endswith("discrete.DiscreteAR"):
            self.type = "hubert"
            codec = HuBERTIO.from_pretrained(
                self.hp_model.hubert.path, hp_rescale=self.mel_rescale)
            self.deduplicate = codec.model.deduplicate
            self.load_model(hp_vq=codec.hp_vq)
            self.model.set_soundstream(codec)
            self.codec = codec
            self.input_key = ("dedup_tokens" if self.deduplicate
                              else "tokens")
        else:
            self.type = "lvtr"
            self.vocoder = HiFiGAN.from_pretrained(
                self.hp_model.vocoder.path, hp_rescale=self.mel_rescale)
            self.load_model(input_dim=self.vocoder.hp.n_mels)
            self.input_key = "mel"
        self.use_tokens = getattr(self.model, "use_tokens", False)
        self.gamma = 1.0
        if self.use_tokens:
            self.hp_hubert = Hparams(
                deduplicate=False,
                sample_rate=self.hp_model.hubert.sample_rate)
            self.gamma = hp.get(
                "gamma", self.hp_model.training.get("token_kld_weight",
                                                    1.0))
        self.scores: list = []

    def test_dataloader(self):
        if self.type == "hubert":
            dataset = DiscreteTokenDataset(
                self.hp.data, self.codec.hp,
                self.codec.model.hp.hubert, self.mel_rescale)
        elif self.use_tokens:
            dataset = DiscreteTokenDataset(
                self.hp.data, self.vocoder.hp, self.hp_hubert,
                self.mel_rescale)
        else:
            dataset = MelSpecDataset(self.hp.data, self.vocoder.hp,
                                     self.mel_rescale)
        self.hp.data.sampler.drop_last = False
        self.hp.trainer = self.hp.get("trainer", Hparams(
            distributed=False))
        return self.get_dataloader(self.hp.data, dataset)

    def test_step(self, batch, key) -> np.ndarray:
        if self.type == "hubert":
            toks = batch[self.input_key]
            score = self.model.likelihood(toks, f0=batch.get("f0", None))
        else:
            model_input = batch[self.input_key]
            if self.use_tokens:
                model_input = batch["tokens"].expand_dim().astype(
                    np.float32).cat(batch["mel"])
            score = self.model.likelihood(model_input, key)
        return np.asarray(score)

    def run(self, seed: int = 0,
            max_batches: Optional[int] = None) -> np.ndarray:
        loader = self.test_dataloader()
        key = jax.random.PRNGKey(seed)
        self.scores = []
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            key, k = jax.random.split(key)
            self.scores.append(self.test_step(batch, k))
        self.scores = (np.concatenate(self.scores) if self.scores
                       else np.zeros((0,)))
        return self.scores
