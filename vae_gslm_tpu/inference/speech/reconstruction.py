"""Resynthesis evaluator: f0 MSE / MCD / WER-CER.

Parity target: ``/root/reference/inference/speech/reconstruction.py`` —
encode→decode→vocode each batch, compare to re-vocoded ground truth on
the configured ``tasks``.  ASR WER uses a HF CTC/Whisper model when one
is locally available; otherwise the wer task degrades gracefully.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ...core.masked import Masked
from ...hparams.hp import Hparams
from .. import eval_utils
from .likelihood import LikelihoodEstimator


class ReconstructionEvaluator(LikelihoodEstimator):
    def __init__(self, hp: Hparams):
        super().__init__(hp)
        hp.check_arg_in_hparams("tasks")
        self.tasks = list(hp.tasks)
        self.asr = None
        if "wer" in self.tasks and hp.has("asr_model"):
            try:
                from transformers import (AutoProcessor,
                                          AutoModelForCTC)
                self.asr_processor = AutoProcessor.from_pretrained(
                    hp.asr_model)
                self.asr = AutoModelForCTC.from_pretrained(hp.asr_model)
            except Exception:
                import logging
                logging.getLogger(__name__).warning(
                    "ASR model unavailable; wer task skipped")
        if self.type == "hubert":
            self.vocoder = self.codec.vocoder
        if hp.has("diffusion"):
            dec = (self.codec.model.decoder if self.type == "hubert"
                   else self.model.decoder)
            dec.override_sampling(
                hp.diffusion.get("sampling_timesteps", None),
                hp.diffusion.get("ddim_sampling_eta", None))

    def _transcribe(self, wave: np.ndarray, sr: int) -> str:
        import torch
        inputs = self.asr_processor(wave, sampling_rate=sr,
                                    return_tensors="pt")
        with torch.no_grad():
            logits = self.asr(inputs.input_values).logits
        ids = logits.argmax(-1)
        return self.asr_processor.batch_decode(ids)[0]

    def test_step(self, batch, key) -> dict:
        sr = self.hp.data.sample_rate
        gold = self.vocoder.decode(batch["mel"])
        if self.type == "hubert":
            rec = self.codec.decode(batch[self.input_key], key=key,
                                    spkr=batch["mel"],
                                    f0=batch.get("f0", None))
        else:
            model_input = batch[self.input_key]
            if self.use_tokens:
                model_input = batch["tokens"].expand_dim().astype(
                    np.float32).cat(batch["mel"])
            k1, k2 = jax.random.split(key)
            utt = (self.model.encode_utterance(model_input)
                   if self.model.utterance_net is not None else None)
            enc = self.model.encode(model_input, k1, temperature=0.0)
            rec_mel = self.model.decode(enc, k2, u_c=utt)
            rec = self.vocoder.decode(rec_mel)
        scores: dict = {}
        g_w = np.asarray(gold.value)
        r_w = np.asarray(rec.value)
        g_l = np.asarray(gold.lengths)
        r_l = np.asarray(rec.lengths)
        if "f0mse" in self.tasks:
            vals = [eval_utils.f0_mse(g_w[i, : g_l[i]],
                                      r_w[i, : r_l[i]], sr)
                    for i in range(len(g_w))]
            scores["f0mse"] = [v for v in vals if np.isfinite(v)]
        if "mcd" in self.tasks:
            # pysptk pipeline when available, else the native mcep
            # solver of the same criterion (eval_utils.mcd_wav).
            scores["mcd"] = [
                eval_utils.mcd_wav(g_w[i, : g_l[i]],
                                   r_w[i, : r_l[i]])
                for i in range(len(g_w))]
        if "wer" in self.tasks and self.asr is not None:
            gt, re_t = [], []
            for i in range(len(g_w)):
                gt.append(self._transcribe(g_w[i, : g_l[i]], sr))
                re_t.append(self._transcribe(r_w[i, : r_l[i]], sr))
            scores["gt_transcripts"] = gt
            scores["re_transcripts"] = re_t
        return scores

    def run(self, seed: int = 0,
            max_batches: Optional[int] = None) -> dict:
        loader = self.test_dataloader()
        key = jax.random.PRNGKey(seed)
        agg: dict = {t: [] for t in self.tasks}
        gt_all, re_all = [], []
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            key, k = jax.random.split(key)
            s = self.test_step(batch, k)
            for t in ("f0mse", "mcd"):
                if t in s:
                    agg[t] += s[t]
            gt_all += s.get("gt_transcripts", [])
            re_all += s.get("re_transcripts", [])
        out = {t: float(np.mean(v)) for t, v in agg.items()
               if v and t in ("f0mse", "mcd")}
        if gt_all and "text_written_form" not in out:
            out["re_cer"] = eval_utils.cer(gt_all, re_all)
            out["re_wer"] = eval_utils.wer(gt_all, re_all)
            # the reference's published metric (jiwer char rate over
            # normalized text, reconstruction.py:55-75)
            out["re_asr_error"] = eval_utils.asr_error_rate(
                gt_all, re_all)
        return out
