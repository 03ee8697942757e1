"""LVTTS (text-to-speech) trainer.

Parity target: ``/root/reference/trainers/tts/lvtts.py``: loss =
rec·scale + KLD + InfoNCE·weight + EOS BCE; text symbol table shared
between train/val datasets and saved alongside checkpoints.

Note: the reference's InfoNCE call reads ``output['cnn_z']`` which the
LVTR forward never produces (a latent KeyError on that config path);
here InfoNCE contrasts q(z|x) samples against the prior-transformed
latents, which is the closest well-defined formulation.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from ...core.losses import eos_loss, masked_loss
from ...core.masked import Masked
from ...data.dataset import MelSpecDataset
from ...hparams.hp import Hparams
from ...inference.tts.sampler import ARTRTTSSampler
from ...models.tts.lvtr import LVTTS
from ...models.vocoder.vocoder import HiFiGAN
from ...nn.contrastive import InfoNCE
from ...parallel import mesh as mesh_lib
from ...training.checkpoint import save_compact
from ...training.optimizer import create_optimizer
from ...training import trainer as trainer_lib
from ...training.trainer import BaseTrainer, init_weights


class LVTTSTrainer(BaseTrainer):
    def __init__(self, hp: Hparams, seed: int = 0):
        super().__init__(hp)
        hp.check_arg_in_hparams("vocoder")
        hp.vocoder.check_arg_in_hparams("path")
        self.mel_rescale = None
        if hp.training.has("mel_rescale"):
            hp.training.mel_rescale.check_arg_in_hparams("mean", "std")
            self.mel_rescale = hp.training.mel_rescale
        self.vocoder = HiFiGAN.from_pretrained(
            hp.vocoder.path, hp_rescale=self.mel_rescale)
        self.train_dataset = MelSpecDataset(
            hp.data.train, self.vocoder.hp, self.mel_rescale,
            name="train dataset")
        self.model = LVTTS(hp.model, symbols=self.train_dataset.symbols,
                           input_dim=self.vocoder.hp.n_mels,
                           rngs=nnx.Rngs(seed))
        hp.check_arg_in_hparams("logging")
        hp.logging.check_arg_in_hparams("num_samples", "temperature",
                                        "max_sample_length",
                                        "min_sample_length", "plot_attn")
        self.run_infoNCE = hp.training.has("infoNCE")
        self.infoNCE_weight = 1.0
        if self.run_infoNCE:
            self.model.infoNCE = InfoNCE(
                hp.training.infoNCE, dim1=hp.model.latent_dim,
                dim2=hp.model.latent_dim, rngs=nnx.Rngs(seed + 7))
            self.infoNCE_weight = hp.training.infoNCE.get("weight", 1.0)
        init_weights(self.model, hp.training.get("init_std", 1.0),
                     seed=seed)
        self.rec_loss_scale = hp.training.get("rec_loss_scale", 1.0)
        self.sampler = ARTRTTSSampler(self.model)
        self.tx, self.lr_schedule = create_optimizer(
            hp.training, hp.trainer.total_steps)
        self.graphdef, params, rest = nnx.split(self.model, nnx.Param,
                                                ...)
        self.params = self.place_params(params)
        self.rest = mesh_lib.replicate_tree(rest, self.mesh)
        self.opt_state = self.init_opt_state(self.tx, self.params)
        self._train_step = None
        # Fused accumulation (same sum-loss contract as LVTR).
        self._fuse_accum = bool(
            hp.training.get("fuse_accumulation", False)
            or os.environ.get("VAE_GSLM_FUSE_ACCUM"))
        self.rng = jax.random.PRNGKey(seed + 1)

    def _merge(self, params, rest):
        return nnx.merge(self.graphdef, params, rest)

    def sync_model(self):
        nnx.update(self.model, jax.tree_util.tree_map(
            np.asarray, self.params))

    def train_dataloader(self):
        return self.get_dataloader(self.hp.data.train,
                                   self.train_dataset)

    def val_dataloader(self):
        ds = MelSpecDataset(self.hp.data.val, self.vocoder.hp,
                            self.mel_rescale, name="validation dataset")
        ds.symbols = self.train_dataset.symbols
        self.val_mel_sample_rate = ds.melspec.sample_rate
        return self.get_dataloader(self.hp.data.val, ds)

    def _loss_fn(self, params, rest, batch, key):
        model = self._merge(params, rest)
        k_model, k_nce = jax.random.split(key)
        out = model(batch["mel"], k_model, text=batch["text"],
                    spkr=batch["cropped_mel"])
        kld = masked_loss(out["log_q"], out["log_p"],
                          fn=lambda x, y: x - y)
        rec = out["rec_loss"]
        e_loss = eos_loss(out["eos"])
        loss = rec * self.rec_loss_scale + kld + e_loss
        metrics = {"kld": kld, "rec_loss": rec, "eos_loss": e_loss,
                   "length": out["log_p"].lengths.sum()}
        if self.run_infoNCE:
            nce = model.infoNCE(
                out["q_z"].sample,
                Masked(jax.lax.stop_gradient(out["sample_q"].value),
                       out["sample_q"].lengths, 1),
                k_nce)
            loss = loss + nce * self.infoNCE_weight
            metrics["infoNCE"] = nce
        return loss, metrics

    def _build_train_step(self):
        grad_fn = jax.grad(self._loss_fn, has_aux=True)

        @partial(jax.jit, donate_argnums=(0, 2))
        def train_step(params, rest, opt_state, batch_stack, step, key):
            zero = jax.tree_util.tree_map(jnp.zeros_like, params)
            accum = jax.tree_util.tree_leaves(batch_stack)[0].shape[0]
            keys = jax.random.split(key, accum)

            def body(acc, mb_key):
                mb, k = mb_key
                grads, metrics = grad_fn(params, rest, mb, k)
                return (jax.tree_util.tree_map(jnp.add, acc, grads),
                        metrics)

            grads, metrics_all = jax.lax.scan(
                body, zero, (batch_stack, keys))
            metrics = jax.tree_util.tree_map(lambda m: m[-1],
                                             metrics_all)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics)
            metrics["lr"] = self.lr_schedule(step)
            return params, opt_state, metrics

        return train_step

    def run_step(self, stacked_batch) -> Dict[str, Any]:
        if self._train_step is None:
            self._train_step = self._build_train_step()
        keep = {"mel", "text", "cropped_mel"}
        batch = {k: v for k, v in stacked_batch.items() if k in keep}
        if self._fuse_accum:
            batch = trainer_lib.fuse_microbatches(batch)
        batch = mesh_lib.shard_batch(batch, self.mesh, axis=1)
        self.rng, key = jax.random.split(self.rng)
        with self.parallel_context():
            self.params, self.opt_state, metrics = self._train_step(
                self.params, self.rest, self.opt_state, batch,
                jnp.asarray(self.global_step), key)
        n = metrics.pop("length")
        for k in ("kld", "rec_loss"):
            metrics[k] = metrics[k] / n
        return metrics

    def validation_run(self, step: int) -> None:
        if self.logger is None:
            return
        loader = self.val_dataloader()
        limit = self.hp.trainer.get("limit_val_batches", 8)
        totals: Dict[str, float] = {}
        length = 0.0
        first_batch = None
        for i, batch in enumerate(loader):
            if i >= limit:
                break
            keep = {"mel", "text", "cropped_mel"}
            jb = {k: v for k, v in batch.items() if k in keep}
            self.rng, key = jax.random.split(self.rng)
            _, m = self._loss_fn(self.params, self.rest, jb, key)
            length += float(m["length"])
            for k in ("kld", "rec_loss"):
                totals[k] = totals.get(k, 0.0) + float(m[k])
            if first_batch is None:
                first_batch = batch
        if length:
            self.logger.log_scalars(
                {f"val/{k}": v / length for k, v in totals.items()},
                step)
        if first_batch is not None:
            self._log_audio_samples(first_batch, step)

    def _log_audio_samples(self, batch, step: int) -> None:
        """Reconstruction + TTS sample audio, optional attention-map
        figures (``/root/reference/trainers/tts/lvtts.py:156-208``)."""
        num = min(self.hp.logging.num_samples,
                  batch["mel"].value.shape[0])
        if num == 0:
            return
        self.sync_model()
        self.rng, k1, k2, k3 = jax.random.split(self.rng, 4)
        take = lambda m: Masked(np.asarray(m.value)[:num],
                                np.asarray(m.lengths)[:num], 1)
        mel = take(batch["mel"])
        text = Masked(np.asarray(batch["text"].value)[:num],
                      np.asarray(batch["text"].lengths)[:num], 1)
        spkr = take(batch["cropped_mel"])
        # Reconstruction through the posterior + diffusion decoder.
        out = self.model(mel, k1, text=text, spkr=spkr)
        rec_audio = self.vocoder.decode(
            self.model.decode(out["sample_q"], k2, c=out["condition"]))
        re_vocoded = self.vocoder.decode(mel)
        rate = self.val_mel_sample_rate * self.model.sample_ratio
        plot_attn = bool(self.hp.logging.plot_attn)
        samples = self.sampler(
            text, spkr, k3,
            max_frames=int(self.hp.logging.max_sample_length * rate),
            min_frames=int(self.hp.logging.min_sample_length * rate),
            temperature=self.hp.logging.temperature,
            eos_threshold=self.hp.logging.get("eos_threshold", 0.5),
            return_attn=plot_attn)
        sampled_audio = self.vocoder.decode(samples["output"])
        sr = self.hp.data.train.sample_rate
        for i in range(num):
            for tag, audio in (("re_vocoded", re_vocoded),
                               ("reconstruct", rec_audio),
                               ("samples", sampled_audio)):
                wav = np.asarray(audio.value)[i]
                ln = int(np.asarray(audio.lengths)[i])
                self.logger.log_audio(f"{tag}/{i}", wav[:ln], step, sr)
        if plot_attn:
            from ...inference.plots import plot_attn as attn_fig
            lengths = np.asarray(samples["lengths"])
            t_len = np.asarray(text.lengths)
            for name in ("self_attn", "cross_attn", "text_self_attn"):
                maps = np.asarray(samples[name])   # (B, L, H, Q, KV)
                for i in range(num):
                    m = maps[i, -1]                # last layer (H, Q, KV)
                    if name == "self_attn":
                        m = m[:, :lengths[i], :lengths[i]]
                    elif name == "cross_attn":
                        m = m[:, :lengths[i], :t_len[i]]
                    else:
                        m = m[:, :t_len[i], :t_len[i]]
                    self.logger.log_figure(f"{name}/{i}", attn_fig(m),
                                           step)

    def resume(self, path: str) -> None:
        """Resume model params from a compact npz checkpoint."""
        if not path.endswith(".npz"):
            self.restore_full_state(path)   # orbax exact resume
            return
        from ...training.checkpoint import load_compact
        load_compact(self.model, path)
        self.graphdef, params, rest = nnx.split(self.model, nnx.Param,
                                                ...)
        self.params = self.place_params(params)
        self.rest = mesh_lib.replicate_tree(rest, self.mesh)
        self.opt_state = self.init_opt_state(self.tx, self.params)
        self._train_step = None

    def save_checkpoint(self, path: str) -> None:
        self.sync_model()
        save_compact(self.model, path)
        if self.logger is not None:
            self.hp.save(os.path.join(self.logger.ckpt_path, "hp.yaml"))
            self.train_dataset.symbols.save(
                os.path.join(self.logger.ckpt_path, "symbols.json"))
