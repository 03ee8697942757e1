"""HiFi-GAN GAN trainer.

Parity target: ``/root/reference/trainers/vocoder/hfgan.py``: two
optimizers (G; D = MPD + MSD-or-MRD), each batch runs a D step then a G
step; mel computed on the fly from audio; G loss = LSGAN + feature
matching (real feature maps captured *before* the D update, detached) +
mel L1 × weight; per-optimizer schedules over ``total_steps // 2``.

TPU-first: the D-then-G sequence is ONE jitted function — two grad
computations, two optax updates, mel featurisation fused in.
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

from ...core.losses import masked_l1_loss
from ...core.masked import Masked, resize_length
from ...data.dataset import StandardDataset
from ...data.features import MelSpecFeatureProcessor
from ...hparams.hp import Hparams
from ...models.vocoder.hfgan import (Generator, MultiPeriodDiscriminator,
                                     MultiResolutionDiscriminator,
                                     MultiScaleDiscriminator,
                                     discriminator_loss, feature_loss,
                                     generator_loss)
from ...parallel import mesh as mesh_lib
from ...training.checkpoint import save_compact
from ...training.optimizer import create_optimizer
from ...training.trainer import BaseTrainer


class _Discriminators(nnx.Module):
    def __init__(self, hp: Hparams, *, rngs: nnx.Rngs):
        self.mpd = MultiPeriodDiscriminator(hp.model.mpd, rngs=rngs)
        if hp.model.get("msd", False):
            self.msrd = MultiScaleDiscriminator(hp.model.msd, rngs=rngs)
        else:
            hp.model.check_arg_in_hparams("mrd")
            self.msrd = MultiResolutionDiscriminator(hp.model.mrd,
                                                     rngs=rngs)

    def __call__(self, wave):
        f_out, f_fmap = self.mpd(wave)
        s_out, s_fmap = self.msrd(wave)
        return f_out, f_fmap, s_out, s_fmap


class HiFiGANTrainer(BaseTrainer):
    def __init__(self, hp: Hparams, seed: int = 0):
        super().__init__(hp)
        hp.model.check_arg_in_hparams("mpd", "generator")
        hp.training.check_arg_in_hparams("generator", "discriminator",
                                         "mel_loss_weight")
        hp.check_arg_in_hparams("logging", "feature")
        self.generator = Generator(hp.model.generator,
                                   rngs=nnx.Rngs(seed))
        self.disc = _Discriminators(hp, rngs=nnx.Rngs(seed + 1))
        self.features = MelSpecFeatureProcessor(hp.feature)
        half = hp.trainer.total_steps // 2
        self.tx_g, self.sched_g = create_optimizer(
            hp.training.generator, half)
        self.tx_d, self.sched_d = create_optimizer(
            hp.training.discriminator, half)
        self.g_graphdef, g_params, self._g_rest = nnx.split(
            self.generator, nnx.Param, ...)
        self.d_graphdef, d_params, self._d_rest = nnx.split(
            self.disc, nnx.Param, ...)
        self.g_params = self.place_params(g_params)
        self.d_params = self.place_params(d_params)
        self.opt_g = self.init_opt_state(self.tx_g, self.g_params)
        self.opt_d = self.init_opt_state(self.tx_d, self.d_params)
        self._train_step = None
        self.rng = jax.random.PRNGKey(seed + 2)

    # -------------------------------------------------------------- data
    def train_dataloader(self):
        ds = StandardDataset(self.hp.data.train, name="train dataset")
        return self.get_dataloader(self.hp.data.train, ds)

    def val_dataloader(self):
        ds = StandardDataset(self.hp.data.val, name="validation dataset")
        return self.get_dataloader(self.hp.data.val, ds)

    # -------------------------------------------------------------- step
    def _gen(self, g_params, mel: Masked) -> Masked:
        return nnx.merge(self.g_graphdef, g_params, self._g_rest)(mel)

    def _disc_apply(self, d_params, wave):
        return nnx.merge(self.d_graphdef, d_params, self._d_rest)(wave)

    def _encode_mel(self, audio: Masked) -> Masked:
        mel = self.features._encode_value(audio.value)
        return Masked.from_lengths(
            mel, resize_length(audio.lengths, self.features.sample_ratio))

    def _build_train_step(self):
        mel_weight = self.hp.training.mel_loss_weight

        def d_loss_fn(d_params, y, y_hat):
            f_r, fmap_f_r, s_r, fmap_s_r = self._disc_apply(d_params, y)
            f_g, _, s_g, _ = self._disc_apply(
                d_params, jax.lax.stop_gradient(y_hat))
            loss_f = discriminator_loss(f_r, f_g)
            loss_s = discriminator_loss(s_r, s_g)
            return loss_f + loss_s, (fmap_f_r, fmap_s_r)

        def g_loss_fn(g_params, d_params, mel, audio, fmaps_r):
            fmap_f_r, fmap_s_r = fmaps_r
            y_hat = self._gen(g_params, mel)
            y_hat_mel = self._encode_mel(y_hat)
            loss_mel = masked_l1_loss(y_hat_mel, mel,
                                      time_reduction=True,
                                      batch_reduction=True)
            f_g, fmap_f_g, s_g, fmap_s_g = self._disc_apply(
                d_params, y_hat.value)
            loss_fm = (feature_loss(fmap_f_r, fmap_f_g)
                       + feature_loss(fmap_s_r, fmap_s_g))
            loss_gen = generator_loss(f_g) + generator_loss(s_g)
            total = loss_gen + loss_fm + loss_mel * mel_weight
            return total, {"mel": loss_mel, "G": loss_gen,
                           "feature": loss_fm}

        @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def train_step(g_params, d_params, opt_g, opt_d, audio: Masked,
                       key):
            mel = self._encode_mel(audio)
            y_hat = self._gen(g_params, mel)
            # ---- D step (real fmaps captured pre-update, detached)
            (d_loss, fmaps_r), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_params, audio.value,
                                         y_hat.value)
            fmaps_r = jax.lax.stop_gradient(fmaps_r)
            d_updates, opt_d = self.tx_d.update(d_grads, opt_d, d_params)
            d_params = optax.apply_updates(d_params, d_updates)
            # ---- G step against the UPDATED discriminator
            (g_loss, g_metrics), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(g_params, d_params, mel,
                                         audio, fmaps_r)
            g_updates, opt_g = self.tx_g.update(g_grads, opt_g, g_params)
            g_params = optax.apply_updates(g_params, g_updates)
            metrics = dict(g_metrics)
            metrics["D"] = d_loss
            return g_params, d_params, opt_g, opt_d, metrics

        return train_step

    def run_step(self, stacked_batch) -> Dict[str, Any]:
        if self._train_step is None:
            self._train_step = self._build_train_step()
        audio = stacked_batch["audio"]
        # GAN training has no grad accumulation; collapse the stack axis.
        audio = Masked(audio.value.reshape(
            (-1,) + audio.value.shape[2:]),
            audio.lengths.reshape(-1), 1)
        audio = mesh_lib.shard_batch(audio, self.mesh)
        self.rng, key = jax.random.split(self.rng)
        (self.g_params, self.d_params, self.opt_g, self.opt_d,
         metrics) = self._train_step(self.g_params, self.d_params,
                                     self.opt_g, self.opt_d, audio, key)
        return metrics

    # ----------------------------------------------------------- val/ckpt
    def sync_model(self):
        nnx.update(self.generator, jax.tree_util.tree_map(
            np.asarray, self.g_params))

    def validation_run(self, step: int) -> None:
        if self.logger is None:
            return
        self.sync_model()
        loader = self.val_dataloader()
        limit = self.hp.trainer.get("limit_val_batches", 8)
        total, count = 0.0, 0
        logged = 0
        num_samples = self.hp.logging.num_samples
        for i, batch in enumerate(loader):
            if i >= limit:
                break
            audio = batch["audio"]
            mel = self._encode_mel(Masked(
                jnp.asarray(audio.value), jnp.asarray(audio.lengths), 1))
            y_hat = self.generator(mel)
            y_hat_mel = self._encode_mel(y_hat)
            loss_mel = masked_l1_loss(y_hat_mel, mel,
                                      time_reduction=True,
                                      batch_reduction=True)
            total += float(loss_mel)
            count += 1
            sr = self.hp.data.train.sample_rate
            while logged < num_samples and logged < len(audio.value):
                wav = np.asarray(audio.value)[logged]
                rec = np.asarray(y_hat.value)[logged]
                self.logger.log_audio(f"original/{logged}", wav, step, sr)
                self.logger.log_audio(f"reconstruct/{logged}", rec, step,
                                      sr)
                logged += 1
        if count:
            self.logger.log_scalar("val/mel", total / count, step)

    def _train_state(self):
        return {"g_params": self.g_params, "d_params": self.d_params,
                "opt_g": self.opt_g, "opt_d": self.opt_d,
                "step": self.global_step}

    def _apply_train_state(self, state) -> None:
        self.g_params = self.place_params(state["g_params"])
        self.d_params = self.place_params(state["d_params"])
        self.opt_g = self.place_opt_state(self.tx_g, self.g_params,
                                          state["opt_g"])
        self.opt_d = self.place_opt_state(self.tx_d, self.d_params,
                                          state["opt_d"])
        self.global_step = int(state["step"])
        self._train_step = None

    def resume(self, path: str) -> None:
        """Resume generator params from a compact npz (discriminators
        restart — matching the reference compact-checkpoint contract
        which stores the generator only), or the full GAN state
        (both param sets + both optimizers) from an orbax dir."""
        if not path.endswith(".npz"):
            self.restore_full_state(path)
            return
        from ...training.checkpoint import load_compact
        load_compact(self.generator, path)
        self.g_graphdef, g_params, self._g_rest = nnx.split(
            self.generator, nnx.Param, ...)
        self.g_params = self.place_params(g_params)
        self.opt_g = self.init_opt_state(self.tx_g, self.g_params)
        self._train_step = None

    def save_checkpoint(self, path: str) -> None:
        self.sync_model()
        save_compact(self.generator, path)
        if self.logger is not None:
            self.hp.save(os.path.join(self.logger.ckpt_path, "hp.yaml"))
            self.hp.save(os.path.join(os.path.dirname(path), "hp.yaml"))
