"""SoundStream mel-AE trainer.

Parity target: ``/root/reference/trainers/speech/soundstream.py`` —
masked L1 reconstruction + VQ commit/codebook aux loss.  (A dead path in
the reference — its codec wrapper import crashes — kept live here.)
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
from ...data.dataset import MelSpecDataset
from ...hparams.hp import Hparams
from ...models.speech.soundstream import SoundStream
from ...models.vocoder.vocoder import HiFiGAN
from ...parallel import mesh as mesh_lib
from ...training.checkpoint import save_compact
from ...training.optimizer import create_optimizer
from ...training.trainer import BaseTrainer, init_weights


class SoundStreamTrainer(BaseTrainer):
    def __init__(self, hp: Hparams, seed: int = 0):
        super().__init__(hp)
        hp.check_arg_in_hparams("vocoder")
        self.mel_rescale = None
        if hp.training.has("mel_rescale"):
            self.mel_rescale = hp.training.mel_rescale
        self.vocoder = HiFiGAN.from_pretrained(
            hp.vocoder.path, hp_rescale=self.mel_rescale)
        self.model = SoundStream(hp.model,
                                 input_dim=self.vocoder.hp.n_mels,
                                 rngs=nnx.Rngs(seed))
        init_weights(self.model, hp.training.get("init_std", 1.0),
                     seed=seed)
        self.tx, self.lr_schedule = create_optimizer(
            hp.training, hp.trainer.total_steps)
        self.graphdef, params, self._rest = nnx.split(
            self.model, nnx.Param, ...)
        self.params = self.place_params(params)
        self.opt_state = self.init_opt_state(self.tx, self.params)
        self._train_step = None

    def _merge(self, params):
        return nnx.merge(self.graphdef, params, self._rest)

    def sync_model(self):
        nnx.update(self.model, jax.tree_util.tree_map(
            np.asarray, self.params))

    def train_dataloader(self):
        ds = MelSpecDataset(self.hp.data.train, self.vocoder.hp,
                            self.mel_rescale, name="train dataset")
        return self.get_dataloader(self.hp.data.train, ds)

    def val_dataloader(self):
        ds = MelSpecDataset(self.hp.data.val, self.vocoder.hp,
                            self.mel_rescale, name="validation dataset")
        return self.get_dataloader(self.hp.data.val, ds)

    def _loss_fn(self, params, batch):
        model = self._merge(params)
        out = model(batch["mel"])
        rec = masked_l1_loss(out["reconstruction"], batch["mel"],
                             time_reduction=True, batch_reduction=True)
        loss = rec + out["aux_loss"]
        return loss, {"rec_loss": rec, "aux_loss": out["aux_loss"]}

    def _build_train_step(self):
        grad_fn = jax.grad(self._loss_fn, has_aux=True)

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch_stack, step):
            zero = jax.tree_util.tree_map(jnp.zeros_like, params)

            def body(acc, mb):
                grads, metrics = grad_fn(params, mb)
                return (jax.tree_util.tree_map(jnp.add, acc, grads),
                        metrics)

            grads, metrics_all = jax.lax.scan(body, zero, batch_stack)
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
        batch = {k: v for k, v in stacked_batch.items() if k == "mel"}
        batch = mesh_lib.shard_batch(batch, self.mesh, axis=1)
        self.params, self.opt_state, metrics = self._train_step(
            self.params, self.opt_state, batch,
            jnp.asarray(self.global_step))
        return metrics

    def validation_run(self, step: int) -> None:
        if self.logger is None:
            return
        loader = self.val_dataloader()
        limit = self.hp.trainer.get("limit_val_batches", 8)
        total, count = 0.0, 0
        for i, batch in enumerate(loader):
            if i >= limit:
                break
            _, m = self._loss_fn(self.params, {"mel": batch["mel"]})
            total += float(m["rec_loss"])
            count += 1
        if count:
            self.logger.log_scalar("val/rec_loss", total / count, step)

    def resume(self, path: str) -> None:
        """Resume model params from a compact npz checkpoint."""
        if not path.endswith(".npz"):
            self.restore_full_state(path)   # orbax exact resume
            return
        from ...training.checkpoint import load_compact
        load_compact(self.model, path)
        self.graphdef, params, self._rest = nnx.split(
            self.model, nnx.Param, ...)
        self.params = self.place_params(params)
        self.opt_state = self.init_opt_state(self.tx, self.params)
        self._train_step = None

    def save_checkpoint(self, path: str) -> None:
        self.sync_model()
        save_compact(self.model, path)
        if self.logger is not None:
            self.hp.save(os.path.join(self.logger.ckpt_path, "hp.yaml"))
