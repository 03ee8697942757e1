"""HuBERT token→mel decoder trainer.

Parity target: ``/root/reference/trainers/vocoder/hubert.py`` —
diffusion reconstruction loss + (dedup mode) log-duration L1 on the
duration predictor, frozen HiFi-GAN for validation audio.
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
from ...core.masked import Masked
from ...data.dataset import DiscreteTokenDataset
from ...hparams.hp import Hparams
from ...models.vocoder.hubert import HuBERT
from ...models.vocoder.vocoder import HiFiGAN
from ...parallel import mesh as mesh_lib
from ...training.checkpoint import save_compact
from ...training.optimizer import create_optimizer
from ...training.trainer import BaseTrainer, init_weights


class HuBERTDecoderTrainer(BaseTrainer):
    def __init__(self, hp: Hparams, seed: int = 0):
        super().__init__(hp)
        hp.check_arg_in_hparams("vocoder")
        hp.vocoder.check_arg_in_hparams("path")
        self.mel_rescale = None
        if hp.training.has("mel_rescale"):
            self.mel_rescale = hp.training.mel_rescale
        self.vocoder = HiFiGAN.from_pretrained(
            hp.vocoder.path, hp_rescale=self.mel_rescale)
        mel_rate = (float(self.vocoder.hp.sample_rate)
                    / self.vocoder.hp.hop_length)
        self.model = HuBERT(hp.model, input_dim=self.vocoder.hp.n_mels,
                            mel_sample_rate=mel_rate,
                            rngs=nnx.Rngs(seed))
        hp.check_arg_in_hparams("logging")
        init_weights(self.model, hp.training.get("init_std", 1.0),
                     seed=seed)
        self.deduplicate = hp.model.hubert.deduplicate
        self.tx, self.lr_schedule = create_optimizer(
            hp.training, hp.trainer.total_steps)
        self.graphdef, params, self._rest = nnx.split(
            self.model, nnx.Param, ...)
        self.params = self.place_params(params)
        self.opt_state = self.init_opt_state(self.tx, self.params)
        self._train_step = None
        self.rng = jax.random.PRNGKey(seed + 1)

    def _merge(self, params):
        return nnx.merge(self.graphdef, params, self._rest)

    def sync_model(self):
        nnx.update(self.model, jax.tree_util.tree_map(
            np.asarray, self.params))

    def _make_dataset(self, hp_data, name):
        return DiscreteTokenDataset(hp_data, self.vocoder.hp,
                                    self.hp.model.hubert,
                                    self.mel_rescale, name=name)

    def train_dataloader(self):
        ds = self._make_dataset(self.hp.data.train, "train dataset")
        return self.get_dataloader(self.hp.data.train, ds)

    def val_dataloader(self):
        ds = self._make_dataset(self.hp.data.val, "validation dataset")
        self.val_mel_sample_rate = ds.melspec.sample_rate
        return self.get_dataloader(self.hp.data.val, ds)

    def _loss_fn(self, params, batch, key):
        model = self._merge(params)
        out = model(x=batch["tokens"], x_mel=batch["mel"], key=key,
                    spkr=batch.get("cropped_mel", None),
                    dedup_x=batch.get("dedup_tokens", None),
                    f0=batch.get("f0", None))
        rec = out["diffusion_loss"]
        loss = rec
        metrics = {"rec_loss": rec}
        if self.deduplicate:
            log_dur = jnp.log1p(
                batch["counts"].value.astype(jnp.float32))
            log_dur = Masked(log_dur, batch["counts"].lengths, 1)
            dp_loss = masked_l1_loss(
                log_dur.expand_dim(),
                out["duration_prediction"],
                time_reduction=True, batch_reduction=True)
            loss = loss + dp_loss
            metrics["dp_loss"] = dp_loss
        return loss, metrics

    def _build_train_step(self):
        grad_fn = jax.grad(self._loss_fn, has_aux=True)

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch_stack, step, key):
            zero = jax.tree_util.tree_map(jnp.zeros_like, params)
            accum = jax.tree_util.tree_leaves(batch_stack)[0].shape[0]
            keys = jax.random.split(key, accum)

            def body(acc, mb_key):
                mb, k = mb_key
                grads, metrics = grad_fn(params, mb, k)
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
        keep = {"tokens", "mel", "cropped_mel", "dedup_tokens", "counts",
                "f0"}
        batch = {k: v for k, v in stacked_batch.items() if k in keep}
        batch = mesh_lib.shard_batch(batch, self.mesh, axis=1)
        self.rng, key = jax.random.split(self.rng)
        self.params, self.opt_state, metrics = self._train_step(
            self.params, self.opt_state, batch,
            jnp.asarray(self.global_step), key)
        return metrics

    def validation_run(self, step: int) -> None:
        if self.logger is None:
            return
        loader = self.val_dataloader()
        limit = self.hp.trainer.get("limit_val_batches", 8)
        totals: Dict[str, float] = {}
        count = 0
        first = None
        for i, batch in enumerate(loader):
            if i >= limit:
                break
            keep = {"tokens", "mel", "cropped_mel", "dedup_tokens",
                    "counts", "f0"}
            jb = {k: v for k, v in batch.items() if k in keep}
            self.rng, key = jax.random.split(self.rng)
            _, m = self._loss_fn(self.params, jb, key)
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            count += 1
            if first is None:
                first = batch
        if count:
            self.logger.log_scalars(
                {f"val/{k}": v / count for k, v in totals.items()}, step)
        if first is not None and self.hp.logging.num_samples > 0:
            self.sync_model()
            num = min(self.hp.logging.num_samples,
                      first["tokens"].value.shape[0])
            toks = Masked(np.asarray(first["tokens"].value)[:num],
                          np.asarray(first["tokens"].lengths)[:num], 1)
            self.rng, key = jax.random.split(self.rng)
            cond = self.model.encode(
                toks,
                spkr=(Masked(
                    np.asarray(first["cropped_mel"].value)[:num],
                    np.asarray(first["cropped_mel"].lengths)[:num], 1)
                    if self.model.spkr_net is not None else None),
                f0=first.get("f0", None))
            mel = self.model.decode(cond, key)
            audio = self.vocoder.decode(mel)
            sr = self.hp.data.train.sample_rate
            for i in range(num):
                wav = np.asarray(audio.value)[i]
                ln = int(np.asarray(audio.lengths)[i])
                self.logger.log_audio(f"reconstruct/{i}", wav[:ln], step,
                                      sr)

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
            self.hp.save(os.path.join(os.path.dirname(path), "hp.yaml"))
