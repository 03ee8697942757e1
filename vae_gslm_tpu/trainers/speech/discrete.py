"""DiscreteAR (token-LM baseline) trainer.

Parity target: ``/root/reference/trainers/speech/discrete.py`` — CE on
shifted tokens (+0.5·f0 L1 when enabled) against a frozen HuBERTIO
codec; the reference's soundstream path is dead code there (broken
import) and is therefore served by the same HuBERTIO contract here.
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

from ...core.losses import masked_ce_loss, masked_l1_loss
from ...core.masked import Masked
from ...data.dataset import DiscreteTokenDataset
from ...hparams.hp import Hparams
from ...inference.speech.sampler import DiscreteARSampler
from ...models.speech.discrete import DiscreteAR
from ...models.vocoder.vocoder import HuBERTIO
from ...parallel import mesh as mesh_lib
from ...training.checkpoint import save_compact
from ...training.optimizer import create_optimizer
from ...training import trainer as trainer_lib
from ...training.trainer import BaseTrainer, init_weights


class DiscreteARTrainer(BaseTrainer):
    def __init__(self, hp: Hparams, seed: int = 0):
        super().__init__(hp)
        self.mel_rescale = None
        if hp.training.has("mel_rescale"):
            hp.training.mel_rescale.check_arg_in_hparams("mean", "std")
            self.mel_rescale = hp.training.mel_rescale
        hp.check_arg_in_hparams("hubert")
        hp.hubert.check_arg_in_hparams("path")
        codec = HuBERTIO.from_pretrained(hp.hubert.path,
                                         hp_rescale=self.mel_rescale)
        self.model = DiscreteAR(hp.model, codec.hp_vq,
                                input_dim=codec.hp.n_mels,
                                rngs=nnx.Rngs(seed))
        self.deduplicate = codec.model.deduplicate
        hp.check_arg_in_hparams("logging")
        init_weights(self.model, hp.training.get("init_std", 1.0),
                     seed=seed)
        self.model.set_soundstream(codec)
        self.codec = codec
        self.sampler = DiscreteARSampler(self.model)
        self.tx, self.lr_schedule = create_optimizer(
            hp.training, hp.trainer.total_steps)
        self.token_key = "dedup_tokens" if self.deduplicate else "tokens"
        # Codec params live outside the trained module (not in
        # nnx.split(self.model)), so no param filtering is needed.
        self.graphdef, params, self._rest = nnx.split(
            self.model, nnx.Param, ...)
        self.params = self.place_params(params)
        self.opt_state = self.init_opt_state(self.tx, self.params)
        self._train_step = None
        # Same fused-accumulation contract as LVTRTrainer: losses are
        # masked sums, so (accum, B) -> (1, accum*B) preserves the
        # summed gradient.
        self._fuse_accum = bool(
            hp.training.get("fuse_accumulation", False)
            or os.environ.get("VAE_GSLM_FUSE_ACCUM"))
        self.rng = jax.random.PRNGKey(seed + 1)

    def _merge(self, params):
        return nnx.merge(self.graphdef, params, self._rest)

    def sync_model(self):
        nnx.update(self.model, jax.tree_util.tree_map(
            np.asarray, self.params))

    # -------------------------------------------------------------- data
    def _make_dataset(self, hp_data, name):
        return DiscreteTokenDataset(hp_data, self.codec.hp,
                                    self.codec.model.hp.hubert,
                                    self.mel_rescale, name=name)

    def train_dataloader(self):
        ds = self._make_dataset(self.hp.data.train, "train dataset")
        return self.get_dataloader(self.hp.data.train, ds)

    def val_dataloader(self):
        ds = self._make_dataset(self.hp.data.val, "validation dataset")
        self.val_mel_sample_rate = ds.melspec.sample_rate
        self.val_token_sample_rate = ds.token_sample_rate
        return self.get_dataloader(self.hp.data.val, ds)

    # -------------------------------------------------------------- step
    def _loss_fn(self, params, batch):
        model = self._merge(params)
        f0 = batch.get("f0", None)
        out = model(batch[self.token_key], f0=f0)
        kld = masked_ce_loss(out["logits"], out["labels"])
        loss = kld
        metrics = {"kld": kld,
                   "length": out["logits"].lengths.sum()}
        if model.f0 is not None:
            f0_loss = masked_l1_loss(out["f0"], batch["f0"])
            loss = loss + f0_loss * 0.5
            metrics["f0_loss"] = f0_loss
        return loss, metrics

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
        keep = {self.token_key, "f0"}
        batch = {k: v for k, v in stacked_batch.items() if k in keep}
        if self._fuse_accum:
            batch = trainer_lib.fuse_microbatches(batch)
        batch = mesh_lib.shard_batch(batch, self.mesh, axis=1)
        with self.parallel_context():
            self.params, self.opt_state, metrics = self._train_step(
                self.params, self.opt_state, batch,
                jnp.asarray(self.global_step))
        n = metrics.pop("length")
        metrics["kld"] = metrics["kld"] / n
        if "f0_loss" in metrics:
            metrics["f0_loss"] = metrics["f0_loss"] / n
        return metrics

    # --------------------------------------------------------------- val
    def validation_run(self, step: int) -> None:
        if self.logger is None:
            return
        loader = self.val_dataloader()
        limit = self.hp.trainer.get("limit_val_batches", 8)
        total, length = 0.0, 0.0
        first = None
        for i, batch in enumerate(loader):
            if i >= limit:
                break
            keep = {self.token_key, "f0"}
            jb = {k: v for k, v in batch.items() if k in keep}
            _, m = self._loss_fn(self.params, jb)
            total += float(m["kld"])
            length += float(m["length"])
            if first is None:
                first = batch
        if length:
            self.logger.log_scalar("val/kld", total / length, step)
        if first is not None and self.hp.logging.num_samples > 0:
            self._log_audio(first, step)

    def _log_audio(self, batch, step: int) -> None:
        self.sync_model()
        num = min(self.hp.logging.num_samples,
                  batch[self.token_key].value.shape[0])
        prior_len = int(self.hp.logging.sample_prior_length
                        * self.val_token_sample_rate)
        length = int(self.hp.logging.sample_length
                     * self.val_token_sample_rate)
        toks = batch[self.token_key]
        prior = Masked(np.asarray(toks.value)[:num, :prior_len],
                       np.minimum(np.asarray(toks.lengths)[:num],
                                  prior_len), 1)
        self.rng, k1, k2 = jax.random.split(self.rng, 3)
        full = self.sampler(length, prior, k1,
                            temperature=self.hp.logging.temperature)
        audio = self.model.decode(full, key=k2)
        sr = self.hp.data.train.sample_rate
        for i in range(num):
            wav = np.asarray(audio.value)[i]
            ln = int(np.asarray(audio.lengths)[i])
            self.logger.log_audio(f"samples/{i}", wav[:ln], step, sr)

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
