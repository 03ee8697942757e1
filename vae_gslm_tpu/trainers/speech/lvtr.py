"""LVTR (VAE-GSLM) trainer.

Parity target: ``/root/reference/trainers/speech/lvtr.py``: frozen
pretrained HiFi-GAN vocoder, β-VAE loss weighting (``fixed_beta`` splits
rec vs KLD), KLD zero/warmup schedule by global step, loss =
rec·scale + (log_q·entropy_weight − log_p)·kld_weight +
CE·token_kld_weight·kld_weight, optional encoder warm-start + freeze,
validation with reconstruction / prior-continuation audio artifacts.

TPU-first: the whole optimizer step — grad-accum scan over stacked
micro-batches (grads summed, like the reference's repeated backward),
KLD schedule, clip, AdamW+cosine update — is ONE jitted function over
the data mesh; XLA SPMD handles the gradient all-reduce.
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

from ...core.losses import masked_loss
from ...core.masked import Masked
from ...data.dataset import DiscreteTokenDataset, MelSpecDataset
from ...hparams.hp import Hparams
from ...inference.speech.sampler import ARTRSampler
from ...models.speech.lvtr import LVTR
from ...models.vocoder.vocoder import HiFiGAN
from ...parallel import mesh as mesh_lib
from ...training.checkpoint import (load_compact, save_compact,
                                    save_train_state)
from ...training.optimizer import create_optimizer
from ...training import trainer as trainer_lib
from ...training.trainer import (BaseTrainer, bucket_pad_batch,
                                 init_weights)

Array = jax.Array


class LVTRTrainer(BaseTrainer):
    def __init__(self, hp: Hparams, seed: int = 0):
        super().__init__(hp)
        hp.check_arg_in_hparams("vocoder")
        hp.vocoder.check_arg_in_hparams("path")
        self.rec_loss_scale = hp.training.get("rec_loss_scale", 1.0)
        self.kld_scale = hp.training.get("kld_scale", 1.0)
        fixed_beta = hp.training.get("fixed_beta", None)
        if fixed_beta is not None:
            if hp.training.get("scale_rec_beta", True):
                self.rec_loss_scale *= 1 - fixed_beta
            self.kld_scale *= fixed_beta
        self.mel_rescale = None
        if hp.training.has("mel_rescale"):
            hp.training.mel_rescale.check_arg_in_hparams("mean", "std")
            self.mel_rescale = hp.training.mel_rescale
        self.vocoder = HiFiGAN.from_pretrained(
            hp.vocoder.path, hp_rescale=self.mel_rescale)
        self.model = LVTR(hp.model, input_dim=self.vocoder.hp.n_mels,
                          rngs=nnx.Rngs(seed))
        hp.check_arg_in_hparams("logging")
        hp.logging.check_arg_in_hparams("num_samples", "temperature",
                                        "sample_length",
                                        "sample_prior_length",
                                        "plot_attn")
        init_weights(self.model, hp.training.get("init_std", 1.0),
                     seed=seed)
        self.zero_kld = hp.training.scheduler.get("zero_kld", 0)
        self.warmup_kld = hp.training.scheduler.get("warmup_kld", 0)
        self.entropy_weight = hp.training.get("entropy_weight", 1.0)
        self.token_kld_weight = hp.training.get("token_kld_weight", 1.0)
        self.use_tokens = self.model.use_tokens
        if self.use_tokens:
            hp.check_arg_in_hparams("hubert")
            hp.hubert.check_arg_in_hparams("sample_rate")
            self.hp_hubert = Hparams(
                deduplicate=False, sample_rate=hp.hubert.sample_rate)
        # Optional encoder warm-start + freeze (``lvtr.py:57-64``).
        self.freeze_encoder = False
        init_from = hp.model.encoder.get("init_from_ckpt", None)
        if init_from is not None:
            load_compact(self.model, init_from)
            self.freeze_encoder = True
        self.tx, self.lr_schedule = create_optimizer(
            hp.training, hp.trainer.total_steps)
        self.sampler = ARTRSampler(self.model)
        self._setup_state()
        self._train_step = None
        self._eval_step = None
        # Fused accumulation: one (accum*B) micro-batch instead of a
        # scan over accum B-sized ones — same summed gradients, better
        # MXU utilization, ~2x activation memory.
        self._fuse_accum = bool(
            hp.training.get("fuse_accumulation", False)
            or os.environ.get("VAE_GSLM_FUSE_ACCUM"))
        self.rng = jax.random.PRNGKey(seed + 1)

    # ------------------------------------------------------------- state
    def _setup_state(self):
        self.graphdef, params, rest = nnx.split(self.model, nnx.Param,
                                                ...)
        self.params = self.place_params(params)
        self.rest = mesh_lib.replicate_tree(rest, self.mesh)
        # zeros_like in optax init follows the params' TP/FSDP shardings.
        self.opt_state = self.init_opt_state(self.tx, self.params)
        if self.freeze_encoder:
            def frozen(path, leaf):
                root = str(getattr(path[0], "key", path[0]))
                return 0.0 if root in ("encoder_net", "encoder_head") \
                    else 1.0
            self.grad_mask = jax.tree_util.tree_map_with_path(
                frozen, self.params)
        else:
            self.grad_mask = None

    def _merge(self, params, rest):
        return nnx.merge(self.graphdef, params, rest)

    def sync_model(self):
        """Copy trained params back into self.model (for sampling/export)."""
        nnx.update(self.model, jax.tree_util.tree_map(
            np.asarray, self.params))

    # --------------------------------------------------------------- data
    def _make_dataset(self, hp_data: Hparams, name: str):
        if self.use_tokens:
            return DiscreteTokenDataset(hp_data, self.vocoder.hp,
                                        self.hp_hubert, self.mel_rescale,
                                        name=name)
        return MelSpecDataset(hp_data, self.vocoder.hp, self.mel_rescale,
                              name=name)

    def train_dataloader(self):
        ds = self._make_dataset(self.hp.data.train, "train dataset")
        self.train_dataset = ds
        return self.get_dataloader(self.hp.data.train, ds)

    def val_dataloader(self):
        ds = self._make_dataset(self.hp.data.val, "validation dataset")
        self.val_dataset = ds
        self.val_mel_sample_rate = ds.melspec.sample_rate
        return self.get_dataloader(self.hp.data.val, ds)

    # --------------------------------------------------------------- step
    def _model_input(self, batch) -> Masked:
        if self.use_tokens:
            return batch["tokens"].expand_dim().astype(
                jnp.float32).cat(batch["mel"])
        return batch["mel"]

    def _kwargs(self, batch) -> Dict[str, Any]:
        kw = {}
        if self.model.utterance_net is not None:
            kw["utterance"] = batch["cropped_mel_utt"]
        if "cropped_mel" in batch:
            kw["diff_input"] = batch["cropped_mel"]
        return kw

    def _loss_fn(self, params, rest, batch, kld_weight, key):
        model = self._merge(params, rest)
        out = model(self._model_input(batch), key,
                    **self._kwargs(batch))
        kld = masked_loss(out["log_q"] * self.entropy_weight,
                          out["log_p"], fn=lambda x, y: x - y)
        rec = out["rec_loss"]
        loss = rec * self.rec_loss_scale + kld * kld_weight
        metrics = {
            "kld": kld,
            "rec_loss": rec,
            "log_p": -out["log_p"].mean(),
            "log_q": -out["log_q"].mean(),
            "length": out["log_p"].lengths.sum(),
            "logstd": out["logstd"],
            "q_logstd": out["q_logstd"],
            "q_mean_abs": out["q_mean_abs"],
        }
        if self.use_tokens:
            token_kld = out["ce_loss"]
            loss = loss + token_kld * self.token_kld_weight * kld_weight
            metrics["token_kld"] = token_kld
        return loss, metrics

    def _kld_weight(self, step: Array) -> Array:
        w = jnp.asarray(self.kld_scale, jnp.float32)
        if self.warmup_kld > 0:
            mult = (step - self.zero_kld) / self.warmup_kld
            in_warm = ((step + 1) > self.zero_kld) & \
                ((step + 1) <= self.warmup_kld)
            w = jnp.where(in_warm, self.kld_scale * mult, w)
        if self.zero_kld > 0:
            w = jnp.where(step <= self.zero_kld, 0.0, w)
        return w

    def _build_train_step(self):
        grad_fn = jax.grad(self._loss_fn, has_aux=True)

        @partial(jax.jit, donate_argnums=(0, 2))
        def train_step(params, rest, opt_state, batch_stack, step, key):
            kld_weight = self._kld_weight(step)
            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)

            def body(acc, mb_key):
                mb, k = mb_key
                grads, metrics = grad_fn(params, rest, mb, kld_weight, k)
                acc = jax.tree_util.tree_map(jnp.add, acc, grads)
                return acc, metrics

            accum = jax.tree_util.tree_leaves(
                batch_stack)[0].shape[0]
            keys = jax.random.split(key, accum)
            grads, metrics_all = jax.lax.scan(
                body, zero_grads, (batch_stack, keys))
            # Aggregate over the accumulation axis like the reference's
            # full-batch logging (trainers/speech/lvtr.py:119-145):
            # token-sum metrics add up; per-token/elementwise means are
            # weighted by each micro-batch's valid-token count.
            n_mb = metrics_all["length"]
            sum_keys = {"kld", "rec_loss", "token_kld", "length"}
            metrics = {
                k: (v.sum(0) if k in sum_keys
                    else (v * n_mb).sum(0) / n_mb.sum())
                for k, v in metrics_all.items()
            }
            if self.grad_mask is not None:
                grads = jax.tree_util.tree_map(
                    lambda g, m: g * m, grads, self.grad_mask)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics)
            metrics["kld_weight"] = kld_weight
            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["lr"] = self.lr_schedule(step)
            return params, opt_state, metrics

        return train_step

    def _prep_batch(self, stacked_batch):
        keep = {"mel", "tokens", "cropped_mel_utt", "cropped_mel"}
        stacked_batch = {k: v for k, v in stacked_batch.items()
                         if k in keep}
        if self._fuse_accum:
            stacked_batch = trainer_lib.fuse_microbatches(stacked_batch)
        # Micro-batch axis is leading: shard on axis 1 (batch).
        return mesh_lib.shard_batch(stacked_batch, self.mesh, axis=1)

    def run_step(self, stacked_batch) -> Dict[str, Any]:
        if self._train_step is None:
            self._train_step = self._build_train_step()
        batch = self._prep_batch(stacked_batch)
        self.rng, key = jax.random.split(self.rng)
        with self.parallel_context():
            self.params, self.opt_state, metrics = self._train_step(
                self.params, self.rest, self.opt_state, batch,
                jnp.asarray(self.global_step), key)
        n = metrics.pop("length")
        for k in ("kld", "rec_loss", "token_kld"):
            if k in metrics:
                metrics[k] = metrics[k] / n
        return metrics

    # ---------------------------------------------------------- validation
    def _build_eval_step(self):
        @jax.jit
        def eval_step(params, rest, batch, key):
            _, metrics = self._loss_fn(params, rest, batch,
                                       jnp.asarray(1.0), key)
            return metrics

        return eval_step

    def validation_run(self, step: int) -> None:
        limit = self.hp.trainer.get("limit_val_batches", 50)
        loader = self.val_dataloader()
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        totals: Dict[str, float] = {}
        length_total = 0.0
        n_batches = 0
        first_batch = None
        for i, batch in enumerate(loader):
            if i >= limit:
                break
            keep = {"mel", "tokens", "cropped_mel_utt", "cropped_mel"}
            jb = bucket_pad_batch(
                {k: v for k, v in batch.items() if k in keep})
            self.rng, key = jax.random.split(self.rng)
            m = self._eval_step(self.params, self.rest, jb, key)
            n = float(m["length"])
            length_total += n
            for k in ("kld", "rec_loss", "token_kld"):
                if k in m:
                    totals[k] = totals.get(k, 0.0) + float(m[k])
            n_batches += 1
            if first_batch is None:
                first_batch = batch
        if self.logger is not None and n_batches:
            self.logger.log_scalars(
                {f"val/{k}": v / length_total
                 for k, v in totals.items()}, step)
        if first_batch is not None:
            self._log_audio_samples(first_batch, step)

    def _log_audio_samples(self, batch, step: int) -> None:
        """Reconstruction + prior-continuation audio
        (``trainers/speech/lvtr.py:182-274``)."""
        if self.logger is None:
            return
        num = min(self.hp.logging.num_samples,
                  batch["mel"].value.shape[0])
        self.sync_model()
        self.rng, k1, k2, k3 = jax.random.split(self.rng, 4)
        mel = Masked(np.asarray(batch["mel"].value)[:num],
                     np.asarray(batch["mel"].lengths)[:num], 1)
        model_input = mel
        if self.use_tokens:
            toks = Masked(
                np.asarray(batch["tokens"].value)[:num, :, None].astype(
                    np.float32),
                np.asarray(batch["tokens"].lengths)[:num], 1)
            model_input = toks.cat(mel)
        # Reconstruction: encode -> decode (+utterance embedding).
        u_c = None
        if self.model.utterance_net is not None:
            utt = Masked(
                np.asarray(batch["cropped_mel_utt"].value)[:num],
                np.asarray(batch["cropped_mel_utt"].lengths)[:num], 1)
            u_c = self.model.utterance_pool(self.model.utterance_net(utt))
        enc = self.model.encode(model_input, k1)
        rec_mel = self.model.decode(enc, k2, u_c=u_c)
        rec_audio = self.vocoder.decode(rec_mel)
        re_vocoded = self.vocoder.decode(mel)
        # Shuffled-speaker reconstruction (``lvtr.py:245-262``).
        s_rec_audio = None
        if u_c is not None and num > 1:
            perm = np.random.RandomState(step).permutation(num)
            s_mel = self.model.decode(enc, jax.random.fold_in(k2, 1),
                                      u_c=u_c[perm])
            s_rec_audio = self.vocoder.decode(s_mel)
        # Prior continuation.
        prior_len = int(self.hp.logging.sample_prior_length
                        * self.val_mel_sample_rate)
        length = int(self.hp.logging.sample_length
                     * self.val_mel_sample_rate
                     * self.model.sample_ratio)
        prior = Masked(model_input.value[:, :prior_len],
                       np.minimum(np.asarray(model_input.lengths),
                                  prior_len), 1)
        plot_attn = bool(self.hp.logging.plot_attn)
        samples = self.sampler(length, prior, k3,
                               temperature=self.hp.logging.temperature,
                               return_attn=plot_attn)
        sampled_audio = self.vocoder.decode(samples["output"])
        sr = self.hp.data.train.sample_rate
        artifacts = [("re_vocoded", re_vocoded),
                     ("reconstruct", rec_audio),
                     ("samples", sampled_audio)]
        if s_rec_audio is not None:
            artifacts.append(("shuffled_rec", s_rec_audio))
        for i in range(num):
            for tag, audio in artifacts:
                wav = np.asarray(audio.value)[i]
                ln = int(np.asarray(audio.lengths)[i])
                self.logger.log_audio(f"{tag}/{i}", wav[:ln], step, sr)
        if plot_attn:
            # Last-layer self-attention over the generated continuation
            # (the reference requests maps on the speech path but never
            # plots them — trainers/speech/lvtr.py:235, sampler.py:48).
            from ...inference.plots import plot_attn as attn_fig
            attn = np.asarray(samples["attn"])  # (B, L, H, steps, T)
            for i in range(num):
                self.logger.log_figure(
                    f"self_attn/{i}", attn_fig(attn[i, -1]), step)

    # --------------------------------------------------------- checkpoints
    def save_checkpoint(self, path: str) -> None:
        self.sync_model()
        save_compact(self.model, path)
        if self.logger is not None:
            self.hp.save(os.path.join(self.logger.ckpt_path, "hp.yaml"))
            self.hp.save(os.path.join(
                os.path.dirname(path), "hp.yaml"))

    def resume(self, path: str) -> None:
        if path.endswith(".npz"):
            load_compact(self.model, path)
            self._setup_state()
            return
        from ...training.checkpoint import restore_train_state
        template = {"params": self.params, "opt_state": self.opt_state,
                    "step": self.global_step}
        state = restore_train_state(path, template)
        # Restore onto the TP/FSDP shardings of a freshly-init template.
        self.params = self.place_params(state["params"])
        self.opt_state = self.place_opt_state(
            self.tx, self.params, state["opt_state"])
        self.global_step = int(state["step"])

    def save_full_state(self, path: str) -> None:
        state = {"params": self.params, "opt_state": self.opt_state,
                 "step": self.global_step}
        try:
            save_train_state(path, state)
        except Exception as e:  # orbax quirk tolerance
            import logging as _l
            _l.getLogger(__name__).warning("full-state save failed: %s", e)
