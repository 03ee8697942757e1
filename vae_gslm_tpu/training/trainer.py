"""Base trainer: data wiring, init, the jitted-step training loop.

Parity target: ``/root/reference/training_lib/trainer.py`` (dataloader
factory with standard/bucket/concat samplers, grad-accum count,
``init_weights``) and the Lightning loop semantics the reference relies
on (step counting per optimizer step, ``val_check_interval``, dual
checkpoint tracks).

TPU-first: instead of Lightning + DDP, each task trainer exposes a pure
``train_step(params, rest, opt_state, batch, step, key)`` that the base
loop jits once over a 1-D ``data`` mesh — params replicated, batch
sharded, gradient all-reduce inserted by XLA SPMD.  Gradient
accumulation stacks micro-batches on a leading axis and `lax.scan`s over
them, **summing** gradients (the reference sums too: its losses are
masked sums accumulated via repeated backward).
"""
from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ..data.loader import DataLoader
from ..data.sampler import (concat_length_sampler, random_bucket_sampler,
                            standard_sampler)
from ..hparams.hp import Hparams
from ..nn.attention import CrossAttention, SelfAttention
from ..nn.linear import Dense, Embedding
from ..nn.transformer import TransformerLayerStack
from ..parallel import mesh as mesh_lib
from ..parallel import tp
from .logging import ExperimentLogger
from .optimizer import create_optimizer

log = logging.getLogger(__name__)


def init_weights(model: nnx.Module, init_std: float = 1.0,
                 seed: int = 0) -> None:
    """Reference init (``training_lib/trainer.py:113-125``): zero all
    biases, unit norm scales (our norms already init so), then
    per-module custom init — attention projections uniform
    ±init_std/sqrt(dim/3), embeddings uniform ±1, T5 bias tables."""
    key = jax.random.PRNGKey(seed)
    i = 0
    for path, node in nnx.iter_graph(model):
        if isinstance(node, Dense) and node.bias is not None:
            node.bias[...] = jnp.zeros_like(node.bias[...])
        if isinstance(node, SelfAttention):
            std = init_std / np.sqrt(node.dim / 3)
            for mod in (node.in_proj, node.out_proj):
                i += 1
                mod.set_uniform(std, key=jax.random.fold_in(key, i))
        if isinstance(node, CrossAttention):
            std = init_std / np.sqrt(node.dim / 3)
            for mod in (node.q_proj, node.kv_proj, node.out_proj):
                i += 1
                mod.set_uniform(std, key=jax.random.fold_in(key, i))
        if isinstance(node, Embedding):
            i += 1
            node.table[...] = jax.random.uniform(
                jax.random.fold_in(key, i), node.table[...].shape,
                jnp.float32, -1.0, 1.0)
        if isinstance(node, TransformerLayerStack):
            i += 1
            node.set_uniform(init_std / np.sqrt(node.dim / 3),
                             key=jax.random.fold_in(key, i))


def stack_batches(batches) -> Any:
    """Stack micro-batch pytrees on a new leading axis."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches)


def fuse_microbatches(stacked: Any) -> Any:
    """Collapse the grad-accum axis into the batch axis:
    (accum, B, ...) -> (1, accum * B, ...).

    Summed gradients over scanned micro-batches equal the gradient of
    one fused batch (losses are masked SUMS — the equivalence the
    metric-aggregation test asserts), so this is numerics-preserving
    up to per-micro-batch PRNG draws while giving the MXU 2x the GEMM
    rows per kernel launch.  Costs ~2x activation memory; gated by
    ``training.fuse_accumulation`` / ``VAE_GSLM_FUSE_ACCUM``.
    """
    def f(x):
        a = jnp.asarray(x)
        return a.reshape((1, a.shape[0] * a.shape[1]) + a.shape[2:])

    return jax.tree_util.tree_map(f, stacked)


def bucket_pad_batch(batch: Dict[str, Any], bucket: int = 256
                     ) -> Dict[str, Any]:
    """Pad every Masked entry's time axis up to a multiple of
    ``bucket`` (zeros, lengths unchanged).  Bounds the number of
    distinct compiled shapes when eval batches have data-dependent
    lengths (e.g. the reference's ``pad: multiple_of`` val configs)."""
    from ..core.masked import Masked

    out: Dict[str, Any] = {}
    for k, v in batch.items():
        if isinstance(v, Masked) and v.time_axis == 1:
            value = np.asarray(v.value)
            t = value.shape[1]
            target = -(-t // bucket) * bucket
            if target != t:
                pad = [(0, 0), (0, target - t)] + \
                    [(0, 0)] * (value.ndim - 2)
                value = np.pad(value, pad)
            out[k] = Masked(value, np.asarray(v.lengths), 1)
        else:
            out[k] = v
    return out


class BaseTrainer:
    """Owns the mesh, data, optimizer, logger and the step loop."""

    def __init__(self, hp: Hparams):
        hp.check_arg_in_hparams("model", "data")
        self.hp = hp
        self.gradient_update_step = 1
        if hp.has("training") and hp.training.has("gradient_accumulation"):
            self.gradient_update_step = hp.training.gradient_accumulation
        n_dev = hp.trainer.get("n_devices", None) if hp.has("trainer") \
            else None
        mp = hp.trainer.get("model_parallel", None) if hp.has("trainer") \
            else None
        pp_n = hp.trainer.get("pipeline_parallel", None) \
            if hp.has("trainer") else None
        self._pp_micro = int(hp.trainer.get(
            "pipeline_microbatches", pp_n or 0)) if hp.has("trainer") \
            else 0
        if pp_n and pp_n > 1:
            # ("data", "pipe") mesh: GPipe pipeline over the trunk's
            # layer dimension (parallel/pp.py; beyond-reference).
            from ..parallel import pp as pp_lib
            self.mesh = pp_lib.create_mesh_pipe(
                pp_n, n_dev // pp_n if n_dev else None)
        elif mp and mp > 1:
            # (data, model) mesh: Megatron-style tensor parallelism for
            # the transformer trunk via sharding annotations alone
            # (parallel/tp.py); beyond the reference's DDP-only scale.
            from ..parallel import tp
            self.mesh = tp.create_mesh_2d(
                mp, n_dev // mp if n_dev else None)
        else:
            self.mesh = mesh_lib.create_mesh(n_dev)
        # ZeRO/FSDP-style param + optimizer-state sharding over the
        # data axis (parallel/fsdp.py; beyond the reference's
        # replicated DDP).
        self._fsdp = bool(hp.trainer.get("fsdp", False)) \
            if hp.has("trainer") else False
        self._fsdp_min_size = hp.trainer.get(
            "fsdp_min_size", 4096) if hp.has("trainer") else 4096
        # Megatron-style sequence parallelism: shard the residual
        # stream's T over the model axis between the TP matmuls
        # (parallel/tp.py::sequence_parallel; needs model_parallel > 1).
        self._seq_parallel = bool(hp.trainer.get(
            "sequence_parallel", False)) if hp.has("trainer") else False
        self.global_step = 0
        self.logger: Optional[ExperimentLogger] = None
        # Multi-host: rank 0 owns artifact writes (scalars, compact
        # checkpoints); orbax full-state saves run on every rank
        # (orbax coordinates the single writer itself).
        self._is_main = mesh_lib.process_index() == 0

    def parallel_context(self):
        """Ambient parallelism for a train/eval/sampling step: the
        shard_mapped flash-attention mesh, plus sequence-parallel
        residual-stream constraints when configured."""
        ctx = contextlib.ExitStack()
        ctx.enter_context(tp.flash_mesh(self.mesh))
        if self._seq_parallel:
            ctx.enter_context(tp.sequence_parallel(self.mesh))
        if "pipe" in self.mesh.axis_names \
                and dict(self.mesh.shape)["pipe"] > 1:
            from ..parallel import pp as pp_lib
            ctx.enter_context(pp_lib.pipeline(self.mesh,
                                              self._pp_micro))
        return ctx

    # ----------------------------------------------------- param placement
    def place_params(self, params: Any) -> Any:
        """Device_put a parameter pytree per the trainer's parallelism
        config: replicated (DP), TP specs (model axis), and/or FSDP
        shardings over the data axis (``trainer.fsdp: true``)."""
        if self._fsdp:
            from ..parallel import fsdp
            return fsdp.shard_params(params, self.mesh,
                                     min_size=self._fsdp_min_size)
        return mesh_lib.place_params(params, self.mesh)

    def init_opt_state(self, tx, params: Any) -> Any:
        """Optimizer-state init following the params' shardings (Adam
        moments come out of ``zeros_like``, so sharded params yield
        sharded moments; replicated params get explicit replication)."""
        if self._fsdp or mesh_lib.has_model_axis(self.mesh):
            return tx.init(params)
        return mesh_lib.replicate_tree(tx.init(params), self.mesh)

    def place_opt_state(self, tx, params: Any, opt_state: Any) -> Any:
        """Place a RESTORED optimizer state onto the shardings a fresh
        ``tx.init(params)`` template would have (exact-resume path).
        Template leaves without a mesh sharding (freshly created
        scalars like Adam's ``count`` come out single-device) are
        replicated over the mesh instead."""
        if self._fsdp or mesh_lib.has_model_axis(self.mesh):
            from jax.sharding import NamedSharding
            template = tx.init(params)
            repl = mesh_lib.replicated(self.mesh)

            def put(z, s):
                sh = getattr(z, "sharding", None)
                if isinstance(sh, NamedSharding):
                    return jax.device_put(np.asarray(s), sh)
                return jax.device_put(np.asarray(s), repl)

            return jax.tree_util.tree_map(put, template, opt_state)
        return mesh_lib.replicate_tree(opt_state, self.mesh)

    # ---------------------------------------------------------------- data
    def _world(self):
        distributed = self.hp.trainer.get("distributed", False)
        if distributed:
            return mesh_lib.process_count(), mesh_lib.process_index()
        return None, None

    def get_dataloader(self, hp: Hparams, dataset) -> DataLoader:
        """Sampler dispatch (``training_lib/trainer.py:40-111``)."""
        hp.check_arg_in_hparams("num_workers", "sampler")
        world_size, rank = self._world()
        distributed = self.hp.trainer.get("distributed", False)
        styp = hp.sampler.type
        if styp == "standard":
            hp.check_arg_in_hparams("batch_size")
            sampler = standard_sampler(
                len(dataset), hp.batch_size,
                shuffle=hp.sampler.shuffle, distributed=distributed,
                world_size=world_size, rank=rank,
                drop_last=hp.sampler.get("drop_last", True))
        elif styp == "bucket":
            hp.sampler.check_arg_in_hparams("num_buckets")
            sampler = random_bucket_sampler(
                hp.sampler.num_buckets, dataset.lengths,
                hp.get("batch_size", None), hp.get("batch_length", None),
                hp.sampler.get("drop_last", False), distributed,
                world_size=world_size, rank=rank)
        elif styp == "concat":
            hp.check_arg_in_hparams("batch_size", "length")
            sampler = concat_length_sampler(
                hp.batch_size, hp.length, dataset.lengths, distributed,
                world_size=world_size, rank=rank)
        else:
            raise NotImplementedError(styp)
        return DataLoader(dataset, sampler,
                          num_workers=hp.num_workers)

    # --------------------------------------------------------------- hooks
    def train_dataloader(self) -> DataLoader:
        raise NotImplementedError

    def val_dataloader(self) -> Optional[DataLoader]:
        return None

    def train_metrics_tags(self) -> Dict[str, str]:
        return {}

    def validation_run(self, step: int) -> None:
        pass

    def save_checkpoint(self, path: str) -> None:
        raise NotImplementedError

    # ----------------------------------------------- full-state resume
    def _train_state(self):
        """Pytree for exact resume.  Default covers the single-
        optimizer trainers (params/opt_state/step); multi-optimizer
        trainers override (e.g. the HiFi-GAN GAN loop)."""
        if hasattr(self, "params") and hasattr(self, "opt_state"):
            return {"params": self.params,
                    "opt_state": self.opt_state,
                    "step": self.global_step}
        return None

    def _apply_train_state(self, state) -> None:
        self.params = self.place_params(state["params"])
        tx = getattr(self, "tx", None)
        if tx is not None:
            self.opt_state = self.place_opt_state(
                tx, self.params, state["opt_state"])
        else:
            self.opt_state = mesh_lib.replicate_tree(
                state["opt_state"], self.mesh)
        self.global_step = int(state["step"])
        self._train_step = None

    def save_full_state(self, path: str) -> None:
        """Orbax full train state (exact resume incl. optimizer and
        step) — available for EVERY trainer, not just LVTR."""
        state = self._train_state()
        if state is None:
            return
        try:
            from .checkpoint import save_train_state
            save_train_state(path, state)
        except Exception as e:   # orbax quirk tolerance
            log.warning("full-state save failed: %s", e)

    def restore_full_state(self, path: str) -> None:
        from .checkpoint import restore_train_state
        template = self._train_state()
        state = restore_train_state(path, template)
        self._apply_train_state(state)

    def step_fn(self):
        """Return the pure jitted step callable + its state refs."""
        raise NotImplementedError

    def resume(self, path: str) -> None:
        """Resume from a full-state dir (orbax) or compact npz."""
        raise NotImplementedError

    # ------------------------------------------------------- preemption
    def _install_preemption_handler(self):
        """SIGTERM-safe training (beyond the reference, which has no
        preemption handling — SURVEY §5): TPU VMs are preemptible, and
        the maintenance signal arrives as SIGTERM.  The handler only
        sets a flag; the fit loop checkpoints the FULL train state at
        the next optimizer-step boundary and returns cleanly, so
        ``-r <full_state>`` resumes exactly.  Returns a restore
        callable."""
        import signal

        self._preempted = False

        def on_term(signum, frame):
            log.warning("SIGTERM received: checkpointing at the next "
                        "step boundary, then exiting")
            self._preempted = True

        try:
            prev = signal.signal(signal.SIGTERM, on_term)
        except ValueError:          # non-main thread: no handler
            return lambda: None

        def restore():
            signal.signal(signal.SIGTERM, prev)

        return restore

    # ---------------------------------------------------------------- loop
    def fit(self, logger: ExperimentLogger,
            max_steps: Optional[int] = None,
            val_check_interval: Optional[int] = None,
            log_every: int = 50,
            profile_dir: Optional[str] = None) -> None:
        self.logger = logger
        hp_tr = self.hp.trainer
        total_steps = max_steps or hp_tr.total_steps
        val_interval = val_check_interval or hp_tr.get(
            "val_check_interval", None)
        loader = self.train_dataloader()
        accum = self.gradient_update_step
        restore_sig = self._install_preemption_handler()
        t0 = time.time()
        profiled = False
        epoch = 0
        # The micro-batch accumulator deliberately carries across epoch
        # boundaries: a dataset yielding fewer batches per epoch than
        # the grad-accum count would otherwise reset it every epoch and
        # spin forever — burning CPU on data loading with zero
        # optimizer steps (hit by a tiny-corpus CLI drive; 4 h, 0
        # steps).  The reference's Lightning loop can't hit this (it
        # flushes incomplete accumulation groups at epoch end).
        micro: list = []
        while self.global_step < total_steps:
            loader.sampler.set_epoch(epoch)
            epoch += 1
            yielded = False
            for batch in loader:
                yielded = True
                micro.append(batch)
                if len(micro) < accum:
                    continue
                stacked = stack_batches(micro)
                micro = []
                if profile_dir and not profiled \
                        and self.global_step == 10:
                    try:
                        jax.profiler.start_trace(profile_dir)
                    except Exception as e:  # tunneled platforms may
                        log.warning("profiler unavailable: %s", e)
                        profiled = True
                with self.parallel_context():
                    metrics = self.run_step(stacked)
                if profile_dir and not profiled \
                        and self.global_step == 12:
                    try:
                        jax.profiler.stop_trace()
                    except Exception as e:
                        log.warning("profiler stop failed: %s", e)
                    profiled = True
                self.global_step += 1
                if self.global_step % log_every == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    metrics["steps_per_sec"] = log_every / (
                        time.time() - t0)
                    t0 = time.time()
                    if self._is_main:
                        logger.log_scalars(
                            {f"train/{k}": v
                             for k, v in metrics.items()},
                            self.global_step)
                if val_interval and \
                        self.global_step % val_interval == 0:
                    if mesh_lib.process_count() == 1:
                        with self.parallel_context():
                            self.validation_run(self.global_step)
                    else:
                        # Multi-host validation would need every rank
                        # to run the val graph in lockstep; skipped for
                        # now — run eval single-host on the compact
                        # checkpoint instead.
                        log.warning("multi-host run: skipping "
                                    "validation at step %d",
                                    self.global_step)
                    self.checkpoint()
                if getattr(self, "_preempted", False):
                    self.checkpoint()
                    log.warning("preemption checkpoint written at "
                                "step %d; exiting fit", self.global_step)
                    restore_sig()
                    return
                if self.global_step >= total_steps:
                    break
            if not yielded:
                raise RuntimeError(
                    "train dataloader yielded no batches — dataset "
                    "smaller than the (distributed) batch size?")
        if mesh_lib.process_count() == 1:
            with self.parallel_context():
                self.validation_run(self.global_step)
        self.checkpoint()
        restore_sig()

    def checkpoint(self) -> None:
        if self.logger is None:
            return
        if self._is_main:
            path = os.path.join(
                self.logger.ckpt_path,
                f"step={self.global_step}-cpt.npz")
            self.save_checkpoint(path)
            last = os.path.join(self.logger.ckpt_path, "last-cpt.npz")
            self.save_checkpoint(last)
        # every rank participates: orbax coordinates the single writer
        self.save_full_state(
            os.path.join(self.logger.ckpt_path, "full_state"))

    def run_step(self, stacked_batch) -> Dict[str, Any]:
        raise NotImplementedError
