"""Training CLI.

Parity target: ``/root/reference/scripts/train.py`` — flags
``-c/--config``, ``-n/--name``, ``-p/--profile``, ``-s/--sanity``,
``-d/--detect_anomaly``, ``-r/--resume_checkpoint``, ``-v/--version``,
``-log/--log_level``; versioned TensorBoard log/ckpt dirs; trainer
located by its dotted ``identifier``.

TPU mappings: ``--profile`` → ``jax.profiler`` trace of steps 10-12;
``--detect_anomaly`` → ``jax_debug_nans``; precision ``"16-mixed"`` →
bf16-mixed compute policy.
"""
from __future__ import annotations

import argparse
import logging
import os


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-n", "--name", default=None)
    parser.add_argument("-p", "--profile", action="store_true")
    parser.add_argument("-s", "--sanity", action="store_true",
                        help="run a val pass before training")
    parser.add_argument("-d", "--detect_anomaly", action="store_true")
    parser.add_argument("-r", "--resume_checkpoint", default=None)
    parser.add_argument("-v", "--version", type=int, default=None)
    parser.add_argument("-log", "--log_level", default="INFO")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="override trainer.total_steps (smoke runs)")
    args = parser.parse_args()

    logging.basicConfig(level=getattr(logging, args.log_level.upper()))

    import jax

    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    # Multi-HOST runtime (env-gated no-op otherwise; must precede
    # first device use — see parallel/mesh.py::init_distributed).
    from ..parallel import mesh as mesh_lib
    mesh_lib.init_distributed()

    from ..hparams.hp import Hparams
    from ..core import precision
    from ..training.logging import ExperimentLogger
    from .registry import resolve

    hp = Hparams.from_yamlfile(args.config)
    hp.check_arg_in_hparams("trainer", "logging")
    hp.trainer.check_arg_in_hparams("identifier", "total_steps")

    prec = hp.trainer.get("precision", "32")
    if str(prec) in ("16-mixed", "bf16-mixed", "16"):
        precision.set_policy(precision.bf16_mixed())

    trainer_cls = resolve(hp.trainer.identifier)
    trainer = trainer_cls(hp)

    logger = ExperimentLogger(hp.logging.log_dir, name=args.name,
                              version=args.version)
    hp.save(os.path.join(logger.ckpt_path, "hp.yaml"))

    if args.resume_checkpoint:
        trainer.resume(args.resume_checkpoint)

    if args.sanity:
        trainer.logger = logger
        trainer.validation_run(step=0)

    profile_dir = os.path.join(logger.log_path, "profile") \
        if args.profile else None
    trainer.fit(logger,
                max_steps=args.max_steps,
                profile_dir=profile_dir)
    logger.close()


if __name__ == "__main__":
    main()
