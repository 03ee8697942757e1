"""Inference CLI.

Parity target: ``/root/reference/scripts/infer.py`` — loads an infer
YAML, optional ``-v version`` mode that materialises an experiment's
newest compact checkpoint + hp.yaml into a temp ckpt dir, builds the
inferer by dotted identifier and runs it.
"""
from __future__ import annotations

import argparse
import logging
import os
import shutil
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser(
        prog="Infer a model with a given config")
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-v", "--version", default=None)
    parser.add_argument("-log", "--loglevel", default="WARNING")
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    logging.basicConfig(level=args.loglevel.upper())

    from ..hparams.hp import Hparams
    from ..core import precision
    from ..training.checkpoint import get_last_ckpt
    from .registry import resolve

    hp = Hparams.from_yamlfile(args.config)
    if hp.has("output_dir"):
        Path(hp.output_dir).mkdir(parents=True, exist_ok=True)

    tmp_dir = None
    if args.version is not None:
        hp.check_arg_in_hparams("exp_dir")
        tmp_dir = f"./tmp_ckpt_infer_{args.version}"
        Path(tmp_dir).mkdir(parents=True, exist_ok=True)
        exp_path = os.path.join(hp.exp_dir, "ckpt",
                                f"version_{args.version}")
        last_ckpt = get_last_ckpt(exp_path)
        hp_path = os.path.join(hp.exp_dir, "ckpt",
                               f"version_{args.version}", "hp.yaml")
        if not os.path.exists(hp_path):
            hp_path = os.path.join(hp.exp_dir, "log",
                                   f"version_{args.version}", "hp.yaml")
        ext = Path(last_ckpt).suffix
        shutil.copy(last_ckpt, os.path.join(tmp_dir, f"last-cpt{ext}"))
        shutil.copy(hp_path, os.path.join(tmp_dir, "hp.yaml"))
        sym = os.path.join(exp_path, "symbols.json")
        if os.path.exists(sym):
            shutil.copy(sym, os.path.join(tmp_dir, "symbols.json"))
        hp.ckpt_path = tmp_dir

    prec = hp.get("precision", "32")
    if str(prec) in ("16-mixed", "bf16-mixed", "16"):
        precision.set_policy(precision.bf16_mixed())

    inferer_cls = resolve(hp.identifier)
    inferer = inferer_cls(hp)
    try:
        n = inferer.run(seed=args.seed, max_batches=args.max_batches)
        logging.info("produced %s outputs", n)
    finally:
        if tmp_dir is not None:
            shutil.rmtree(tmp_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
