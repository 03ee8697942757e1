"""Precompute log-mel ``.npy`` files for a dataset.

Parity target: ``/root/reference/scripts/preprocess_mels.py`` — iterate
the mel dataset and save each ``mel`` as ``.npy`` mirroring the wav
directory tree.
"""
from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-o", "--output_dir", required=True)
    parser.add_argument("--split", default="train",
                        choices=["train", "val"])
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from ..data.dataset import MelSpecDataset
    from ..hparams.hp import Hparams

    hp = Hparams.from_yamlfile(args.config)
    hp_data = hp.data.get(args.split, None) or hp.data
    hp_mel = hp.get("mel", None) or hp.get("feature", None)
    assert hp_mel is not None, "config needs a mel:/feature: block"
    ds = MelSpecDataset(hp_data, hp_mel, name="preprocess")
    wavdir = Path(hp_data.wavdir).resolve()
    for i in range(len(ds)):
        item = ds[i]
        rel = Path(ds.audios[i]).resolve()
        rel = rel.parent / (rel.stem + ".npy")
        rel = str(rel)[len(str(wavdir)) + 1:]
        out = Path(args.output_dir) / rel
        out.parent.mkdir(parents=True, exist_ok=True)
        np.save(str(out), np.asarray(item["mel"], np.float32))
        if (i + 1) % 100 == 0:
            logging.info("saved %d/%d", i + 1, len(ds))
    logging.info("done: %d mels -> %s", len(ds), args.output_dir)


if __name__ == "__main__":
    main()
