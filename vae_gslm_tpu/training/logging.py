"""Experiment logging: TensorBoard with versioned run directories.

Parity target: the reference's TensorBoardLogger layout
(``scripts/train.py:56-61``): ``{log_dir}/log/version_N`` for events and
``{log_dir}/ckpt/version_N`` for checkpoints, plus scalar/audio/figure/
text channels used by the trainers.  Falls back to a JSONL logger when
tensorboardX is unavailable.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


def next_version(root: str) -> int:
    os.makedirs(root, exist_ok=True)
    versions = []
    for name in os.listdir(root):
        if name.startswith("version_"):
            try:
                versions.append(int(name.split("_")[1]))
            except (IndexError, ValueError):
                pass
    return max(versions) + 1 if versions else 0


class ExperimentLogger:
    def __init__(self, log_dir: str, name: Optional[str] = None,
                 version: Optional[int] = None):
        base = os.path.join(log_dir, name) if name else log_dir
        if version is None:
            version = next_version(os.path.join(base, "log"))
        self.version = version
        self.log_path = os.path.join(base, "log", f"version_{version}")
        self.ckpt_path = os.path.join(base, "ckpt", f"version_{version}")
        os.makedirs(self.log_path, exist_ok=True)
        os.makedirs(self.ckpt_path, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter
            self.writer = SummaryWriter(self.log_path)
        except ImportError:
            self.writer = None
        self._jsonl = open(os.path.join(self.log_path, "metrics.jsonl"),
                           "a")

    def log_scalar(self, tag: str, value, step: int) -> None:
        value = float(value)
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": value, "step": step,
             "time": time.time()}) + "\n")

    def log_scalars(self, scalars: dict, step: int) -> None:
        for k, v in scalars.items():
            self.log_scalar(k, v, step)
        self._jsonl.flush()

    def log_audio(self, tag: str, wave, step: int,
                  sample_rate: int) -> None:
        wave = np.asarray(wave, np.float32)
        if self.writer is not None:
            try:
                self.writer.add_audio(tag, wave[:, None], step,
                                      sample_rate=sample_rate)
                return
            except (ImportError, ModuleNotFoundError):
                pass
        # Fallback: dump the wav next to the event files.
        from ..data.audio import save_wav
        out = os.path.join(self.log_path, "audio",
                           f"{tag.replace('/', '_')}_step{step}.wav")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        save_wav(out, wave, sample_rate)

    def log_text(self, tag: str, text: str, step: int) -> None:
        if self.writer is not None:
            self.writer.add_text(tag, text, step)

    def log_figure(self, tag: str, figure, step: int) -> None:
        if self.writer is not None:
            self.writer.add_figure(tag, figure, step)

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
        self._jsonl.close()
