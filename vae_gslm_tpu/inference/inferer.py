"""Base inferer: checkpoint-directory loading contract.

Parity target: ``/root/reference/inference/inferer.py`` — reads
``{ckpt_path}/hp.yaml`` as the train-time config (source of truth at
inference), locates the model class by its dotted identifier, loads the
compact checkpoint leniently (strict=False equivalent).
"""
from __future__ import annotations

import os
from typing import Any

from ..hparams.hp import Hparams
from ..scripts.registry import resolve
from ..training.checkpoint import load_compact
from ..training.trainer import BaseTrainer


class BaseInferer(BaseTrainer):
    def __init__(self, hp: Hparams):
        hp.check_arg_in_hparams("ckpt_path")
        self.hp = hp
        self.hp_model = Hparams.from_yamlfile(
            os.path.join(hp.ckpt_path, "hp.yaml"))
        self.gradient_update_step = 1
        from ..parallel import mesh as mesh_lib
        self.mesh = mesh_lib.create_mesh()
        self.global_step = 0
        self.logger = None

    def load_model(self, *args, **kwargs) -> Any:
        from flax import nnx
        cls = resolve(self.hp.model.identifier)
        model = cls(self.hp_model.model, *args, rngs=nnx.Rngs(0),
                    **kwargs)
        ckpt = os.path.join(self.hp.ckpt_path, "last-cpt.npz")
        if not os.path.exists(ckpt):
            from ..training.checkpoint import get_last_ckpt
            ckpt = get_last_ckpt(self.hp.ckpt_path)
        if ckpt.endswith(".npz"):
            load_compact(model, ckpt)
        else:
            # Reference torch compact checkpoint (released artifacts).
            import torch

            from ..models import convert_torch as ct
            from ..models.speech.discrete import DiscreteAR
            from ..models.speech.lvtr import LVTR
            from ..models.tts.lvtr import LVTTS

            sd = torch.load(ckpt, map_location="cpu",
                            weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            if isinstance(model, LVTTS):
                ct.load_torch_lvtts(model, sd)
            elif isinstance(model, LVTR):
                ct.load_torch_lvtr(model, sd)
            elif isinstance(model, DiscreteAR):
                ct.load_torch_discrete_ar(model, sd)
            else:
                raise NotImplementedError(
                    f"torch conversion for {type(model).__name__}")
        self.model = model
        return model
