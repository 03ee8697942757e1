"""Registry-by-string class resolution.

Parity target: the reference's importlib dispatch
(``scripts/train.py:50-54``, ``inference/inferer.py:18-22``) — dotted
``identifier`` strings in YAML locate trainer/model/inferer classes.
Reference identifiers (e.g. ``trainers.speech.lvtr.LVTRTrainer``)
resolve inside this package first, so reference config files work
unchanged.
"""
from __future__ import annotations

import importlib
from typing import Any


def resolve(identifier: str) -> Any:
    module_name, cls_name = identifier.rsplit(".", 1)
    for prefix in ("vae_gslm_tpu.", ""):
        try:
            module = importlib.import_module(prefix + module_name)
            return getattr(module, cls_name)
        except (ImportError, AttributeError):
            continue
    raise ImportError(f"cannot resolve identifier {identifier!r}")
