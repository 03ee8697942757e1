"""Checkpoint IO.

Dual-track like the reference (SURVEY §5):
  * **Compact deployment format** — model-only params + ``hp.yaml`` in a
    directory (``{dir}/last-cpt.npz`` + ``{dir}/hp.yaml``), mirroring the
    reference's ``CompactModelCheckpoint`` contract
    (``training_lib/callbacks.py:4-10``) consumed by ``from_pretrained``.
    Stored as a flat ``path -> array`` npz; portable, no pickle.
  * **Full train state** — params + optimizer + step via Orbax for exact
    resume (the Lightning full-ckpt equivalent).
"""
from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np
from flax import nnx


def _flatten_state(state) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            nnx.to_pure_dict(state))[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_compact(module: nnx.Module, path: str) -> None:
    """Save model-only params as ``path`` (npz)."""
    state = nnx.state(module)
    np.savez(path, **_flatten_state(state))


def load_compact(module: nnx.Module, path: str) -> None:
    """In-place load of a compact npz into a module (strict on shapes,
    lenient on missing/extra keys like the reference's strict=False)."""
    data = np.load(path)
    state = nnx.state(module)
    pure = nnx.to_pure_dict(state)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(pure)
    new_leaves = []
    for pth, leaf in leaves:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in pth)
        if key in data.files:
            arr = data[key]
            assert arr.shape == leaf.shape, (
                f"{key}: ckpt {arr.shape} vs model {leaf.shape}")
            new_leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
        else:
            new_leaves.append(leaf)
    pure = jax.tree_util.tree_unflatten(treedef,
                                        [l for l in new_leaves])
    nnx.replace_by_pure_dict(state, pure)
    nnx.update(module, state)


def get_last_ckpt(directory: str) -> str:
    """Newest ``*-cpt.*`` by ``step=`` regex
    (``utils/helpers.py:153-161``); falls back to ``last-cpt.*``."""
    cands = list(Path(directory).glob("*-cpt.npz")) + \
        list(Path(directory).glob("*-cpt.ckpt"))
    if not cands:
        raise FileNotFoundError(f"no compact checkpoint in {directory}")

    def step_of(p: Path):
        m = re.findall(r"step=(\d+)", p.stem)
        return int(m[0]) if m else -1

    return str(sorted(cands, key=step_of)[-1])


# ------------------------------------------------------------- orbax full
def save_train_state(path: str, state: Any) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path),
               jax.tree_util.tree_map(np.asarray, state), force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
