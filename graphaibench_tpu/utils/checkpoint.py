"""Training checkpoint/resume.

The reference has NO weight save/load (SURVEY.md §5 — models live and
die in one process); multi-host training needs real checkpointing, so
this adds it: orbax when available, with a plain-npz fallback that
handles arbitrary pytrees of arrays."""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save_checkpoint(path: str, state: Any, *, step: int = 0) -> str:
    """Save a pytree to ``path`` (directory). Returns the path."""
    os.makedirs(path, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        target = os.path.join(os.path.abspath(path), f"step_{step}")
        ckpt.save(target, state, force=True)
        ckpt.wait_until_finished()
        return target
    except Exception:
        leaves, treedef = _flatten(state)
        np.savez(
            os.path.join(path, f"step_{step}.npz"),
            *[np.asarray(l) for l in leaves],
        )
        with open(os.path.join(path, f"step_{step}.treedef.json"), "w") as f:
            json.dump({"n": len(leaves), "step": step}, f)
        return os.path.join(path, f"step_{step}.npz")


def restore_checkpoint(path: str, like: Any, *, step: int = 0) -> Any:
    """Restore into the structure of ``like``."""
    target = os.path.join(os.path.abspath(path), f"step_{step}")
    if os.path.isdir(target):
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        return ckpt.restore(target, like)
    npz = np.load(os.path.join(path, f"step_{step}.npz"))
    leaves, treedef = _flatten(like)
    new_leaves = [npz[f"arr_{i}"] for i in range(len(leaves))]
    import jax.numpy as jnp

    return jax.tree.unflatten(treedef, [jnp.asarray(l) for l in new_leaves])
