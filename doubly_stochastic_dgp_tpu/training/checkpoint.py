"""Checkpoint / resume: save and restore (model, opt_state, step)
pytrees.

Rebuilds the reference's checkpoint capability
(gpflow_monitor.StoreSession TF-session checkpoints,
/root/reference/demos/run_regression.py:93-94) with Orbax when
available, falling back to a plain npz-of-leaves format (the pytree
structure comes from a template, so custom Module nodes restore
exactly)."""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _leaves_to_npz(path: str, tree, step: int):
    leaves = jax.tree_util.tree_leaves(tree)
    arrs = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrs["__step__"] = np.asarray(step)
    np.savez(path, **arrs)


def _leaves_from_npz(path: str, template) -> Tuple[Any, int]:
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = []
    for i, l in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        new_leaves.append(jnp.asarray(arr, dtype=jnp.asarray(l).dtype))
    step = int(data["__step__"])
    return jax.tree_util.tree_unflatten(treedef, new_leaves), step


def save_checkpoint(ckpt_dir: str, state, step: int, backend: str = "npz"):
    """state: any pytree (e.g. (model, opt_state)).

    backend='npz' (default, dependency-free) or 'orbax' (async-capable,
    the production choice; Module pytrees round-trip through Orbax's
    StandardCheckpointer since they are registered pytrees)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    if backend == "orbax":
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(ckpt_dir, f"orbax_{step}"))
        # synchronous handler: the async StandardCheckpointer returns
        # before files hit disk
        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
            ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
        return path
    path = os.path.join(ckpt_dir, f"ckpt_{step}.npz")
    _leaves_to_npz(path, state, step)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for f in os.listdir(ckpt_dir):
        if f.startswith("ckpt_") and f.endswith(".npz"):
            try:
                steps.append(int(f[5:-4]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, template,
                       step: Optional[int] = None, backend: str = "npz"):
    """Restore into the structure of ``template``; returns
    (state, step) or (template, None) if nothing to restore."""
    if backend == "orbax":
        import orbax.checkpoint as ocp
        if step is None:
            steps = []
            for f in os.listdir(ckpt_dir) if os.path.isdir(ckpt_dir) else []:
                if f.startswith("orbax_"):
                    try:
                        steps.append(int(f[6:]))
                    except ValueError:
                        pass
            if not steps:
                return template, None
            step = max(steps)
        path = os.path.abspath(os.path.join(ckpt_dir, f"orbax_{step}"))
        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
            state = ckptr.restore(
                path, args=ocp.args.StandardRestore(template))
        return state, step
    step = step if step is not None else latest_step(ckpt_dir)
    if step is None:
        return template, None
    path = os.path.join(ckpt_dir, f"ckpt_{step}.npz")
    state, s = _leaves_from_npz(path, template)
    return state, s
