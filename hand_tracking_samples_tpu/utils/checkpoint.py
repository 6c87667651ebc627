"""Checkpoint / resume.

Two levels, mirroring SURVEY section 5:
  * .cnnb weight files (cnn/model.py) — reference-compatible interop.
  * Orbax checkpoints for training state (params + step + optimizer state)
    and tracker state snapshots — the production autosave/restore the
    reference lacks (train-hand-pose-cnn/readme.md:19 acknowledges no
    autosave).
"""
from __future__ import annotations

import os

import jax
import numpy as np


def save_orbax(path: str, tree):
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def save_tracker_state(path: str, state):
    """Snapshot TrackerState(s) as npz (tiny; trivially resumable)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(path, *[np.asarray(l) for l in leaves])


def load_tracker_state(path: str, like):
    z = np.load(path)
    leaves = [z[k] for k in z.files]
    treedef = jax.tree_util.tree_structure(like)
    import jax.numpy as jnp
    return jax.tree_util.tree_unflatten(treedef,
                                        [jnp.asarray(l) for l in leaves])
