"""Checkpoint/resume helpers for simulation and DSP state.

The reference's closest analogs are SSFM per-span snapshots (``saveSpanN``)
and the adaptive equalizer's tap-state in/out (SURVEY.md §5) with no
serialization format. Here any pytree of arrays (fields, tap tensors H/H_,
configs rendered to dicts, PRNG keys) round-trips through a single
``.npz``-based format — dependency-free, works for complex64, and loads back
as jnp arrays.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
from jax.tree_util import tree_flatten, tree_unflatten

__all__ = ["save_state", "load_state"]


def save_state(path, pytree):
    """Serialize a pytree of arrays/scalars to ``path`` (.npz)."""
    leaves, treedef = tree_flatten(pytree)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path, __treedef__=np.frombuffer(
        json.dumps(_treedef_repr(pytree)).encode(), dtype=np.uint8
    ), **arrays)
    return path


def load_state(path, like=None):
    """Load a pytree saved by :func:`save_state`.

    If ``like`` (a pytree with the same structure) is given, the stored leaves
    are unflattened into that structure; otherwise a flat list is returned.
    """
    with np.load(path, allow_pickle=False) as data:
        n = sum(1 for k in data.files if k.startswith("leaf_"))
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    if like is not None:
        _, treedef = tree_flatten(like)
        return tree_unflatten(treedef, leaves)
    return leaves


def _treedef_repr(pytree):
    _, treedef = tree_flatten(pytree)
    return str(treedef)
