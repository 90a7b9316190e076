"""Checkpoint/resume for tracker state and BA problems.

The reference has NO load path (SURVEY §5.4: the only persistence is the
stats JSON). Here any pytree of arrays (MonoSlamState, BAProblem, ...)
round-trips through a single .npz file: leaves + a JSON-encoded treedef.
Writes are atomic (tmp + rename) so a crash never leaves a torn checkpoint.
"""

from __future__ import annotations

import json
import os
import tempfile

import jax
import numpy as np


def save_pytree(path: str, tree) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload["treedef"] = np.frombuffer(
        json.dumps(_treedef_to_str(treedef)).encode(), dtype=np.uint8)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    os.close(fd)
    try:
        np.savez(tmp, **payload)
        # np.savez appends .npz if missing; mkstemp already ends with .npz
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load_pytree(path: str, like):
    """Load into the structure of `like` (an example pytree with the same
    treedef — e.g. a freshly-initialized state)."""
    with np.load(path) as z:
        n = sum(1 for k in z.files if k.startswith("leaf_"))
        leaves = [z[f"leaf_{i}"] for i in range(n)]
    _, treedef = jax.tree.flatten(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, expected {treedef.num_leaves}")
    import jax.numpy as jnp

    return jax.tree.unflatten(treedef, [jnp.asarray(x) for x in leaves])


def _treedef_to_str(treedef) -> str:
    return str(treedef)
