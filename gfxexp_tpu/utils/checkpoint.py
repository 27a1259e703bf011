"""Checkpoint / resume for long runs.

The reference has no persistence at all (SURVEY.md §5 — screenshots only; the
NRC net is rebuilt from scratch on setting changes). This module adds the
capability the TPU build wants: save/restore any pytree (film accumulation,
NRC optimizer state, reservoirs) so long convergence runs survive restarts.

Format: numpy .npz of the flattened leaves plus a JSON manifest of the tree
structure (no pickle — loading a checkpoint must never execute code).
Structure is validated on load against a `like` template.
"""

from __future__ import annotations

import json
from typing import Any, Optional

import numpy as np

_MANIFEST_KEY = "__treedef_json__"


def save_checkpoint(path: str, tree: Any) -> None:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays[_MANIFEST_KEY] = np.frombuffer(
        json.dumps({"treedef": str(treedef), "n": len(leaves)}).encode(),
        dtype=np.uint8,
    )
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    """Restore a pytree saved by save_checkpoint. `like` provides the tree
    structure (required for any non-trivial tree — npz stores the leaves and
    a human-readable structure string, not executable structure)."""
    import jax
    import jax.numpy as jnp

    with open(path, "rb") as f:
        magic = f.read(2)
    if magic == b"\x80\x04" or magic == b"\x80\x05":
        raise ValueError(
            f"{path} is a legacy pickle checkpoint (format predates the "
            "npz+JSON hardening); re-save it with the new format — load it "
            "once in a trusted session via pickle.load and call "
            "save_checkpoint on the result."
        )
    with np.load(path, allow_pickle=False) as data:
        manifest = json.loads(bytes(data[_MANIFEST_KEY]).decode())
        n = manifest["n"]
        leaves = [data[f"leaf_{i}"] for i in range(n)]

    if like is None:
        if n == 1:
            return jnp.asarray(leaves[0])
        raise ValueError(
            f"checkpoint {path} has {n} leaves; pass `like` to restore the "
            f"tree structure (stored structure: {manifest['treedef']})"
        )
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(like_leaves) != n:
        raise ValueError(
            f"checkpoint structure mismatch: {path} has {n} leaves, "
            f"expected {len(like_leaves)} ({manifest['treedef']})"
        )
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(x) for x in leaves]
    )
