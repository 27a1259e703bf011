"""Checkpoint / resume for long runs.

The reference has no persistence at all (SURVEY.md §5 — screenshots only; the
NRC net is rebuilt from scratch on setting changes). This module adds the
capability the TPU build wants: save/restore any pytree (film accumulation,
NRC optimizer state, reservoirs) so long convergence runs survive restarts.
Uses a plain pickle of numpy-converted leaves (orbax-compatible layouts can
come later); structure is validated on load against a `like` template.
"""

from __future__ import annotations

import pickle
from typing import Any, Optional

import numpy as np


def save_checkpoint(path: str, tree: Any) -> None:
    import jax

    host = jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
    with open(path, "wb") as f:
        pickle.dump(host, f)


def load_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    import jax
    import jax.numpy as jnp

    with open(path, "rb") as f:
        host = pickle.load(f)
    if like is not None:
        s1 = jax.tree_util.tree_structure(host)
        s2 = jax.tree_util.tree_structure(like)
        if s1 != s2:
            raise ValueError(
                f"checkpoint structure mismatch: {path} has {s1}, expected {s2}")
    return jax.tree_util.tree_map(jnp.asarray, host)
