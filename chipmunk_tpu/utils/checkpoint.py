"""State/params checkpointing.

The reference has no mid-run resume (SURVEY.md §5: caches are ephemeral,
reset per generation).  In this build the entire sparsity state is an
explicit pytree, so mid-generation checkpoint/resume is a serialization
one-liner; model params use the same path (orbax is available for sharded
checkpoints of real deployments; this flat .npz path has no extra deps).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_pytree(path: str, like: Any) -> Any:
    """Load leaves saved by save_pytree into the structure of ``like``.
    Structure is verified against the stored treedef repr (catches
    swapped same-shape leaves), and leaf shapes AND dtypes must match."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    if "__treedef__" in data:
        saved_def = bytes(data["__treedef__"]).decode()
        assert saved_def == repr(treedef), (
            f"checkpoint structure mismatch:\n saved: {saved_def}\n "
            f"expected: {treedef!r}")
    loaded = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    for a, b in zip(loaded, leaves):
        assert a.shape == b.shape, (a.shape, b.shape)
        assert a.dtype == b.dtype, (a.dtype, b.dtype)
    return jax.tree_util.tree_unflatten(treedef, loaded)
