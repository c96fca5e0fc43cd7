"""State/params checkpointing.

The reference has no mid-run resume (SURVEY.md §5: caches are ephemeral,
reset per generation).  In this build the entire sparsity state is an
explicit pytree, so mid-generation checkpoint/resume is a serialization
one-liner; model params use the same path (orbax is available for sharded
checkpoints of real deployments; this flat .npz path has no extra deps).

Format v2: leaves are keyed by their tree PATH (not position), so a state
pytree that gains a field in a later version (e.g. AttnState.packed) still
loads older snapshots — missing paths keep the value from ``like`` and are
reported.  v1 (positional ``leaf_i``) files still load, strictly.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _paths(tree):
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    return [(jax.tree_util.keystr(p), x) for p, x in leaves]


def save_pytree(path: str, tree: Any) -> None:
    arrays = {f"path:{k}": np.asarray(x) for k, x in _paths(tree)}
    assert len(arrays) == len(jax.tree_util.tree_leaves(tree)), \
        "duplicate tree paths"
    np.savez(path, **arrays)


def load_pytree(path: str, like: Any) -> Any:
    """Load leaves saved by save_pytree into the structure of ``like``.
    Path-keyed (v2) files match leaves by tree path: a path present in
    ``like`` but not in the file keeps ``like``'s value (new fields added
    since the save); shapes and dtypes of matched leaves must agree.
    Positional (v1) files require an exact structure match."""
    data = np.load(path)
    keys = set(data.keys())
    if any(k.startswith("path:") for k in keys):
        out = []
        for k, leaf in _paths(like):
            fk = f"path:{k}"
            if fk in keys:
                a = jnp.asarray(data[fk])
                assert a.shape == leaf.shape, (k, a.shape, leaf.shape)
                assert a.dtype == leaf.dtype, (k, a.dtype, leaf.dtype)
                out.append(a)
            else:
                out.append(leaf)   # field added after the snapshot
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, out)
    # ---- v1 positional format: strict
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
