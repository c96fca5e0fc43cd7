"""2-D two-level space-filling token reorder for images.

Mirrors reference src/chipmunk/ops/patch.py:7-80: tokens are reordered so
that ``chunk_size_1 x chunk_size_1`` spatial patches (further split into
``chunk_size_2 x chunk_size_2`` sub-patches) are contiguous — making the
128-token MLP blocks and the query groups spatially local.

Unlike the reference (which reads chunk sizes from the global config at
import time), chunk sizes are explicit arguments; we additionally expose the
reorder as a precomputed permutation (``patch_order``) so models can apply it
with one ``jnp.take`` on any token-major tensor, including RoPE tables.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=None)
def patch_order(h: int, w: int, c1: int = 8, c2: int = 4) -> np.ndarray:
    """Permutation p of length h*w: patchified_flat = flat[p]."""
    assert h % c1 == 0 and w % c1 == 0 and c1 % c2 == 0
    ids = np.arange(h * w).reshape(h, w)
    # level 1: (nh c1 nw c1) -> (nh nw) (c1 c1)
    ids = ids.reshape(h // c1, c1, w // c1, c1).transpose(0, 2, 1, 3)
    ids = ids.reshape(-1, c1, c1)
    # level 2 within each c1 x c1 chunk
    r = c1 // c2
    ids = ids.reshape(-1, r, c2, r, c2).transpose(0, 1, 3, 2, 4)
    return ids.reshape(-1).astype(np.int32)


@lru_cache(maxsize=None)
def inverse_patch_order(h: int, w: int, c1: int = 8, c2: int = 4) -> np.ndarray:
    p = patch_order(h, w, c1, c2)
    inv = np.empty_like(p)
    inv[p] = np.arange(p.shape[0], dtype=np.int32)
    return inv


def patchify(x: jnp.ndarray, c1: int = 8, c2: int = 4) -> jnp.ndarray:
    """[b, h, w] -> [b, h*w] in patch order (reference patch.py:7-35)."""
    assert x.ndim == 3
    b, h, w = x.shape
    p = jnp.asarray(patch_order(h, w, c1, c2))
    return x.reshape(b, h * w)[:, p]


def unpatchify(x_flat: jnp.ndarray, original_shape, c1: int = 8,
               c2: int = 4) -> jnp.ndarray:
    """Inverse of patchify (reference patch.py:37-62)."""
    b, h, w = original_shape
    inv = jnp.asarray(inverse_patch_order(h, w, c1, c2))
    return x_flat[:, inv].reshape(b, h, w)


def patchify_tokens(x: jnp.ndarray, h: int, w: int, axis: int,
                    c1: int = 8, c2: int = 4) -> jnp.ndarray:
    """Apply the patch permutation along ``axis`` (length h*w) of any tensor."""
    p = jnp.asarray(patch_order(h, w, c1, c2))
    return jnp.take(x, p, axis=axis)


def unpatchify_tokens(x: jnp.ndarray, h: int, w: int, axis: int,
                      c1: int = 8, c2: int = 4) -> jnp.ndarray:
    inv = jnp.asarray(inverse_patch_order(h, w, c1, c2))
    return jnp.take(x, inv, axis=axis)


def patchify_rope(pe: jnp.ndarray, img_tokens: int, h: int, w: int,
                  axis: int, c1: int = 8, c2: int = 4) -> jnp.ndarray:
    """Reorder the trailing ``img_tokens`` positions of a RoPE table along
    ``axis`` with the patch permutation, leaving text positions untouched
    (reference patch.py:65-80)."""
    n = pe.shape[axis]
    txt = n - img_tokens
    perm = np.concatenate([np.arange(txt, dtype=np.int32),
                           txt + patch_order(h, w, c1, c2)])
    return jnp.take(pe, jnp.asarray(perm), axis=axis)
