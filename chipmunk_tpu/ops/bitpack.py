"""Bool-mask <-> uint8 bitfield packing.

Mirrors reference src/chipmunk/ops/bitpack.py:4-68 (little-endian bit order).
Used to compress attention masks 8x before offloading to host memory.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def bitpack(mask: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    """Pack a bool array into a flat little-endian uint8 bitfield.

    Returns (packed uint8 [ceil(size/8)], original shape)."""
    shape = tuple(mask.shape)
    flat = mask.reshape(-1).astype(jnp.uint8)
    pad = (-flat.shape[0]) % 8
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.uint8)])
    bits = flat.reshape(-1, 8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint8))
    packed = (bits * weights).sum(axis=1).astype(jnp.uint8)
    return packed, shape


def bitunpack(packed: jnp.ndarray, shape: Sequence[int]) -> jnp.ndarray:
    """Inverse of bitpack."""
    size = 1
    for s in shape:
        size *= s
    weights = (1 << jnp.arange(8, dtype=jnp.uint8))
    bits = (packed[:, None] & weights[None, :]) != 0
    return bits.reshape(-1)[:size].reshape(tuple(shape))


def bitpack_rows(mask: jnp.ndarray) -> jnp.ndarray:
    """Pack along the LAST axis only: bool [..., n] -> uint8 [..., ceil(n/8)]
    (little-endian within each byte).  Keeps the leading structure, so the
    packed mask lives in per-layer state pytrees (reference stores packed
    masks in AttnStorage, modules/attn.py:134-139)."""
    n = mask.shape[-1]
    pad = (-n) % 8
    m = mask.astype(jnp.uint8)
    if pad:
        m = jnp.concatenate(
            [m, jnp.zeros(m.shape[:-1] + (pad,), jnp.uint8)], axis=-1)
    m = m.reshape(m.shape[:-1] + (-1, 8))
    weights = (1 << jnp.arange(8, dtype=jnp.uint8))
    return (m * weights).sum(axis=-1).astype(jnp.uint8)


def bitunpack_rows(packed: jnp.ndarray, n: int) -> jnp.ndarray:
    """Inverse of bitpack_rows: uint8 [..., ceil(n/8)] -> bool [..., n]."""
    weights = (1 << jnp.arange(8, dtype=jnp.uint8))
    bits = (packed[..., None] & weights) != 0
    return bits.reshape(packed.shape[:-1] + (-1,))[..., :n]
