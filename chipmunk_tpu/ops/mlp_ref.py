"""Eager (pure-jnp) sparse-delta MLP reference.

Mirrors the reference MLP op chain (src/chipmunk/ops/mlp.py:63-92,
csrc/mlp/csp_mlp_mm1.cu, csrc/mlp/csp_mlp_mm2_and_scatter_add.cu): on sparse
steps, for each block of ``bm`` tokens, recompute only the selected fc1
neurons, form the delta against the cached post-activations, fold the delta
into the output cache and refresh the activation cache at the selected
positions.

Cache layout note: the reference keeps the activation cache transposed
([N, T] column-major, modules/mlp.py:56) to suit its mm1's register epilogue;
on TPU we keep it **token-major [T, N]** — XLA/Mosaic layouts make the
transpose pointless and [T, N] lets the mm2 scatter be a plain blocked write.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def block_mean(x: jnp.ndarray, mbm: int) -> jnp.ndarray:
    """[B, T, C] -> [B, T//mbm, C] mean over mbm-token groups
    (reference modules/mlp.py:8-9)."""
    B, T, C = x.shape
    assert T % mbm == 0
    return x.reshape(B, T // mbm, mbm, C).mean(axis=2)


def dense_mlp_ref(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                  w2: jnp.ndarray, b2: jnp.ndarray,
                  act: Callable = jax.nn.gelu) -> Tuple[jnp.ndarray, ...]:
    """Dense full-step MLP returning (out, mid, post_act) for cache refresh
    (reference modules/mlp.py:51-59).  w1: [C, N], w2: [N, C]."""
    mid = x.astype(jnp.float32) @ w1.astype(jnp.float32) + b1
    pa = act(mid)
    out = pa @ w2.astype(jnp.float32) + b2
    return out.astype(x.dtype), mid.astype(x.dtype), pa.astype(x.dtype)


def csp_mlp_ref(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                w2: jnp.ndarray,
                inds: jnp.ndarray, counts: jnp.ndarray,
                sparse_act: jnp.ndarray, out_cache: jnp.ndarray,
                bm: int, act: Callable = jax.nn.gelu,
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse-delta MLP step (token-granular neuron indices).

    For each bm-token block m with selected neuron set S_m =
    inds[m, :counts[m]]:
        new_act[t, S_m] = act((x @ w1 + b1)[t, S_m])          (mm1)
        delta           = new_act[t, S_m] - sparse_act[t, S_m]
        out            += delta @ w2[S_m, :]                   (mm2)
        sparse_act[t, S_m] = new_act[t, S_m]                   (scatter_add)

    x: [T, C]; sparse_act: [T, N]; out_cache: [T, C].
    Returns (new_out_cache, new_sparse_act).  Note fc2's bias is NOT re-added
    (it already lives in out_cache from the full step) — reference
    ops/mlp.py:63-92 likewise runs mm2 without bias.
    """
    T, C = x.shape
    N = w1.shape[1]
    assert T % bm == 0
    M = T // bm
    # mask [M, N] of selected neurons per token-block
    pos = jnp.arange(inds.shape[-1])
    valid = pos[None, :] < counts[:, None]

    def row(ix, ok):
        ix = jnp.where(ok, ix, N)
        return jnp.zeros((N,), jnp.bool_).at[ix].set(True, mode='drop')

    sel = jax.vmap(row)(inds, valid)                          # [M, N]
    sel_t = jnp.repeat(sel, bm, axis=0)                       # [T, N]

    mid = x.astype(jnp.float32) @ w1.astype(jnp.float32) + b1
    new_act = act(mid).astype(x.dtype)
    delta = jnp.where(sel_t, (new_act - sparse_act).astype(jnp.float32), 0.0)
    out = out_cache.astype(jnp.float32) + delta @ w2.astype(jnp.float32)
    new_sparse_act = jnp.where(sel_t, new_act, sparse_act)
    return out.astype(out_cache.dtype), new_sparse_act
