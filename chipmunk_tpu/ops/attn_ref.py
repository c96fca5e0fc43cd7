"""Eager (pure-jnp) attention references.

Numerics contract (kept bit-compatible in spirit with the reference kernels,
reference: csrc/attn/csp_attn.cu:265, csrc/attn/dense_colsum_attn.cu:267-319):

  * softmax is computed in base-2: ``p_ij = 2^(s_ij * tau - norm_i)`` with
    ``tau = log2(e)/sqrt(D)``.
  * the per-row normalizer ("lse") is stored in **log2 domain**:
    ``lse_i = log2(sum_j 2^(s_ij * tau))``.  The reference stores the
    reciprocal ``1/(2^m * l)`` (dense_colsum_attn.cu:316-319); the log2 form
    is the same quantity as ``2^(-lse)`` but cannot overflow fp32.  Padded
    query rows carry ``lse = +BIG`` so their colsum contribution is exactly 0
    (the reference zeroes the reciprocal, modules/attn.py:117-129 — same
    effect).
  * column sums are normalized by the **previous step's** lse:
    ``colsum[g, j] = sum_{i in group g} 2^(s_ij * tau - prev_lse_i)``
    (dense_colsum_attn.cu:267-274), estimating last-step attention mass.
  * accumulation in fp32, outputs cast back to the input dtype.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

LOG2E = math.log2(math.e)
# Sentinel lse for padded rows: 2^(s - PAD_LSE) == 0 in fp32 for any real s.
PAD_LSE = 3.0e4


def attn_scale(head_dim: int) -> float:
    """tau such that 2^(s*tau) == e^(s/sqrt(D))."""
    return LOG2E / math.sqrt(head_dim)


def _scores2(q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Base-2 scaled scores, fp32: [B,H,Sq,Sk]."""
    tau = attn_scale(q.shape[-1])
    s = jnp.einsum('bhid,bhjd->bhij', q.astype(jnp.float32),
                   k.astype(jnp.float32))
    return s * tau


def dense_attn_ref(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   kv_mask: Optional[jnp.ndarray] = None,
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Non-causal attention forward returning (o, lse).

    Mirrors torch.ops.chipmunk.dense_attn (csrc/attn/dense_attn.cu) with the
    log2-domain lse format described in the module docstring.

    q,k,v: [B,H,S,D].  kv_mask: optional bool [Sk] marking valid KV rows
    (padding support, reference pads q only — ops/attn.py:59-79).
    Returns o [B,H,Sq,D] (q.dtype), lse [B,H,Sq] fp32.
    """
    s2 = _scores2(q, k)
    if kv_mask is not None:
        s2 = jnp.where(kv_mask[None, None, None, :], s2, -jnp.inf)
    m = jnp.max(s2, axis=-1, keepdims=True)
    p = jnp.exp2(s2 - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum('bhij,bhjd->bhid', p / l, v.astype(jnp.float32))
    lse = (m + jnp.log2(l))[..., 0]
    return o.astype(q.dtype), lse


def dense_colsum_attn_ref(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          prev_lse: jnp.ndarray, qg: int,
                          kv_mask: Optional[jnp.ndarray] = None,
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dense attention that also emits per-query-group column sums of the
    previous-step-normalized probability matrix.

    Mirrors torch.ops.chipmunk.dense_colsum_attn
    (csrc/attn/dense_colsum_attn.cu:267-274).

    prev_lse: [B,H,Sq] fp32 log2-domain (PAD_LSE on padded rows).
    qg: query-group size (reference mbm=192; TPU default 128).
    kv_mask: optional bool [Sk] marking valid KV rows.
    Returns (o, colsums [B,H,G,Sk] fp32, lse).
    """
    B, H, Sq, D = q.shape
    assert Sq % qg == 0, f"Sq={Sq} must be padded to a multiple of qg={qg}"
    s2 = _scores2(q, k)
    if kv_mask is not None:
        s2 = jnp.where(kv_mask[None, None, None, :], s2, -jnp.inf)
    # output + current-step lse (standard softmax)
    m = jnp.max(s2, axis=-1, keepdims=True)
    p = jnp.exp2(s2 - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum('bhij,bhjd->bhid', p / l, v.astype(jnp.float32))
    lse = (m + jnp.log2(l))[..., 0]
    # colsums normalized by the previous step's lse
    p_prev = jnp.exp2(s2 - prev_lse[..., None])
    colsums = p_prev.reshape(B, H, Sq // qg, qg, -1).sum(axis=3)
    return o.astype(q.dtype), colsums, lse


def _gather_mask_from_indices(inds: jnp.ndarray, counts: jnp.ndarray,
                              n_cols: int) -> jnp.ndarray:
    """bool [..., G, n_cols] with True at inds[..., g, :counts[..., g]]."""
    lead = inds.shape[:-1]
    pos = jnp.arange(inds.shape[-1])
    valid = (pos[None, :] < counts.reshape(-1, 1))           # [R, K]
    flat_inds = inds.reshape(-1, inds.shape[-1])

    def row(ix, ok):
        # invalid entries scatter out of bounds and are dropped
        ix = jnp.where(ok, ix, n_cols)
        return jnp.zeros((n_cols,), jnp.bool_).at[ix].set(True, mode='drop')

    return jax.vmap(row)(flat_inds, valid).reshape(*lead, n_cols)


def csp_attn_ref(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 inds: jnp.ndarray, counts: jnp.ndarray, qg: int,
                 ) -> jnp.ndarray:
    """Column-sparse attention, token-granular indices (reference parity).

    Mirrors torch.ops.chipmunk.csp_128_attn (csrc/attn/csp_128_attn.cu):
    each query group g (qg rows) attends only to KV rows listed in
    ``inds[b,h,g,:counts[b,h,g]]``; softmax is over that subset.

    inds: int32 [B,H,G,K] (padding entries arbitrary), counts: int32 [B,H,G].
    Returns o [B,H,Sq,D].
    """
    B, H, Sq, D = q.shape
    Sk = k.shape[-2]
    G = Sq // qg
    mask = _gather_mask_from_indices(inds, counts, Sk)       # [B,H,G,Sk]
    mask = jnp.repeat(mask, qg, axis=2)                      # [B,H,Sq,Sk]
    s2 = jnp.where(mask, _scores2(q, k), -jnp.inf)
    m = jnp.max(s2, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)                   # empty group
    p = jnp.where(mask, jnp.exp2(s2 - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l = jnp.where(l == 0.0, 1.0, l)
    o = jnp.einsum('bhij,bhjd->bhid', p / l, v.astype(jnp.float32))
    return o.astype(q.dtype)


def csp_block_attn_ref(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       block_inds: jnp.ndarray, block_counts: jnp.ndarray,
                       qg: int, kv_block: int,
                       kv_valid: Optional[int] = None) -> jnp.ndarray:
    """Column-sparse attention with **block-granular** indices — the TPU-native
    operating point (each index selects ``kv_block`` contiguous KV rows, so
    gathers are whole-tile DMAs; see config.AttnConfig.kv_block).

    block_inds: int32 [B,H,G,J] block ids; block_counts: int32 [B,H,G].
    kv_valid: optional static count of valid KV rows (model-level padding
    tail excluded, matching kernels.csp_attn).
    Equivalent to csp_attn_ref with token inds expanded from blocks.
    """
    Sk = k.shape[-2]
    assert Sk % kv_block == 0
    n_blocks = Sk // kv_block
    mask_b = _gather_mask_from_indices(block_inds, block_counts, n_blocks)
    mask = jnp.repeat(mask_b, kv_block, axis=-1)             # [B,H,G,Sk]
    if kv_valid is not None and kv_valid < Sk:
        mask = mask & (jnp.arange(Sk) < kv_valid)[None, None, None, :]
    B, H, Sq, D = q.shape
    mask = jnp.repeat(mask, qg, axis=2)
    s2 = jnp.where(mask, _scores2(q, k), -jnp.inf)
    m = jnp.max(s2, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.where(mask, jnp.exp2(s2 - m), 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    l = jnp.where(l == 0.0, 1.0, l)
    o = jnp.einsum('bhij,bhjd->bhid', p / l, v.astype(jnp.float32))
    return o.astype(q.dtype)
