"""Ring attention over a mesh axis, and USP (Ulysses x ring) composition.

TPU-native equivalent of the reference's xDiT USP path
(examples/wan/wan/distributed/xdit_context_parallel.py:160-192, which
monkey-patches Wan attention onto xFuserLongContextAttention =
ulysses_degree x ring_degree).  Matching the reference, the ring path is
**dense-only** — the reference never combines ring with chipmunk sparsity
(SURVEY.md §2.4), because the column-sparse delta caches are keyed to a
stationary KV layout while ring rotates KV shards.

Design (TPU-first): KV shards rotate around the ring with
`jax.lax.ppermute` over ICI while each hop's partial attention accumulates
into a running (max, denominator, accumulator) triple — flash attention's
online softmax, with the hop loop unrolled at trace time so XLA can overlap
each hop's ppermute with the previous hop's matmuls.  Numerics use the same
base-2 softmax as the rest of the framework (ops/attn_ref.py contract).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.attn_ref import attn_scale
from .comm import collect_tokens, collect_heads

NEG_INF = -1.0e30


def _ring_attn_local(q, k, v, axis: str) -> jnp.ndarray:
    """Inside shard_map: q/k/v [B, H, S_local, D] token shards; returns the
    exact attention output for the local queries over the GLOBAL key set."""
    n = jax.lax.axis_size(axis)
    tau = attn_scale(q.shape[-1])
    qf = q.astype(jnp.float32)

    m = jnp.full(q.shape[:-1] + (1,), NEG_INF, jnp.float32)
    l = jnp.zeros_like(m)
    acc = jnp.zeros(q.shape, jnp.float32)

    def hop(i, k, v, m, l, acc):
        s = jnp.einsum('bhid,bhjd->bhij', qf, k.astype(jnp.float32)) * tau
        m_new = jnp.maximum(m, s.max(-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + p.sum(-1, keepdims=True)
        acc = acc * alpha + jnp.einsum('bhij,bhjd->bhid', p,
                                       v.astype(jnp.float32))
        if i + 1 < n:
            perm = [(j, (j + 1) % n) for j in range(n)]
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
        return k, v, m_new, l, acc

    # unrolled: each hop's ppermute overlaps the next hop's compute
    for i in range(n):
        k, v, m, l, acc = hop(i, k, v, m, l, acc)
    l = jnp.where(l == 0.0, 1.0, l)
    return (acc / l).astype(q.dtype)


def ring_attention(mesh: Mesh, axis: str, q, k, v) -> jnp.ndarray:
    """Dense ring attention: q/k/v [B, H, S, D] sequence-sharded over
    ``axis``; returns o with the same sharding.  Exact (online softmax)."""
    spec = P(None, None, axis, None)

    def inner(q, k, v):
        return _ring_attn_local(q, k, v, axis)

    return jax.shard_map(inner, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)


def usp_attention(mesh: Mesh, ulysses_axis: str, ring_axis: str,
                  q, k, v) -> jnp.ndarray:
    """USP = Ulysses (head-parallel a2a over ``ulysses_axis``) x ring
    (token-parallel KV rotation over ``ring_axis``), the reference's
    xFuserLongContextAttention composition (xdit_context_parallel.py:
    179-185).  q/k/v [B, H, S, D] sequence-sharded over BOTH axes
    (S split into ulysses*ring shards); dense only.
    """
    spec = P(None, None, (ulysses_axis, ring_axis), None)

    def inner(q, k, v):
        # heads spread over the ulysses axis; each head shard sees the
        # sequence still sharded over the ring axis
        q = collect_tokens(q, ulysses_axis)
        k = collect_tokens(k, ulysses_axis)
        v = collect_tokens(v, ulysses_axis)
        o = _ring_attn_local(q, k, v, ring_axis)
        return collect_heads(o, ulysses_axis)

    return jax.shard_map(inner, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)
