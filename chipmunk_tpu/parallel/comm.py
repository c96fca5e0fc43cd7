"""Distributed communication for head-parallel (Ulysses) attention.

TPU-native equivalent of the reference's NCCL all-to-all layer
(examples/hunyuan/hyvideo/modules/head_parallel.py:42-115): the same
collect_tokens / collect_heads semantics, but as `jax.lax.all_to_all`
inside shard_map over a named mesh axis — the collective rides ICI and XLA
schedules/overlaps it; there is no process-group state to manage
(reference head_parallel.py:5-18).

Layout contract (matches the reference):
  * ``collect_tokens``: each device holds a token shard of the sequence
    with ALL heads -> after, each device holds ALL tokens for its head
    shard.  [B, H, S_local, D] -> [B, H_local, S, D].
  * ``collect_heads``: the inverse, for attention outputs.

Sparsity state (indices, out_cache, lse) is per-head and therefore stays
fully local to each head shard — exactly the reference's invariant
(SURVEY.md §3.4: "sparsity state is per-rank, per-local-head").
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def initialize_multihost(coordinator_address: str = None,
                         num_processes: int = None,
                         process_id: int = None) -> int:
    """Multi-host (DCN) bring-up: ``jax.distributed.initialize`` with the
    standard coordinator flags, after which ``jax.devices()`` spans all
    hosts and every mesh/collective in this package works across DCN
    unchanged (the TPU-native analogue of the reference's
    torchrun/NCCL launchers, examples/hunyuan/scripts/
    run_sample_video_multigpu.sh:34-46 + sample_video.py:43-49).

    All arguments optional: on TPU pods the runtime autodetects them; a
    single-process call (no coordinator) is a no-op-equivalent init.
    Returns the process index.  Idempotent: a second call is ignored.
    """
    try:  # idempotence: jax.distributed has no public is-initialized API
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, 'client', None) is not None:
            return jax.process_index()
    except ImportError:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return jax.process_index()


def make_mesh(axis_sizes: dict, devices=None) -> Mesh:
    """mesh from {'axis': size}; devices default to all."""
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    names = tuple(axis_sizes)
    shape = tuple(axis_sizes[n] for n in names)
    n = int(np.prod(shape))
    return Mesh(np.asarray(devices[:n]).reshape(shape), names)


def collect_tokens(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Inside shard_map: [B, H, S_local, D] (all heads, token shard) ->
    [B, H_local, S, D] (head shard, full sequence).
    Reference head_parallel.all_to_all_collect_tokens:42-87."""
    return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                              tiled=True)


def collect_heads(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Inside shard_map: [B, H_local, S, D] -> [B, H, S_local, D].
    Reference head_parallel.all_to_all_collect_heads:89-115."""
    return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                              tiled=True)


def ulysses_attention(mesh: Mesh, axis: str,
                      attn_fn: Callable[..., Tuple],
                      q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      state, *attn_args, batch_axis: str = None,
                      **attn_kwargs):
    """Run ``attn_fn(q, k, v, state, ...) -> (o, state')`` head-parallel.

    q/k/v arrive sequence-sharded over ``axis`` ([B, H, S, D] global);
    state is head-sharded.  Inside: a2a to head shards, local (sparse)
    attention over the full sequence, a2a back.  This is the chipmunk-aware
    multi-device path (reference attenion.py:229-292).

    ``batch_axis``: mesh axis the surrounding computation shards the batch
    over (dp / CFG cond-uncond).  Threading it into the shard_map specs
    keeps the batch dim sharded across the boundary — without it GSPMD
    must replicate-then-repartition every q/k/v (the "involuntary full
    rematerialization" warning in MULTICHIP_r02.json).
    """
    if batch_axis and q.shape[0] % mesh.shape[batch_axis] != 0:
        # batch indivisible over dp (e.g. a CFG host loop invoking the
        # model with B=1 per branch): fall back to sp-only sharding
        batch_axis = None
    qspec = P(batch_axis, None, axis, None)
    n_axis = mesh.shape[axis]
    n_batch = mesh.shape[batch_axis] if batch_axis else 1

    # state leaves have different ranks; [B, heads, ...] for all real
    # leaves.  Placeholder leaves (e.g. the 1-byte packed dummy in
    # uncompressed mode) can't shard — replicate them.
    def leaf_spec(x):
        if x.ndim < 2 or x.shape[1] % n_axis != 0:
            return P()
        b = batch_axis if (batch_axis and x.shape[0] % n_batch == 0) \
            else None
        return P(*([b, axis] + [None] * (x.ndim - 2)))

    sspec = jax.tree_util.tree_map(leaf_spec, state)

    def inner(q, k, v, st):
        q = collect_tokens(q, axis)
        k = collect_tokens(k, axis)
        v = collect_tokens(v, axis)
        o, st2 = attn_fn(q, k, v, st, *attn_args, **attn_kwargs)
        return collect_heads(o, axis), st2

    return jax.shard_map(inner, mesh=mesh,
                         in_specs=(qspec, qspec, qspec, sspec),
                         out_specs=(qspec, sspec),
                         check_vma=False)(q, k, v, state)
