"""Weight/state sharding helpers.

The reference's only weight sharding is torch FSDP FULL_SHARD over Wan
blocks (examples/wan/wan/distributed/fsdp.py:11-33).  On TPU this is a
sharding annotation: stacked per-layer weights shard over a mesh axis and
XLA all-gathers per layer inside the scan.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_shardings(params, mesh: Mesh, axis: str = 'sp'):
    """NamedShardings that fully shard every stacked weight along its
    largest shardable dim over ``axis`` (replicating anything indivisible)
    — the pjit analogue of FULL_SHARD."""
    size = mesh.shape[axis]

    def spec(x):
        if x.ndim == 0:
            return NamedSharding(mesh, P())
        # prefer the largest dim divisible by the axis size
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % size == 0 and x.shape[d] >= size:
                parts = [None] * x.ndim
                parts[d] = axis
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, params)


def shard_params(params, mesh: Mesh, axis: str = 'sp'):
    return jax.device_put(params, fsdp_shardings(params, mesh, axis))
