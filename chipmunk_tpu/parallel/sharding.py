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


def chipmunk_state_shardings(state, mesh: Mesh, sp: str = 'sp',
                             dp: str = None):
    """NamedShardings for a stacked FluxState (leaves [L, ...]):
    attention caches shard over heads on ``sp`` ([L, B, H, ...] — the
    reference's invariant that sparsity state is per-local-head,
    SURVEY.md §3.4), MLP caches shard over token blocks on ``sp``
    ([L, T, ...]), batch (CFG cond/uncond) over ``dp``; placeholder
    leaves replicate."""
    n_sp = mesh.shape[sp]
    n_dp = mesh.shape[dp] if dp else 1

    def spec(path, x):
        name = '/'.join(str(p) for p in path)
        if x.ndim >= 3 and 'attn' in name and x.shape[2] % n_sp == 0:
            b = dp if (dp and x.shape[1] % n_dp == 0) else None
            return NamedSharding(mesh, P(None, b, sp))
        if x.ndim >= 2 and x.shape[1] % n_sp == 0:
            return NamedSharding(mesh, P(None, sp))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, state)


def place_video_inputs(mesh: Mesh, params, arrays, state,
                       sp: str = 'sp', dp: str = None, fsdp: bool = False):
    """Device-put a video-model denoise input set onto the mesh: params
    replicated (or FSDP-sharded over ``sp``), each array in ``arrays``
    batch-sharded over ``dp`` (replicated if dp is None or indivisible),
    chipmunk state per chipmunk_state_shardings.  Returns
    (params, placed_arrays, state).  The video analogue of
    place_flux_inputs — used by HunyuanModel.sharded()/WanModel.sharded()
    denoise paths (reference multi-GPU: hyvideo inference.py:63-69 token
    shards + head_parallel.py a2a)."""
    repl = NamedSharding(mesh, P())
    n_dp = mesh.shape[dp] if dp else 1
    params = (shard_params(params, mesh, sp) if fsdp
              else jax.device_put(params, repl))

    def put(x):
        if x is None:
            return None
        if dp and x.ndim >= 1 and x.shape[0] % n_dp == 0:
            return jax.device_put(x, NamedSharding(mesh, P(dp)))
        return jax.device_put(x, repl)

    placed = tuple(put(a) for a in arrays)
    state = jax.device_put(state,
                           chipmunk_state_shardings(state, mesh, sp, dp))
    return params, placed, state


def place_flux_inputs(mesh: Mesh, params, img, txt, y, state,
                      sp: str = 'sp', dp: str = None, fsdp: bool = False):
    """Device-put a full FLUX denoise input set onto the mesh: params
    replicated (or FSDP-sharded over ``sp``), batch tensors on ``dp``,
    chipmunk state per chipmunk_state_shardings.  Returns the placed
    (params, img, txt, y, state)."""
    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P(dp)) if dp else repl
    params = (shard_params(params, mesh, sp) if fsdp
              else jax.device_put(params, repl))
    img = jax.device_put(img, batch)
    txt = jax.device_put(txt, batch)
    y = jax.device_put(y, batch)
    state = jax.device_put(state,
                           chipmunk_state_shardings(state, mesh, sp, dp))
    return params, img, txt, y, state
