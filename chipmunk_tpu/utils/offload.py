"""Host-memory cache offload.

TPU-native rebuild of the reference's pinned-CPU offload pool
(src/chipmunk/util/storage/offloaded_tensor.py): the reference manages two
dedicated CUDA streams, a pinned buffer pool sized LARGE/MEDIUM/SMALL, and a
PIPELINE_DEPTH=2 sliding window of GPU slots.  On TPU none of that is
hand-rolled: JAX memory kinds ("pinned_host") put an array in host memory,
`jax.device_put` issues async DMA in either direction, and the double-buffer
pipeline is two in-flight `device_put`s ahead of the layer loop
(DoubleBufferedLoader below) — the dispatch queue is the stream.

Policy keys mirror the reference's offloading config (util/config.py:55-70).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import OffloadingConfig


def _mem_kind_supported(kind: str = "pinned_host") -> bool:
    try:
        dev = jax.devices()[0]
        kinds = [m.kind for m in dev.addressable_memories()]
        return kind in kinds
    except Exception:
        return False


def host_sharding(x: jnp.ndarray):
    """Sharding that places ``x`` in host memory (falls back to device if
    the backend has no pinned_host memory space, e.g. some CPU builds)."""
    dev = jax.devices()[0]
    s = jax.sharding.SingleDeviceSharding(dev)
    if _mem_kind_supported():
        return s.with_memory_kind("pinned_host")
    return s


def device_sharding(x: jnp.ndarray):
    return jax.sharding.SingleDeviceSharding(jax.devices()[0])


def chunked_device_put(arr, sharding=None,
                       max_bytes: int = 128 * 1024 * 1024):
    """device_put for LARGE host (numpy) arrays.  The dev-tunnel transfer
    path degrades ~50x above ~200MB per call (measured: 128MB=0.13s,
    256MB=10.5s); slicing along axis 0 into <=128MB pieces and
    concatenating on device is ~7x faster for multi-hundred-MB leaves.
    ``sharding`` (e.g. a pinned_host placement) is applied to the
    assembled result."""
    import numpy as np
    if arr.nbytes <= 192 * 1024 * 1024:
        return (jax.device_put(arr, sharding) if sharding is not None
                else jax.device_put(arr))
    dev = jax.devices()[0]
    s_dev = jax.sharding.SingleDeviceSharding(dev)
    n0 = arr.shape[0]
    per = max(1, int(max_bytes // max(1, arr.nbytes // n0)))
    parts = [jax.device_put(np.ascontiguousarray(arr[i:i + per]), s_dev)
             for i in range(0, n0, per)]
    out = jnp.concatenate(parts, axis=0)
    if sharding is not None:
        out = jax.device_put(out, sharding)
    return out


def offload_to_host(tree):
    """Async copy a pytree to host memory (D2H)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, host_sharding(x)), tree)


def fetch_to_device(tree):
    """Async copy a pytree back to device memory (H2D)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, device_sharding(x)), tree)


@dataclass(frozen=True)
class OffloadPolicy:
    """Which cache names live host-side (reference config.py:55-70)."""
    attn_out_cache: bool = True
    attn_indices: bool = True
    attn_counts: bool = False
    attn_lse: bool = False
    mlp_out_cache: bool = False
    mlp_act_cache: bool = False
    mlp_indices: bool = False
    mlp_counts: bool = False
    mlp_bm_mid: bool = False
    enabled: bool = True

    @staticmethod
    def from_config(c: OffloadingConfig) -> "OffloadPolicy":
        return OffloadPolicy(
            attn_out_cache=c.attn_out_cache, attn_indices=c.attn_indices,
            attn_counts=c.attn_counts, attn_lse=c.attn_lse_constants,
            mlp_out_cache=c.mlp_out_cache,
            mlp_act_cache=c.mlp_sparse_act_T,
            mlp_indices=c.mlp_indices, mlp_counts=c.mlp_counts,
            mlp_bm_mid=c.mlp_blockmean_mid_cache,
            enabled=not c.global_disable_offloading)

    def wants_host(self, name: str) -> bool:
        return self.enabled and bool(getattr(self, name, False))


class DoubleBufferedLoader:
    """Sliding-window prefetcher over per-layer host-resident cache slices.

    Mirrors the reference's PIPELINE_DEPTH=2 flow
    (offloaded_tensor.py:134-178; flux model.py:115-127): call
    ``prefetch(i)`` for upcoming layers, ``get(i)`` to obtain the
    device-resident slice (the async H2D has usually completed by then),
    and ``store(i, value)`` to push updated caches back to host
    asynchronously.
    """

    def __init__(self, host_slices, depth: int = 2):
        self._host = list(host_slices)
        self._depth = depth
        self._inflight: Dict[int, Any] = {}

    def __len__(self):
        return len(self._host)

    def prefetch(self, i: int) -> None:
        if 0 <= i < len(self._host) and i not in self._inflight:
            self._inflight[i] = fetch_to_device(self._host[i])
            # bound the window
            while len(self._inflight) > self._depth:
                oldest = min(self._inflight)
                if oldest == i:
                    break
                self._inflight.pop(oldest)

    def get(self, i: int):
        if i not in self._inflight:
            self.prefetch(i)
        return self._inflight.pop(i)

    def store(self, i: int, value) -> None:
        self._host[i] = offload_to_host(value)

    def host_slices(self):
        return list(self._host)
