"""Layer-chunked streaming execution with host-offloaded state.

TPU-native rebuild of the reference's per-layer offload pipeline (reference:
flux model.py:115-127, hunyuan models.py:796-828 — load_async the next
layer's caches while computing the current layer, PIPELINE_DEPTH=2).

On TPU the layer loop is a `lax.scan`, so streaming happens at **layer-chunk
granularity**: the stacked per-layer state (and optionally weights) is split
into C chunks along the layer axis; chunk i+1 is fetched host->device with
an async `jax.device_put` while chunk i computes, and chunk i's updated
state is pushed back asynchronously.  Device residency is O(L/C) of the
caches instead of O(L) — the knob that lets video-scale cache footprints
(tens of GB at HunyuanVideo scale, SURVEY.md §5 memory row) exceed HBM.
"""
from __future__ import annotations

from typing import Any, Callable, List, Sequence

import jax
import jax.numpy as jnp

from .offload import fetch_to_device, offload_to_host


def chunk_tree(tree, n_chunks: int) -> List:
    """Split a stacked-leading-axis pytree into n_chunks equal pieces."""
    leaves = jax.tree_util.tree_leaves(tree)
    L = leaves[0].shape[0]
    assert L % n_chunks == 0, (L, n_chunks)
    c = L // n_chunks
    return [jax.tree_util.tree_map(lambda x: x[i * c:(i + 1) * c], tree)
            for i in range(n_chunks)]


def unchunk_tree(chunks: Sequence) -> Any:
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *chunks)


class StreamedScan:
    """Run ``carry, per_layer_out = scan(body, carry, (params, state, idx))``
    with params/state chunks living in host memory between calls.

    chunk_fn(carry, params_chunk, state_chunk, idx_chunk) ->
        (carry, new_state_chunk)  — typically a jitted lax.scan over the
    chunk.  The same compiled fn serves every chunk (equal shapes).
    """

    def __init__(self, chunk_fn: Callable, params_chunks: Sequence,
                 state_chunks: Sequence, offload_params: bool = False,
                 offload_state: bool = True, depth: int = 2):
        self.chunk_fn = chunk_fn
        self.offload_params = offload_params
        self.offload_state = offload_state
        self.depth = depth
        self.params = [offload_to_host(p) if offload_params else p
                       for p in params_chunks]
        self.state = [offload_to_host(s) if offload_state else s
                      for s in state_chunks]
        self.n = len(self.params)
        assert len(self.state) == self.n

    def _fetch(self, i):
        p = fetch_to_device(self.params[i]) if self.offload_params \
            else self.params[i]
        s = fetch_to_device(self.state[i]) if self.offload_state \
            else self.state[i]
        return p, s

    def __call__(self, carry, idx_chunks: Sequence):
        # prefetch window
        window = {}
        for i in range(min(self.depth, self.n)):
            window[i] = self._fetch(i)
        for i in range(self.n):
            p, s = window.pop(i)
            if i + self.depth - 1 < self.n and (i + self.depth - 1) not in window:
                window[i + self.depth - 1] = self._fetch(i + self.depth - 1)
            carry, new_s = self.chunk_fn(carry, p, s, idx_chunks[i])
            self.state[i] = offload_to_host(new_s) if self.offload_state \
                else new_s
        return carry

    def gathered_state(self):
        return unchunk_tree([fetch_to_device(s) if self.offload_state else s
                             for s in self.state])
