"""Streamed layer-chunk execution == monolithic scan (offload pipeline
semantics, reference flux model.py:115-127)."""
import jax
import jax.numpy as jnp
import numpy as np

from chipmunk_tpu.utils.streaming import (chunk_tree, unchunk_tree,
                                          StreamedScan)


def test_chunk_roundtrip():
    tree = {'a': jnp.arange(24.0).reshape(8, 3), 'b': jnp.ones((8, 2, 2))}
    chunks = chunk_tree(tree, 4)
    assert len(chunks) == 4 and chunks[0]['a'].shape == (2, 3)
    back = unchunk_tree(chunks)
    np.testing.assert_array_equal(np.asarray(back['a']),
                                  np.asarray(tree['a']))


def test_streamed_scan_matches_monolithic():
    L, C = 8, 4
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (L, 4, 4)) * 0.3          # per-layer params
    s0 = jnp.zeros((L, 4))                               # per-layer state
    x0 = jnp.ones((4,))

    def body(x, layer):
        wi, si, idx = layer
        y = jnp.tanh(wi @ x + si)
        return y, y + idx                                 # new state

    # monolithic
    idx = jnp.arange(L, dtype=jnp.float32)
    x_ref, s_ref = jax.lax.scan(body, x0, (w, s0, idx))

    # streamed (2 chunks resident at a time)
    @jax.jit
    def chunk_fn(x, wc, sc, ic):
        return jax.lax.scan(body, x, (wc, sc, ic))

    runner = StreamedScan(chunk_fn, chunk_tree(w, C), chunk_tree(s0, C),
                          offload_params=True, offload_state=True)
    x_out = runner(x0, chunk_tree(idx, C))
    np.testing.assert_allclose(np.asarray(x_out), np.asarray(x_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(runner.gathered_state()),
                               np.asarray(s_ref), atol=1e-6)
