"""Reliable TPU timing under the axon tunnel: host-side timing of single
dispatches is polluted by RPC latency and async dispatch, so we time a
jitted lax.fori_loop of N data-dependent kernel iterations in ONE dispatch
and divide."""
import time

import jax
import jax.numpy as jnp


def _materialize(r):
    """block_until_ready can return EARLY under the axon tunnel; a host
    device_get of one element cannot (verify-skill gotcha)."""
    import numpy as np
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(np.asarray(leaf.ravel()[0]).astype(np.float32))


def bench_loop(step, x0, iters=50, warmup=True):
    """step: x -> x (must consume its input so iterations chain).
    Returns seconds per iteration."""
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: step(x), x)

    _materialize(run(x0))  # compile + warm
    t0 = time.perf_counter()
    _materialize(run(x0))
    t1 = time.perf_counter()
    # subtract a 1-iteration run to remove dispatch overhead
    @jax.jit
    def run1(x):
        return step(x)
    _materialize(run1(x0))
    t2 = time.perf_counter()
    _materialize(run1(x0))
    t3 = time.perf_counter()
    total = (t1 - t0) - (t3 - t2)
    return max(total, 1e-9) / max(iters - 1, 1)
