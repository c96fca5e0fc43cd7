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


def bench_loop(step, x0, iters=50, warmup=True, trials=3):
    """step: x -> x (must consume its input so iterations chain).
    Returns seconds per iteration.

    Two loop lengths (iters and 4*iters), min over ``trials`` runs each,
    slope = (t_long - t_short) / (3*iters): the per-dispatch constant
    (tunnel RPC, host sync) cancels in the difference, and min-of-N
    suppresses its variance — a single 1-iteration subtraction run (the
    previous scheme) swings by +-10-20 ms on the tunnel, which dwarfs
    sub-millisecond kernels."""
    n1, n2 = iters, 4 * iters

    def make(n):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, n, lambda i, x: step(x), x)
        return run

    run1, run2 = make(n1), make(n2)
    _materialize(run1(x0))  # compile + warm
    _materialize(run2(x0))
    t_short, t_long = float('inf'), float('inf')
    for _ in range(trials):
        t0 = time.perf_counter()
        _materialize(run1(x0))
        t_short = min(t_short, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _materialize(run2(x0))
        t_long = min(t_long, time.perf_counter() - t0)
    return max(t_long - t_short, 1e-9) / (n2 - n1)
