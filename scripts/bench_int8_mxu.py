"""Does the v5e MXU run int8 x int8 -> int32 at 2x the bf16 rate, and does
Mosaic lower it natively inside Pallas?  Decides whether the sparse-MLP
int8-activation path (DESIGN.md "known perf headroom") is worth building.

Usage: python scripts/bench_int8_mxu.py
"""
import functools
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])
sys.path.insert(0, __file__.rsplit('/', 1)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_util import bench_loop


def _chain(aa, y, K):
    """Data-dependence chain XLA cannot fold away: float path multiplies by
    a tiny NONZERO factor (0.0*y folds — bench_mlp.py lesson); int path
    xors the low bit (no algebraic identity to exploit)."""
    if aa.dtype == jnp.int8:
        return aa ^ (y[:, :K] & 1).astype(jnp.int8)
    return (aa + 1e-20 * y[:, :K].astype(jnp.float32)).astype(aa.dtype)


def xla_case(M, K, N, dt, acc):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    if dt == jnp.int8:
        a = jax.random.randint(k1, (M, K), -127, 127, jnp.int8)
        b = jax.random.randint(k2, (K, N), -127, 127, jnp.int8)
    else:
        a = jax.random.normal(k1, (M, K), dt)
        b = jax.random.normal(k2, (K, N), dt)

    def step(aa):
        y = jax.lax.dot_general(aa, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=acc)
        return _chain(aa, y, K)
    t = bench_loop(step, a, iters=30)
    fl = 2 * M * K * N
    return t, fl / t / 1e12


def _pk(a_ref, b_ref, o_ref, acc):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=acc)


def pallas_case(M, K, N, dt, acc):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    if dt == jnp.int8:
        a = jax.random.randint(k1, (M, K), -127, 127, jnp.int8)
        b = jax.random.randint(k2, (K, N), -127, 127, jnp.int8)
    else:
        a = jax.random.normal(k1, (M, K), dt)
        b = jax.random.normal(k2, (K, N), dt)
    bm, bn = 512, 512
    f = pl.pallas_call(
        functools.partial(_pk, acc=acc),
        grid=(M // bm, N // bn),
        in_specs=[pl.BlockSpec((bm, K), lambda m, n: (m, 0)),
                  pl.BlockSpec((K, bn), lambda m, n: (0, n))],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), acc),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def step(aa):
        y = f(aa, b)
        return _chain(aa, y, K)
    t = bench_loop(step, a, iters=30)
    fl = 2 * M * K * N
    return t, fl / t / 1e12


def main():
    M, K, N = 4096, 3072, 4096
    for name, fn in [('xla', xla_case), ('pallas', pallas_case)]:
        for dt, acc, lbl in [(jnp.bfloat16, jnp.float32, 'bf16'),
                             (jnp.int8, jnp.int32, 'int8')]:
            try:
                t, tf = fn(M, K, N, dt, acc)
                print(f"{name} {lbl} [{M}x{K}x{N}]: {t*1e3:.3f} ms, "
                      f"{tf:.1f} T/s")
            except Exception as e:
                print(f"{name} {lbl}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")


if __name__ == '__main__':
    main()
