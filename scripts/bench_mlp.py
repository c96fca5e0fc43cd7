"""Sparse-MLP layer microbenchmark: fused / two-kernel csp_mlp vs the
dense XLA baseline at FLUX layer shapes (the reference's 2.5x-vs-cuBLAS
layer claim, README.md:12).

Usage: python scripts/bench_mlp.py [--keep 0.3] [--quant fp8|none]
Prints one line per (bm, path).
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit('/', 2)[0])
sys.path.insert(0, __file__.rsplit('/', 1)[0])

import numpy as np
import jax
import jax.numpy as jnp

from chipmunk_tpu.kernels.csp_mlp import (csp_mlp_fused, csp_mlp_mm1,
                                          csp_mlp_mm2)
from chipmunk_tpu.utils.quant import quantize
from bench_util import bench_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--keep', type=float, default=0.3)
    ap.add_argument('--quant', default='fp8',
                    choices=['fp8', 'int8', 'int4', 'none'])
    ap.add_argument('--tokens', type=int, default=4608)
    ap.add_argument('--iters', type=int, default=48)
    ap.add_argument('--bn', type=int, default=128)
    ap.add_argument('--a8', action='store_true',
                    help='int8-quantized activations (needs int8/int4 '
                         'weights)')
    ap.add_argument('--bm', type=int, nargs='*', default=[128, 256, 512])
    ap.add_argument('--fused-only', action='store_true')
    args = ap.parse_args()

    T, C, N = args.tokens, 3072, 12288
    dt = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (T, C), dt)
    w1t = (jax.random.normal(ks[1], (N, C)) * C ** -0.5).astype(dt)
    b1 = jnp.zeros((N,), dt)
    w2 = (jax.random.normal(ks[2], (N, C)) * N ** -0.5).astype(dt)
    if args.quant != 'none':
        pa = 1 if args.quant == 'int4' else None
        w1u = quantize(w1t, args.quant, keep_axes=(0,), pack_axis=pa)
        w2u = quantize(w2, args.quant, keep_axes=(0,), pack_axis=pa)
    else:
        w1u, w2u = w1t, w2

    def dense(xx):
        mid = xx @ w1t.T + b1
        act = jax.nn.gelu(mid.astype(jnp.float32),
                          approximate=True).astype(dt)
        return act @ w2

    t_dense = bench_loop(lambda xx: dense(xx).astype(dt), x,
                         iters=args.iters)
    fl_dense = 2 * T * C * N * 2
    print(f"dense XLA bf16: {t_dense*1000:.2f} ms, "
          f"{fl_dense/t_dense/1e12:.1f} TFLOP/s")

    for bm in args.bm:
        M = T // bm
        bn = args.bn
        nb = N // bn
        sel = max(int(round(args.keep * nb)), 1)
        rng = np.random.default_rng(0)
        inds = np.sort(np.stack([rng.choice(nb, sel, replace=False)
                                 for _ in range(M)]), axis=1)
        inds = jnp.asarray(inds.astype(np.int32))
        counts = jnp.full((M,), sel, jnp.int32)
        cache = (jax.random.normal(ks[3], (T, N)) * 0.1
                 ).astype(jnp.float8_e4m3fn)
        out = jax.random.normal(ks[4], (T, C), dt) * 0.1
        fl_sp = 2 * T * C * (sel * bn) * 2

        # chain with a tiny NONZERO factor: `0.0 * o` lets XLA's algebraic
        # simplifier fold the product to zeros and DCE the whole sparse
        # kernel (measured: "9.45x" > the 3.3x FLOP ceiling).  1e-20 is
        # exactly representable in bf16 (fp32-range exponent) and keeps
        # the chained value numerically unchanged.
        def step_f(xx):
            o, _ = csp_mlp_fused(xx, w1u, b1, w2u, cache, out, inds,
                                 counts, bn=bn, bm=bm, a8=args.a8)
            return (xx + 1e-20 * o[:, :C].astype(jnp.float32)).astype(dt)

        def step_2(xx):
            p, _ = csp_mlp_mm1(xx, w1u, b1, cache, inds, counts,
                               bn=bn, bm=bm)
            o = csp_mlp_mm2(p, w2u, out, inds, counts, bn=bn, bm=bm)
            return (xx + 1e-20 * o[:, :C].astype(jnp.float32)).astype(dt)

        t_f = bench_loop(step_f, x, iters=args.iters)
        line = (f"bm={bm} bn={bn} keep={args.keep} quant={args.quant} "
                f"a8={args.a8}: fused {t_f*1000:.2f} ms "
                f"({fl_sp/t_f/1e12:.1f} TF/s, {t_dense/t_f:.2f}x dense)")
        if not args.fused_only:
            t_2 = bench_loop(step_2, x, iters=args.iters)
            line += f" | two-kernel {t_2*1000:.2f} ms ({t_dense/t_2:.2f}x)"
        print(line, flush=True)


if __name__ == '__main__':
    main()
