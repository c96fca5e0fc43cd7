"""Microbench: direct block-sparse flash vs gather-csp vs dense at the
Wan2.1 operating shape (B=1 H=12 S=32768 D=128, kv_block=128), sweeping
selection density.  Establishes the DIRECT_FRAC / DIRECT_DENSE_FALLBACK_FRAC
dispatch thresholds (kernels/csp_attention.py) with measured crossovers.

The reference has no analogue kernel: its CUDA csp must gather KV into
smem tiles to feed wgmma (csrc/attn/csp_attn.cu:135-191); the TPU MXU can
consume dynamic VMEM slices directly, so at dense-ish selections we skip
the gather entirely and win by pure FLOP reduction.
"""
import argparse
import sys

sys.path.insert(0, '/'.join(__file__.split('/')[:-2]))
sys.path.insert(0, '/'.join(__file__.split('/')[:-1]))
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
from chipmunk_tpu.kernels.flash_attention import dense_attn
from chipmunk_tpu.kernels.csp_attention import csp_attn
from chipmunk_tpu.ops.indexing import mask_to_indices
from bench_util import bench_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--heads', type=int, default=12)
    ap.add_argument('--seq', type=int, default=32768)
    ap.add_argument('--iters', type=int, default=8)
    ap.add_argument('--densities', default='0.3,0.45,0.6,0.72,0.85')
    ap.add_argument('--modes', default='direct,vmem')
    args = ap.parse_args()
    B, H, S, D, kvb = 1, args.heads, args.seq, 128, 128
    G, NB = S // 128, S // kvb
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
               for kk in ks)

    t_dense = bench_loop(
        lambda x: dense_attn(x, k, v)[0].astype(jnp.bfloat16), q,
        iters=args.iters)
    print(f"dense H={H} S={S}: {t_dense*1000:.2f} ms", flush=True)

    for dens in (float(d) for d in args.densities.split(',')):
        mask = jax.random.bernoulli(jax.random.PRNGKey(7), dens,
                                    (B, H, G, NB)).at[..., 0].set(True)
        inds, counts = mask_to_indices(mask, multiple_of=1)
        jmax = int(counts.max())
        inds = inds[..., :jmax]
        for mode in args.modes.split(','):
            t = bench_loop(
                lambda x, mode=mode: csp_attn(
                    x, k, v, inds, counts, qg=128, kv_block=kvb,
                    mode=mode).astype(jnp.bfloat16),
                q, iters=args.iters)
            print(f"csp[{mode}] dens={dens:.2f} jmax={jmax}/{NB}: "
                  f"{t*1000:.2f} ms ({t_dense/t:.2f}x vs dense)", flush=True)


if __name__ == '__main__':
    main()
