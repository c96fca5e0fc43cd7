"""Dense flash-attention (bq, bk) sweep at VIDEO sequence lengths.

VERDICT r4 weak #4: dense_attn runs 188 TF/s at FLUX scale (whole-Q
bq=4352..8192) but only ~104 TF/s at S=119k where _pick_bq falls back to
bq=1024 — every dense/full/colsum step of the video pipelines pays that.
This sweeps bq x bk at S in {30k, 60k, 119k} (B*H kept small so q/k/v fit
HBM; throughput is per-head so H doesn't change TF/s materially) and
reports TF/s per point.  The winner gets baked into _pick_bq.

Run ON THE REAL CHIP:  timeout 3600 python scripts/sweep_flash_video.py
"""
import sys
sys.path.insert(0, '/'.join(__file__.split('/')[:-2]))
sys.path.insert(0, '/'.join(__file__.split('/')[:-1]))
import argparse

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_compile_cache")
from chipmunk_tpu.kernels.flash_attention import dense_attn
from bench_util import bench_loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seqs', type=int, nargs='*',
                    default=[29952, 61440, 119040])
    ap.add_argument('--heads', type=int, default=2)
    ap.add_argument('--iters', type=int, default=4)
    ap.add_argument('--bqs', type=int, nargs='*',
                    default=[1024, 2048, 4096, 8192])
    ap.add_argument('--bks', type=int, nargs='*',
                    default=[512, 1024, 2048])
    args = ap.parse_args()
    D = 128
    for S in args.seqs:
        H = args.heads
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(kk, (1, H, S, D), jnp.bfloat16)
                   for kk in ks)
        fl = 4 * H * S * S * D
        for bq in args.bqs:
            for bk in args.bks:
                try:
                    dt = bench_loop(
                        lambda x, bq=bq, bk=bk: dense_attn(
                            x, k, v, bq=bq, bk=bk)[0].astype(jnp.bfloat16),
                        q, iters=args.iters)
                    print(f"S={S} bq={bq} bk={bk}: {dt*1000:.2f} ms "
                          f"-> {fl/dt/1e12:.1f} TF/s", flush=True)
                except Exception as e:
                    print(f"S={S} bq={bq} bk={bk}: FAIL "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == '__main__':
    main()
