"""csp_attn HBM-gather mode diagnostics at the HunyuanVideo 119k point.

VERDICT r4 weak #5: csp layer ratio is 7.9x vs the reference's ~9.3x at
the matched 119k/5% point.  The HBM mode issues 2*jmax separate
kv_block-row DMAs per query group; this bench separates the two
candidate limiters before building anything:

  * bandwidth-bound: total gather bytes = G * count * 2 * kv_block * D*2
    set the floor -> time scales with density, granule size is irrelevant
  * DMA-issue-bound: the per-copy start/wait scalar work sets the floor
    -> coarser granules (fewer, bigger copies at ~same bytes) win

Sweep: kv_block in {128, 256, 512} with the SAME underlying 128-token
selection (coarsened by union), plus a half-density point.  Also prints
the adjacent-consecutive fraction of selected blocks (how much a
pair-coalescing DMA scheme could merge).

Run ON THE REAL CHIP:  timeout 3600 python scripts/bench_csp_hbm.py
"""
import argparse
import sys

sys.path.insert(0, '/'.join(__file__.split('/')[:-2]))
sys.path.insert(0, '/'.join(__file__.split('/')[:-1]))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_compile_cache")
from chipmunk_tpu.kernels.flash_attention import dense_attn
from chipmunk_tpu.kernels import csp_attention as csp_mod
from chipmunk_tpu.ops.voxel import get_local_indices_with_text
from chipmunk_tpu.ops import indexing
from bench_util import bench_loop


def build_selection(B, H, S, grid, txt_len, lv, topk_frac, rng):
    """Hunyuan-style static voxel-cube mask + random top-k extras, at
    128-token block granularity (the production selection granule)."""
    mask, _, _ = get_local_indices_with_text(
        grid, txt_len=txt_len, voxel_shape=(4, 4, 8),
        local_shape=(lv, lv, lv))
    G = S // 128
    m = np.zeros((G, S), bool)
    sshape = mask.shape
    m[:sshape[0], :sshape[1]] = np.asarray(mask)
    nb = S // 128
    mb = np.asarray(indexing.blockify_mask(jnp.asarray(m), 128))
    extra = (rng.random((B, H, G, nb)) < topk_frac) & ~mb[None, None]
    union = mb[None, None] | extra
    return union


def contiguity(union):
    """Fraction of selected blocks whose successor block is also selected
    (upper bound on what pair-coalescing can merge)."""
    sel = union
    nxt = np.zeros_like(sel)
    nxt[..., :-1] = sel[..., 1:]
    both = (sel & nxt).sum()
    return both / max(sel.sum(), 1)


def to_inds(union, gran):
    B, H, G, nb128 = union.shape
    r = gran // 128
    nb = nb128 // r
    u = union[..., :nb * r].reshape(B, H, G, nb, r).any(-1)
    rowdens = u.reshape(-1, nb).mean(-1).reshape(u.shape[:-1])
    dense_rows = rowdens >= 0.95
    jmax = int(np.where(dense_rows, 0, u.sum(-1)).max())
    inds, counts = indexing.mask_to_indices(jnp.asarray(u), multiple_of=1)
    counts = jnp.where(jnp.asarray(dense_rows), 1, counts)
    counts = jnp.minimum(counts, jmax)
    inds = inds[..., :jmax]
    d_eff = float(counts.mean()) / nb
    return inds, counts, jmax, d_eff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--heads', type=int, default=4)
    ap.add_argument('--grid', type=int, nargs=3, default=[32, 44, 80],
                    help='voxel-divisible video token grid (~112k tokens; '
                         'the real 119k grid is not voxel-divisible '
                         'everywhere, same structure)')
    ap.add_argument('--txt-len', type=int, default=0)
    ap.add_argument('--lv', type=int, default=1)
    ap.add_argument('--topk-frac', type=float, default=0.04)
    ap.add_argument('--iters', type=int, default=4)
    ap.add_argument('--granules', default='128,256,512')
    ap.add_argument('--nbufs', default='2,3,4',
                    help='gather pipeline depths to sweep (HBM mode)')
    ap.add_argument('--skip-dense', action='store_true',
                    help='reuse a known dense time instead of re-measuring')
    ap.add_argument('--dense-ms', type=float, default=170.26,
                    help='dense time (ms) to use with --skip-dense')
    args = ap.parse_args()
    B, H, D = 1, args.heads, 128
    t, h, w = args.grid
    S = t * h * w + args.txt_len
    S += (-S) % 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
               for kk in ks)

    if args.skip_dense:
        t_dense = args.dense_ms / 1000.0
        print(f"dense H={H} S={S}: {t_dense*1000:.2f} ms (reused)",
              flush=True)
    else:
        t_dense = bench_loop(
            lambda x: dense_attn(x, k, v)[0].astype(jnp.bfloat16), q,
            iters=args.iters)
        fl = 4 * H * S * S * D
        print(f"dense H={H} S={S}: {t_dense*1000:.2f} ms "
              f"({fl/t_dense/1e12:.0f} TF/s)", flush=True)

    rng = np.random.default_rng(1)
    union = build_selection(B, H, S, (t, h, w), args.txt_len, args.lv,
                            args.topk_frac, rng)
    print(f"density={union.mean():.4f} "
          f"contiguous-successor frac={contiguity(union):.3f}", flush=True)

    for gran in (int(x) for x in args.granules.split(',')):
        inds, counts, jmax, d_eff = to_inds(union, gran)
        csp_mod.MAX_KV_BLOCK = max(csp_mod.MAX_KV_BLOCK, gran)
        for nbuf in (int(x) for x in args.nbufs.split(',')):
            tt = bench_loop(
                lambda x, inds=inds, counts=counts, gran=gran, nbuf=nbuf:
                csp_mod.csp_attn(
                    x, k, v, inds, counts, qg=128, kv_block=gran,
                    mode='hbm', nbuf=nbuf).astype(jnp.bfloat16),
                q, iters=args.iters)
            gb = (float(np.asarray(counts, np.float64).sum())
                  * 2 * gran * D * 2) / 1e9
            print(f"csp[hbm] gran={gran} nbuf={nbuf} jmax={jmax}/{S//gran} "
                  f"d={d_eff:.3f}: {tt*1000:.2f} ms ({t_dense/tt:.2f}x vs "
                  f"dense; gather {gb:.2f} GB -> {gb/tt:.0f} GB/s)",
                  flush=True)


if __name__ == '__main__':
    main()
