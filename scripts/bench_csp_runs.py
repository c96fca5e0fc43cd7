"""Microbench: gather-granule sweep for csp vmem mode at the REAL Wan2.1
static mask (local_voxels=5 voxel cube + top-k extras), plus dense.

Purpose: test the hypothesis that the vmem gather mode is DMA-descriptor
bound at Wan's ~59% selection density (151 per-block copies per query
group).  The static cube mask is st*sh contiguous runs of sw blocks in
block space, so gathering at coarser granules (256/512 tokens) cuts the
descriptor count ~proportionally while barely raising selected density —
if time drops with granule size, a run-granular gather kernel wins Wan.
"""
import argparse
import sys
import time

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


def wan_static_mask(seq_pad: int, lv: int):
    """The real Wan2.1-1.3B 480x832x81 static mask: token grid (21,30,52),
    voxel (4,4,8), local cube (lv,lv,lv) — models/wan.py:153-165."""
    mask, _, _ = get_local_indices_with_text(
        (20, 28, 48), txt_len=0, voxel_shape=(4, 4, 8),
        local_shape=(lv, lv, lv))
    # wan pads to seq_pad with zeros (models/wan.py:162-164)
    G = seq_pad // 128
    m = np.zeros((G, seq_pad), bool)
    s = mask.shape
    m[:s[0], :s[1]] = np.asarray(mask)
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--heads', type=int, default=12)
    ap.add_argument('--seq', type=int, default=26880,
                    help='20*28*48=26880 grid tokens (divisible voxel grid '
                         'close to the real 32760)')
    ap.add_argument('--lv', type=int, default=5)
    ap.add_argument('--topk-frac', type=float, default=0.1)
    ap.add_argument('--iters', type=int, default=8)
    ap.add_argument('--granules', default='128,256,512,640')
    args = ap.parse_args()
    B, H, D = 1, args.heads, 128
    S = args.seq
    assert S % 128 == 0
    G = S // 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
               for kk in ks)

    t_dense = bench_loop(
        lambda x: dense_attn(x, k, v)[0].astype(jnp.bfloat16), q,
        iters=args.iters)
    print(f"dense H={H} S={S}: {t_dense*1000:.2f} ms", flush=True)

    m_tok = wan_static_mask(S, args.lv)            # [G, S] bool, static
    # top-k extras: random 10% of blocks not already in the static mask,
    # same per (b,h,g) shape as production
    rng = np.random.default_rng(1)
    nb128 = S // 128
    mb = np.asarray(indexing.blockify_mask(jnp.asarray(m_tok), 128))
    extra = (rng.random((B, H, G, nb128)) < args.topk_frac) & ~mb[None, None]
    union = mb[None, None] | extra
    dens = union.mean()
    print(f"static={mb.mean():.3f} union={dens:.3f} density", flush=True)

    for gran in (int(x) for x in args.granules.split(',')):
        if S % gran:
            print(f"granule {gran}: skipped (S % gran != 0)", flush=True)
            continue
        nb = S // gran
        # re-blockify the token union at this granule
        u_tok = np.repeat(union, 128, axis=-1)     # [B,H,G,S]
        u_blk = u_tok.reshape(B, H, G, nb, gran).any(-1)
        # production (modules/attn.py dense_tail_g) excludes ~fully-dense
        # query groups (the txt/tail row that get_local_indices_with_text
        # makes attend everywhere) from the gather capacity and recomputes
        # them with a tiny exact-dense flash instead; without this the
        # static jmax — and with it every group's matmul width — inflates
        # to ALL blocks (the r4 first-cut of this bench measured 0.79x at
        # true density 0.219 purely from that)
        rowdens = u_blk.reshape(-1, nb).mean(-1).reshape(u_blk.shape[:-1])
        dense_rows = rowdens >= 0.95
        jmax = int(np.where(dense_rows, 0,
                            u_blk.sum(-1)).max())
        inds, counts = indexing.mask_to_indices(jnp.asarray(u_blk),
                                                multiple_of=1)
        counts = jnp.where(jnp.asarray(dense_rows), 1, counts)
        counts = jnp.minimum(counts, jmax)
        inds = inds[..., :jmax]
        d_eff = float(counts.mean()) / nb
        csp_mod.MAX_KV_BLOCK = max(csp_mod.MAX_KV_BLOCK, gran)
        t = bench_loop(
            lambda x: csp_mod.csp_attn(
                x, k, v, inds, counts, qg=128, kv_block=gran,
                mode='vmem').astype(jnp.bfloat16),
            q, iters=args.iters)
        print(f"csp[vmem] gran={gran} jmax={jmax}/{nb} d={d_eff:.3f}: "
              f"{t*1000:.2f} ms ({t_dense/t:.2f}x vs dense)", flush=True)


if __name__ == '__main__':
    main()
