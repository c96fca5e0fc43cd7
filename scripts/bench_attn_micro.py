"""Dense-attention + index-compaction microbenchmarks (round-3 levers).

1. dense_attn at FLUX/video shapes (the chains=2 two-chain variant this
   script measured as a regression was deleted in round 4).
2. compressed-index rebuild: argsort mask_to_indices vs binary-search
   mask_to_indices_limited at the 119k hunyuan shape (VERDICT r2 weak #7).

Timing: chained iterations via scripts/bench_util.bench_loop (the output
feeds the next iteration's input, so XLA cannot hoist the body out of the
loop — a loop-invariant body measures 1 call / iters and reports
impossible TF/s numbers).
"""
import sys
sys.path.insert(0, '/'.join(__file__.split('/')[:-2]))
sys.path.insert(0, '/'.join(__file__.split('/')[:-1]))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
from chipmunk_tpu.kernels.flash_attention import dense_attn
from chipmunk_tpu.ops.indexing import mask_to_indices, mask_to_indices_limited
from bench_util import bench_loop


def bench_dense():
    for (H, S) in ((24, 4352), (24, 8896), (8, 16384)):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(kk, (1, H, S, D := 128), jnp.bfloat16)
                   for kk in ks)
        fl = 4 * H * S * S * 128
        dt = bench_loop(
            lambda x: dense_attn(x, k, v)[0].astype(jnp.bfloat16),
            q, iters=64)
        print(f"dense_attn H={H} S={S}: {dt*1000:.2f} ms "
              f"-> {fl/dt/1e12:.1f} TF/s", flush=True)


def bench_rebuild():
    B, H, G, NB, jmax = 1, 24, 930, 930, 96
    mask = jax.random.bernoulli(jax.random.PRNGKey(1), 0.06, (B, H, G, NB))

    def chain(fn):
        # feed the (boolean) mask through so iterations depend on the
        # previous result: flip one bit derived from the prior indices
        def step(m):
            inds = fn(m)
            bump = (inds[..., :1, :1, :1] % NB)
            return m.at[0, 0, 0, bump[0, 0, 0]].set(True)
        return step

    t_old = bench_loop(chain(lambda m: mask_to_indices(m, 1)[0][..., :jmax]),
                       mask, iters=64)
    t_new = bench_loop(chain(lambda m: mask_to_indices_limited(m, 1, jmax)[0]),
                       mask, iters=64)
    print(f"index rebuild @119k [1,24,930,930] jmax={jmax}: "
          f"argsort {t_old*1000:.2f} ms -> topk-limited {t_new*1000:.2f} ms "
          f"({t_old/t_new:.1f}x)", flush=True)


if __name__ == '__main__':
    bench_rebuild()
    bench_dense()
