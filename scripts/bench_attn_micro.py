"""Dense-attention + index-compaction microbenchmarks (round-3 levers).

1. dense_attn single-chain vs two-chain (chains=2) at FLUX/video shapes.
2. compressed-index rebuild: argsort mask_to_indices vs binary-search
   mask_to_indices_limited at the 119k hunyuan shape (VERDICT r2 weak #7).
"""
import sys, time
sys.path.insert(0, '/'.join(__file__.split('/')[:-2]))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
from chipmunk_tpu.kernels.flash_attention import dense_attn
from chipmunk_tpu.ops.indexing import mask_to_indices, mask_to_indices_limited


def timeit(fn, *args, iters=8):
    @jax.jit
    def loop(*a):
        def body(c, _):
            r = fn(*a)
            leaf = jax.tree_util.tree_leaves(r)[0]
            return c + leaf.ravel()[0].astype(jnp.float32), None
        s, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return s
    _ = float(np.asarray(loop(*args)))
    t0 = time.perf_counter()
    _ = float(np.asarray(loop(*args)))
    return (time.perf_counter() - t0) / iters


def bench_dense():
    for (H, S) in ((24, 4352), (24, 8896), (8, 16384)):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(kk, (1, H, S, D := 128), jnp.bfloat16)
                   for kk in ks)
        fl = 4 * H * S * S * 128
        for ch in (1, 2):
            dt = timeit(lambda q, k, v, ch=ch: dense_attn(q, k, v,
                                                          chains=ch)[0],
                        q, k, v)
            print(f"dense_attn H={H} S={S} chains={ch}: {dt*1000:.2f} ms "
                  f"-> {fl/dt/1e12:.1f} TF/s", flush=True)


def bench_rebuild():
    B, H, G, NB, jmax = 1, 24, 930, 930, 96
    mask = jax.random.bernoulli(jax.random.PRNGKey(1), 0.06, (B, H, G, NB))
    t_old = timeit(lambda m: mask_to_indices(m, 1)[0][..., :jmax], mask)
    t_new = timeit(lambda m: mask_to_indices_limited(m, 1, jmax)[0], mask)
    print(f"index rebuild @119k [1,24,930,930] jmax={jmax}: "
          f"argsort {t_old*1000:.2f} ms -> searchsorted {t_new*1000:.2f} ms "
          f"({t_old/t_new:.1f}x)", flush=True)


if __name__ == '__main__':
    bench_rebuild()
    bench_dense()
