"""TPU hardware smoke test: compile + numerics + rough timings for all
Pallas kernels at FLUX shapes.  Run on the real chip (not under pytest)."""
import functools
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, '/root/repo')
from chipmunk_tpu import ops
from chipmunk_tpu.kernels import (dense_attn, dense_colsum_attn, csp_attn,
                                  csp_mlp)

print("devices:", jax.devices())
DEV = jax.devices()[0]


def bench(fn, *args, iters=20):
    fn(*args)  # compile
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
    return (time.perf_counter() - t0) / iters


# ---------------- FLUX shapes ----------------
B, H, S, D = 1, 24, 4608, 128
dt = jnp.bfloat16
ks = jax.random.split(jax.random.PRNGKey(0), 4)
q = jax.random.normal(ks[0], (B, H, S, D), dt)
k = jax.random.normal(ks[1], (B, H, S, D), dt)
v = jax.random.normal(ks[2], (B, H, S, D), dt)

# --- dense attention
t = bench(dense_attn, q, k, v)
flops = 4 * B * H * S * S * D
print(f"dense_attn: {t*1e3:.3f} ms  {flops/t/1e12:.1f} TFLOP/s")
o, lse = dense_attn(q, k, v)
o32, lse32 = ops.dense_attn_ref(q.astype(jnp.float32)[:, :2],
                                k.astype(jnp.float32)[:, :2],
                                v.astype(jnp.float32)[:, :2])
err = np.abs(np.asarray(o[:, :2], np.float32) - np.asarray(o32)).max()
lerr = np.abs(np.asarray(lse[:, :2]) - np.asarray(lse32)).max()
print(f"dense_attn max err vs fp32 ref: o={err:.4f} lse={lerr:.4f}")

# --- XLA baseline (dense attention via jnp, what torch.compile+FA3 is to ref)
@jax.jit
def xla_attn(q, k, v):
    s = jnp.einsum('bhid,bhjd->bhij', q, k) / np.sqrt(D)
    return jnp.einsum('bhij,bhjd->bhid', jax.nn.softmax(s, -1), v)

t_xla = bench(xla_attn, q, k, v)
print(f"xla dense attn: {t_xla*1e3:.3f} ms  {flops/t_xla/1e12:.1f} TFLOP/s")

try:
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention as jfa
    t_jfa = bench(functools.partial(jfa, sm_scale=1/np.sqrt(D)), q, k, v)
    print(f"jax builtin flash: {t_jfa*1e3:.3f} ms {flops/t_jfa/1e12:.1f} TFLOP/s")
except Exception as e:
    print("builtin flash unavailable:", type(e).__name__, e)

# --- colsum attention
t = bench(dense_colsum_attn, q, k, v, lse)
print(f"dense_colsum_attn: {t*1e3:.3f} ms")
o2, cs, lse2 = dense_colsum_attn(q, k, v, lse)
print("colsum block scores shape:", cs.shape,
      " sum check (≈128):", np.asarray(cs.sum(-1)).mean())

# --- csp attention at 83.5% sparsity (16.5% keep), kv_block=128
kv_block = 128
G, NB = S // 128, S // kv_block
keep = 6  # 6/36 blocks = 16.7% keep
scores = jax.random.uniform(ks[3], (B, H, G, NB))
mask = ops.topk_mask(scores, keep)
inds, counts = ops.mask_to_indices(mask, multiple_of=1)
inds = inds[..., :keep + 2]

csp = functools.partial(csp_attn, qg=128, kv_block=kv_block)
t_csp = bench(csp, q, k, v, inds, counts)
print(f"csp_attn (16.7% keep, kv_block=128): {t_csp*1e3:.3f} ms  "
      f"vs dense pallas {bench(dense_attn, q, k, v)/t_csp:.2f}x  "
      f"vs xla {t_xla/t_csp:.2f}x")
o_csp = csp(q, k, v, inds, counts)
o_ref = ops.csp_block_attn_ref(q[:, :2].astype(jnp.float32),
                               k[:, :2].astype(jnp.float32),
                               v[:, :2].astype(jnp.float32),
                               inds[:, :2], counts[:, :2], 128, kv_block)
err = np.abs(np.asarray(o_csp[:, :2], np.float32) - np.asarray(o_ref)).max()
print(f"csp_attn max err vs fp32 ref: {err:.4f}")

# --- csp attention with kv_block=16 (fine granularity)
kv_block = 16
NB = S // kv_block
keep16 = 48  # 48*16 = 768 tokens = 16.7%
scores = jax.random.uniform(ks[3], (B, H, G, NB))
mask = ops.topk_mask(scores, keep16)
inds16, counts16 = ops.mask_to_indices(mask, multiple_of=1)
inds16 = inds16[..., :keep16 + 8]
csp16 = functools.partial(csp_attn, qg=128, kv_block=16)
t16 = bench(csp16, q, k, v, inds16, counts16)
print(f"csp_attn (16.7% keep, kv_block=16): {t16*1e3:.3f} ms")

# ---------------- MLP: FLUX shapes ----------------
T, C, N = 4608, 3072, 12288
bn = 128
M, NBm = T // 128, N // bn
kk = jax.random.split(jax.random.PRNGKey(1), 8)
x = jax.random.normal(kk[0], (T, C), dt)
w1t = jax.random.normal(kk[1], (N, C), dt) * 0.02
b1 = jax.random.normal(kk[2], (N,), jnp.float32) * 0.02
w2 = jax.random.normal(kk[3], (N, C), dt) * 0.02
act_cache = jax.random.normal(kk[4], (T, N), dt)
out_cache = jax.random.normal(kk[5], (T, C), dt)
keep_n = int(0.3 * NBm)  # 70% sparsity
mscores = jax.random.uniform(kk[6], (M, NBm))
mmask = ops.topk_mask(mscores, keep_n)
minds, mcounts = ops.mask_to_indices(mmask, multiple_of=1)
minds = minds[..., :keep_n + 2]


@jax.jit
def xla_dense_mlp(x, w1t, b1, w2):
    mid = x @ w1t.T + b1.astype(dt)
    return jax.nn.gelu(mid, approximate=True) @ w2

t_dense_mlp = bench(xla_dense_mlp, x, w1t, b1, w2)
mlp_flops = 2 * T * C * N * 2
print(f"xla dense mlp: {t_dense_mlp*1e3:.3f} ms {mlp_flops/t_dense_mlp/1e12:.1f} TFLOP/s")

cm = functools.partial(csp_mlp, bn=bn)
t_csp_mlp = bench(cm, x, w1t, b1, w2, act_cache, out_cache, minds, mcounts)
print(f"csp_mlp (30% keep): {t_csp_mlp*1e3:.3f} ms  vs dense {t_dense_mlp/t_csp_mlp:.2f}x")

print("OK")
