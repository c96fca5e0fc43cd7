"""Isolate the Wan sparse-step attention cost at the production operating
point (seq 32760 -> padded 32768, lv=3, jmax=62): times the module-level
pieces that make up SparseDiffAttn.sparse_step vs the raw kernel and the
dense baseline, to find where the e2e's ~31ms/layer effective attention
cost (profile_wan_lv3) diverges from the 16ms raw-kernel estimate."""
import dataclasses
import sys

sys.path.insert(0, '/'.join(__file__.split('/')[:-2]))
sys.path.insert(0, '/'.join(__file__.split('/')[:-1]))
import jax
import os
if os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_compile_cache")
import jax.numpy as jnp
import numpy as np

from chipmunk_tpu.config import load_config
from chipmunk_tpu.models.wan import WanModelConfig, WanModel
from chipmunk_tpu.kernels.csp_attention import csp_attn
from chipmunk_tpu.kernels.flash_attention import dense_attn
from bench_util import bench_loop

cfg = WanModelConfig(latent_t=21, latent_h=60, latent_w=104, num_layers=2,
                     dtype=jnp.bfloat16)
ship = load_config('configs/wan-chipmunk.yml')
ck = ship.replace(attn=dataclasses.replace(ship.attn, local_voxels=3))
m = WanModel(cfg=cfg, ck=ck, use_kernels=True)
am = m.attn_mod
S = m.seq_padded
H, D = cfg.num_heads, 128
print(f"seq_padded={S} valid={am.valid_len} jmax={am.jmax} "
      f"dense_tail_g={am.dense_tail_g}", flush=True)

ks = jax.random.split(jax.random.PRNGKey(0), 3)
q, k, v = (jax.random.normal(kk, (1, H, S, D), jnp.bfloat16) for kk in ks)

# production-like selection: static mask + random topk extras
state = am.init_state(1, H, D)
key = jax.random.PRNGKey(1)
scores = jax.random.uniform(key, (1, H, S // am.cfg.mbm,
                                  S // am.cfg.kv_block))
mask = am._select_mask(scores, key)
inds, counts = am._mask_to_inds(mask)
state = am._store_selection(state, mask, inds, counts)
state = state._replace(out_cache=jnp.zeros_like(state.out_cache))
jax.block_until_ready((inds, counts))

t = bench_loop(lambda x: dense_attn(x, k[..., :am.valid_len, :],
                                    v[..., :am.valid_len, :]
                                    )[0].astype(jnp.bfloat16), q, iters=8)
print(f"dense_attn (valid-sliced): {t*1000:.2f} ms", flush=True)

t = bench_loop(lambda x: csp_attn(x, k, v, inds, counts, qg=am.cfg.mbm,
                                  kv_block=am.cfg.kv_block,
                                  ).astype(jnp.bfloat16), q, iters=8)
print(f"csp_attn kv_valid=None:    {t*1000:.2f} ms", flush=True)

t = bench_loop(lambda x: csp_attn(x, k, v, inds, counts, qg=am.cfg.mbm,
                                  kv_block=am.cfg.kv_block,
                                  kv_valid=am.valid_len,
                                  ).astype(jnp.bfloat16), q, iters=8)
print(f"csp_attn kv_valid={am.valid_len}: {t*1000:.2f} ms", flush=True)


@jax.jit
def rebuild(st, x):
    # thread an x-derived zero into packed so the rebuild cannot be
    # hoisted out of the timing loop (values unchanged: xor 0)
    st = st._replace(packed=st.packed ^ (x[0, 0, 0, 0] * 0
                                         ).astype(jnp.uint8))
    i2, c2 = am._stored_inds(st)
    return x + (c2.sum() * 0).astype(x.dtype)


jax.block_until_ready(rebuild(state, q))
t = bench_loop(lambda x: rebuild(state, x), q, iters=8)
print(f"stored_inds rebuild (bitunpack+compact): {t*1000:.2f} ms",
      flush=True)


@jax.jit
def sstep(x, st):
    o, st2 = am.sparse_step(x, k, v, st)
    return o.astype(jnp.bfloat16)


jax.block_until_ready(sstep(q, state))
t = bench_loop(lambda x: sstep(x, state), q, iters=8)
print(f"module sparse_step (rebuild+csp+tail+cache-add): {t*1000:.2f} ms",
      flush=True)


@jax.jit
def fstep(x, st):
    o, st2 = am.full_step_colsum(x, k, v, st, jax.random.PRNGKey(3))
    return o.astype(jnp.bfloat16)


jax.block_until_ready(fstep(q, state))
t = bench_loop(lambda x: fstep(x, state), q, iters=8)
print(f"module full_step_colsum (colsum+select+csp):     {t*1000:.2f} ms",
      flush=True)
