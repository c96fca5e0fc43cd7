"""Decompose the Wan sparse-step e2e overhead: times the EXACT production
jitted step program (30 layers, state in carry) in three variants:

  a) production sparse step (csp attention),
  b) same program but attention forced dense_step (state still threaded),
  c) attention disabled entirely (placeholder state, the dense baseline).

(b)-(a) isolates what csp actually saves inside the full program;
(c) vs (b) isolates the cost of carrying/threading the 3.2GB state.
"""
import dataclasses
import sys
import time

sys.path.insert(0, '/'.join(__file__.split('/')[:-2]))
import jax
import os
if os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_compile_cache")
import jax.numpy as jnp
import numpy as np

from chipmunk_tpu.config import load_config, config_from_dict
from chipmunk_tpu.models.wan import WanModelConfig, WanModel, init_wan_params
from chipmunk_tpu.models.video_sampling import FluxStep, _jit_step
from chipmunk_tpu.modules.attn import SparseDiffAttn

LAYERS = 30
on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
cfg = WanModelConfig(latent_t=21, latent_h=60, latent_w=104,
                     num_layers=LAYERS,
                     dtype=jnp.bfloat16 if on_tpu else jnp.float32)
params = init_wan_params(jax.random.PRNGKey(0), cfg)
ship = load_config('configs/wan-chipmunk.yml').replace(steps=50)
ck3 = ship.replace(attn=dataclasses.replace(ship.attn, local_voxels=3))
ck_off = config_from_dict({
    'steps': 50, 'num_model_invocations_per_inference_step': 2,
    'attn': {'is_enabled': False}, 'mlp': {'is_enabled': False},
    'step_caching': {'is_enabled': False}})

ks = jax.random.split(jax.random.PRNGKey(1), 3)
lat = jax.random.normal(ks[0], (1, cfg.in_channels, 21, 60, 104), cfg.dtype)
ctx = jax.random.normal(ks[1], (1, cfg.txt_len, cfg.text_dim), cfg.dtype)
SPARSE = FluxStep(index=5, full_attn=False, full_mlp=False, colsum=False,
                  recompute_mlp_mask=False)
COLSUM = FluxStep(index=4, full_attn=True, full_mlp=True, colsum=True,
                  recompute_mlp_mask=True)


def time_step(tag, ck, step, iters=6, patch_dense=False):
    m = WanModel(cfg=cfg, ck=ck, use_kernels=on_tpu)
    if patch_dense:
        orig = SparseDiffAttn.sparse_step
        SparseDiffAttn.sparse_step = (
            lambda self, q, k, v, st: (self.dense_step(q, k, v), st))
    try:
        st = m.init_state(1)
        if step.index > 2 and ck.attn.is_enabled and not m.attn_mod.fully_dense:
            # prime the selection with one colsum step so the sparse
            # step consumes a realistic index set
            fn0 = _jit_step(m, COLSUM, 'wan-step')
            _, st = fn0(params, lat, ctx, jnp.ones((1,), jnp.float32), st,
                        jax.random.PRNGKey(2), m.rope(1))
        fn = _jit_step(m, step, 'wan-step')
        pe = m.rope(1)

        def once(s):
            p, s2 = fn(params, lat, ctx, jnp.ones((1,), jnp.float32), s,
                       jax.random.PRNGKey(3), pe)
            _ = float(np.asarray(p.ravel()[0]))
            return s2

        st = once(st)                     # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            st = once(st)
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag}: {dt*1000:.1f} ms/invocation "
              f"({dt*1000/LAYERS:.2f} ms/layer)", flush=True)
        return dt
    finally:
        if patch_dense:
            SparseDiffAttn.sparse_step = orig


time_step('c) attn disabled (dense baseline)   ', ck_off, SPARSE)
time_step('b) sparse program, attention DENSE  ', ck3, SPARSE,
          patch_dense=True)
time_step('a) sparse program, csp attention    ', ck3, SPARSE)
time_step('d) colsum-full step                 ', ck3, COLSUM)


def time_cfg_pair(tag, ck, step, iters=6):
    """Replicate the e2e structure: TWO alternating CFG states (cond +
    uncond, 6.4GB live) through the same jitted step."""
    m = WanModel(cfg=cfg, ck=ck, use_kernels=on_tpu)
    st_c, st_u = m.init_cfg_states(1)
    pe = m.rope(1)
    if ck.attn.is_enabled and not m.attn_mod.fully_dense:
        fn0 = _jit_step(m, COLSUM, 'wan-step')
        _, st_c = fn0(params, lat, ctx, jnp.ones((1,), jnp.float32), st_c,
                      jax.random.PRNGKey(2), pe)
        _, st_u = fn0(params, lat, ctx, jnp.ones((1,), jnp.float32), st_u,
                      jax.random.PRNGKey(2), pe)
    fn = _jit_step(m, step, 'wan-step')

    def once(sc, su):
        p_c, sc = fn(params, lat, ctx, jnp.ones((1,), jnp.float32), sc,
                     jax.random.PRNGKey(3), pe)
        p_u, su = fn(params, lat, ctx, jnp.ones((1,), jnp.float32), su,
                     jax.random.PRNGKey(3), pe)
        pred = p_u + 5.0 * (p_c - p_u)
        _ = float(np.asarray(pred.ravel()[0]))
        return sc, su

    st_c, st_u = once(st_c, st_u)
    t0 = time.perf_counter()
    for _ in range(iters):
        st_c, st_u = once(st_c, st_u)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1000:.1f} ms/STEP (2 invocations) "
          f"({dt*1000/2/LAYERS:.2f} ms/layer-inv)", flush=True)
    return dt


time_cfg_pair('e) CFG pair, csp attention          ', ck3, SPARSE)
