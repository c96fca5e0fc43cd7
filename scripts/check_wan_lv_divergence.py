"""Sanity check: lv=3 (csp engaged) vs lv=5 (gate -> dense) final latents
must DIFFER (csp delta caching is approximate).  Identical outputs would
mean the ablation knob is inert — guards the quality_eval rows.
"""
import dataclasses
import sys

sys.path.insert(0, '/'.join(__file__.split('/')[:-2]))
import jax
import os
if os.environ.get('JAX_PLATFORMS'):
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_compile_cache")
import jax.numpy as jnp
import numpy as np

from chipmunk_tpu.config import load_config
from chipmunk_tpu.models.wan import WanModelConfig, WanModel, init_wan_params
from chipmunk_tpu.models.video_sampling import wan_denoise
from chipmunk_tpu.models.sampling import get_schedule

steps, layers = 14, 2
on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
cfg = WanModelConfig(latent_t=21, latent_h=60, latent_w=104,
                     num_layers=layers,
                     dtype=jnp.bfloat16 if on_tpu else jnp.float32)
params = init_wan_params(jax.random.PRNGKey(0), cfg)
ks = jax.random.split(jax.random.PRNGKey(1), 3)
lat = jax.random.normal(ks[0], (1, cfg.in_channels, 21, 60, 104), cfg.dtype)
ctx_c = jax.random.normal(ks[1], (1, cfg.txt_len, cfg.text_dim), cfg.dtype)
ctx_u = jax.random.normal(ks[2], (1, cfg.txt_len, cfg.text_dim), cfg.dtype)
ts = get_schedule(steps, cfg.seq_len, shift=False)
ship = load_config('configs/wan-chipmunk.yml').replace(steps=steps)

outs = {}
for lv in (5, 3):
    ck = ship.replace(attn=dataclasses.replace(ship.attn, local_voxels=lv))
    m = WanModel(cfg=cfg, ck=ck, use_kernels=on_tpu)
    print(f"lv={lv}: fully_dense={m.attn_mod.fully_dense} "
          f"jmax={m.attn_mod.jmax}", flush=True)
    out = wan_denoise(m, params, lat, ctx_c, ctx_u, ts,
                      key=jax.random.PRNGKey(7))
    outs[lv] = np.asarray(out.astype(jnp.float32))
d = np.abs(outs[5] - outs[3])
rel = float(np.linalg.norm(d) / np.linalg.norm(outs[5]))
print(f"max|lv5-lv3|={d.max():.3e} rel_l2={rel:.3e}", flush=True)
assert d.max() > 0, "lv knob is INERT - outputs bit-identical"
print("ok: lv=3 diverges from lv=5 (csp path engaged)", flush=True)
