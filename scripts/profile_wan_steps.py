"""Per-step-kind wall-clock profile of the Wan2.1 CFG denoise loop:
replays wan_denoise's host loop (video_sampling.py:107-143) with a
block-until-materialized boundary after every step, and buckets times by
step kind (first-dense / colsum-full / plain-full / sparse / skip).
Answers "where do the computed seconds go" for the sparse side — the
e2e bench only shows the total.
"""
import argparse
import collections
import sys
import time

sys.path.insert(0, '/'.join(__file__.split('/')[:-2]))

import jax
import os
if os.environ.get('JAX_PLATFORMS'):     # honor CPU smokes under axon
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from chipmunk_tpu.config import load_config, config_from_dict
from chipmunk_tpu.models.wan import WanModelConfig, WanModel, init_wan_params
from chipmunk_tpu.models.video_sampling import FluxStep, _jit_step
from chipmunk_tpu.models.sampling import get_schedule
from chipmunk_tpu.schedule import step_plan


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--layers', type=int, default=30)
    ap.add_argument('--latent', type=int, nargs=3, default=[21, 60, 104])
    ap.add_argument('--local-voxels', type=int, default=None)
    ap.add_argument('--no-compress', action='store_true',
                    help='store inds/counts directly instead of bitpacked '
                         'masks (skips the per-layer-per-step rebuild)')
    ap.add_argument('--full-schedule', default=None,
                    help='comma list of full-attention steps')
    ap.add_argument('--dense', action='store_true',
                    help='profile the dense config instead')
    args = ap.parse_args()
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    lt, lh, lw = args.latent
    cfg = WanModelConfig(latent_t=lt, latent_h=lh, latent_w=lw,
                         num_layers=args.layers,
                         dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    params = init_wan_params(jax.random.PRNGKey(0), cfg)
    if args.dense:
        ck = config_from_dict({
            'steps': args.steps,
            'num_model_invocations_per_inference_step': 2,
            'attn': {'is_enabled': False}, 'mlp': {'is_enabled': False},
            'step_caching': {'is_enabled': False}})
    else:
        ck = load_config('configs/wan-chipmunk.yml').replace(
            steps=args.steps)
        import dataclasses
        if args.local_voxels is not None:
            ck = ck.replace(attn=dataclasses.replace(
                ck.attn, local_voxels=args.local_voxels))
        if args.no_compress:
            ck = ck.replace(attn=dataclasses.replace(
                ck.attn, should_compress_indices=False))
        if args.full_schedule is not None:
            sched = frozenset(int(x) for x in args.full_schedule.split(','))
            ck = ck.replace(attn=dataclasses.replace(
                ck.attn, full_step_schedule=sched))
    model = WanModel(cfg=cfg, ck=ck, use_kernels=on_tpu)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    lat = jax.random.normal(ks[0], (1, cfg.in_channels, lt, lh, lw),
                            cfg.dtype)
    ctx_c = jax.random.normal(ks[1], (1, cfg.txt_len, cfg.text_dim),
                              cfg.dtype)
    ctx_u = jax.random.normal(ks[2], (1, cfg.txt_len, cfg.text_dim),
                              cfg.dtype)
    ts = get_schedule(args.steps, cfg.seq_len, shift=False)

    def kind_name(k, i):
        if k.skip and i > 0:
            return 'skip'
        bits = []
        if i < 2:
            bits.append('first')
        bits.append('colsum' if k.colsum else
                    ('full' if k.full_attn else 'sparse'))
        return '+'.join(bits)

    plan = step_plan(ck)
    n = min(len(plan), ts.shape[0] - 1)

    def run(tag):
        st_c, st_u = model.init_cfg_states(1)
        pe = model.rope(1)
        latents, pred = lat, None
        buckets = collections.defaultdict(list)
        key = jax.random.PRNGKey(7)
        for i in range(n):
            kind = plan[i]
            name = kind_name(kind, i)
            t_curr, t_prev = ts[i], ts[i + 1]
            t0 = time.perf_counter()
            if kind.skip and pred is not None:
                latents = latents + (t_prev - t_curr) * pred
            else:
                t_vec = jnp.full((1,), t_curr, jnp.float32)
                step = FluxStep.of(kind, i)
                k_i = jax.random.fold_in(key, i)
                fn = _jit_step(model, step, 'wan-step')
                p_c, st_c = fn(params, latents, ctx_c, t_vec, st_c, k_i, pe)
                p_u, st_u = fn(params, latents, ctx_u, t_vec, st_u, k_i, pe)
                pred = p_u + 5.0 * (p_c - p_u)
                latents = latents + (t_prev - t_curr) * pred
            _ = float(np.asarray(latents.ravel()[0]))   # block (tunnel-safe)
            buckets[name].append(time.perf_counter() - t0)
        print(f"--- {tag} ---", flush=True)
        total = 0.0
        for name, xs in sorted(buckets.items()):
            s = sum(xs)
            total += s
            print(f"{name:14s} n={len(xs):3d} total={s:7.2f}s "
                  f"mean={s/len(xs)*1000:8.1f}ms", flush=True)
        print(f"{'TOTAL':14s} {total:7.2f}s", flush=True)
        return total

    run('warmup(+compile)')
    run('steady')


if __name__ == '__main__':
    main()
