"""Per-step-kind timing breakdown for the HunyuanVideo sparse pipeline.

The e2e curve (BENCH_HUNYUAN.json) tells us the speedup but not where the
sparse side's time goes at video scale — full steps (dense+colsum) vs
sparse steps vs index rebuild.  This harness times each distinct step
kind of the shipped schedule separately (one jitted program per kind,
measured with chained-iteration loops where possible), so the 3.09x ->
3.72x gap hunt targets the right component.

Usage: python scripts/bench_hy_steps.py [--scale video] [--iters 3]
Prints one line per step kind + a modeled e2e reconstruction.
"""
import argparse
import sys
import time

sys.path.insert(0, '/'.join(__file__.split('/')[:-2]))

import jax
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from chipmunk_tpu.config import load_config, config_from_dict
from chipmunk_tpu.models.hunyuan import (HunyuanModelConfig, HunyuanModel,
                                         init_hunyuan_params)
from chipmunk_tpu.models.flux import FluxStep
from chipmunk_tpu.models.video_sampling import _jit_step
from chipmunk_tpu.models.sampling import get_schedule
from chipmunk_tpu.schedule import step_plan

SCALES = {
    'small':  ((9, 48, 80),   (2, 4)),
    'medium': ((13, 90, 116), (2, 4)),
    'xl':     ((17, 90, 156), (2, 4)),
    'video':  ((33, 90, 160), (2, 4)),
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scale', default='video')
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--iters', type=int, default=3)
    args = ap.parse_args()
    (lt, lh, lw), (dd, ds) = SCALES[args.scale]
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    cfg = HunyuanModelConfig(latent_t=lt, latent_h=lh, latent_w=lw,
                             depth_double=dd, depth_single=ds,
                             dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    log(f"[{args.scale}] seq {cfg.seq_len} depth {dd}+{ds}")
    ck = load_config('configs/hunyuan-chipmunk.yml').replace(
        steps=args.steps)
    ck = config_from_dict(
        {'attn': {'first_n_dense_layers': min(2, dd)}}, ck)
    params = init_hunyuan_params(jax.random.PRNGKey(0), cfg)
    m = HunyuanModel(cfg=cfg, ck=ck, use_kernels=on_tpu)

    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    lat = jax.random.normal(ks[0], (1, cfg.in_channels, lt, lh, lw),
                            cfg.dtype)
    txt = jax.random.normal(ks[1], (1, cfg.txt_len, cfg.text_dim),
                            cfg.dtype)
    y = jax.random.normal(ks[2], (1, cfg.vec_in_dim), cfg.dtype)
    ts = get_schedule(args.steps, cfg.img_len, shift=False)
    pe = m.rope(1)
    g = (jnp.full((1,), 6.0, jnp.float32)
         if m.cfg.guidance_embed else None)
    state = m.init_state(1)

    plan = step_plan(ck)
    # distinct step kinds in schedule order, with counts
    kinds = {}
    for i, kind in enumerate(plan):
        if kind.skip:
            kinds.setdefault('skip', [0, None])[0] += 1
            continue
        step = FluxStep.of(kind, i)
        sig = (step.full_attn, step.full_mlp, step.colsum,
               step.recompute_mlp_mask, min(step.index, 2))
        lab = (('full+colsum' if step.colsum else 'full')
               if step.full_attn else 'sparse')
        if step.index < 2:
            lab = f'warmup{step.index}'
        e = kinds.setdefault((lab, sig), [0, None])
        e[0] += 1
        if e[1] is None:
            e[1] = step

    t_vec = jnp.full((1,), ts[0], jnp.float32)
    total_model = 0.0
    rows = []
    for k, (count, step) in kinds.items():
        if k == 'skip':
            rows.append(('skip', count, 0.0))
            continue
        lab, _ = k
        fn = _jit_step(m, step, 'hy-prof')
        k_i = jax.random.fold_in(jax.random.PRNGKey(7), step.index)
        t0 = time.perf_counter()
        pred, state = fn(params, lat, txt, t_vec, y, state, g, k_i, pe)
        float(np.asarray(pred.ravel()[0]))
        log(f"{lab}: compile+run {time.perf_counter()-t0:.1f}s")
        best = float('inf')
        for _ in range(args.iters):
            t0 = time.perf_counter()
            pred, state = fn(params, lat, txt, t_vec, y, state, g, k_i,
                             pe)
            float(np.asarray(pred.ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        rows.append((lab, count, best))
        total_model += count * best
        log(f"{lab}: {best:.3f}s x{count} = {count*best:.1f}s")

    print(f"# scale={args.scale} seq={cfg.seq_len} depth={dd}+{ds}")
    for lab, count, t in rows:
        print(f"{lab}\tx{count}\t{t:.3f}s\t{count*t:.1f}s total")
    print(f"modeled sparse e2e (sum of kinds): {total_model:.1f}s")


if __name__ == '__main__':
    main()
