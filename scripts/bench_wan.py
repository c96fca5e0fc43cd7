"""Wan2.1-T2V-1.3B e2e benchmark at FULL depth (30 layers, real model
scale — 1.3B params fit bf16 on one chip) with the CFG dual-invocation
loop (num_model_invocations_per_inference_step=2, reference wan
chipmunk-config.yml), sparse vs dense.  The reference publishes no Wan
numbers (BASELINE.md), so this series establishes ours.

Emits one JSON line {seq, depth, dense_s, sparse_s, speedup}.
"""
import argparse
import json
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
from chipmunk_tpu.models.wan import (WanModelConfig, WanModel,
                                     init_wan_params)
from chipmunk_tpu.models.video_sampling import (wan_denoise,
                                                wan_denoise_compiled)
from chipmunk_tpu.models.sampling import get_schedule


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--trials', type=int, default=1)
    ap.add_argument('--layers', type=int, default=30)
    # 480x832x81 frames -> latent (21, 60, 104) -> seq 32,760 (the real
    # Wan2.1-1.3B default, reference text2video.py)
    ap.add_argument('--latent', type=int, nargs=3, default=[21, 60, 104])
    ap.add_argument('--local-voxels', type=int, default=None,
                    help='override attn.local_voxels (the reference ships '
                         '5, whose static cube selects ~59% of KV at this '
                         'grid and trips the TPU dense-fallback gate; '
                         'smaller cubes re-enable sparse attention — '
                         'quality-gated in QUALITY.md)')
    ap.add_argument('--dense-s', type=float, default=None,
                    help='reuse a previously measured dense wall-clock '
                         '(seconds) instead of re-running the dense side')
    ap.add_argument('--full-schedule', default=None,
                    help='comma list of inference steps to run as FULL '
                         'attention steps (overrides full_step_every; the '
                         'reference hunyuan yml ships {0,1,10,40})')
    ap.add_argument('--recompute-mask', type=int, default=None,
                    choices=[0, 1],
                    help='override attn.recompute_mask (0 = freeze the '
                         'mask after the step-1 selection; later full '
                         'steps re-prime caches without a colsum pass)')
    ap.add_argument('--loop', default='host', choices=['host', 'compiled'],
                    help='compiled = single-dispatch lax.scan denoise '
                         'loop (wan_denoise_compiled): no per-step host '
                         'round trips, same loop for both sides')
    ap.add_argument('--side', default='both',
                    choices=['both', 'dense', 'sparse'])
    ap.add_argument('--chunk', type=int, default=None,
                    help='with --loop compiled: computed steps per '
                         'dispatch (the dev tunnel kills ~minute-plus '
                         'single dispatches; chunking keeps each window '
                         'short while amortizing the host residual)')
    args = ap.parse_args()
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    lt, lh, lw = args.latent
    cfg = WanModelConfig(latent_t=lt, latent_h=lh, latent_w=lw,
                         num_layers=args.layers,
                         dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    log(f"wan: seq {cfg.seq_len}, layers {args.layers}")
    params = init_wan_params(jax.random.PRNGKey(0), cfg)

    sparse_ck = load_config('configs/wan-chipmunk.yml').replace(
        steps=args.steps)
    if args.local_voxels is not None:
        import dataclasses
        sparse_ck = sparse_ck.replace(attn=dataclasses.replace(
            sparse_ck.attn, local_voxels=args.local_voxels))
    if args.full_schedule is not None:
        import dataclasses
        sched = frozenset(int(x) for x in args.full_schedule.split(','))
        sparse_ck = sparse_ck.replace(attn=dataclasses.replace(
            sparse_ck.attn, full_step_schedule=sched))
    if args.recompute_mask is not None:
        import dataclasses
        sparse_ck = sparse_ck.replace(attn=dataclasses.replace(
            sparse_ck.attn, recompute_mask=bool(args.recompute_mask)))
    dense_ck = config_from_dict({
        'steps': args.steps,
        'num_model_invocations_per_inference_step': 2,
        'attn': {'is_enabled': False}, 'mlp': {'is_enabled': False},
        'step_caching': {'is_enabled': False},
    })
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    lat = jax.random.normal(ks[0], (1, cfg.in_channels, lt, lh, lw),
                            cfg.dtype)
    ctx_c = jax.random.normal(ks[1], (1, cfg.txt_len, cfg.text_dim),
                              cfg.dtype)
    ctx_u = jax.random.normal(ks[2], (1, cfg.txt_len, cfg.text_dim),
                              cfg.dtype)
    ts = get_schedule(args.steps, cfg.seq_len, shift=False)

    if args.loop == 'compiled':
        def denoise(m, params, lat, ctx_c, ctx_u, ts, key):
            return wan_denoise_compiled(m, params, lat, ctx_c, ctx_u, ts,
                                        key=key, chunk=args.chunk)
    else:
        denoise = wan_denoise

    def run(ck, tag):
        m = WanModel(cfg=cfg, ck=ck, use_kernels=on_tpu)
        t0 = time.perf_counter()
        out = denoise(m, params, lat, ctx_c, ctx_u, ts,
                      key=jax.random.PRNGKey(7))
        _ = float(np.asarray(out.ravel()[0]))
        log(f"{tag}: warmup(+compile) {time.perf_counter()-t0:.1f}s")
        best = float('inf')
        for t in range(args.trials):
            t0 = time.perf_counter()
            out = denoise(m, params, lat, ctx_c, ctx_u, ts,
                          key=jax.random.PRNGKey(7))
            _ = float(np.asarray(out.ravel()[0]))
            dt = time.perf_counter() - t0
            log(f"{tag}: trial {t}: {dt:.2f}s")
            best = min(best, dt)
        return best

    if args.dense_s is not None:
        log(f"dense: reusing supplied wall-clock {args.dense_s:.2f}s "
            f"(--dense-s; not re-measured this run)")
        t_d = args.dense_s
    elif args.side in ('both', 'dense'):
        t_d = run(dense_ck, 'dense')
    else:
        t_d = None
    t_s = run(sparse_ck, 'sparse') if args.side in ('both', 'sparse') \
        else None
    if t_d is None or t_s is None:
        log(f"single side done: dense={t_d} sparse={t_s}")
        print(json.dumps({"metric": "wan_e2e_single_side",
                          "seq": cfg.seq_len, "layers": args.layers,
                          "dense_s": t_d, "sparse_s": t_s,
                          "loop": args.loop, "chunk": args.chunk,
                          "steps": args.steps}))
        return
    log(f"dense {t_d:.2f}s sparse {t_s:.2f}s -> {t_d/t_s:.3f}x")
    print(json.dumps({
        "metric": "wan_e2e_speedup_sparse_vs_dense",
        "seq": cfg.seq_len, "layers": args.layers,
        "dense_s": round(t_d, 2), "sparse_s": round(t_s, 2),
        "speedup": round(t_d / t_s, 3),
        "local_voxels": (args.local_voxels if args.local_voxels is not None
                         else sparse_ck.attn.local_voxels),
        "full_schedule": (sorted(sparse_ck.attn.full_step_schedule)
                          if sparse_ck.attn.full_step_schedule is not None
                          else f"every {sparse_ck.attn.full_step_every}"),
        "dense_reused": args.dense_s is not None,
        "loop": args.loop,
        "note": "full 30-layer Wan2.1-1.3B shapes, CFG 2 invocations/step; "
                "reference publishes no Wan numbers (BASELINE.md)"}))


if __name__ == '__main__':
    main()
