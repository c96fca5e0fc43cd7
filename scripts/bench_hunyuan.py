"""HunyuanVideo e2e benchmark: sparse (attention top_keys=0.05 +
full-step schedule {0,1,10,40} + 25-step skip schedule, the reference's
operating point) vs dense, across a sequence-scaling curve up to the real
119k-token 720p/129-frame grid, plus a FULL-depth (20+40, 13B-param) run
with quantized weight residency.  The reference's headline is 3.72x
(1030s -> 277s on H100, README.md:87).

Scales (env CHIPMUNK_HY_SCALE or --scale, comma-separated):
  small   seq  8,896   core 2+4 depth      (round-1 continuity point)
  medium  seq 26,816   core 2+4
  xl      seq 59,926   core 2+4
  video   seq 119,056  core 2+4            (the real 720p x 129f grid)
  full30k seq 29,956   FULL 20+40 depth, int4/fp8 weights, fp8 attn cache

Emits one JSON line: list of {seq, depth, dense_s, sparse_s, speedup}.
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
from chipmunk_tpu.models.hunyuan import (HunyuanModelConfig, HunyuanModel,
                                         init_hunyuan_params)
from chipmunk_tpu.models.video_sampling import (hunyuan_denoise,
                                                hunyuan_denoise_compiled)
from chipmunk_tpu.models.sampling import get_schedule
from chipmunk_tpu.utils.quant import synth_quantized_params, QuantSpec

SCALES = {
    #          latent (t, h, w)   depth      quantized
    'tiny':    ((2, 16, 16),      (1, 2),    False),   # CPU smoke only
    'small':   ((9, 48, 80),      (2, 4),    False),
    'medium':  ((13, 90, 116),    (2, 4),    False),
    'xl':      ((17, 90, 156),    (2, 4),    False),
    'video':   ((33, 90, 160),    (2, 4),    False),
    'full30k': ((9, 100, 132),    (20, 40),  True),
    'full18k': ((9, 80, 104),     (20, 40),  True),
}
# '<scale>-streamed' runs the sparse side through the host-offload
# streamed runner (make_streamed honoring the shipped offloading block) so
# the offload overhead is a measured number (VERDICT r2 item 2)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_one(name, steps=50, trials=1, side='both', loop='host',
              wq=None, chunk=None):
    streamed_mode = name.endswith('-streamed')
    base = name[:-len('-streamed')] if streamed_mode else name
    (lt, lh, lw), (dd, ds), quant = SCALES[base]
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    cfg = HunyuanModelConfig(
        latent_t=lt, latent_h=lh, latent_w=lw,
        depth_double=dd, depth_single=ds,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    log(f"[{name}] img tokens {cfg.img_len}, seq {cfg.seq_len}, "
        f"depth {dd}+{ds}, quant={quant}")

    key = jax.random.PRNGKey(0)
    if quant:
        # host-side synthesis: device-side init+quantize churn degrades
        # the tunnel allocator (utils/quant.quantize_host docstring)
        shapes = jax.eval_shape(lambda k: init_hunyuan_params(k, cfg), key)
        # int4 MLP weights (was fp8 in r3): Hunyuan's MLP sparsity is off,
        # so these are only dense-matmul-consumed (dequant fuses), and
        # int4 halves the dominant param bytes — the residency shrink that
        # lets FULL 20+40 depth fit the 15.75GiB chip WITHOUT the streamed
        # runner (VERDICT r3 next #1)
        wq = wq or 'int4'
        params = synth_quantized_params(
            0, shapes, QuantSpec(attn=wq, mod=wq,
                                 mlp_sparse=wq, mlp_dense=wq))
    else:
        params = init_hunyuan_params(key, cfg)

    sparse_ck = load_config('configs/hunyuan-chipmunk.yml').replace(
        steps=steps)
    extra = {'first_n_dense_layers': min(2, dd)}
    if quant:
        extra['out_cache_dtype'] = 'float8_e4m3fn'
    sparse_ck = config_from_dict({'attn': extra}, sparse_ck)
    dense_ck = config_from_dict({
        'steps': steps,
        'attn': {'is_enabled': False}, 'mlp': {'is_enabled': False},
        'step_caching': {'is_enabled': False},
    })

    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    lat = jax.random.normal(ks[0], (1, cfg.in_channels, lt, lh, lw),
                            cfg.dtype)
    txt = jax.random.normal(ks[1], (1, cfg.txt_len, cfg.text_dim),
                            cfg.dtype)
    y = jax.random.normal(ks[2], (1, cfg.vec_in_dim), cfg.dtype)
    ts = get_schedule(steps, cfg.img_len, shift=False)

    def run(ck, tag, use_streamed=False):
        m = HunyuanModel(cfg=cfg, ck=ck, use_kernels=on_tpu)

        import os
        nd, ns = (int(x) for x in
                  os.environ.get('CHIPMUNK_HY_CHUNKS', '2,4').split(','))

        def once():
            if loop == 'compiled' and not use_streamed:
                # single-dispatch whole-loop program: no per-step host
                # round trips (the tunnel charges per dispatch; docs/
                # DESIGN.md "Single-dispatch denoise loops")
                out = hunyuan_denoise_compiled(m, params, lat, txt, y, ts,
                                               key=jax.random.PRNGKey(7),
                                               chunk=chunk)
            else:
                streamed = (m.make_streamed(n_chunks_double=nd,
                                            n_chunks_single=ns)
                            if use_streamed else None)
                out = hunyuan_denoise(m, params, lat, txt, y, ts,
                                      key=jax.random.PRNGKey(7),
                                      streamed=streamed)
            return float(np.asarray(out.ravel()[0]))

        t0 = time.perf_counter()
        once()
        log(f"[{name}] {tag}: warmup(+compile) {time.perf_counter()-t0:.1f}s")
        best = float('inf')
        for t in range(trials):
            t0 = time.perf_counter()
            once()
            dt = time.perf_counter() - t0
            log(f"[{name}] {tag}: trial {t}: {dt:.2f}s")
            best = min(best, dt)
        return best

    # --side dense|sparse runs one side per process: full-depth footprints
    # only fit when each side gets a fresh device heap (the tunnel pins
    # prior programs' argument buffers — memory notes / quantize_host doc)
    t_d = run(dense_ck, 'dense') if side in ('both', 'dense') else None
    t_s = (run(sparse_ck,
               'sparse-streamed' if streamed_mode else 'sparse',
               use_streamed=streamed_mode)
           if side in ('both', 'sparse') else None)
    row = {"scale": name, "seq": cfg.seq_len, "depth": f"{dd}+{ds}",
           "quantized": quant, "streamed": streamed_mode, "loop": loop}
    if t_d is not None:
        row["dense_s"] = round(t_d, 2)
    if t_s is not None:
        row["sparse_s"] = round(t_s, 2)
    if t_d is not None and t_s is not None:
        log(f"[{name}] dense {t_d:.2f}s sparse {t_s:.2f}s "
            f"-> {t_d/t_s:.3f}x")
        row["speedup"] = round(t_d / t_s, 3)
    return row


def main():
    import os
    ap = argparse.ArgumentParser()
    ap.add_argument('--scale',
                    default=os.environ.get('CHIPMUNK_HY_SCALE', 'small'))
    ap.add_argument('--steps', type=int, default=50)
    ap.add_argument('--trials', type=int, default=1)
    ap.add_argument('--side', default='both',
                    choices=['both', 'dense', 'sparse'])
    ap.add_argument('--loop', default='host',
                    choices=['host', 'compiled'])
    ap.add_argument('--chunk', type=int, default=None,
                    help='with --loop compiled: computed steps per '
                         'dispatch (the dev tunnel kills ~minute-plus '
                         'single dispatches; chunking keeps each window '
                         'short while amortizing the host residual)')
    ap.add_argument('--wq', default=None,
                    choices=['int4', 'int8', 'float8_e4m3fn'],
                    help='override the weight-quant dtype of the full* '
                         'presets (crash/perf bisection)')
    args = ap.parse_args()
    rows = []
    for name in args.scale.split(','):
        rows.append(bench_one(name.strip(), steps=args.steps,
                              trials=args.trials, side=args.side,
                              loop=args.loop, wq=args.wq,
                              chunk=args.chunk))
    print(json.dumps({"metric": "hunyuan_e2e_speedup_curve",
                      "reference_baseline":
                          "HunyuanVideo e2e 3.72x (README.md:87)",
                      "rows": rows}))


if __name__ == '__main__':
    main()
