"""HunyuanVideo-core e2e benchmark: sparse (attention top_keys=0.05 +
full-step schedule {0,1,10,40} + 25-step skip schedule, the reference's
operating point) vs dense, at reduced depth / reduced video so it fits one
chip.  The reference's headline is 3.72x (1030s -> 277s on H100,
README.md:87)."""
import json
import sys
import time

sys.path.insert(0, '/'.join(__file__.split('/')[:-2]))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from chipmunk_tpu.config import load_config, config_from_dict
from chipmunk_tpu.models.hunyuan import (HunyuanModelConfig, HunyuanModel,
                                         init_hunyuan_params)
from chipmunk_tpu.models.video_sampling import hunyuan_denoise_compiled
from chipmunk_tpu.models.sampling import get_schedule


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
    steps = 50
    import os
    scale = os.environ.get('CHIPMUNK_HY_SCALE', 'small')
    dims = {'small': (9, 48, 80), 'large': (13, 68, 120)}[scale]
    cfg = HunyuanModelConfig(
        latent_t=dims[0], latent_h=dims[1], latent_w=dims[2],
        depth_double=2, depth_single=4,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    log(f"img tokens: {cfg.img_len}, seq: {cfg.seq_len}")

    sparse_ck = load_config('configs/hunyuan-chipmunk.yml').replace(
        steps=steps)
    # first_n_dense scaled to reduced depth
    sparse_ck = config_from_dict(
        {'attn': {'first_n_dense_layers': 1}}, sparse_ck)
    dense_ck = config_from_dict({
        'steps': steps,
        'attn': {'is_enabled': False}, 'mlp': {'is_enabled': False},
        'step_caching': {'is_enabled': False},
    })

    params = init_hunyuan_params(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    lat = jax.random.normal(ks[0], (1, cfg.in_channels, cfg.latent_t,
                                    cfg.latent_h, cfg.latent_w), cfg.dtype)
    txt = jax.random.normal(ks[1], (1, cfg.txt_len, cfg.text_dim), cfg.dtype)
    y = jax.random.normal(ks[2], (1, cfg.vec_in_dim), cfg.dtype)
    ts = get_schedule(steps, cfg.img_len, shift=False)

    def run(ck, tag):
        model = HunyuanModel(cfg=cfg, ck=ck, use_kernels=on_tpu)
        t0 = time.perf_counter()
        out = hunyuan_denoise_compiled(model, params, lat, txt, y, ts)
        _ = float(np.asarray(out[0, 0, 0, 0, 0]))
        log(f"{tag}: warmup(+compile) {time.perf_counter()-t0:.1f}s")
        best = float('inf')
        for i in range(2):
            t0 = time.perf_counter()
            out = hunyuan_denoise_compiled(model, params, lat, txt, y, ts)
            _ = float(np.asarray(out[0, 0, 0, 0, 0]))
            dt = time.perf_counter() - t0
            log(f"{tag} trial {i}: {dt:.2f}s")
            best = min(best, dt)
        return best

    t_dense = run(dense_ck, 'dense')
    t_sparse = run(sparse_ck, 'sparse')
    speedup = t_dense / t_sparse
    log(f"dense {t_dense:.2f}s sparse {t_sparse:.2f}s -> {speedup:.2f}x")
    print(json.dumps({
        "metric": "hunyuan_core_e2e_speedup",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 3.72, 3),
        "detail": {"dense_s": round(t_dense, 2),
                   "sparse_s": round(t_sparse, 2),
                   "seq": cfg.seq_len, "steps": steps,
                   "reference": "HunyuanVideo 3.72x (README.md:87)"},
    }))


if __name__ == '__main__':
    main()
