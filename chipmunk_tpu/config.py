"""Chipmunk-TPU configuration.

Schema parity with the reference's YAML config (reference:
src/chipmunk/util/config.py:4-81 — same key names, same defaults where they
make sense on TPU), but exposed as an immutable dataclass pytree passed
explicitly instead of a process-global mutable dict.  A module-level
``GLOBAL_CONFIG`` plus ``load_from_file`` is kept for CLI-edge drop-in
compatibility only.

TPU-specific deltas (documented, quality-neutral-by-design):
  * ``attn.mbm`` defaults to 128 (query-group size).  The reference uses 192
    (3 warpgroups x 64 rows, an SM90 artifact); 128 matches the MXU tile.
  * ``attn.kv_block`` / ``mlp.neuron_block``: gather granularity.  The
    reference gathers single KV rows / single neurons with per-row cp.async
    (csrc/common/memory/global_to_shared.cuh); on TPU we gather blocks via
    scalar-prefetched BlockSpec index maps so each gather is one DMA.
    ``kv_block=1`` / ``neuron_block=1`` recovers token/neuron granularity on
    the eager reference path.
  * ``counts_multiple_of`` defaults follow block granularity.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, FrozenSet, Optional

import yaml


def _freeze(x):
    if isinstance(x, (set, frozenset)):
        return frozenset(x)
    if isinstance(x, list):
        return tuple(x)
    return x


@dataclass(frozen=True)
class MlpConfig:
    is_enabled: bool = True
    # fp8 MLPs (reference quantize_fp8, src/chipmunk/modules/mlp_fp8.py):
    # load edges store MLP weights as fp8 QTensors
    # (modules/mlp_fp8.quant_spec_for_is_fp8) and SparseDiffMlp runs fc1
    # as an fp8 x fp8 dot with a dynamic input scale (f8_input_matmul)
    is_fp8: bool = False
    top_keys: float = 0.3
    random_keys: float = 0.05
    full_step_every: int = 10
    block_mask_cache: int = 2
    first_n_dense_layers: int = 2
    # kernel-coupled (reference config.py:22-25)
    counts_multiple_of: int = 256
    # token block sharing one neuron set ([bm,1] pattern).  128 = reference
    # default; large values (512-1024) are the TPU perf lever: weight
    # gathers amortize over the whole VMEM-resident token chunk (see
    # kernels/csp_mlp.py).  Must divide the (padded) token count.
    bm: int = 128
    mbm: int = 128          # block-mean group size
    # TPU-only: neuron gather granularity (neurons per gathered weight
    # block).  128 = one MXU tile per gather (the BlockSpec kernel path
    # requires >= 128; finer granularity falls back to the eager path)
    neuron_block: int = 128
    # TPU-only: cap on selected neuron blocks (static shape); fraction of N
    max_selected_frac: float = 0.5
    # TPU-only: storage dtype for the [T, N] activation cache — the largest
    # chipmunk cache (e.g. 'float8_e4m3fn' halves it vs bf16 at a small,
    # measured quality cost; see utils/quant.py).  None = model dtype.
    act_cache_dtype: Optional[str] = None
    # TPU-only: storage dtype for the [T, C] output cache.  fp8 here is
    # more aggressive than for act_cache (the cache accumulates sparse
    # deltas between full refreshes) — measure with scripts/quality_eval.
    out_cache_dtype: Optional[str] = None
    # TPU-only: run the sparse-step matmuls on the MXU's ~1.7x-rate int8
    # path with per-token-row dynamically quantized activations (the TPU
    # analogue of the reference's fp8 Triton mm1, triton/csp_mlp_mm1.py).
    # Requires int8/int4 QTensor weights (quantized_residency int8/int4);
    # quality deltas measured by scripts/quality_eval.
    int8_act: bool = False


@dataclass(frozen=True)
class AttnConfig:
    is_enabled: bool = True
    top_keys: float = 0.05
    random_keys: float = 0.01
    local_voxels: int = 0
    local_1d_window: float = 0.0
    first_n_dense_layers: int = 2
    full_step_every: int = 10
    full_step_schedule: Optional[FrozenSet[int]] = None
    recompute_mask: bool = True
    should_compress_indices: bool = True
    # TPU-only: with compressed indices, ALSO keep the materialized
    # (inds, counts) in the state as a deterministic cache of the packed
    # mask — skips the bitunpack+top_k rebuild on every consuming step
    # (~10ms/layer at Wan scale, results/profile_wan_lv3*.log).  None =
    # auto: True unless the model offloads attn indices (packed is the
    # 8x-smaller transfer unit the compression exists for)
    materialize_indices: Optional[bool] = None
    # kernel-coupled (reference config.py:50-53)
    counts_multiple_of: int = 128
    pad_qkv_before_kernel: bool = True
    mbm: int = 128          # query-group size (reference: 192)
    # TPU-only: KV gather granularity (tokens per gathered KV block).
    # 128 = full-tile DMAs; down to 8 for near-token selection granularity
    kv_block: int = 128
    # TPU-only: cap on selected KV fraction (static shapes); 1.0 = no cap
    max_selected_frac: float = 0.5
    # TPU-only cost gate: when the per-group selection capacity (jmax)
    # reaches this fraction of the KV blocks, column-sparse delta
    # attention cannot beat dense on TPU (measured at Wan's operating
    # point, S=32k/59% selection: csp 65ms HBM / 44ms VMEM vs 44ms dense
    # — gather duplication + delta-cache IO eat the FLOP ratio), so the
    # layer falls back to exact dense attention every step.  The
    # reference's per-group gate (modules/attn.py:67) only fires when
    # static+topk covers the ENTIRE sequence; on H100 its L2-backed
    # gathers tolerate dense-ish selections, TPU DMA gathers do not.
    # 1.0 disables the gate.
    dense_fallback_frac: float = 0.45
    # TPU-only: storage dtype for the [B,H,S,D] attention output cache.
    # None = model dtype.
    out_cache_dtype: Optional[str] = None


@dataclass(frozen=True)
class PatchifyConfig:
    is_enabled: bool = True
    chunk_size_1: int = 8
    chunk_size_2: int = 4


@dataclass(frozen=True)
class OffloadingConfig:
    """Which per-layer cache tensors live in host memory (reference
    config.py:55-70).  Keys match the reference's dotted names."""
    global_disable_offloading: bool = False
    mlp_out_cache: bool = False
    mlp_indices: bool = False
    mlp_counts: bool = False
    mlp_sparse_act_T: bool = False
    mlp_blockmean_mid_cache: bool = False
    attn_out_cache: bool = True
    attn_indices: bool = True
    attn_counts: bool = False
    attn_lse_constants: bool = False
    text_encoders: bool = True


@dataclass(frozen=True)
class StepCachingConfig:
    is_enabled: bool = True
    skip_step_schedule: FrozenSet[int] = frozenset(
        {7, 11, 13, 14, 15, 17, 18, 19, 21, 22, 23, 25, 26, 27, 29,
         31, 33, 34, 35, 37, 38, 39, 41, 42, 43})


@dataclass(frozen=True)
class ChipmunkConfig:
    num_model_invocations_per_inference_step: int = 1
    should_profile: bool = False
    generation_index: int = 0
    steps: int = 50
    world_size: int = 1
    mlp: MlpConfig = field(default_factory=MlpConfig)
    attn: AttnConfig = field(default_factory=AttnConfig)
    patchify: PatchifyConfig = field(default_factory=PatchifyConfig)
    offloading: OffloadingConfig = field(default_factory=OffloadingConfig)
    step_caching: StepCachingConfig = field(default_factory=StepCachingConfig)

    def replace(self, **kw) -> "ChipmunkConfig":
        return dataclasses.replace(self, **kw)


_DOTTED = {  # reference offloading keys use dots; dataclass fields use underscores
    'mlp.out_cache': 'mlp_out_cache', 'mlp.indices': 'mlp_indices',
    'mlp.counts': 'mlp_counts', 'mlp.sparse_act_T': 'mlp_sparse_act_T',
    'mlp.blockmean_mid_cache': 'mlp_blockmean_mid_cache',
    'attn.out_cache': 'attn_out_cache', 'attn.indices': 'attn_indices',
    'attn.counts': 'attn_counts', 'attn.lse_constants': 'attn_lse_constants',
}


def _merge_dataclass(dc, updates: Dict[str, Any]):
    kw = {}
    names = {f.name for f in dataclasses.fields(dc)}
    for k, v in updates.items():
        k = _DOTTED.get(k, k)
        if k not in names:
            raise KeyError(f"unknown config key {k!r} for {type(dc).__name__}")
        cur = getattr(dc, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            kw[k] = _merge_dataclass(cur, v)
        else:
            kw[k] = _freeze(v)
    return dataclasses.replace(dc, **kw)


def config_from_dict(d: Dict[str, Any],
                     base: Optional[ChipmunkConfig] = None) -> ChipmunkConfig:
    """Deep-merge a (possibly partial, YAML-shaped) dict onto ``base``.

    Mirrors the reference's ``_deep_update`` (util/config.py:91-97) but
    produces an immutable config.
    """
    return _merge_dataclass(base or ChipmunkConfig(), d or {})


def load_config(path: str, base: Optional[ChipmunkConfig] = None) -> ChipmunkConfig:
    """Load a chipmunk-config.yml (reference util/config.py:99-107)."""
    with open(path) as f:
        y = yaml.safe_load(f)
    return config_from_dict(y or {}, base)


# ---------------------------------------------------------------------------
# CLI-edge mutable global, for drop-in parity with the reference's
# ``GLOBAL_CONFIG`` / ``load_from_file``.  Library code never reads this; it
# exists so example CLIs can mimic the reference's flow.
# ---------------------------------------------------------------------------
GLOBAL_CONFIG: ChipmunkConfig = ChipmunkConfig()


def load_from_file(path: str) -> ChipmunkConfig:
    global GLOBAL_CONFIG
    GLOBAL_CONFIG = load_config(path, GLOBAL_CONFIG)
    return GLOBAL_CONFIG


def set_global_config(cfg: ChipmunkConfig) -> None:
    global GLOBAL_CONFIG
    GLOBAL_CONFIG = cfg
