"""Host-offloaded, layer-chunked FLUX-core forward.

TPU-native rebuild of the reference's per-layer cache offload pipeline
(reference: hunyuan models.py:796-828, flux model.py:115-127,
offloaded_tensor.py:90-178 — PIPELINE_DEPTH=2 sliding window of GPU slots,
async copies on dedicated streams).  Here the layer loop is decomposed into
**layer-chunk programs**: per-layer cache state lives host-side
(memory_kind "pinned_host") split into C chunks along the layer axis; the
host loop fetches chunk i+1 asynchronously while chunk i computes and pushes
chunk i's updated state back — `jax.device_put` is the stream.  Device cache
residency drops from O(L) to O(L/C + prefetch window), which is what lets
video-scale footprints (44GB of attention caches at HunyuanVideo's 119k
sequence, SURVEY.md §5) exceed HBM.

Which tensors go host-side follows the reference's `offloading:` config
block (util/config.py:55-70 → config.OffloadingConfig → OffloadPolicy):
non-offloaded leaves stay device-resident inside the same chunk structure.

Correctness contract: a streamed run is BIT-IDENTICAL to the resident
`flux_forward` — same block math, same keys, same state updates (test:
tests/test_streamed_forward.py).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.offload import OffloadPolicy, offload_to_host, fetch_to_device
from .flux import (FluxModelConfig, FluxSparse, FluxState, FluxStep,
                   double_block, single_block, flux_embed, flux_final,
                   _tree_at, _tree_put_changed)

def _host_flags(policy: OffloadPolicy):
    """Per-field host-placement flags for an (AttnState, MlpState) chunk —
    explicit field mapping, not path-name sniffing (NamedTuple key paths
    don't carry field names reliably).  ``packed`` follows attn_indices:
    it IS the compressed index storage."""
    from ..modules import AttnState, MlpState
    a = AttnState(out_cache=policy.wants_host('attn_out_cache'),
                  lse=policy.wants_host('attn_lse'),
                  inds=policy.wants_host('attn_indices'),
                  counts=policy.wants_host('attn_counts'),
                  packed=policy.wants_host('attn_indices'))
    m = MlpState(out_cache=policy.wants_host('mlp_out_cache'),
                 act_cache=policy.wants_host('mlp_act_cache'),
                 bm_mid=policy.wants_host('mlp_bm_mid'),
                 inds=policy.wants_host('mlp_indices'),
                 counts=policy.wants_host('mlp_counts'))
    return (a, m)


def _placed_flags(tree, flags, to_host: bool):
    """Place ``tree`` leaves host/device per boolean ``flags`` with ONE
    batched device_put call — per-leaf dispatches are RPC round trips on
    tunneled backends."""
    from ..utils.offload import host_sharding, device_sharding
    shardings = jax.tree_util.tree_map(
        lambda x, f: (host_sharding(x) if (to_host and f)
                      else device_sharding(x)), tree, flags)
    return jax.device_put(tree, shardings)


def _placed(tree, policy: OffloadPolicy, to_host: bool):
    """Move policy-selected leaves of an (AttnState, MlpState) chunk
    host-side (or back)."""
    return _placed_flags(tree, _host_flags(policy), to_host)


def _retain(old_tree, new_tree, flags):
    """Keep the still-valid HOST copies of an unmutated family (skipping
    the D2H writeback entirely); leaves that never left the device must
    take the program's fresh output — their fetched copy was donated."""
    def pick(old, new, f):
        try:
            on_host = old.sharding.memory_kind == 'pinned_host'
        except Exception:
            on_host = False
        return old if (f and on_host) else new
    return jax.tree_util.tree_map(pick, old_tree, new_tree, flags)


def _chunk(tree, n: int) -> List:
    L = jax.tree_util.tree_leaves(tree)[0].shape[0]
    assert L % n == 0, (L, n)
    c = L // n
    return [jax.tree_util.tree_map(lambda x: x[i * c:(i + 1) * c], tree)
            for i in range(n)]


@dataclass
class StreamedFluxState:
    """FluxState split into per-chunk pytrees with policy-selected leaves
    host-resident between steps."""
    double: List            # list of (AttnState, MlpState) chunk pairs
    single: List
    policy: OffloadPolicy

    @staticmethod
    def create(state: FluxState, n_chunks_double: int, n_chunks_single: int,
               policy: OffloadPolicy) -> "StreamedFluxState":
        dbl = [_placed(c, policy, True)
               for c in _chunk((state.double_attn, state.double_mlp),
                               n_chunks_double)]
        sgl = [_placed(c, policy, True)
               for c in _chunk((state.single_attn, state.single_mlp),
                               n_chunks_single)]
        return StreamedFluxState(double=dbl, single=sgl, policy=policy)

    @staticmethod
    def create_hostwise(sp, model_cfg, B: int, n_chunks_double: int,
                        n_chunks_single: int,
                        policy: OffloadPolicy) -> "StreamedFluxState":
        """Build the chunked state WITHOUT ever materializing the full
        device-resident FluxState: a full-depth video model's cache
        state exceeds HBM — which is the reason streaming exists — so
        ``create(sp.init_state(...))`` OOMs before the first offload.
        Each chunk is built from the single-layer init values
        (broadcast host-side) and placed per policy directly."""
        import numpy as np
        from ..utils.offload import (host_sharding, device_sharding,
                                     chunked_device_put)
        H, D = model_cfg.num_heads, model_cfg.head_dim
        flags = _host_flags(policy)

        def build(n_chunks, depth, pair):
            assert depth % n_chunks == 0, (depth, n_chunks)
            c = depth // n_chunks
            pair_np = jax.tree_util.tree_map(np.asarray, pair)

            def mk(x, f):
                arr = np.broadcast_to(x, (c,) + x.shape)
                return chunked_device_put(
                    arr, host_sharding(x) if f else device_sharding(x))

            return [jax.tree_util.tree_map(mk, pair_np, flags)
                    for _ in range(n_chunks)]

        dbl = build(n_chunks_double, model_cfg.depth,
                    (sp.attn_d.init_state(B, H, D, model_cfg.dtype),
                     sp.mlp_d.init_state(model_cfg.dtype)))
        sgl = build(n_chunks_single, model_cfg.depth_single_blocks,
                    (sp.attn_s.init_state(B, H, D, model_cfg.dtype),
                     sp.mlp_s.init_state(model_cfg.dtype)))
        return StreamedFluxState(double=dbl, single=sgl, policy=policy)

    def gather(self) -> FluxState:
        """Reassemble a device-resident FluxState (for tests/checkpoints)."""
        def cat(chunks):
            fetched = [_placed(c, self.policy, False) for c in chunks]
            return jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, 0), *fetched)
        da, dm = cat(self.double)
        sa, sm = cat(self.single)
        return FluxState(double_attn=da, double_mlp=dm,
                         single_attn=sa, single_mlp=sm)


@dataclass
class StreamedFluxRunner:
    """Compiled layer-chunk programs + the PIPELINE_DEPTH=2 host loop.

    One jitted program per (stage, step-kind); every chunk of a stage
    reuses the same compiled program (equal shapes), with the global layer
    offset arriving as an argument array.
    """
    cfg: FluxModelConfig
    sp: FluxSparse
    n_chunks_double: int = 1
    n_chunks_single: int = 2
    prefetch_depth: int = 2
    # chunks [0, resident_chunks) of each stage stay device-resident
    # across steps: their (re)fetch + writeback round trip is pure
    # latency on the critical path at every step, and keeping one chunk
    # on device costs only 1/n of the cache footprint.
    resident_chunks: int = 1
    _progs: Dict = field(default_factory=dict)
    _idx0: Dict = field(default_factory=dict)
    _window: Dict = field(default_factory=dict)

    def _prog(self, stage: str, step: FluxStep):
        """Per-(stage, step-kind) jitted layer-chunk program.  The FULL
        stacked params are passed in and per-layer params are gathered
        in-program with dynamic_index (``_tree_at``) — chunking the param
        pytree host-side would dispatch O(leaves x chunks) slice programs
        per denoise step and duplicate the whole param footprint."""
        sig = (stage, step.full_attn, step.full_mlp, step.colsum,
               step.recompute_mlp_mask, min(step.index, 2))
        if sig in self._progs:
            return self._progs[sig]
        cfg, sp = self.cfg, self.sp

        if stage == 'double':
            def prog(p_stack, img, txt, vec, cos, sin, st_chunk, idx0, key,
                     _step=step):
                attn, mlp = st_chunk

                def body(carry, i):
                    img, txt, attn, mlp = carry
                    idx = idx0 + i
                    a0, m0 = _tree_at(attn, i), _tree_at(mlp, i)
                    img, txt, a2, m2 = double_block(
                        cfg, sp, _tree_at(p_stack, idx), img, txt, vec,
                        cos, sin,
                        a0, m0, idx, _step,
                        jax.random.fold_in(key, idx))
                    return (img, txt, _tree_put_changed(attn, a0, a2, i),
                            _tree_put_changed(mlp, m0, m2, i)), None

                n = jax.tree_util.tree_leaves(attn)[0].shape[0]
                (img, txt, attn, mlp), _ = jax.lax.scan(
                    body, (img, txt, attn, mlp), jnp.arange(n))
                return img, txt, (attn, mlp)
            jp = jax.jit(prog, donate_argnums=(6,))
        else:
            def prog(p_stack, x, vec, cos, sin, st_chunk, idx0, key,
                     _step=step):
                attn, mlp = st_chunk

                def body(carry, i):
                    x, attn, mlp = carry
                    idx = idx0 + i
                    a0, m0 = _tree_at(attn, i), _tree_at(mlp, i)
                    x, a2, m2 = single_block(
                        cfg, sp, _tree_at(p_stack, idx), x, vec, cos, sin,
                        a0, m0, idx, _step,
                        jax.random.fold_in(key, idx))
                    return (x, _tree_put_changed(attn, a0, a2, i),
                            _tree_put_changed(mlp, m0, m2, i)), None

                n = jax.tree_util.tree_leaves(attn)[0].shape[0]
                (x, attn, mlp), _ = jax.lax.scan(
                    body, (x, attn, mlp), jnp.arange(n))
                return x, (attn, mlp)
            jp = jax.jit(prog, donate_argnums=(5,))
        self._progs[sig] = jp
        return jp

    def _idx_const(self, v: int):
        if v not in self._idx0:
            self._idx0[v] = jnp.int32(v)
        return self._idx0[v]

    def forward(self, params: Dict, st: StreamedFluxState,
                img, txt, timesteps, y, pe, step: FluxStep,
                guidance=None, key: Optional[jax.Array] = None):
        """Streamed equivalent of flux_forward.  Mutates ``st`` chunks
        in place; returns the prediction."""
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(0)
        kd, ks_, _ = jax.random.split(key, 3)
        cos, sin = pe
        if 'embed' not in self._progs:
            self._progs['embed'] = jax.jit(flux_embed, static_argnums=(1,))
            self._progs['final'] = jax.jit(flux_final, static_argnums=(1,))
        img, txt, vec = self._progs['embed'](
            params, cfg, img, txt, timesteps, y, guidance)

        pol = st.policy

        # Which state families can this step kind mutate?  Sparse
        # attention steps only READ AttnState (o = out_cache + delta;
        # out_cache/lse/indices refresh exclusively on full steps) —
        # writing an unchanged multi-GB chunk back to host every step
        # is what sank the first full-depth streamed measurement
        # (0.63x vs dense).  MLP state (act/out caches) accumulates on
        # every computed step when MLP sparsity is on.
        sp = self.sp
        attn_mut = bool(step.full_attn)
        mlp_mut = {'double': sp.mlp_d.cfg.is_enabled,
                   'single': sp.mlp_s.cfg.is_enabled}
        attn_on = {'double': sp.attn_d.cfg.is_enabled,
                   'single': sp.attn_s.cfg.is_enabled}

        def run_stage(chunks, p_stack, stage, state_io, kstage):
            n = len(chunks)
            res = min(self.resident_chunks, n - 1) if n > 1 else n
            layers_per = (cfg.depth if stage == 'double'
                          else cfg.depth_single_blocks) // n
            prog = self._prog(stage, step)
            a_mut = attn_mut and attn_on[stage]
            m_mut = mlp_mut[stage]
            window = self._window.setdefault(stage, {})
            for j in range(min(self.prefetch_depth, n)):
                if j not in window:
                    window[j] = _placed(chunks[j], pol, False)
            for i in range(n):
                dev_chunk = window.pop(i)
                nxt = i + self.prefetch_depth - 1
                if nxt < n and nxt not in window:
                    window[nxt] = _placed(chunks[nxt], pol, False)
                idx0 = self._idx_const(i * layers_per)
                if stage == 'double':
                    a, b, new_chunk = prog(p_stack, state_io[0],
                                           state_io[1], vec, cos, sin,
                                           dev_chunk, idx0, kstage)
                    state_io = (a, b)
                else:
                    a, new_chunk = prog(p_stack, state_io, vec, cos,
                                        sin, dev_chunk, idx0, kstage)
                    state_io = a
                if i < res:
                    # resident chunk: stays on device; next step's window
                    # entry is the fresh output — no host round trip.
                    chunks[i] = new_chunk
                    window[i] = new_chunk
                else:
                    na, nm = new_chunk
                    oa, om = chunks[i]
                    fa, fm = _host_flags(pol)
                    chunks[i] = (
                        _placed_flags(na, fa, True) if a_mut
                        else _retain(oa, na, fa),
                        _placed_flags(nm, fm, True) if m_mut
                        else _retain(om, nm, fm))
            return state_io

        img, txt = run_stage(st.double, params['double'], 'double',
                             (img, txt), kd)
        x = (jnp.concatenate([txt, img], axis=1) if cfg.txt_first
             else jnp.concatenate([img, txt], axis=1))
        x = run_stage(st.single, params['single'], 'single', x, ks_)
        return self._progs['final'](params, cfg, x, vec)
