"""3-D voxel token reordering and static local-attention masks for video.

Mirrors reference src/chipmunk/ops/voxel.py.  The reorder flattens a
(t, h, w) token grid so each voxel's tokens (e.g. 4x4x8 = 128) are
contiguous, with non-divisible tails appended raster-order — exactly
sequence-preserving (voxel.py:9-54).  The static mask gives every
query-voxel-group a local neighborhood cube plus the text tail
(voxel.py:206-304).

TPU notes: the reorder itself is data movement, done with one gather along
the token axis (permutation precomputed in numpy at trace time — it depends
only on shapes).  Default voxel shape is (4, 4, 8) = 128 tokens to match the
MXU-aligned query-group size, vs the reference's (4, 6, 8) = 192 (a
3x64-row-warpgroup artifact).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@lru_cache(maxsize=None)
def voxel_order(t: int, h: int, w: int,
                voxel_shape: Tuple[int, int, int] = (4, 4, 8)) -> np.ndarray:
    """Permutation p (length t*h*w): chunked_flat = raster_flat[p].

    Main region = full voxels in raster voxel order; tails (t-, h-, w-
    remainders) appended raster-order (reference voxel.py:14-54)."""
    vt, vh, vw = voxel_shape
    tf, hf, wf = (t // vt) * vt, (h // vh) * vh, (w // vw) * vw
    ids = np.arange(t * h * w).reshape(t, h, w)
    main = ids[:tf, :hf, :wf]
    main = main.reshape(tf // vt, vt, hf // vh, vh, wf // vw, vw)
    main = main.transpose(0, 2, 4, 1, 3, 5).reshape(-1)
    tails = [ids[tf:, :, :].reshape(-1),
             ids[:tf, hf:, :].reshape(-1),
             ids[:tf, :hf, wf:].reshape(-1)]
    return np.concatenate([main] + tails).astype(np.int32)


@lru_cache(maxsize=None)
def inverse_voxel_order(t: int, h: int, w: int,
                        voxel_shape: Tuple[int, int, int] = (4, 4, 8)
                        ) -> np.ndarray:
    p = voxel_order(t, h, w, voxel_shape)
    inv = np.empty_like(p)
    inv[p] = np.arange(p.shape[0], dtype=np.int32)
    return inv


def voxel_chunk_no_padding(x: jnp.ndarray,
                           voxel_shape: Tuple[int, int, int] = (4, 4, 8)
                           ) -> jnp.ndarray:
    """[b, ah, t, h, w, d] -> [b, ah, t*h*w, d] in voxel order
    (reference voxel.py:9-54)."""
    b, ah, t, h, w, d = x.shape
    p = jnp.asarray(voxel_order(t, h, w, voxel_shape))
    return x.reshape(b, ah, t * h * w, d)[:, :, p, :]


def reverse_voxel_chunk_no_padding(x_flat: jnp.ndarray, original_shape,
                                   voxel_shape: Tuple[int, int, int] = (4, 4, 8)
                                   ) -> jnp.ndarray:
    """Inverse (reference voxel.py:56-99)."""
    b, ah, t, h, w, d = original_shape
    inv = jnp.asarray(inverse_voxel_order(t, h, w, voxel_shape))
    return x_flat[:, :, inv, :].reshape(b, ah, t, h, w, d)


def voxel_tokens(x: jnp.ndarray, grid: Tuple[int, int, int], axis: int,
                 voxel_shape: Tuple[int, int, int] = (4, 4, 8)) -> jnp.ndarray:
    """Apply the voxel permutation along ``axis`` of any token-major tensor."""
    t, h, w = grid
    return jnp.take(x, jnp.asarray(voxel_order(t, h, w, voxel_shape)),
                    axis=axis)


def unvoxel_tokens(x: jnp.ndarray, grid: Tuple[int, int, int], axis: int,
                   voxel_shape: Tuple[int, int, int] = (4, 4, 8)) -> jnp.ndarray:
    t, h, w = grid
    return jnp.take(x, jnp.asarray(inverse_voxel_order(t, h, w, voxel_shape)),
                    axis=axis)


def _window_starts(n: int, span: int) -> np.ndarray:
    """For each base coordinate in [0, n): start of the length-``span``
    window centered on it, clamped in-bounds (equivalent to reference
    voxel.py offsets(), voxel.py:101-113, which builds a contiguous window of
    2*(l//2)+1 cells shifted to fit)."""
    span = min(span, n)
    r = span // 2
    return np.clip(np.arange(n) - r, 0, n - span)


def get_local_voxel_indices(full_shape: Tuple[int, int, int],
                            local_shape: Tuple[int, int, int]) -> np.ndarray:
    """For each voxel in the (t, h, w) voxel grid, the flat indices of the
    local neighborhood cube containing it (reference voxel.py:115-158).

    Returns int32 [t*h*w, span_t*span_h*span_w] where span = 2*(l//2)+1
    (clamped to the grid).  Note: the reference allocates (l+1) columns per
    dim and leaves unwritten entries 0 when l is odd; we size exactly —
    no spurious index-0 entries."""
    t, h, w = full_shape
    lt, lh, lw = local_shape
    if lt == 0 or lh == 0 or lw == 0:
        return np.zeros((t * h * w, 0), dtype=np.int32)
    st, sh, sw = (min(2 * (l // 2) + 1, n)
                  for l, n in zip((lt, lh, lw), (t, h, w)))
    ts = _window_starts(t, st)[:, None] + np.arange(st)[None, :]   # [t, st]
    hs = _window_starts(h, sh)[:, None] + np.arange(sh)[None, :]
    ws = _window_starts(w, sw)[:, None] + np.arange(sw)[None, :]
    # broadcast to [t, h, w, st, sh, sw] flat ids
    flat = (ts[:, None, None, :, None, None] * (h * w)
            + hs[None, :, None, None, :, None] * w
            + ws[None, None, :, None, None, :])
    return flat.reshape(t * h * w, st * sh * sw).astype(np.int32)


def get_local_indices_with_text(
    vid_shape: Tuple[int, int, int],
    txt_len: int,
    voxel_shape: Tuple[int, int, int] = (4, 4, 8),
    local_shape: Tuple[int, int, int] = (0, 0, 0),
    rk: float = 0.0,
    kv_tile_size: int = 128,
    rng: Optional[np.random.Generator] = None,
    full_tail_from_attn: bool = False,
    full_tail_to_attn: bool = False,
):
    """Build the static attention mask [n_query_groups, seq]
    (reference voxel.py:206-304):

      * every query group attends to all text tokens,
      * image query voxels attend to their local voxel cube,
      * tail query rows attend to the last ``local_size`` tokens,
      * text query rows attend to (almost) everything,
      * plus optional random columns (prob rk).

    Query group g covers tokens [g*voxel_size, (g+1)*voxel_size) of the
    voxel-reordered sequence.  Returns (mask bool [G, S], inds, counts)
    as numpy arrays — this runs once per generation at trace time.
    """
    tt, th, tw = vid_shape
    vt, vh, vw = voxel_shape
    lt, lh, lw = local_shape
    vid_seqlen = tt * th * tw
    seq = vid_seqlen + txt_len
    voxel_size = vt * vh * vw
    n_groups = _cdiv(seq, voxel_size)

    mask = np.zeros((n_groups, seq), dtype=bool)
    mask[:, vid_seqlen:] = True  # all queries -> text

    vtt, vth, vtw = tt // vt, th // vh, tw // vw
    n_img_voxels = vtt * vth * vtw
    local = get_local_voxel_indices((vtt, vth, vtw), (lt, lh, lw))
    if local.shape[1] > 0:
        # voxel-id mask -> token columns (each voxel spans voxel_size tokens)
        vox_mask = np.zeros((n_img_voxels, n_img_voxels), dtype=bool)
        np.put_along_axis(vox_mask, local, True, axis=1)
        tok_mask = np.repeat(vox_mask, voxel_size, axis=1)
        n_main = n_img_voxels * voxel_size
        if full_tail_to_attn:
            mask[:n_img_voxels, n_main:] = True
        mask[:n_img_voxels, :n_main] |= tok_mask

    pad0 = n_groups - n_img_voxels
    local_size = voxel_size * lt * lh * lw
    if local_size > 0 and pad0 > 0:
        # tail query rows attend to the trailing local_size tokens
        mask[n_img_voxels:, -local_size:] = True
    # text query rows attend to everything (rounded to kv tiles)
    n_text_rows = txt_len // voxel_size + 1
    mask[-n_text_rows:, -((seq // kv_tile_size) * kv_tile_size):] = True
    if full_tail_from_attn and pad0 > 0:
        mask[-pad0:, -((seq // kv_tile_size) * kv_tile_size):] = True
    if rk > 0:
        rng = rng or np.random.default_rng(0)
        rand = rng.random(mask.shape) < rk
        if full_tail_from_attn and pad0 > 0:
            rand[-pad0:, :] = False
        rand[-n_text_rows:, :] = False
        mask |= rand

    counts = mask.sum(axis=-1).astype(np.int32)
    counts = ((counts + kv_tile_size - 1) // kv_tile_size) * kv_tile_size
    counts = np.minimum(counts, seq)
    inds = np.argsort(~mask, axis=-1, kind='stable').astype(np.int32)
    return mask, inds, counts


def local_1d_window_mask(vid_seqlen: int, total_seqlen: int,
                         window_frac: float, qg: int = 128) -> np.ndarray:
    """Static 1-D local window: each query group attends to a window of
    ``window_frac * vid_seqlen`` tokens centered on it (reference
    modules/attn.py:48-64 local_1d_window)."""
    n_groups = -(-total_seqlen // qg)
    mask = np.zeros((n_groups, total_seqlen), dtype=bool)
    if window_frac <= 0:
        return mask
    w = int(window_frac * vid_seqlen)
    for g in range(vid_seqlen // qg):
        center = g * qg + qg // 2
        lo = max(0, center - w // 2)
        hi = min(vid_seqlen, center + w // 2)
        mask[g, lo:hi] = True
    return mask
