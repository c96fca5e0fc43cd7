"""chipmunk_tpu.ops — op-level API.

Mirrors the reference's ``chipmunk.ops`` surface (reference:
src/chipmunk/ops/__init__.py:1-8) with pure-jnp implementations that are the
numerical ground truth for the Pallas kernels in ``chipmunk_tpu.kernels``.
"""
from .attn_ref import (
    dense_attn_ref,
    dense_colsum_attn_ref,
    csp_attn_ref,
    csp_block_attn_ref,
    attn_scale,
    LOG2E,
)
from .mlp_ref import block_mean, csp_mlp_ref, dense_mlp_ref
from .indexing import (
    merge_indices,
    scatter_add,
    topk_mask,
    random_and_topk_mask,
    mask_to_indices,
    topk_indices,
    copy_indices,
    blockify_scores,
)
from .bitpack import (bitpack, bitunpack, bitpack_rows,
                      bitunpack_rows)
from .patch import patchify, unpatchify, patchify_rope
from .voxel import (
    voxel_chunk_no_padding,
    reverse_voxel_chunk_no_padding,
    get_local_voxel_indices,
    get_local_indices_with_text,
    local_1d_window_mask,
)

__all__ = [
    'dense_attn_ref', 'dense_colsum_attn_ref', 'csp_attn_ref',
    'csp_block_attn_ref', 'attn_scale', 'LOG2E',
    'block_mean', 'csp_mlp_ref', 'dense_mlp_ref',
    'merge_indices', 'scatter_add', 'topk_mask', 'random_and_topk_mask', 'mask_to_indices', 'topk_indices',
    'copy_indices', 'blockify_scores',
    'bitpack', 'bitunpack', 'bitpack_rows', 'bitunpack_rows',
    'patchify', 'unpatchify', 'patchify_rope',
    'voxel_chunk_no_padding', 'reverse_voxel_chunk_no_padding',
    'get_local_voxel_indices', 'get_local_indices_with_text',
    'local_1d_window_mask',
]
