"""chipmunk_tpu.kernels — Pallas TPU kernels (the equivalents of the
reference's csrc/ CUDA kernel inventory, SURVEY.md §2.2).

Every kernel has a pure-jnp twin in chipmunk_tpu.ops used as ground truth;
all kernels run under interpret mode on CPU for testing.
"""
from .flash_attention import dense_attn, dense_colsum_attn
from .csp_attention import csp_attn
from .csp_mlp import csp_mlp_mm1, csp_mlp_mm2, csp_mlp

__all__ = ['dense_attn', 'dense_colsum_attn', 'csp_attn',
           'csp_mlp_mm1', 'csp_mlp_mm2', 'csp_mlp']
