"""chipmunk_tpu — TPU-native dynamic-sparsity inference accelerator for
diffusion transformers.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
sandyresearch/chipmunk (training-free column-sparse delta attention + MLP,
step caching, voxel/patch token reordering, host offload, Ulysses head
parallelism) designed for TPU: MXU-aligned [128,1] sparsity patterns,
scalar-prefetch gather kernels, explicit cache pytrees instead of mutable
singletons, and XLA collectives over device meshes.
"""
from . import config, schedule, ops
from .config import ChipmunkConfig, load_config, config_from_dict

__version__ = "0.1.0"
