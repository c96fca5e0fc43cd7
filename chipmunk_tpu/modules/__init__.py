from .attn import SparseDiffAttn, AttnState
from .mlp import SparseDiffMlp, MlpState

__all__ = ['SparseDiffAttn', 'AttnState', 'SparseDiffMlp', 'MlpState']
