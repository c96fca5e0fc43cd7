from .comm import (collect_tokens, collect_heads, ulysses_attention,
                   make_mesh)
from .ring import ring_attention, usp_attention
from .sharding import fsdp_shardings, shard_params

__all__ = ['collect_tokens', 'collect_heads', 'ulysses_attention',
           'make_mesh', 'ring_attention', 'usp_attention',
           'fsdp_shardings', 'shard_params']
