from .comm import (collect_tokens, collect_heads, ulysses_attention,
                   make_mesh)
from .sharding import fsdp_shardings, shard_params

__all__ = ['collect_tokens', 'collect_heads', 'ulysses_attention',
           'make_mesh', 'fsdp_shardings', 'shard_params']
