from .comm import (collect_tokens, collect_heads, ulysses_attention,
                   make_mesh)

__all__ = ['collect_tokens', 'collect_heads', 'ulysses_attention',
           'make_mesh']
