from .flux import (FluxModelConfig, init_flux_params, flux_forward,
                   FluxSparse, FluxState)
from . import sampling

__all__ = ['FluxModelConfig', 'init_flux_params', 'flux_forward',
           'FluxSparse', 'FluxState', 'sampling']
