from .offload import (host_sharding, device_sharding, offload_to_host,
                      fetch_to_device, OffloadPolicy, DoubleBufferedLoader)
from .profiling import profile_region, StepTimer
from .checkpoint import save_pytree, load_pytree

__all__ = ['host_sharding', 'device_sharding', 'offload_to_host',
           'fetch_to_device', 'OffloadPolicy', 'DoubleBufferedLoader',
           'profile_region', 'StepTimer', 'save_pytree', 'load_pytree']
