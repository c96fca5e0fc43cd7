from .offload import (host_sharding, device_sharding, offload_to_host,
                      fetch_to_device, OffloadPolicy, DoubleBufferedLoader)
from .profiling import profile_region, StepTimer

__all__ = ['host_sharding', 'device_sharding', 'offload_to_host',
           'fetch_to_device', 'OffloadPolicy', 'DoubleBufferedLoader',
           'profile_region', 'StepTimer']
