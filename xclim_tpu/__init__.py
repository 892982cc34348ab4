"""xclim_tpu: a TPU-native climate-indicator framework.

A ground-up rebuild of the capabilities of Ouranosinc/xclim for TPU hardware:
host-side CF semantics (units, calendars, metadata) driving jit/Pallas device
kernels batched over the spatial grid, with `jax.sharding` replacing dask.
"""

__version__ = "0.1.0"

from xclim_tpu.core.options import set_options  # noqa: F401
