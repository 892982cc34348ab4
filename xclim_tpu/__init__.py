"""xclim_tpu: a TPU-native climate-indicator framework.

A ground-up rebuild of the capabilities of Ouranosinc/xclim for TPU hardware:
host-side CF semantics (units, calendars, metadata) driving jit/Pallas device
kernels batched over the spatial grid, with `jax.sharding` replacing dask.
"""

__version__ = "0.1.0"

from xclim_tpu.core.options import set_options  # noqa: F401
from xclim_tpu.core.jit_wrapper import climjit, climjit_chain  # noqa: F401

from xclim_tpu.core import units  # noqa: F401
from xclim_tpu import indices  # noqa: F401
from xclim_tpu import indicators  # noqa: F401
from xclim_tpu.indicators import atmos, generic, land, seaIce  # noqa: F401
from xclim_tpu.core.indicator import build_indicator_module_from_yaml  # noqa: F401

# YAML virtual modules are built at import, like the reference
# (xclim:src/xclim/__init__.py:19-27)
import pathlib as _pathlib

_data_dir = _pathlib.Path(__file__).parent / "data"
for _yml in ("icclim", "anuclim", "cf"):
    _f = _data_dir / f"{_yml}.yml"
    if _f.exists():
        build_indicator_module_from_yaml(_f, name=_yml, mode="warn")
