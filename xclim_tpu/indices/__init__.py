"""Index functions (reference: xclim:src/xclim/indices/__init__.py)."""

# generic first: the reference exposes generic only as a submodule, so any
# name collision (extreme_temperature_range) must resolve to the specific
# family module, as in xclim.indices (xclim:indices/__init__.py:5-16)
from xclim_tpu.indices.generic import *  # noqa: F401,F403
from xclim_tpu.indices._simple import *  # noqa: F401,F403
from xclim_tpu.indices._agro import *  # noqa: F401,F403
from xclim_tpu.indices._anuclim import *  # noqa: F401,F403
from xclim_tpu.indices._hydrology import *  # noqa: F401,F403
from xclim_tpu.indices._synoptic import *  # noqa: F401,F403
from xclim_tpu.indices._threshold import *  # noqa: F401,F403
from xclim_tpu.indices._multivariate import *  # noqa: F401,F403
from xclim_tpu.indices import converters, generic  # noqa: F401
from xclim_tpu.indices.converters import *  # noqa: F401,F403
from xclim_tpu.indices import helpers, stats  # noqa: F401
from xclim_tpu.indices import fire  # noqa: F401
from xclim_tpu.indices.fire import *  # noqa: F401,F403
