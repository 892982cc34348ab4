"""Atmospheric indicators (reference: xclim:src/xclim/indicators/atmos/)."""

from xclim_tpu.indicators.atmos._precip import *  # noqa: F401,F403
from xclim_tpu.indicators.atmos._synoptic import *  # noqa: F401,F403
from xclim_tpu.indicators.atmos._temperature import *  # noqa: F401,F403
from xclim_tpu.indicators.atmos._wind import *  # noqa: F401,F403
