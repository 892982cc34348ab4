"""Land indicators: snow & streamflow (reference: xclim:src/xclim/indicators/land/)."""

from xclim_tpu.indicators.land._snow import *  # noqa: F401,F403
from xclim_tpu.indicators.land._streamflow import *  # noqa: F401,F403
