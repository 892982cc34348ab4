"""Generic indicators (reference: xclim:src/xclim/indicators/generic/_stats.py)."""

from __future__ import annotations

from xclim_tpu.core.indicator import Indicator, ResamplingIndicator
from xclim_tpu.indices.generic import select_resample_op

__all__ = ["stats"]


class Generic(ResamplingIndicator):
    realm = "generic"


stats = Generic(
    identifier="stats",
    title="Statistic of the daily values for a given period",
    units="",
    long_name="{freq} {op} of daily values",
    description="{freq} {op} of daily values.",
    compute=select_resample_op,
)
