"""Generic indicators (reference: xclim:src/xclim/indicators/generic/_stats.py)."""

from __future__ import annotations

from xclim_tpu.core.indicator import Indicator, ResamplingIndicator
from xclim_tpu.indices.generic import select_resample_op



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


class GenericReducing(Indicator):
    realm = "generic"
    missing = "skip"


def _fit_compute(da, dist="norm", method="ML", **fitkwargs):
    from xclim_tpu.indices.stats import fit as _fit

    return _fit(da, dist=dist, method=method, **fitkwargs)


def _return_level_compute(da, mode="max", t=20, dist="genextreme", window=1,
                          freq="YS", method="PWM", **indexer):
    from xclim_tpu.indices.stats import frequency_analysis

    return frequency_analysis(da, mode=mode, t=t, dist=dist, window=window,
                              freq=freq, method=method, **indexer)


fit = GenericReducing(
    identifier="fit",
    title="Distribution parameters fitted over the time dimension",
    units="",
    long_name="{dist} distribution parameters",
    description="Parameters of the {dist} distribution fitted over the time "
                "dimension.",
    compute=_fit_compute,
)

return_level = GenericReducing(
    identifier="return_level",
    title="Return level from frequency analysis",
    units="",
    long_name="{mode} return level for {t}-year return periods",
    description="Return levels of block {mode}ima for {t}-year return periods, "
                "from a {dist} fit.",
    compute=_return_level_compute,
)

__all__ = ["stats", "fit", "return_level"]
