"""Data quality flags (reference: xclim:src/xclim/core/dataflags.py, 851 LoC).

Registry of per-variable QC heuristics evaluated on device; ``data_flags``
drives them and aggregates, ``ecad_compliant`` bundles the ECA&D set.
"""

from __future__ import annotations

import inspect

import jax.numpy as jnp
import numpy as np

from xclim_tpu.core._exceptions import raise_warn_or_log
from xclim_tpu.core.dataarray import ClimArray, ClimDataset
from xclim_tpu.core.units import convert_units_to, declare_units, str2pint
from xclim_tpu.core.variables import VARIABLES
from xclim_tpu.indices.generic import binary_ops, get_op
from xclim_tpu.indices.run_length import suspicious_run
from xclim_tpu.ops.segments import rolling_reduce

__all__ = [
    "DataQualityException",
    "data_flags",
    "ecad_compliant",
    "negative_accumulation_values",
    "outside_n_standard_deviations_of_climatology",
    "percentage_values_outside_of_bounds",
    "register_methods",
    "tas_below_tasmin",
    "tas_exceeds_tasmax",
    "tasmax_below_tasmin",
    "temperature_extremely_high",
    "temperature_extremely_low",
    "values_op_thresh_repeating_for_n_or_more_days",
    "values_repeating_for_n_or_more_days",
    "very_large_precipitation_events",
    "wind_values_outside_of_bounds",
]

_REGISTRY: dict[str, tuple] = {}


class DataQualityException(Exception):
    """Raised when any data-quality flag is raised (xclim:core/dataflags.py:32)."""

    def __init__(self, flag_array: ClimDataset, message="Data quality flags indicate suspicious values. Flags raised are:\n  - "):
        self.flags = []
        for name, da in flag_array.items():
            if bool(np.asarray(da.values).any()):
                self.flags.append(da.attrs.get("description", name))
        super().__init__(message + "\n  - ".join(self.flags))


def register_methods(variable_name: str | None = None):
    """Register a data-flag check (xclim:core/dataflags.py:87)."""

    def dec(func):
        _REGISTRY[func.__name__] = (func, variable_name)
        return func

    return dec


def _flag(da: ClimArray, data, name: str, description: str) -> ClimArray:
    out = da.copy(data=data)
    out.attrs = {"description": description, "units": ""}
    out.name = name
    return out


@register_methods()
@declare_units(tasmax="[temperature]", tasmin="[temperature]")
def tasmax_below_tasmin(tasmax: ClimArray, tasmin: ClimArray) -> ClimArray:
    """tasmax < tasmin anywhere (xclim:core/dataflags.py:127)."""
    tn = convert_units_to(tasmin, tasmax)
    return _flag(tasmax, tasmax.data < tn.data, "tasmax_below_tasmin",
                 "Maximum temperature values found below minimum temperatures.")


@register_methods()
@declare_units(tas="[temperature]", tasmax="[temperature]")
def tas_exceeds_tasmax(tas: ClimArray, tasmax: ClimArray) -> ClimArray:
    """tas > tasmax (xclim:core/dataflags.py:164)."""
    tx = convert_units_to(tasmax, tas)
    return _flag(tas, tas.data > tx.data, "tas_exceeds_tasmax",
                 "Mean temperature values found above maximum temperatures.")


@register_methods()
@declare_units(tas="[temperature]", tasmin="[temperature]")
def tas_below_tasmin(tas: ClimArray, tasmin: ClimArray) -> ClimArray:
    """tas < tasmin (xclim:core/dataflags.py:201)."""
    tn = convert_units_to(tasmin, tas)
    return _flag(tas, tas.data < tn.data, "tas_below_tasmin",
                 "Mean temperature values found below minimum temperatures.")


@register_methods()
@declare_units(da="[temperature]", thresh="[temperature]")
def temperature_extremely_low(da: ClimArray, *, thresh: str = "-90 degC") -> ClimArray:
    """T < -90°C (xclim:core/dataflags.py:235)."""
    t = convert_units_to(str2pint(thresh), da)
    return _flag(da, da.data < t, "temperature_extremely_low",
                 f"Temperatures found below {thresh}.")


@register_methods()
@declare_units(da="[temperature]", thresh="[temperature]")
def temperature_extremely_high(da: ClimArray, *, thresh: str = "60 degC") -> ClimArray:
    """T > 60°C (xclim:core/dataflags.py:272)."""
    t = convert_units_to(str2pint(thresh), da)
    return _flag(da, da.data > t, "temperature_extremely_high",
                 f"Temperatures found in excess of {thresh}.")


@register_methods()
def negative_accumulation_values(da: ClimArray) -> ClimArray:
    """Negative values in an accumulation variable (xclim:core/dataflags.py:308)."""
    return _flag(da, da.data < 0, "negative_accumulation_values",
                 "Negative values found for accumulation variable.")


@register_methods()
@declare_units(da="[precipitation]", thresh="[precipitation]")
def very_large_precipitation_events(da: ClimArray, *, thresh: str = "300 mm d-1") -> ClimArray:
    """Precipitation above 300 mm/day (xclim:core/dataflags.py:342)."""
    t = convert_units_to(str2pint(thresh), da, context="hydro")
    return _flag(da, da.data > t, "very_large_precipitation_events",
                 f"Precipitation events in excess of {thresh}.")


@register_methods("values_{op}_{thresh}_repeating_for_{n}_or_more_days")
def values_op_thresh_repeating_for_n_or_more_days(da: ClimArray, *, n: int,
                                                  thresh: str,
                                                  op: str = "==") -> ClimArray:
    """Runs of n+ identical values satisfying ``value op thresh``
    (xclim:core/dataflags.py:377-416 — the reference detects identical-value
    runs first and filters them by the threshold comparison)."""
    t = convert_units_to(str2pint(thresh), da, context="infer")
    out = suspicious_run(da, window=n, op=op, thresh=t)
    return _flag(da, out.data, "values_op_thresh_repeating",
                 f"Repetitive values at {thresh} for at least {n} days found.")


@register_methods()
@declare_units(da="[speed]", lower="[speed]", upper="[speed]")
def wind_values_outside_of_bounds(da: ClimArray, *, lower: str = "0 m s-1",
                                  upper: str = "46 m s-1") -> ClimArray:
    """Wind outside [0, 46 m/s] (xclim:core/dataflags.py:422)."""
    lo = convert_units_to(str2pint(lower), da)
    hi = convert_units_to(str2pint(upper), da)
    return _flag(da, (da.data < lo) | (da.data > hi), "wind_values_outside_of_bounds",
                 f"Wind speeds found outside of [{lower}, {upper}].")


@register_methods("outside_{n}_standard_deviations_of_climatology")
def outside_n_standard_deviations_of_climatology(da: ClimArray, *, n: int,
                                                 window: int = 5) -> ClimArray:
    """|x − doy-climatology mean| > n·σ (xclim:core/dataflags.py:466)."""
    from xclim_tpu.core.percentiles import doy_quantile_gather, resample_doy
    from xclim_tpu.core.calendar import max_doy

    g, doys, _ = doy_quantile_gather(da, window)
    mu = jnp.nanmean(g, axis=1)
    sd = jnp.nanstd(g, axis=1)
    space_dims = tuple(d for d in da.dims if d != "time")
    coords = {k: v for k, v in da.coords.items() if k in space_dims}
    coords["dayofyear"] = doys
    mu_c = ClimArray(mu, ("dayofyear",) + space_dims, coords, {}, "mu")
    sd_c = ClimArray(sd, ("dayofyear",) + space_dims, dict(coords), {}, "sd")
    mu_t = resample_doy(mu_c, da)
    sd_t = resample_doy(sd_c, da)
    out = jnp.abs(da.data - mu_t.data) > n * sd_t.data
    return _flag(da, out, "outside_n_standard_deviations_of_climatology",
                 f"Values outside of {n} standard deviations from climatology found.")


@register_methods("values_repeating_for_{n}_or_more_days")
def values_repeating_for_n_or_more_days(da: ClimArray, *, n: int) -> ClimArray:
    """Identical values n+ days in a row (xclim:core/dataflags.py:521)."""
    out = suspicious_run(da, window=n)
    return _flag(da, out.data, "values_repeating",
                 f"Runs of repetitive values for {n} or more days found.")


@register_methods()
def percentage_values_outside_of_bounds(da: ClimArray) -> ClimArray:
    """Percent values outside [0, 100] (xclim:core/dataflags.py:554)."""
    return _flag(da, (da.data < 0) | (da.data > 100),
                 "percentage_values_outside_of_bounds",
                 "Percentage values beyond bounds found.")


# which flags apply to which variables (from the reference variables.yml)
_VARIABLE_FLAGS = {
    "tas": ["temperature_extremely_low", "temperature_extremely_high",
            "values_repeating_for_n_or_more_days"],
    "tasmax": ["temperature_extremely_low", "temperature_extremely_high",
               "values_repeating_for_n_or_more_days", "tasmax_below_tasmin"],
    "tasmin": ["temperature_extremely_low", "temperature_extremely_high",
               "values_repeating_for_n_or_more_days"],
    "pr": ["negative_accumulation_values", "very_large_precipitation_events",
           "values_op_thresh_repeating_for_n_or_more_days"],
    "prsn": ["negative_accumulation_values"],
    "sfcWind": ["wind_values_outside_of_bounds",
                "values_repeating_for_n_or_more_days"],
    "hurs": ["percentage_values_outside_of_bounds"],
    "siconc": ["percentage_values_outside_of_bounds"],
    "snd": ["negative_accumulation_values"],
    "snw": ["negative_accumulation_values"],
}

_DEFAULT_FLAG_KWARGS = {
    "values_repeating_for_n_or_more_days": {"n": 5},
    "values_op_thresh_repeating_for_n_or_more_days": {"n": 5, "thresh": "5 mm d-1",
                                                      "op": "=="},
}


def data_flags(da: ClimArray, ds: ClimDataset | None = None, flags: dict | None = None,
               dims="all", freq: str | None = None,
               raise_flags: bool = False) -> ClimDataset:
    """Evaluate applicable QC flags for a variable (xclim:core/dataflags.py:581)."""
    name = da.name
    if flags is None:
        flag_names = _VARIABLE_FLAGS.get(name, ["values_repeating_for_n_or_more_days"])
        flags = {fn: _DEFAULT_FLAG_KWARGS.get(fn) for fn in flag_names}
    out = ClimDataset()
    for fname, kwargs in flags.items():
        func, _ = _REGISTRY[fname]
        kwargs = dict(kwargs or {})
        sig = inspect.signature(func)
        call = {}
        first = True
        for pname, p in sig.parameters.items():
            if p.kind == inspect.Parameter.KEYWORD_ONLY:
                if pname in kwargs:
                    call[pname] = kwargs[pname]
                continue
            if first:
                call[pname] = da
                first = False
            elif ds is not None and pname in ds:
                call[pname] = ds[pname]
            elif p.default is inspect.Parameter.empty:
                call = None
                break
        if call is None:
            continue
        res = func(**call)
        key = fname
        if freq is not None and res.time is not None:
            res2 = res.astype(jnp.float32).resample(freq).sum() > 0
            res2.attrs = dict(res.attrs)
            res = res2
        elif dims == "all":
            red = res.any()
            red.attrs = dict(res.attrs)
            res = red
        out[key] = res
    if raise_flags:
        if any(bool(np.asarray(v.values).any()) for v in out.values()):
            raise DataQualityException(out)
    return out


def ecad_compliant(ds: ClimDataset, dims="all", raise_flags: bool = False,
                   append: bool = True):
    """Run ECA&D compliance flags on every variable of a dataset
    (xclim:core/dataflags.py:749)."""
    flags = ClimDataset()
    for name, da in ds.items():
        if name not in _VARIABLE_FLAGS:
            continue
        res = data_flags(da, ds, dims=dims)
        for k, v in res.items():
            flags[f"{name}_{k}"] = v
    if raise_flags:
        bad = [k for k, v in flags.items() if bool(np.asarray(v.values).any())]
        if bad:
            raise DataQualityException(flags)
    import functools

    if len(flags.data_vars):
        datas = [v.astype(jnp.bool_) for v in flags.values()]
        agg = functools.reduce(lambda a, b: a | b, datas)
        ecad = ~agg
        ecad.attrs = {"comment": "Adheres to ECAD quality control checks.",
                      "units": ""}
        ecad.name = "ecad_qc_flag"
    else:
        ecad = None
    if append:
        out = ds.copy()
        if ecad is not None:
            out["ecad_qc_flag"] = ecad
        return out
    return ecad


@register_methods()
@declare_units(da="[discharge]/[area]", thresh="[precipitation]")
def specific_discharge_extremely_high(da: ClimArray, *,
                                      thresh: str = "100 mm d-1") -> ClimArray:
    """Specific discharge above 100 mm/day (xclim:core/dataflags.py:823)."""
    t = convert_units_to(str2pint(thresh), da, context="hydro")
    return _flag(da, da.data > t, "specific_discharge_extremely_high",
                 f"Specific discharge values found above {thresh}.")
