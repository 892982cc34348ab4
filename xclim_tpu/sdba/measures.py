"""Measures comparing a property computed on a simulation against the same
property on a reference (reference: the external xsdba package's
``measures`` module, re-exported through xclim.sdba — xclim:src/xclim/sdba.py).

All measures are elementwise over matching-shaped property arrays (the
output of :mod:`xclim_tpu.sdba.properties` on sim and ref)."""

from __future__ import annotations

import jax.numpy as jnp

from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.core.units import convert_units_to

__all__ = [
    "annual_cycle_correlation",
    "bias",
    "circular_bias",
    "mae",
    "ratio",
    "relative_bias",
    "rmse",
]


def _pair(sim: ClimArray, ref: ClimArray):
    if sim.attrs.get("units") and ref.attrs.get("units"):
        sim = convert_units_to(sim, ref)
    return sim, ref


def bias(sim: ClimArray, ref: ClimArray) -> ClimArray:
    """sim − ref (xsdba measures.bias)."""
    sim, ref = _pair(sim, ref)
    out = sim - ref
    out.attrs["units"] = ref.attrs.get("units", "")
    out.name = "bias"
    return out


def relative_bias(sim: ClimArray, ref: ClimArray) -> ClimArray:
    """(sim − ref) / ref (xsdba measures.relative_bias)."""
    sim, ref = _pair(sim, ref)
    out = (sim - ref) / ref
    out.attrs["units"] = ""
    out.name = "relative_bias"
    return out


def ratio(sim: ClimArray, ref: ClimArray) -> ClimArray:
    """sim / ref (xsdba measures.ratio)."""
    sim, ref = _pair(sim, ref)
    out = sim / ref
    out.attrs["units"] = ""
    out.name = "ratio"
    return out


def circular_bias(sim: ClimArray, ref: ClimArray,
                  period: float = 365.25) -> ClimArray:
    """Bias on a circular variable (day of year): the signed shortest
    distance around the cycle (xsdba measures.circular_bias)."""
    d = (sim.data - ref.data) % period
    out_data = jnp.where(d > period / 2, d - period, d)
    out = sim.copy(data=out_data)
    out.attrs["units"] = "d"
    out.name = "circular_bias"
    return out


def rmse(sim: ClimArray, ref: ClimArray, dim: str = "time") -> ClimArray:
    """Root-mean-square error along `dim` (xsdba measures.rmse)."""
    sim, ref = _pair(sim, ref)
    d2 = (sim - ref) * (sim - ref)
    out = d2.mean(dim=dim)
    out = out.copy(data=jnp.sqrt(out.data))
    out.attrs["units"] = ref.attrs.get("units", "")
    out.name = "rmse"
    return out


def mae(sim: ClimArray, ref: ClimArray, dim: str = "time") -> ClimArray:
    """Mean absolute error along `dim` (xsdba measures.mae)."""
    sim, ref = _pair(sim, ref)
    d = sim - ref
    d = d.copy(data=jnp.abs(d.data))
    out = d.mean(dim=dim)
    out.attrs["units"] = ref.attrs.get("units", "")
    out.name = "mae"
    return out


def annual_cycle_correlation(sim: ClimArray, ref: ClimArray,
                             window: int = 15) -> ClimArray:
    """Correlation between the smoothed mean annual cycles of sim and ref
    (xsdba measures.annual_cycle_correlation)."""
    from xclim_tpu.ops.segments import rolling_reduce

    sim, ref = _pair(sim, ref)

    def cycle(da):
        from xclim_tpu.sdba.grouping import Grouper
        from xclim_tpu.sdba.properties import _gather

        gr = Grouper("time.dayofyear")
        gg = _gather(da, gr)               # (n_doy, m, ...)
        cyc = jnp.nanmean(gg, axis=1)      # (n_doy, ...)
        return rolling_reduce(cyc, window, "mean", axis=0, center=True)

    cs = cycle(sim)
    cr = cycle(ref)
    ok = ~jnp.isnan(cs) & ~jnp.isnan(cr)
    x = jnp.where(ok, cs, jnp.nan)
    y = jnp.where(ok, cr, jnp.nan)
    mx = jnp.nanmean(x, axis=0, keepdims=True)
    my = jnp.nanmean(y, axis=0, keepdims=True)
    num = jnp.nanmean((x - mx) * (y - my), axis=0)
    den = jnp.nanstd(x, axis=0) * jnp.nanstd(y, axis=0)
    out_data = num / jnp.where(den == 0, jnp.nan, den)
    space_dims = tuple(d for d in sim.dims if d != "time")
    coords = {k: v for k, v in sim.coords.items() if k in space_dims}
    return ClimArray(out_data, space_dims, coords, {"units": ""},
                     "annual_cycle_correlation")
