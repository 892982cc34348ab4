"""Statistical properties of climate series for adjustment diagnostics
(reference: the external xsdba package's ``properties`` module, re-exported
through xclim.sdba — xclim:src/xclim/sdba.py).

Each property reduces the time dimension (optionally per group) so that the
same property computed on ref, hist and scen can be compared with a measure
from :mod:`xclim_tpu.sdba.measures`. All kernels are the static-table
group-gather + dense masked reduction pattern used by the adjustment
training step.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.core.units import convert_units_to, str2pint
from xclim_tpu.sdba.grouping import Grouper

__all__ = [
    "acf",
    "annual_cycle_amplitude",
    "annual_cycle_phase",
    "corr_btw_var",
    "mean",
    "quantile",
    "relative_annual_cycle_amplitude",
    "relative_frequency",
    "return_value",
    "skewness",
    "spell_length_distribution",
    "std",
    "transition_probability",
    "trend",
    "var",
]

_SEASONS = np.array(["DJF", "MAM", "JJA", "SON"])


def _gather(da: ClimArray, grouper: Grouper):
    """(G, m, ...) group-gathered data, NaN where padded/missing."""
    table = grouper.train_table(da.time)
    xf = jnp.moveaxis(da.data, da.time_axis, 0)
    t = jnp.asarray(table)
    g = xf[jnp.maximum(t, 0)]
    ok = (t >= 0).reshape(t.shape + (1,) * (g.ndim - 2))
    return jnp.where(ok, g, jnp.nan)


def _wrap(da: ClimArray, data, grouper: Grouper, units: str, name: str):
    """Wrap per-group output (G, ...) into a ClimArray; squeeze group='time'."""
    space_dims = tuple(d for d in da.dims if d != "time")
    coords = {k: v for k, v in da.coords.items() if k in space_dims}
    if grouper.group == "time":
        return ClimArray(data[0], space_dims, coords, {"units": units}, name)
    prop = grouper.prop
    if grouper.group == "time.month":
        coords[prop] = np.arange(1, 13)
    elif grouper.group == "time.season":
        coords[prop] = _SEASONS
    else:
        coords[prop] = np.arange(1, data.shape[0] + 1)
    return ClimArray(data, (prop,) + space_dims, coords, {"units": units}, name)


def _grouper(group) -> Grouper:
    return group if isinstance(group, Grouper) else Grouper(group)


def mean(da: ClimArray, group="time") -> ClimArray:
    """Temporal mean (xsdba properties.mean)."""
    gr = _grouper(group)
    return _wrap(da, jnp.nanmean(_gather(da, gr), axis=1), gr,
                 da.attrs.get("units", ""), "mean")


def var(da: ClimArray, group="time") -> ClimArray:
    """Temporal variance (xsdba properties.var)."""
    gr = _grouper(group)
    u = da.attrs.get("units", "")
    u2 = f"({u})2" if u else ""
    return _wrap(da, jnp.nanvar(_gather(da, gr), axis=1), gr, u2, "var")


def std(da: ClimArray, group="time") -> ClimArray:
    """Temporal standard deviation (xsdba properties.std)."""
    gr = _grouper(group)
    return _wrap(da, jnp.nanstd(_gather(da, gr), axis=1), gr,
                 da.attrs.get("units", ""), "std")


def skewness(da: ClimArray, group="time") -> ClimArray:
    """Temporal skewness E[(x−μ)³]/σ³ (xsdba properties.skewness)."""
    gr = _grouper(group)
    g = _gather(da, gr)
    mu = jnp.nanmean(g, axis=1, keepdims=True)
    sd = jnp.nanstd(g, axis=1, keepdims=True)
    z = (g - mu) / jnp.where(sd == 0, jnp.nan, sd)
    return _wrap(da, jnp.nanmean(z ** 3, axis=1), gr, "", "skewness")


def quantile(da: ClimArray, q: float = 0.98, group="time") -> ClimArray:
    """Temporal quantile (xsdba properties.quantile)."""
    from xclim_tpu.ops.quantile import nan_quantile

    gr = _grouper(group)
    g = _gather(da, gr)
    out = nan_quantile(jnp.moveaxis(g, 1, 0), jnp.asarray([float(q)]),
                       axis=0)[0]
    return _wrap(da, out, gr, da.attrs.get("units", ""), "quantile")


def relative_frequency(da: ClimArray, op: str = ">=", thresh="1 mm d-1",
                       group="time") -> ClimArray:
    """Fraction of steps satisfying ``da op thresh``
    (xsdba properties.relative_frequency)."""
    from xclim_tpu.indices.generic import compare

    gr = _grouper(group)
    th = convert_units_to(str2pint(thresh), da) if isinstance(thresh, str) \
        else float(thresh)
    cond = compare(da, op, th)
    g = _gather(cond.copy(data=cond.data.astype(jnp.float32)), gr)
    return _wrap(da, jnp.nanmean(g, axis=1), gr, "", "relative_frequency")


def transition_probability(da: ClimArray, initial_op: str = ">=",
                           final_op: str = ">=", thresh="1 mm d-1") -> ClimArray:
    """P(day t+1 satisfies final_op | day t satisfies initial_op)
    (xsdba properties.transition_probability)."""
    from xclim_tpu.indices.generic import compare

    th = convert_units_to(str2pint(thresh), da) if isinstance(thresh, str) \
        else float(thresh)
    a = compare(da, initial_op, th).data.astype(jnp.float32)
    b = compare(da, final_op, th).data.astype(jnp.float32)
    ax = da.time_axis
    af = jnp.moveaxis(a, ax, 0)
    bf = jnp.moveaxis(b, ax, 0)
    valid = ~jnp.isnan(jnp.moveaxis(da.data, ax, 0))
    both = af[:-1] * bf[1:]
    vv = (valid[:-1] & valid[1:]).astype(jnp.float32)
    num = jnp.sum(both * vv, axis=0)
    den = jnp.sum(af[:-1] * vv, axis=0)
    out = num / jnp.where(den == 0, jnp.nan, den)
    space_dims = tuple(d for d in da.dims if d != "time")
    coords = {k: v for k, v in da.coords.items() if k in space_dims}
    return ClimArray(out, space_dims, coords, {"units": ""},
                     "transition_probability")


def acf(da: ClimArray, lag: int = 1, group="time.season") -> ClimArray:
    """Lag-k autocorrelation per group (xsdba properties.acf).

    Computed over the group-gathered member axis: corr(x_t, x_{t+lag}) with
    both members inside the group, NaN-masked."""
    gr = _grouper(group)
    g = _gather(da, gr)  # (G, m, ...)
    x0 = g[:, :-lag]
    x1 = g[:, lag:]
    ok = ~jnp.isnan(x0) & ~jnp.isnan(x1)
    x0 = jnp.where(ok, x0, jnp.nan)
    x1 = jnp.where(ok, x1, jnp.nan)
    m0 = jnp.nanmean(x0, axis=1, keepdims=True)
    m1 = jnp.nanmean(x1, axis=1, keepdims=True)
    num = jnp.nanmean((x0 - m0) * (x1 - m1), axis=1)
    den = jnp.nanstd(x0, axis=1) * jnp.nanstd(x1, axis=1)
    return _wrap(da, num / jnp.where(den == 0, jnp.nan, den), gr, "", "acf")


def _yearly_stat(da: ClimArray, op: str):
    r = da.resample("YS")
    return getattr(r, op)()


def annual_cycle_amplitude(da: ClimArray, amplitude_type: str = "absolute") -> ClimArray:
    """Mean over years of (yearly max − yearly min)
    (xsdba properties.annual_cycle_amplitude)."""
    amp = _yearly_stat(da, "max") - _yearly_stat(da, "min")
    if amplitude_type == "relative":
        amp = amp / _yearly_stat(da, "mean") * 100.0
    out = amp.mean(dim="time")
    out.attrs["units"] = "%" if amplitude_type == "relative" \
        else da.attrs.get("units", "")
    out.name = "annual_cycle_amplitude"
    return out


def relative_annual_cycle_amplitude(da: ClimArray) -> ClimArray:
    """Relative amplitude of the annual cycle in percent."""
    return annual_cycle_amplitude(da, amplitude_type="relative")


def annual_cycle_phase(da: ClimArray) -> ClimArray:
    """Mean day-of-year of the yearly maximum
    (xsdba properties.annual_cycle_phase)."""
    from xclim_tpu.indices.generic import doymax

    phase = doymax(da, freq="YS").mean(dim="time")
    phase.attrs["units"] = ""
    phase.name = "annual_cycle_phase"
    return phase


def trend(da: ClimArray, output: str = "slope") -> ClimArray:
    """Linear trend of the annual means, per year (xsdba properties.trend)."""
    ym = _yearly_stat(da, "mean")
    t = jnp.asarray(ym.time.year.astype(np.float32))
    ax = ym.time_axis
    x = jnp.moveaxis(ym.data, ax, 0)
    valid = ~jnp.isnan(x)
    tt = t.reshape((-1,) + (1,) * (x.ndim - 1))
    n = valid.sum(axis=0)
    tm = jnp.sum(jnp.where(valid, tt, 0), axis=0) / n
    xm = jnp.nansum(jnp.where(valid, x, 0), axis=0) / n
    cov = jnp.nansum(jnp.where(valid, (tt - tm) * (x - xm), 0), axis=0)
    vt = jnp.nansum(jnp.where(valid, (tt - tm) ** 2, 0), axis=0)
    slope = cov / jnp.where(vt == 0, jnp.nan, vt)
    if output == "intercept":
        out = xm - slope * tm
    else:
        out = slope
    space_dims = tuple(d for d in da.dims if d != "time")
    coords = {k: v for k, v in da.coords.items() if k in space_dims}
    u = da.attrs.get("units", "")
    return ClimArray(out, space_dims, coords,
                     {"units": f"{u} yr-1" if output == "slope" else u},
                     "trend")


def spell_length_distribution(da: ClimArray, op: str = ">=",
                              thresh="1 mm d-1", stat: str = "mean",
                              window: int = 1) -> ClimArray:
    """Statistic of the distribution of spell lengths satisfying
    ``da op thresh`` for at least `window` steps
    (xsdba properties.spell_length_distribution)."""
    from xclim_tpu.indices.generic import compare
    from xclim_tpu.ops import runlength as rl

    th = convert_units_to(str2pint(thresh), da) if isinstance(thresh, str) \
        else float(thresh)
    cond = compare(da, op, th)
    ax = da.time_axis
    stats = rl.rle_statistics(cond.data, reducer=stat, window=window, axis=ax,
                              spec=None)
    space_dims = tuple(d for d in da.dims if d != "time")
    coords = {k: v for k, v in da.coords.items() if k in space_dims}
    return ClimArray(stats, space_dims, coords, {"units": "d"},
                     "spell_length_distribution")


def corr_btw_var(da1: ClimArray, da2: ClimArray, corr_type: str = "Spearman",
                 group="time") -> ClimArray:
    """Correlation between two variables (xsdba properties.corr_btw_var)."""
    gr = _grouper(group)
    g1 = _gather(da1, gr)
    g2 = _gather(convert_units_to(da2, da2), gr)
    if corr_type.lower() == "spearman":
        # rank-transform the member axis (NaNs keep NaN)
        def _rank(g):
            order = jnp.argsort(jnp.where(jnp.isnan(g), jnp.inf, g), axis=1)
            ranks = jnp.argsort(order, axis=1).astype(jnp.float32)
            return jnp.where(jnp.isnan(g), jnp.nan, ranks)

        g1 = _rank(g1)
        g2 = _rank(g2)
    ok = ~jnp.isnan(g1) & ~jnp.isnan(g2)
    x = jnp.where(ok, g1, jnp.nan)
    y = jnp.where(ok, g2, jnp.nan)
    mx = jnp.nanmean(x, axis=1, keepdims=True)
    my = jnp.nanmean(y, axis=1, keepdims=True)
    num = jnp.nanmean((x - mx) * (y - my), axis=1)
    den = jnp.nanstd(x, axis=1) * jnp.nanstd(y, axis=1)
    return _wrap(da1, num / jnp.where(den == 0, jnp.nan, den), gr, "",
                 "corr_btw_var")


def return_value(da: ClimArray, period: int = 20, op: str = "max",
                 dist: str = "genextreme") -> ClimArray:
    """T-year return value of the block extreme (xsdba properties.return_value)."""
    from xclim_tpu.indices.stats import frequency_analysis

    out = frequency_analysis(da, mode=op, t=period, dist=dist, freq="YS")
    out.name = "return_value"
    # drop the return-period axis (single period requested)
    if "return_period" in out.dims:
        out = out.isel(return_period=0)
    return out
