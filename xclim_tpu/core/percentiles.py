"""Day-of-year climatological percentiles (reference: xclim percentile_doy,
src/xclim/core/calendar.py:396-497, and utils.calc_perc).

TPU-first design: the centered rolling window + year×doy unstack of the
reference becomes ONE static gather table (built host-side by
``percentile_doy_table``); the device does a single gather + batched
Hyndman-Fan quantile over the sample axis. The same table reshaped to
(doy, year, window) powers the bootstrap's year-replacement without any
data movement.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.calendar import max_doy, percentile_doy_table
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.ops.quantile import nan_quantile

__all__ = [
    "percentile_doy",
    "resample_doy",
    "adjust_doy_calendar",
    "build_climatology_bounds",
    "doy_quantile_gather",
]


def build_climatology_bounds(da: ClimArray) -> list[str]:
    """[start, end] ISO dates of the data used for the climatology
    (xclim:core/calendar.py:497)."""
    t = da.time
    return [t.isoformat(0)[:10], t.isoformat(len(t) - 1)[:10]]


def doy_quantile_gather(da: ClimArray, window: int):
    """Gather the (doy, year, window, ...) sample tensor for doy percentiles.

    Returns (samples, doys, table) where samples has NaN at missing positions.
    """
    table, doys = percentile_doy_table(da.time, window=window)
    ax = da.time_axis
    xf = jnp.moveaxis(da.data, ax, 0)
    t = jnp.asarray(table)
    safe = jnp.maximum(t, 0)
    g = xf[safe]  # (n_doy, nyears*window, ...)
    okshape = t.shape + (1,) * (g.ndim - 2)
    g = jnp.where((t >= 0).reshape(okshape), g, jnp.nan)
    return g, doys, table


def percentile_doy(arr: ClimArray, window: int = 5, per=10.0,
                   alpha: float = 1.0 / 3.0, beta: float = 1.0 / 3.0,
                   copy: bool = True) -> ClimArray:
    """Climatological percentile for each day of the year
    (xclim:core/calendar.py:396).

    Returns a ClimArray with dims ('dayofyear', ..., 'percentiles') carrying
    ``climatology_bounds``/``window``/``alpha``/``beta`` attrs used by the
    bootstrap machinery.
    """
    freq = arr.time.infer_freq()
    per_arr = np.atleast_1d(np.asarray(per, dtype=np.float32))
    cal = arr.time.calendar
    mx = max_doy(cal)

    present_366 = int(arr.time.doy.max()) == 366

    if present_366:
        # compute on doys 1..365 only, then interpolate to 1..366
        # (the 366th doy has 1/4 the sample size; xclim:core/calendar.py:489-491)
        sub = arr.sel_time(mask=arr.time.doy < 366)
    else:
        sub = arr

    g, doys, _ = doy_quantile_gather(sub, window)
    q = jnp.asarray(per_arr / 100.0)
    p = nan_quantile(g, q, axis=1, alpha=alpha, beta=beta)  # (Q, n_doy, ...)
    p = jnp.moveaxis(p, 0, -1)  # (n_doy, ..., Q)

    if present_366:
        p = _interp_doy_axis(p, len(doys), mx)
        doy_coord = np.arange(1, mx + 1, dtype=np.int32)
    else:
        doy_coord = doys

    space_dims = tuple(d for d in arr.dims if d != "time")
    dims = ("dayofyear",) + space_dims + ("percentiles",)
    coords = {k: v for k, v in arr.coords.items() if k in space_dims}
    coords["dayofyear"] = doy_coord
    coords["percentiles"] = per_arr
    attrs = dict(arr.attrs)
    attrs["climatology_bounds"] = build_climatology_bounds(arr)
    attrs["window"] = window
    attrs["alpha"] = alpha
    attrs["beta"] = beta
    return ClimArray(p, dims, coords, attrs, "per")


def _interp_doy_axis(p, n_src: int, n_tgt: int):
    """Linearly stretch the doy axis (axis 0) from n_src to n_tgt points
    (xclim _interpolate_doy_calendar, core/calendar.py:690)."""
    src_pos = jnp.linspace(1.0, float(n_tgt), n_src)
    tgt = jnp.arange(1, n_tgt + 1, dtype=jnp.float32)
    idx = jnp.clip(jnp.searchsorted(src_pos, tgt, side="right") - 1, 0, n_src - 2)
    x0 = src_pos[idx]
    x1 = src_pos[idx + 1]
    w = ((tgt - x0) / (x1 - x0)).reshape((n_tgt,) + (1,) * (p.ndim - 1))
    return p[idx] * (1 - w) + p[idx + 1] * w


def adjust_doy_calendar(source: ClimArray, target: ClimArray) -> ClimArray:
    """Stretch a doy-indexed array onto the target's doy range
    (xclim:core/calendar.py:729)."""
    tgt_max = int(target.time.doy.max())
    tgt_min = int(target.time.doy.min())
    src_doy = source.coords["dayofyear"]
    if int(src_doy.max()) == tgt_max and int(src_doy.min()) == tgt_min:
        return source
    dax = source.dims.index("dayofyear")
    p = jnp.moveaxis(source.data, dax, 0)
    n_src = p.shape[0]
    out = _interp_doy_axis(p, n_src, tgt_max - tgt_min + 1)
    out = jnp.moveaxis(out, 0, dax)
    coords = dict(source.coords)
    coords["dayofyear"] = np.arange(tgt_min, tgt_max + 1, dtype=np.int32)
    return ClimArray(out, source.dims, coords, dict(source.attrs), source.name)


def resample_doy(doy_arr: ClimArray, arr: ClimArray) -> ClimArray:
    """Broadcast a doy-indexed array onto arr's time axis
    (xclim:core/calendar.py:763)."""
    adoy = adjust_doy_calendar(doy_arr, arr)
    dax = adoy.dims.index("dayofyear")
    doy_min = int(adoy.coords["dayofyear"].min())
    idx = jnp.asarray((arr.time.doy - doy_min).astype(np.int32))
    idx = jnp.clip(idx, 0, adoy.shape[dax] - 1)
    data = jnp.take(adoy.data, idx, axis=dax)
    dims = list(adoy.dims)
    dims[dax] = "time"
    coords = {k: v for k, v in adoy.coords.items() if k != "dayofyear"}
    coords["time"] = arr.time
    return ClimArray(data, tuple(dims), coords, dict(adoy.attrs), adoy.name)
