"""Synoptic indices (reference: xclim:src/xclim/indices/_synoptic.py, 116 LoC)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.core.units import convert_units_to, declare_units

__all__ = ["jetstream_metric_woollings"]


def _lanczos_lowpass_weights(window: int, cutoff: float) -> np.ndarray:
    """Lanczos low-pass filter weights (Duchon 1979; the filter used by
    xclim:_synoptic.py:103)."""
    order = (window - 1) // 2 + 1
    nwts = 2 * order + 1
    w = np.zeros(nwts)
    n = nwts // 2
    w[n] = 2 * cutoff
    k = np.arange(1.0, n)
    sigma = np.sin(np.pi * k / n) * n / (np.pi * k)
    firstfactor = np.sin(2.0 * np.pi * cutoff * k) / (np.pi * k)
    w[n - 1:0:-1] = firstfactor * sigma
    w[n + 1:-1] = firstfactor * sigma
    return w[1:-1]


@declare_units(ua="[speed]")
def jetstream_metric_woollings(ua: ClimArray):
    """Strength and latitude of the jet stream (Woollings et al. 2010;
    xclim:_synoptic.py:24).

    ua: zonal wind with dims including ('time', 'lat'); already pressure- and
    longitude-averaged. Applies a 61-day Lanczos low-pass (10-day cutoff),
    then takes the latitude of maximum wind per day.
    """
    u = convert_units_to(ua, "m/s")
    w = _lanczos_lowpass_weights(61, 1 / 10)
    wl = len(w)
    ax = u.time_axis
    xm = jnp.moveaxis(u.data, ax, -1)
    T = xm.shape[-1]
    half = wl // 2
    pads = [(0, 0)] * (xm.ndim - 1) + [(half, half)]
    xp = jnp.pad(xm, pads, constant_values=jnp.nan)
    idx = jnp.arange(T)[:, None] + jnp.arange(wl)[None, :]
    filt = (xp[..., idx] * jnp.asarray(w.astype(np.float32))).sum(-1)
    filt = jnp.moveaxis(filt, -1, ax)  # same shape as input
    lat_ax = u.dims.index("lat")
    lats = jnp.asarray(np.asarray(u.coords["lat"], dtype=np.float32))
    strength = jnp.nanmax(filt, axis=lat_ax)
    arg = jnp.nanargmax(jnp.nan_to_num(filt, nan=-jnp.inf), axis=lat_ax)
    latitude = lats[arg]
    allnan = jnp.isnan(filt).all(axis=lat_ax)
    strength = jnp.where(allnan, jnp.nan, strength)
    latitude = jnp.where(allnan, jnp.nan, latitude)
    out_dims = tuple(d for d in u.dims if d != "lat")
    coords = {c: v for c, v in u.coords.items() if c != "lat"}
    s = ClimArray(strength, out_dims, coords, {"units": "m s-1"}, "jetstream_strength")
    la = ClimArray(latitude, out_dims, dict(coords), {"units": "degrees_north"},
                   "jetstream_latitude")
    # reference returns (jetlat, jetstr) in that order (xclim:_synoptic.py:100)
    return la, s
