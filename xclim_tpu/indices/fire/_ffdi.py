"""McArthur Forest Fire Danger Index (Mark 5)
(reference: xclim:src/xclim/indices/fire/_ffdi.py, 402 LoC).

The reference's guvectorized recurrences become lax.scan (KBDI) and a
20-iteration windowed event scan over all days at once (Griffiths drought
factor).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.core.units import convert_units_to, declare_units, str2pint

__all__ = [
    "griffiths_drought_factor",
    "keetch_byram_drought_index",
    "mcarthur_forest_fire_danger_index",
]


def _kbdi_scan(p, t, pa, kbdi0):
    """KBDI recurrence (Finkele et al. 2006; xclim:_ffdi.py:38-88).

    p, t: (T, ...); pa: (...) annual precip; kbdi0: (...) initial KBDI.
    """
    def step(carry, inp):
        kbdi_prev, rr_prev = carry
        prcp, temp = inp
        runoff = jnp.where(prcp <= 0.0, prcp, jnp.minimum(prcp, rr_prev))
        rr_new = jnp.where(prcp <= 0.0, 5.0, rr_prev - runoff)
        peff = prcp - runoff
        et = (1e-3 * (203.2 - kbdi_prev)
              * (0.968 * jnp.exp(0.0875 * temp + 1.5552) - 8.3)
              / (1 + 10.88 * jnp.exp(-0.00173 * pa)))
        kbdi = jnp.clip(kbdi_prev + et - peff, 0.0, 203.2)
        return (kbdi, rr_new), kbdi

    init = (kbdi0, jnp.full_like(kbdi0, 5.0))
    _, out = jax.lax.scan(step, init, (p, t))
    return out


def _griffiths_df(p, smd, limiting_func: int):
    """Griffiths drought factor (xclim:_ffdi.py:92-166).

    p, smd: (T, ...). The per-day 20-day-window event analysis runs as a
    20-iteration loop over ALL days simultaneously (each iteration is a pure
    vector op over the (T, ...) lattice).
    """
    wl = 20
    T = p.shape[0]
    # windows[d, iw] = p[d - wl + 1 + iw]; out of range → NaN
    idx = jnp.arange(T)[:, None] + jnp.arange(wl)[None, :] - (wl - 1)
    valid_w = idx >= 0
    pw = jnp.where(valid_w.reshape(T, wl, *([1] * (p.ndim - 1))),
                   p[jnp.clip(idx, 0, T - 1)], 0.0)  # (T, wl, ...)

    shape = (T,) + p.shape[1:]
    conseq = jnp.zeros(shape, dtype=jnp.float32)
    P = jnp.zeros(shape, dtype=jnp.float32)
    pmax = jnp.zeros(shape, dtype=jnp.float32)
    N = jnp.zeros(shape, dtype=jnp.float32)
    x = jnp.ones(shape, dtype=jnp.float32)

    for iw in range(wl):
        pi = pw[:, iw]
        event = pi > 2.0
        event_end = ~event & (conseq != 0)
        final_event = event & (iw == wl - 1)
        conseq = jnp.where(event, conseq + 1, conseq)
        P_new = jnp.where(event, P + pi, P)
        N = jnp.where(event & (pi >= pmax), wl - iw, N)
        pmax = jnp.where(event & (pi >= pmax), pi, pmax)
        P = P_new
        close = event_end | final_event
        x_ = N ** 1.3 / (N ** 1.3 + P - 2.0)
        x = jnp.where(close, jnp.minimum(x_, x), x)
        conseq = jnp.where(close, 0.0, conseq)
        P = jnp.where(close, 0.0, P)
        pmax = jnp.where(close, 0.0, pmax)

    if limiting_func == 0:  # "xlim" (Eq. 14)
        xlim = jnp.where(smd < 20, 1 / (1 + 0.1135 * smd),
                         75 / (270.525 - 1.267 * smd))
        x = jnp.minimum(x, xlim)
    dfw = (10.5 * (1 - jnp.exp(-(smd + 30) / 40))
           * (41 * x ** 2 + x) / (40 * x ** 2 + x + 1))
    if limiting_func == 1:  # "discrete" (Eq. 13)
        dflim = jnp.where(smd < 25, 6.0,
                          jnp.where(smd < 42, 7.0,
                                    jnp.where(smd < 65, 8.0,
                                              jnp.where(smd < 100, 9.0, 10.0))))
        dfw = jnp.minimum(dfw, dflim)
    dfw = jnp.minimum(dfw, 10.0)
    # first wl-1 days lack a full window
    dayidx = jnp.arange(T).reshape((T,) + (1,) * (p.ndim - 1))
    return jnp.where(dayidx >= wl - 1, dfw, jnp.nan)


@declare_units(pr="[precipitation]", tasmax="[temperature]",
               pr_annual="[precipitation]", kbdi0="[precipitation]")
def keetch_byram_drought_index(pr: ClimArray, tasmax: ClimArray, pr_annual,
                               kbdi0: ClimArray | None = None) -> ClimArray:
    """Keetch-Byram drought index [mm] (xclim:_ffdi.py:188)."""
    p = convert_units_to(pr, "mm/d", context="hydro")
    t = convert_units_to(tasmax, "degC")
    ax = p.time_axis
    pd_ = jnp.moveaxis(p.data, ax, 0)
    td = jnp.moveaxis(t.data, ax, 0)
    pa = convert_units_to(str2pint(pr_annual), "mm/yr") if isinstance(pr_annual, str) \
        else convert_units_to(pr_annual, "mm/yr").data
    pa = jnp.asarray(pa, dtype=pd_.dtype) * jnp.ones(pd_.shape[1:], pd_.dtype)
    k0 = jnp.zeros(pd_.shape[1:], pd_.dtype) if kbdi0 is None else \
        jnp.asarray(getattr(kbdi0, "data", kbdi0))
    out = _kbdi_scan(pd_, td, pa, k0)
    res = p.copy(data=jnp.moveaxis(out, 0, ax))
    # the reference's KBDI convention is mm/day (xclim:_ffdi.py:265), so the
    # KBDI -> griffiths smd chain composes without unit friction
    res.attrs = {"units": "mm/day"}
    res.name = "kbdi"
    return res


@declare_units(pr="[precipitation]", smd="[precipitation]")
def griffiths_drought_factor(pr: ClimArray, smd: ClimArray,
                             limiting_func: str = "xlim") -> ClimArray:
    """Griffiths drought factor (xclim:_ffdi.py:273).

    `smd` is the soil-moisture deficit (e.g. KBDI), declared as
    [precipitation] like the reference (its KBDI convention is mm/day)."""
    p = convert_units_to(pr, "mm/d", context="hydro")
    s = convert_units_to(smd, "mm/d", context="hydro")
    lim = {"xlim": 0, "discrete": 1}[limiting_func]
    ax = p.time_axis
    out = _griffiths_df(jnp.moveaxis(p.data, ax, 0),
                        jnp.moveaxis(s.data, ax, 0), lim)
    res = p.copy(data=jnp.moveaxis(out, 0, ax))
    res.attrs = {"units": ""}
    res.name = "df"
    return res


@declare_units(drought_factor="[]", tasmax="[temperature]", hurs="[]",
               sfcWind="[speed]")
def mcarthur_forest_fire_danger_index(drought_factor: ClimArray,
                                      tasmax: ClimArray, hurs: ClimArray,
                                      sfcWind: ClimArray) -> ClimArray:
    """McArthur FFDI Mark 5 (xclim:_ffdi.py:359)."""
    t = convert_units_to(tasmax, "degC")
    h = convert_units_to(hurs, "%")
    w = convert_units_to(sfcWind, "km/h")
    ffdi = drought_factor.data ** 0.987 * jnp.exp(
        0.0338 * t.data - 0.0345 * h.data + 0.0234 * w.data + 0.243147)
    out = t.copy(data=ffdi)
    out.attrs = {"units": ""}
    out.name = "ffdi"
    return out
