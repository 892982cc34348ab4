"""Canadian Forest Fire Weather Index System
(reference: xclim:src/xclim/indices/fire/_cffwis.py, 1697 LoC; validated against
published Van Wagner 1987 equations — the same the reference implements with
numba, <3% vs GFWED per its module docstring).

TPU-first design: the reference's per-day Python/numba iteration
(_fire_weather_calc, _cffwis.py:655-880) becomes ONE ``lax.scan`` over the time
axis with carry = (DC, DMC, FFMC, ow_DC, ow_DMC, winter_pr) — all grid cells
advance together on the VPU each step; season start/stop and overwintering are
branchless ``where`` updates on the carry. Day-length tables are static
(month, lat-band) gathers built host-side.
"""

from __future__ import annotations

from collections import namedtuple

import jax
import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.core.units import convert_units_to, declare_units, str2pint

__all__ = [
    "DAY_LENGTHS",
    "DAY_LENGTH_FACTORS",
    "build_up_index",
    "cffwis_indices",
    "daily_severity_rating",
    "drought_code",
    "duff_moisture_code",
    "fire_season",
    "fire_weather_ufunc",
    "fire_weather_index",
    "initial_spread_index",
    "overwintering_drought_code",
]

default_params = {
    "temp_start_thresh": 12.0,   # degC
    "temp_end_thresh": 5.0,      # degC
    "snow_thresh": 0.01,         # m
    "temp_condition_days": 3,
    "snow_condition_days": 3,
    "carry_over_fraction": 0.75,
    "wetting_efficiency_fraction": 0.75,
    "dc_start": 15.0,
    "dmc_start": 6.0,
    "ffmc_start": 85.0,
    "prec_thresh": 1.0,          # mm/d
    "dc_dry_factor": 5.0,
    "dmc_dry_factor": 2.0,
}

# Monthly effective day-length tables per latitude band (GFWED values, same
# data as the reference _cffwis.py:189-207)
DAY_LENGTHS = np.array([
    [11.5, 10.5, 9.2, 7.9, 6.8, 6.2, 6.5, 7.4, 8.7, 10, 11.2, 11.8],
    [10.1, 9.6, 9.1, 8.5, 8.1, 7.8, 7.9, 8.3, 8.9, 9.4, 9.9, 10.2],
    12 * [9.0],
    [7.9, 8.4, 8.9, 9.5, 9.9, 10.2, 10.1, 9.7, 9.1, 8.6, 8.1, 7.8],
    [6.5, 7.5, 9, 12.8, 13.9, 13.9, 12.4, 10.9, 9.4, 8, 7, 6],
])

DAY_LENGTH_FACTORS = np.array([
    [6.4, 5.0, 2.4, 0.4, -1.6, -1.6, -1.6, -1.6, -1.6, 0.9, 3.8, 5.8],
    12 * [1.39],
    [-1.6, -1.6, -1.6, 0.9, 3.8, 5.8, 6.4, 5.0, 2.4, 0.4, -1.6, -1.6],
])


def _day_length_series(months: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """(T, *lat_shape) effective day lengths from the banded table;
    lat may be scalar, 1-D or an N-D grid."""
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    flat = lat.reshape(-1)
    band = np.select(
        [flat < -30, flat < -15, flat < 15, flat < 30], [0, 1, 2, 3], default=4)
    out = DAY_LENGTHS[band][:, months - 1].T  # (T, L)
    return out.reshape((len(months),) + lat.shape)


def _day_length_factor_series(months: np.ndarray, lat: np.ndarray) -> np.ndarray:
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    flat = lat.reshape(-1)
    band = np.select([flat < -15, flat < 15], [0, 1], default=2)
    out = DAY_LENGTH_FACTORS[band][:, months - 1].T
    return out.reshape((len(months),) + lat.shape)


# ---------------------------------------------------------------------------
# one-step code updates (Van Wagner 1987 equations, branchless)
# ---------------------------------------------------------------------------


def _ffmc_step(t, p, w, h, ffmc0):
    """Fine fuel moisture code update (Eqs. 1-10)."""
    mo = 147.2 * (101.0 - ffmc0) / (59.5 + ffmc0)
    rf = p - 0.5
    mo_wet_lo = mo + 42.5 * rf * jnp.exp(-100.0 / (251.0 - mo)) * (1.0 - jnp.exp(-6.93 / rf))
    mo_wet_hi = mo_wet_lo + 0.0015 * (mo - 150.0) ** 2 * jnp.sqrt(jnp.maximum(rf, 0))
    mo_wet = jnp.where(mo > 150.0, mo_wet_hi, mo_wet_lo)
    mo = jnp.where(p > 0.5, jnp.minimum(mo_wet, 250.0), mo)

    ed = (0.942 * h ** 0.679 + 11.0 * jnp.exp((h - 100.0) / 10.0)
          + 0.18 * (21.1 - t) * (1.0 - jnp.exp(-0.115 * h)))
    ew = (0.618 * h ** 0.753 + 10.0 * jnp.exp((h - 100.0) / 10.0)
          + 0.18 * (21.1 - t) * (1.0 - jnp.exp(-0.115 * h)))
    kl_dry = 0.424 * (1.0 - (h / 100.0) ** 1.7) + 0.0694 * jnp.sqrt(w) * (1.0 - (h / 100.0) ** 8)
    kw_dry = kl_dry * 0.581 * jnp.exp(0.0365 * t)
    m_dry = ed + (mo - ed) / 10.0 ** kw_dry
    kl_wet = 0.424 * (1.0 - ((100.0 - h) / 100.0) ** 1.7) \
        + 0.0694 * jnp.sqrt(w) * (1.0 - ((100.0 - h) / 100.0) ** 8)
    kw_wet = kl_wet * 0.581 * jnp.exp(0.0365 * t)
    m_wet = ew - (ew - mo) / 10.0 ** kw_wet
    m = jnp.where(mo < ed, jnp.where(mo < ew, m_wet, mo), jnp.where(mo == ed, mo, m_dry))
    ffmc = 59.5 * (250.0 - m) / (147.2 + m)
    return jnp.clip(ffmc, 0.0, 101.0)


def _dmc_step(t, p, h, dl, dmc0):
    """Duff moisture code update (Eqs. 11-17, CFS variant of Eq. 12/15)."""
    rk = jnp.where(t < -1.1, 0.0, 1.894 * (t + 1.1) * (100.0 - h) * dl * 1e-4)
    rw = 0.92 * p - 1.27
    wmi = 20.0 + 280.0 / jnp.exp(0.023 * dmc0)
    b = jnp.where(dmc0 <= 33.0, 100.0 / (0.5 + 0.3 * dmc0),
                  jnp.where(dmc0 <= 65.0, 14.0 - 1.3 * jnp.log(dmc0),
                            6.2 * jnp.log(dmc0) - 17.2))
    wmr = wmi + 1000 * rw / (48.77 + b * rw)
    pr_wet = 43.43 * (5.6348 - jnp.log(jnp.maximum(wmr - 20.0, 1e-8)))
    pr = jnp.where(p > 1.5, pr_wet, dmc0)
    pr = jnp.maximum(pr, 0.0)
    return jnp.maximum(pr + rk, 0.0)


def _dc_step(t, p, fl, dc0):
    """Drought code update (Eqs. 18-22)."""
    tc = jnp.maximum(t, -2.8)
    pe = jnp.maximum((0.36 * (tc + 2.8) + fl) / 2, 0.0)
    rw = 0.83 * p - 1.27
    smi = 800.0 * jnp.exp(-dc0 / 400.0)
    dr = dc0 - 400.0 * jnp.log(1.0 + 3.937 * rw / smi)
    dc_wet = jnp.where(dr > 0.0, dr + pe, pe)
    return jnp.where(p > 2.8, dc_wet, dc0 + pe)


def initial_spread_index(ws, ffmc):
    """ISI from wind & FFMC (Eqs. 25-26; xclim:_cffwis.py:436)."""
    mo = 147.2 * (101.0 - ffmc) / (59.5 + ffmc)
    ff = 19.1152 * jnp.exp(mo * -0.1386) * (1.0 + mo ** 5.31 / 49300000.0)
    return ff * jnp.exp(0.05039 * ws)


def build_up_index(dmc, dc):
    """BUI from DMC & DC (Eq. 27; xclim:_cffwis.py:466)."""
    denom = jnp.where((dmc == 0) & (dc == 0), jnp.nan, dmc + 0.4 * dc)
    bui = jnp.where((dmc == 0) & (dc == 0), 0.0,
                    jnp.where(dmc <= 0.4 * dc, 0.8 * dc * dmc / denom,
                              dmc - (1.0 - 0.8 * dc / denom)
                              * (0.92 + (0.0114 * dmc) ** 1.7)))
    return jnp.clip(bui, 0.0)


def fire_weather_index(isi, bui):
    """FWI from ISI & BUI (Eqs. 28-30; xclim:_cffwis.py:497)."""
    fwi = jnp.where(bui <= 80.0, 0.1 * isi * (0.626 * bui ** 0.809 + 2.0),
                    0.1 * isi * (1000.0 / (25.0 + 108.64 / jnp.exp(0.023 * bui))))
    big = jnp.exp(2.72 * (0.434 * jnp.log(jnp.maximum(fwi, 1e-8))) ** 0.647)
    return jnp.where(fwi > 1, big, fwi)


def daily_severity_rating(fwi):
    """DSR (xclim:_cffwis.py:522)."""
    return 0.0272 * fwi ** 1.77


def _overwintered_dc(DCf, wpr, a, b, minDC):
    """Season-starting DC from last season's DC and winter precip
    (xclim:_cffwis.py:530)."""
    Qf = 800 * jnp.exp(-DCf / 400)
    Qs = a * Qf + b * 3.94 * wpr
    DCs = 400 * jnp.log(800 / Qs)
    return jnp.maximum(DCs, minDC)


# ---------------------------------------------------------------------------
# fire season (xclim:_cffwis.py:570) — vectorized masks + one propagation scan
# ---------------------------------------------------------------------------


def _season_masks(tas, snd, method, p):
    """start_up/shut_down (T, ...) masks from rolling conditions."""
    from xclim_tpu.ops.segments import rolling_reduce

    tcd = p["temp_condition_days"]
    scd = p["snow_condition_days"]
    if method == "WF93":
        # last tcd days EXCLUDING today
        tmin = rolling_reduce(tas, tcd, "min", axis=0)
        tmax = rolling_reduce(tas, tcd, "max", axis=0)
        tmin = jnp.roll(tmin, 1, axis=0).at[0].set(jnp.nan)
        tmax = jnp.roll(tmax, 1, axis=0).at[0].set(jnp.nan)
        start_up = tmin > p["temp_start_thresh"]
        shut_down = tmax < p["temp_end_thresh"]
    elif method == "LA08":
        smax = rolling_reduce(snd, scd, "max", axis=0)
        tmax = rolling_reduce(tas, tcd, "max", axis=0)
        start_up = smax <= p["snow_thresh"]
        shut_down = (snd > p["snow_thresh"]) | (tmax < p["temp_end_thresh"])
    elif method == "GFWED":
        msnow = rolling_reduce(snd, scd, "mean", axis=0)
        mtemp = rolling_reduce(tas, tcd, "mean", axis=0)
        start_up = (mtemp > p["temp_start_thresh"]) & (msnow < p["snow_thresh"])
        shut_down = (msnow >= p["snow_thresh"]) | (mtemp < p["temp_end_thresh"])
    else:
        raise ValueError("method must be one of WF93, LA08, GFWED")
    start_up = jnp.nan_to_num(start_up.astype(jnp.float32), nan=0.0) > 0
    shut_down = jnp.nan_to_num(shut_down.astype(jnp.float32), nan=0.0) > 0

    def step(carry, inp):
        su, sd = inp
        mask = (carry | su) & ~sd
        return mask, mask

    init = jnp.zeros(tas.shape[1:], dtype=bool)
    _, mask = jax.lax.scan(step, init, (start_up, shut_down))
    return mask


def fire_season_mask(tas, snd=None, method: str = "WF93", **params):
    """Boolean fire-season mask, time on axis 0 (xclim:_cffwis.py:570)."""
    p = {**default_params, **params}
    return _season_masks(tas, snd, method, p)


# ---------------------------------------------------------------------------
# the main scan (xclim:_cffwis.py:655-880)
# ---------------------------------------------------------------------------


def fire_weather_calc(tas, pr, hurs, sfcWind, dl, flf, season_mask=None,
                      dc0=None, dmc0=None, ffmc0=None, winter_pr0=None,
                      overwintering: bool = False, dry_start: str | None = None,
                      initial_start_up: bool = True, **params):
    """Run the full CFFWIS over time axis 0.

    tas [degC], pr [mm/day], hurs [%], sfcWind [km/h], dl/flf day-length
    (factor) series (T, ...-broadcastable). Returns a dict with DC, DMC, FFMC,
    ISI, BUI, FWI, DSR, winter_pr, season_mask.
    """
    p = {**default_params, **params}
    shape = tas.shape[1:]
    always_on = season_mask is None
    if always_on:
        season_mask = jnp.ones_like(tas, dtype=bool)
    sm = season_mask.astype(jnp.int32)

    nanarr = jnp.full(shape, jnp.nan, dtype=tas.dtype)
    dc0 = nanarr if dc0 is None else dc0
    dmc0 = nanarr if dmc0 is None else dmc0
    ffmc0 = nanarr if ffmc0 is None else ffmc0
    winter_pr0 = jnp.zeros(shape, tas.dtype) if winter_pr0 is None else winter_pr0

    if always_on:
        dc_prev = jnp.where(jnp.isnan(dc0), p["dc_start"], dc0)
        dmc_prev = jnp.where(jnp.isnan(dmc0), p["dmc_start"], dmc0)
        ffmc_prev = jnp.where(jnp.isnan(ffmc0), p["ffmc_start"], ffmc0)
        ow_dc = nanarr
        ow_dmc = nanarr
    else:
        # with a season, codes start off (NaN) until the first start-up
        dc_prev = nanarr if overwintering else dc0
        dmc_prev = dmc0
        ffmc_prev = ffmc0
        ow_dc = dc0 if (overwintering or dry_start) else nanarr
        ow_dc = jnp.where(jnp.isnan(ow_dc) & (dry_start is not None) & ~overwintering,
                          p["dc_start"], ow_dc) if dry_start else ow_dc
        ow_dmc = jnp.where(jnp.isnan(dmc0), p["dmc_start"], dmc0) if dry_start else nanarr

    prev_mask0 = jnp.zeros(shape, dtype=jnp.int32) if initial_start_up else sm[0]

    def step(carry, inp):
        dc_p, dmc_p, ffmc_p, owdc, owdmc, wpr, prev_m = carry
        t, prcp, h, w, dlr, flr, m = inp
        if always_on:
            start_up = jnp.zeros(shape, dtype=bool)
            shut_down = jnp.zeros(shape, dtype=bool)
            winter = jnp.zeros(shape, dtype=bool)
        else:
            delta = m - prev_m
            shut_down = delta == -1
            winter = (delta == 0) & (m == 0)
            start_up = delta == 1

        if not always_on:
            if overwintering:
                owdc = jnp.where(shut_down, dc_p, owdc)
                wpr = jnp.where(shut_down, prcp, jnp.where(winter, wpr + prcp, wpr))
                started_dc = jnp.where(
                    jnp.isnan(owdc), p["dc_start"],
                    _overwintered_dc(owdc, wpr, p["carry_over_fraction"],
                                     p["wetting_efficiency_fraction"], p["dc_start"]))
                dc_p = jnp.where(start_up, started_dc, dc_p)
                owdc = jnp.where(start_up, jnp.nan, owdc)
                wpr = jnp.where(start_up, 0.0, wpr)
            elif dry_start:
                wetpts = prcp > p["prec_thresh"]
                owdc = jnp.where(shut_down, p["dc_start"], owdc)
                owdc = jnp.where(winter & wetpts, p["dc_start"], owdc)
                owdc = jnp.where(winter & ~wetpts, owdc + p["dc_dry_factor"], owdc)
                dc_p = jnp.where(start_up, owdc, dc_p)
                owdc = jnp.where(start_up, jnp.nan, owdc)
            else:
                dc_p = jnp.where(start_up, p["dc_start"], dc_p)
            dc_p = jnp.where(shut_down, jnp.nan, dc_p)

            if dry_start:
                wetpts = prcp > p["prec_thresh"]
                owdmc = jnp.where(shut_down, p["dmc_start"], owdmc)
                owdmc = jnp.where(winter & wetpts, p["dmc_start"], owdmc)
                owdmc = jnp.where(winter & ~wetpts, owdmc + p["dmc_dry_factor"], owdmc)
                dmc_p = jnp.where(start_up, owdmc, dmc_p)
                owdmc = jnp.where(start_up, jnp.nan, owdmc)
            else:
                dmc_p = jnp.where(start_up, p["dmc_start"], dmc_p)
            dmc_p = jnp.where(shut_down, jnp.nan, dmc_p)
            ffmc_p = jnp.where(start_up, p["ffmc_start"], ffmc_p)
            ffmc_p = jnp.where(shut_down, jnp.nan, ffmc_p)

        dc = _dc_step(t, prcp, flr, dc_p)
        dmc = _dmc_step(t, prcp, h, dlr, dmc_p)
        ffmc = _ffmc_step(t, prcp, w, h, ffmc_p)
        new_carry = (dc, dmc, ffmc, owdc, owdmc, wpr, m)
        return new_carry, (dc, dmc, ffmc, wpr)

    dlb = jnp.broadcast_to(dl.reshape(dl.shape + (1,) * (tas.ndim - dl.ndim)), tas.shape)
    flb = jnp.broadcast_to(flf.reshape(flf.shape + (1,) * (tas.ndim - flf.ndim)), tas.shape)
    carry0 = (dc_prev, dmc_prev, ffmc_prev, ow_dc, ow_dmc, winter_pr0, prev_mask0)
    final, (DC, DMC, FFMC, WPR) = jax.lax.scan(
        step, carry0, (tas, pr, hurs, sfcWind, dlb, flb, sm))
    ISI = initial_spread_index(sfcWind, FFMC)
    BUI = build_up_index(DMC, DC)
    FWI = fire_weather_index(ISI, BUI)
    DSR = daily_severity_rating(FWI)
    return {"DC": DC, "DMC": DMC, "FFMC": FFMC, "ISI": ISI, "BUI": BUI,
            "FWI": FWI, "DSR": DSR, "winter_pr": final[5],
            "season_mask": season_mask}


# ---------------------------------------------------------------------------
# public ClimArray API (xclim:_cffwis.py:883-1608)
# ---------------------------------------------------------------------------


def _prep(tas, pr, hurs, sfcWind, lat):
    t = convert_units_to(tas, "degC")
    p = convert_units_to(pr, "mm/d", context="hydro")
    h = convert_units_to(hurs, "%")
    months = t.time.month
    latv = np.atleast_1d(np.asarray(getattr(lat, "values", lat) if lat is not None
                                    else t.coords.get("lat", 45.0), dtype=np.float64))
    dl = jnp.asarray(_day_length_series(months, latv).astype(np.float32))
    flf = jnp.asarray(_day_length_factor_series(months, latv).astype(np.float32))
    if latv.size == 1:
        dl = dl[:, 0]
        flf = flf[:, 0]
    w = convert_units_to(sfcWind, "km/h") if sfcWind is not None else None
    return t, p, h, w, dl, flf


def _to_time_first(da: ClimArray):
    ax = da.time_axis
    return jnp.moveaxis(da.data, ax, 0), ax


@declare_units(tas="[temperature]", pr="[precipitation]", sfcWind="[speed]",
               hurs="[]")
def cffwis_indices(tas: ClimArray, pr: ClimArray, sfcWind: ClimArray,
                   hurs: ClimArray, lat=None, snd: ClimArray | None = None,
                   ffmc0=None, dmc0=None, dc0=None, season_mask=None,
                   season_method: str | None = None,
                   overwintering: bool = False, dry_start: str | None = None,
                   initial_start_up: bool = True, **params):
    """DC, DMC, FFMC, ISI, BUI, FWI, DSR (xclim:_cffwis.py:1278)."""
    t, p, h, w, dl, flf = _prep(tas, pr, hurs, sfcWind, lat)
    td, ax = _to_time_first(t)
    pd_, _ = _to_time_first(p)
    hd, _ = _to_time_first(h)
    wd, _ = _to_time_first(w)
    sm = None
    if season_mask is not None:
        sm = jnp.moveaxis(season_mask.data if isinstance(season_mask, ClimArray)
                          else jnp.asarray(season_mask), ax, 0)
    elif season_method is not None:
        sndd = None
        if snd is not None:
            sndd, _ = _to_time_first(convert_units_to(snd, "m"))
        sm = _season_masks(td, sndd, season_method, {**default_params, **params})
    out = fire_weather_calc(td, pd_, hd, wd, dl, flf, season_mask=sm,
                            dc0=None if dc0 is None else jnp.asarray(getattr(dc0, "data", dc0)),
                            dmc0=None if dmc0 is None else jnp.asarray(getattr(dmc0, "data", dmc0)),
                            ffmc0=None if ffmc0 is None else jnp.asarray(getattr(ffmc0, "data", ffmc0)),
                            overwintering=overwintering, dry_start=dry_start,
                            initial_start_up=initial_start_up, **params)

    def wrap(name, units=""):
        arr = jnp.moveaxis(out[name], 0, ax)
        res = t.copy(data=arr)
        res.attrs = {"units": units}
        res.name = name.lower()
        return res

    Outs = namedtuple("CFFWIS", ["dc", "dmc", "ffmc", "isi", "bui", "fwi", "dsr"])
    return Outs(wrap("DC"), wrap("DMC"), wrap("FFMC"), wrap("ISI"), wrap("BUI"),
                wrap("FWI"), wrap("DSR"))


@declare_units(tas="[temperature]", pr="[precipitation]")
def drought_code(tas: ClimArray, pr: ClimArray, lat=None, snd=None, dc0=None,
                 season_mask=None, season_method=None, overwintering=False,
                 dry_start=None, initial_start_up=True, **params) -> ClimArray:
    """Drought code only (xclim:_cffwis.py:1416)."""
    t = convert_units_to(tas, "degC")
    p = convert_units_to(pr, "mm/d", context="hydro")
    months = t.time.month
    latv = np.atleast_1d(np.asarray(getattr(lat, "values", lat) if lat is not None
                                    else t.coords.get("lat", 45.0), dtype=np.float64))
    flf = jnp.asarray(_day_length_factor_series(months, latv).astype(np.float32))
    if latv.size == 1:
        flf = flf[:, 0]
    td, ax = _to_time_first(t)
    pd_, _ = _to_time_first(p)
    sm = None
    if season_method is not None:
        sndd = None
        if snd is not None:
            sndd, _ = _to_time_first(convert_units_to(snd, "m"))
        sm = _season_masks(td, sndd, season_method, {**default_params, **params})
    dl = jnp.zeros_like(flf)
    out = fire_weather_calc(td, pd_, jnp.zeros_like(td) + 50.0, jnp.zeros_like(td),
                            dl, flf, season_mask=sm,
                            dc0=None if dc0 is None else jnp.asarray(getattr(dc0, "data", dc0)),
                            overwintering=overwintering, dry_start=dry_start,
                            initial_start_up=initial_start_up, **params)
    res = t.copy(data=jnp.moveaxis(out["DC"], 0, ax))
    res.attrs = {"units": ""}
    res.name = "dc"
    return res


@declare_units(tas="[temperature]", pr="[precipitation]", hurs="[]")
def duff_moisture_code(tas: ClimArray, pr: ClimArray, hurs: ClimArray, lat=None,
                       snd=None, dmc0=None, season_mask=None, season_method=None,
                       dry_start=None, initial_start_up=True, **params) -> ClimArray:
    """Duff moisture code only (xclim:_cffwis.py:1513)."""
    t, p, h, _, dl, flf = _prep(tas, pr, hurs, None, lat)
    td, ax = _to_time_first(t)
    pd_, _ = _to_time_first(p)
    hd, _ = _to_time_first(h)
    sm = None
    if season_method is not None:
        sndd = None
        if snd is not None:
            sndd, _ = _to_time_first(convert_units_to(snd, "m"))
        sm = _season_masks(td, sndd, season_method, {**default_params, **params})
    out = fire_weather_calc(td, pd_, hd, jnp.zeros_like(td), dl, flf,
                            season_mask=sm,
                            dmc0=None if dmc0 is None else jnp.asarray(getattr(dmc0, "data", dmc0)),
                            dry_start=dry_start,
                            initial_start_up=initial_start_up, **params)
    res = t.copy(data=jnp.moveaxis(out["DMC"], 0, ax))
    res.attrs = {"units": ""}
    res.name = "dmc"
    return res


@declare_units(tas="[temperature]", snd="[length]")
def fire_season(tas: ClimArray, snd: ClimArray | None = None,
                method: str = "WF93", freq: str | None = None,
                temp_start_thresh: str = "12 degC",
                temp_end_thresh: str = "5 degC",
                temp_condition_days: int = 3, snow_condition_days: int = 3,
                snow_thresh: str = "0.01 m") -> ClimArray:
    """Fire season mask (xclim:_cffwis.py:1608)."""
    t = convert_units_to(tas, "degC")
    td, ax = _to_time_first(t)
    sndd = None
    if snd is not None:
        sndd, _ = _to_time_first(convert_units_to(snd, "m"))
    p = dict(default_params)
    p.update(temp_start_thresh=convert_units_to(str2pint(temp_start_thresh), "degC"),
             temp_end_thresh=convert_units_to(str2pint(temp_end_thresh), "degC"),
             temp_condition_days=temp_condition_days,
             snow_condition_days=snow_condition_days,
             snow_thresh=convert_units_to(str2pint(snow_thresh), "m"))
    mask = _season_masks(td, sndd, method, p)
    res = t.copy(data=jnp.moveaxis(mask, 0, ax))
    res.attrs = {"units": ""}
    res.name = "fire_season"
    return res


@declare_units(last_dc="[]", winter_pr="[length]")
def overwintering_drought_code(last_dc: ClimArray, winter_pr: ClimArray,
                               carry_over_fraction=0.75,
                               wetting_efficiency_fraction=0.75,
                               min_dc: float = 15.0) -> ClimArray:
    """Overwintered season-starting DC (xclim:_cffwis.py:1170)."""
    wpr = convert_units_to(winter_pr, "mm")
    out = last_dc.copy(data=_overwintered_dc(last_dc.data, wpr.data,
                                             carry_over_fraction,
                                             wetting_efficiency_fraction, min_dc))
    out.attrs = {"units": ""}
    out.name = "dc0"
    return out


def fire_weather_ufunc(*, tas: ClimArray, pr: ClimArray,
                       hurs: ClimArray | None = None,
                       sfcWind: ClimArray | None = None, lat=None, snd=None,
                       dc0=None, dmc0=None, ffmc0=None, winter_pr=None,
                       season_mask=None, season_method=None,
                       overwintering=False, dry_start=None,
                       initial_start_up=True, indexes=None, **params):
    """Dict-returning driver mirroring the reference's fire_weather_ufunc
    (xclim:_cffwis.py:883)."""
    outs = cffwis_indices(tas, pr, sfcWind, hurs, lat=lat, snd=snd, dc0=dc0,
                          dmc0=dmc0, ffmc0=ffmc0, season_mask=season_mask,
                          season_method=season_method,
                          overwintering=overwintering, dry_start=dry_start,
                          initial_start_up=initial_start_up, **params)
    return {"DC": outs.dc, "DMC": outs.dmc, "FFMC": outs.ffmc, "ISI": outs.isi,
            "BUI": outs.bui, "FWI": outs.fwi, "DSR": outs.dsr}
