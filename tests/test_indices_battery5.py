"""Index battery wave 5 (VERDICT r2 #6): calendar robustness and NaN-period
semantics for the most-used indices, plus the last unported simple classes.

Every case computes its expectation with plain numpy on the raw series —
independent of the framework's segment/run-length kernels — and runs the
index under BOTH noleap and 360_day calendars (the reference exercises
non-standard calendars through its real-data files; here the parameterization
is explicit). All-NaN-period cases pin the missing='any' contract.

Reference models: xclim:tests/test_indices.py (class-per-index style) and
the indicator suites (tests/test_temperature.py, tests/test_precip.py).
"""

import numpy as np
import pytest

from xclim_tpu import indices
from xclim_tpu.testing.helpers import test_timeseries

K = 273.15


def ylen(calendar):
    return {"noleap": 365, "360_day": 360}[calendar]


def series(values, var, calendar, units=None, start="2001-01-01"):
    return test_timeseries(np.asarray(values, dtype=np.float64), var,
                           start=start, calendar=calendar, units=units)


def per_year(vals, calendar, fn):
    L = ylen(calendar)
    n = len(vals) // L
    return np.array([fn(vals[i * L:(i + 1) * L]) for i in range(n)])


def _runs(mask):
    """Lengths of consecutive-True runs."""
    out, n = [], 0
    for m in mask:
        if m:
            n += 1
        elif n:
            out.append(n)
            n = 0
    if n:
        out.append(n)
    return out


def _max_run(mask):
    r = _runs(mask)
    return float(max(r)) if r else 0.0


def _days_in_runs_ge(mask, w):
    return float(sum(r for r in _runs(mask) if r >= w))


def _make(calendar, seed, mean, amp, sd, nyears=2):
    L = ylen(calendar)
    T = nyears * L
    rng = np.random.default_rng(seed)
    return (mean + amp * np.sin(2 * np.pi * np.arange(T) / L)
            + rng.normal(0, sd, T))


# (index name, variable, units, kwargs, numpy per-year expectation, tol)
# expectation closures receive the raw (unconverted) series values
CASES = [
    ("tg_mean", "tas", "K", {}, lambda v: v.mean(), 1e-5),
    ("tx_max", "tasmax", "K", {}, lambda v: v.max(), 1e-5),
    ("tn_min", "tasmin", "K", {}, lambda v: v.min(), 1e-5),
    ("frost_days", "tasmin", "K", {},
     lambda v: float((v < K).sum()), 0),
    ("ice_days", "tasmax", "K", {},
     lambda v: float((v < K).sum()), 0),
    ("tx_days_above", "tasmax", "K", {"thresh": "25 degC"},
     lambda v: float((v > K + 25).sum()), 0),
    ("tn_days_above", "tasmin", "K", {"thresh": "20 degC"},
     lambda v: float((v > K + 20).sum()), 0),
    ("tn_days_below", "tasmin", "K", {"thresh": "-10 degC"},
     lambda v: float((v < K - 10).sum()), 0),
    ("tg_days_above", "tas", "K", {"thresh": "10 degC"},
     lambda v: float((v > K + 10).sum()), 0),
    ("tg_days_below", "tas", "K", {"thresh": "10 degC"},
     lambda v: float((v < K + 10).sum()), 0),
    ("growing_degree_days", "tas", "K", {"thresh": "4.0 degC"},
     lambda v: np.clip(v - (K + 4), 0, None).sum(), 1e-4),
    ("heating_degree_days", "tas", "K", {"thresh": "17.0 degC"},
     lambda v: np.clip((K + 17) - v, 0, None).sum(), 1e-4),
    ("cooling_degree_days", "tas", "K", {"thresh": "18.0 degC"},
     lambda v: np.clip(v - (K + 18), 0, None).sum(), 1e-4),
    ("warm_day_frequency", "tasmax", "K", {},
     lambda v: float((v > K + 30).sum()), 0),
    ("warm_night_frequency", "tasmin", "K", {},
     lambda v: float((v > K + 22).sum()), 0),
    ("heat_wave_index", "tasmax", "K", {"thresh": "25.0 degC", "window": 5},
     lambda v: _days_in_runs_ge(v > K + 25, 5), 0),
    ("maximum_consecutive_frost_days", "tasmin", "K", {},
     lambda v: _max_run(v < K), 0),
    ("maximum_consecutive_frost_free_days", "tasmin", "K", {},
     lambda v: _max_run(v >= K), 0),
    ("wetdays", "pr", "kg m-2 s-1", {"thresh": "1.0 mm/day"},
     lambda v: float((v * 86400 >= 1.0 - 1e-9).sum()), 0),
    ("dry_days", "pr", "kg m-2 s-1", {"thresh": "0.2 mm/d"},
     lambda v: float((v * 86400 < 0.2 + 1e-9).sum()), 0),
    ("maximum_consecutive_dry_days", "pr", "kg m-2 s-1",
     {"thresh": "1 mm/day"},
     lambda v: _max_run(v * 86400 < 1.0), 0),
    ("maximum_consecutive_wet_days", "pr", "kg m-2 s-1",
     {"thresh": "1 mm/day"},
     lambda v: _max_run(v * 86400 >= 1.0), 0),
    # reference returns rx1day in the INPUT units (xclim:_simple.py:462)
    ("max_1day_precipitation_amount", "pr", "kg m-2 s-1", {},
     lambda v: v.max(), 1e-9),
    ("precip_accumulation", "pr", "kg m-2 s-1", {},
     lambda v: v.sum() * 86400, 1e-3),
    ("daily_pr_intensity", "pr", "kg m-2 s-1", {"thresh": "1 mm/day"},
     lambda v: ((v * 86400)[v * 86400 >= 1.0].mean()
                if (v * 86400 >= 1.0).any() else 0.0), 1e-4),
]


def _values_for(var, calendar, seed):
    if var == "pr":
        L = ylen(calendar)
        rng = np.random.default_rng(seed)
        v = rng.gamma(0.6, 4.0, 2 * L) / 86400.0  # mm/day -> kg m-2 s-1
        v[rng.random(2 * L) < 0.4] = 0.0
        return v
    mean = {"tas": 285.0, "tasmax": 295.0, "tasmin": 276.0}[var]
    return _make(calendar, seed, mean, 12.0, 3.0)


class TestCalendarRobustness:
    @pytest.mark.parametrize("calendar", ["noleap", "360_day"])
    @pytest.mark.parametrize("name,var,units,kwargs,exp,tol",
                             CASES, ids=[c[0] for c in CASES])
    def test_yearly(self, name, var, units, kwargs, exp, tol, calendar):
        v = _values_for(var, calendar, seed=hash(name) % 2**31)
        da = series(v, var, calendar, units=units)
        out = getattr(indices, name)(da, freq="YS", **kwargs)
        got = np.asarray(out.values, dtype=np.float64)
        want = per_year(v, calendar, exp)
        assert got.shape == want.shape
        if tol == 0:
            np.testing.assert_array_equal(got, want)
        else:
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=tol)


#: index function -> registered indicator applying the missing mask
#: (missing='any' lives at the INDICATOR layer, xclim:core/indicator.py
#: _postprocess; raw index functions use plain skipna reductions)
INDICATOR_FOR = {
    "tg_mean": "TG_MEAN", "tx_max": "TX_MAX", "tn_min": "TN_MIN",
    "frost_days": "FROST_DAYS", "ice_days": "ICE_DAYS",
    "tx_days_above": "TX_DAYS_ABOVE", "tn_days_above": "TN_DAYS_ABOVE",
    "tn_days_below": "TN_DAYS_BELOW", "tg_days_above": "TG_DAYS_ABOVE",
    "tg_days_below": "TG_DAYS_BELOW",
    "growing_degree_days": "GROWING_DEGREE_DAYS",
    "heating_degree_days": "HEATING_DEGREE_DAYS",
    "cooling_degree_days": "COOLING_DEGREE_DAYS",
    "heat_wave_index": "HEAT_WAVE_INDEX",
    "maximum_consecutive_frost_days": "CONSECUTIVE_FROST_DAYS",
    "maximum_consecutive_frost_free_days": "CONSECUTIVE_FROST_FREE_DAYS",
    "wetdays": "WETDAYS", "dry_days": "DRY_DAYS",
    "maximum_consecutive_dry_days": "CDD",
    "maximum_consecutive_wet_days": "CWD",
    "max_1day_precipitation_amount": "RX1DAY",
    "daily_pr_intensity": "SDII",
}

NAN_CASES = [c for c in CASES if c[0] in INDICATOR_FOR]


class TestAllNaNPeriod:
    """missing='any' contract (at the indicator layer): a period whose input
    is entirely (or even partially) NaN yields NaN, intact periods are
    unaffected and still match the numpy expectation."""

    @pytest.mark.parametrize("name,var,units,kwargs,exp,tol",
                             NAN_CASES, ids=[c[0] for c in NAN_CASES])
    def test_nan_year(self, name, var, units, kwargs, exp, tol):
        from xclim_tpu.core.indicator import registry

        calendar = "noleap"
        L = ylen(calendar)
        v = _values_for(var, calendar, seed=hash(name) % 2**30)
        vnan = v.copy()
        vnan[:L] = np.nan  # year 1 fully missing
        da = series(vnan, var, calendar, units=units)
        ind = registry[INDICATOR_FOR[name]]
        kw = dict(kwargs)
        if name in ("maximum_consecutive_dry_days",
                    "maximum_consecutive_wet_days", "daily_pr_intensity"):
            kw.pop("thresh", None)  # indicator variants inject 1 mm/day
        out = ind(da, freq="YS", **kw)
        got = np.asarray(out.values, dtype=np.float64)
        assert np.isnan(got[0]), f"{name}: all-NaN year must be NaN"
        want1 = exp(v[L:])
        # indicator-layer declared units differ from the raw index for one
        # precip output: RX1DAY converts the SI rate to mm/day. SDII
        # (mm d-1, xclim:indicators/atmos/_precip.py:251-260) already matches
        # its numpy expectation, which computes in mm/day.
        if name == "max_1day_precipitation_amount":
            want1 = want1 * 86400.0
        np.testing.assert_allclose(got[1], want1, rtol=1e-5, atol=tol or 1e-5)

    def test_partial_nan_year_masked(self):
        from xclim_tpu.core.indicator import registry

        v = _make("noleap", 7, 285.0, 12.0, 3.0)
        v[3] = np.nan  # one bad day in year 1
        da = series(v, "tas", "noleap", units="K")
        out = np.asarray(registry["TG_MEAN"](da, freq="YS").values)
        assert np.isnan(out[0]) and not np.isnan(out[1])

    @pytest.mark.parametrize("name,var,units,kwargs,exp,tol",
                             [c for c in CASES if c[0] not in INDICATOR_FOR],
                             ids=[c[0] for c in CASES
                                  if c[0] not in INDICATOR_FOR])
    def test_index_level_nan_semantics(self, name, var, units, kwargs, exp,
                                       tol):
        # indices without a 1:1 indicator: the raw index uses skipna
        # reductions — an all-NaN year gives the op's empty-set value
        # (NaN for mean/max, 0 for counts), never an exception
        calendar = "noleap"
        L = ylen(calendar)
        v = _values_for(var, calendar, seed=hash(name) % 2**30)
        vnan = v.copy()
        vnan[:L] = np.nan
        da = series(vnan, var, calendar, units=units)
        out = getattr(indices, name)(da, freq="YS", **kwargs)
        got = np.asarray(out.values, dtype=np.float64)
        want1 = exp(v[L:])
        np.testing.assert_allclose(got[1], want1, rtol=1e-5, atol=tol or 1e-5)

    def test_skip_missing_option(self):
        from xclim_tpu.core.options import set_options

        v = _make("noleap", 8, 285.0, 12.0, 3.0)
        v[3] = np.nan
        da = series(v, "tas", "noleap", units="K")
        with set_options(check_missing="skip"):
            out = np.asarray(indices.tg_mean(da, freq="YS").values)
        np.testing.assert_allclose(out[0], np.nanmean(v[:365]), rtol=1e-5)


class TestSfcWindStats:
    """xclim:tests/test_indices.py TestSfcWindMax/Mean/Min and the
    sfcWindmax triplet."""

    @pytest.mark.parametrize("fn,exp", [
        ("sfcWind_max", 15.27), ("sfcWind_mean", 13.36), ("sfcWind_min", 10.70)])
    def test_sfcwind(self, fn, exp):
        da = series([14.11, 15.27, 10.70], "sfcWind", "noleap", units="m s-1")
        out = getattr(indices, fn)(da, freq="YS")
        np.testing.assert_allclose(np.asarray(out.values), [exp], rtol=1e-6)

    @pytest.mark.parametrize("fn,exp", [
        ("sfcWindmax_max", 15.27), ("sfcWindmax_mean", 13.36),
        ("sfcWindmax_min", 10.70)])
    def test_sfcwindmax(self, fn, exp):
        da = series([14.11, 15.27, 10.70], "sfcWindmax", "noleap",
                    units="m s-1")
        out = getattr(indices, fn)(da, freq="YS")
        np.testing.assert_allclose(np.asarray(out.values), [exp], rtol=1e-6)


class TestTas:
    """xclim:tests/test_indices.py TestTas: tas estimated as the
    tasmin/tasmax midpoint, preserving the input units."""

    @pytest.mark.parametrize("units,off", [("K", K), ("degC", 0.0)])
    def test_midpoint(self, units, off):
        tasmin = series(np.zeros(10) + off, "tasmin", "noleap", units=units)
        tasmax = series(np.ones(10) * 2 + off, "tasmax", "noleap", units=units)
        out = indices.tas(tasmin, tasmax)
        assert out.attrs["units"] == units
        np.testing.assert_allclose(np.asarray(out.values),
                                   np.ones(10) + off, rtol=1e-6)


class TestIcclimEquivalence:
    """xclim:tests/test_indices.py TestTG.test_indice_against_icclim —
    the icclim virtual module's TG must equal tg_mean (synthetic data
    replaces the CMIP3 file)."""

    def test_tg(self):
        from xclim_tpu.core.options import set_options
        from xclim_tpu.indicators import icclim

        v = _make("noleap", 9, 285.0, 12.0, 3.0)
        da = series(v, "tas", "noleap", units="K")
        with set_options(cf_compliance="log"):
            a = indices.tg_mean(da, freq="YS")
            b = icclim.TG(da, freq="YS")
        np.testing.assert_array_equal(np.asarray(a.values),
                                      np.asarray(b.values))
