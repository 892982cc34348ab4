"""Agroclimatic indices tests."""

import numpy as np
import pytest

from xclim_tpu.indices import (
    biologically_effective_degree_days,
    chill_portions,
    chill_units,
    cool_night_index,
    corn_heat_units,
    effective_growing_degree_days,
    hardiness_zones,
    huglin_index,
    latitude_temperature_index,
    rain_season,
    standardized_precipitation_index,
)
from xclim_tpu.testing.helpers import test_timeseries


K = 273.15


class TestCornHeatUnits:
    def test_basic(self, tasmin_series, tasmax_series):
        tn = tasmin_series(np.array([10.0]), units="degC")
        tx = tasmax_series(np.array([20.0]), units="degC")
        chu = corn_heat_units(tn, tx)
        # ymin = 1.8·(10−4.44)=10.008; ymax = 3.33·10 − 0.084·100 = 24.9
        np.testing.assert_allclose(chu.values[0], (10.008 + 24.9) / 2, rtol=1e-4)


class TestHuglin:
    def test_flat(self, tas_series, tasmax_series):
        n = 365
        tas = tas_series(np.full(n, 15.0), units="degC", start="2001-01-01")
        tx = tasmax_series(np.full(n, 25.0), units="degC", start="2001-01-01")
        tas.coords["lat"] = np.asarray(45.0)
        out = huglin_index(tas, tx, method="huglin", freq="YS")
        # daily: ((15+25)/2 - 10)·1.04 = 10.4 over Apr 1 – Sep 30 (183 days)
        np.testing.assert_allclose(out.values[0], 10.4 * 183, rtol=1e-4)


class TestBEDD:
    def test_icclim(self, tasmin_series, tasmax_series):
        n = 365
        tn = tasmin_series(np.full(n, 12.0), units="degC", start="2001-01-01")
        tx = tasmax_series(np.full(n, 22.0), units="degC", start="2001-01-01")
        out = biologically_effective_degree_days(tn, tx, method="icclim", freq="YS")
        # ((12+22)/2 − 10) = 7, capped at 9 → 7/day × (Apr 1 – Oct 31 = 214 d)
        np.testing.assert_allclose(out.values[0], 7 * 214, rtol=1e-4)


class TestCoolNight:
    def test_north(self, tasmin_series):
        vals = np.full(365, 10.0)
        # September (doys 244..273 in 2001) at 14 degC
        t = test_timeseries(vals, "tasmin", units="degC", start="2001-01-01")
        m = (t.time.month == 9)
        vals[m] = 14.0
        tn = tasmin_series(vals, units="degC", start="2001-01-01")
        tn.coords["lat"] = np.asarray(45.0)
        out = cool_night_index(tn, freq="YS")
        np.testing.assert_allclose(out.values[0], 14.0, rtol=1e-6)


class TestLTI:
    def test_basic(self, tas_series):
        tas = tas_series(np.full(365, 20.0), units="degC", start="2001-01-01")
        tas.coords["lat"] = np.asarray(45.0)
        out = latitude_temperature_index(tas, freq="YS")
        np.testing.assert_allclose(out.values[0], 20 * (75 - 45), rtol=1e-5)


class TestSPI:
    def test_spi_basic(self, pr_series):
        rng = np.random.default_rng(0)
        n = 365 * 15
        pr = pr_series((rng.gamma(2, 2e-5, n) * (rng.random(n) < 0.7)).astype(np.float32),
                       start="1981-01-01")
        out = standardized_precipitation_index(pr, freq="MS", window=1,
                                               dist="gamma", method="APP")
        v = np.asarray(out.values)
        ok = v[~np.isnan(v)]
        assert abs(ok.mean()) < 0.2
        assert out.name == "spi"


class TestChill:
    def test_chill_units_utah(self, tas_series):
        # 24 hours at 5 degC → +24 chill units
        tas = tas_series(np.full(48, 5.0), units="degC", freq="h",
                         start="2001-01-01")
        out = chill_units(tas, freq="YS")
        np.testing.assert_allclose(out.values[0], 48.0)

    def test_chill_units_negative(self, tas_series):
        tas = tas_series(np.full(24, 20.0), units="degC", freq="h",
                         start="2001-01-01")
        out = chill_units(tas, freq="YS")
        np.testing.assert_allclose(out.values[0], -24.0)

    def test_chill_portions_positive(self, tas_series):
        # sustained cool temperatures accumulate chill portions
        rng = np.random.default_rng(1)
        n = 24 * 60
        tas = tas_series((6 + 4 * np.sin(np.arange(n) * 2 * np.pi / 24)
                          ).astype(np.float32), units="degC", freq="h",
                         start="2001-01-01")
        out = chill_portions(tas, freq="YS")
        assert float(out.values[0]) > 10


class TestHardinessZones:
    def test_usda(self, tasmin_series):
        n = 365 * 31
        tn = tasmin_series(np.full(n, -10.0), units="degC", start="1980-07-01")
        out = hardiness_zones(tn, window=30, freq="YS-JUL")
        v = np.asarray(out.values)
        # -10 degC = 14 degF → zone index between (-60..70 by 5) → (14+60)/5 = 14.8 → 14
        ok = v[~np.isnan(v)]
        assert (ok == 14).all()


class TestRainSeason:
    def test_basic(self, pr_series):
        vals = np.zeros(365)
        # wet season starting Jun 1 (doy 152): heavy rain for 60 days
        vals[151:211] = 20 / 86400
        pr = pr_series(vals, start="2001-01-01")
        s, e, ln = rain_season(pr, date_min_start="05-01", date_max_start="12-31",
                               date_min_end="09-01", freq="YS")
        # 3-day accumulation ≥25mm is first reached on the 2nd wet day (doy 153)
        assert s.values[0] == 153
        # the dry run marker (its first day) precedes date_min_end → no end
        # found; the length runs to the period boundary (reference behavior)
        assert np.isnan(e.values[0])
        assert ln.values[0] == 365 - 152
