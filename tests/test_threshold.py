"""Threshold indices: hand-computed expected values (style of reference
tests/test_indices.py)."""

import numpy as np
import pytest

from xclim_tpu.indices import (
    cold_spell_days,
    cold_spell_frequency,
    cooling_degree_days,
    daily_pr_intensity,
    degree_days_exceedance_date,
    dry_days,
    dry_spell_frequency,
    dry_spell_total_length,
    first_day_temperature_above,
    frost_free_season_length,
    growing_degree_days,
    growing_season_end,
    growing_season_length,
    growing_season_start,
    heat_wave_index,
    heating_degree_days,
    hot_spell_frequency,
    hot_spell_max_length,
    hot_spell_max_magnitude,
    last_spring_frost,
    maximum_consecutive_dry_days,
    maximum_consecutive_wet_days,
    sea_ice_area,
    sea_ice_extent,
    snd_season_length,
    tx_days_above,
    wetdays,
    wetdays_prop,
)
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.testing.helpers import test_timeseries


K = 273.15


class TestColdSpell:
    def test_days(self, tas_series):
        vals = np.full(365, K + 5)
        vals[10:20] = K - 15  # 10-day cold spell
        vals[50:53] = K - 15  # 3-day spell — below window
        tas = tas_series(vals, start="2000-01-01")
        out = cold_spell_days(tas, thresh="-10 degC", window=5, freq="YS")
        assert out.values[0] == 10
        assert out.attrs["units"] == "d"

    def test_frequency(self, tas_series):
        vals = np.full(365, K + 5)
        vals[10:20] = K - 15
        vals[50:57] = K - 15
        tas = tas_series(vals, start="2000-01-01")
        out = cold_spell_frequency(tas, thresh="-10 degC", window=5, freq="YS")
        assert out.values[0] == 2


class TestDegreeDays:
    def test_cooling(self, tas_series):
        tas = tas_series(np.array([20.0, 25, 15, 18]), units="degC")
        out = cooling_degree_days(tas, thresh="18 degC", freq="YS")
        np.testing.assert_allclose(out.values[0], 2 + 7)
        assert "K" in out.attrs["units"] or "degC" in out.attrs["units"]

    def test_growing(self, tas_series):
        tas = tas_series(np.array([2.0, 5, 8, 10]), units="degC")
        out = growing_degree_days(tas, thresh="4 degC", freq="YS")
        np.testing.assert_allclose(out.values[0], 1 + 4 + 6)

    def test_heating(self, tas_series):
        tas = tas_series(np.array([15.0, 20, 10]), units="degC")
        out = heating_degree_days(tas, thresh="17 degC", freq="YS")
        np.testing.assert_allclose(out.values[0], 2 + 0 + 7)

    def test_exceedance_date(self, tas_series):
        # 1 K-day per day above 0: reaches 25 K-days on day 25 (doy 25)
        tas = tas_series(np.full(365, K + 1.0), start="2001-01-01")
        out = degree_days_exceedance_date(tas, thresh="0 degC", sum_thresh="25 K days",
                                          op=">", freq="YS")
        assert out.values[0] == 26  # cumsum exceeds 25 on day 26
        assert out.attrs["is_dayofyear"] == 1

    def test_exceedance_after_date(self, tas_series):
        tas = tas_series(np.full(365, K + 1.0), start="2001-01-01")
        out = degree_days_exceedance_date(tas, thresh="0 degC", sum_thresh="25 K days",
                                          op=">", after_date="07-01", freq="YS")
        # Jul 1 is doy 182 (2001); 26 days later = doy 207
        assert out.values[0] == 182 + 25


class TestGrowingSeason:
    def test_start_end_length(self, tas_series):
        vals = np.full(365, K + 1.0)
        vals[99:250] = K + 10  # warm from doy 100 to doy 250
        tas = tas_series(vals, start="2001-01-01")
        start = growing_season_start(tas, thresh="5 degC", window=5, freq="YS")
        end = growing_season_end(tas, thresh="5 degC", window=5, mid_date="07-01", freq="YS")
        length = growing_season_length(tas, thresh="5 degC", window=5, mid_date="07-01", freq="YS")
        assert start.values[0] == 100
        assert end.values[0] == 251
        assert length.values[0] == 151

    def test_no_season(self, tas_series):
        tas = tas_series(np.full(365, K - 5), start="2001-01-01")
        start = growing_season_start(tas, thresh="5 degC", window=5, freq="YS")
        length = growing_season_length(tas, thresh="5 degC", window=5, freq="YS")
        assert np.isnan(start.values[0])
        assert length.values[0] == 0


class TestFirstDay:
    def test_above(self, tas_series):
        vals = np.full(365, K - 5.0)
        vals[59:] = K + 5  # warm from doy 60 (2001)
        tas = tas_series(vals, start="2001-01-01")
        out = first_day_temperature_above(tas, thresh="0 degC", after_date="01-01",
                                          window=1, freq="YS")
        assert out.values[0] == 60


class TestLastSpringFrost:
    def test_basic(self, tasmin_series):
        vals = np.full(365, K + 5.0)
        vals[:100] = K - 2  # frost until doy 100
        tn = tasmin_series(vals, start="2001-01-01")
        out = last_spring_frost(tn, thresh="0 degC", before_date="07-01", freq="YS")
        assert out.values[0] == 100


class TestPrecip:
    def test_wetdays(self, pr_series):
        vals = np.zeros(365)
        vals[5:15] = 5 / 86400  # 5 mm/d in kg m-2 s-1
        pr = pr_series(vals, start="2000-01-01")
        out = wetdays(pr, thresh="1 mm/day", freq="YS")
        assert out.values[0] == 10
        prop = wetdays_prop(pr, thresh="1 mm/day", freq="YS")
        np.testing.assert_allclose(prop.values[0], 10 / 365, rtol=1e-5)

    def test_dry_days(self, pr_series):
        vals = np.full(30, 5 / 86400)
        vals[3:7] = 0
        pr = pr_series(vals, start="2000-01-01")
        out = dry_days(pr, thresh="0.2 mm/d", freq="MS")
        assert out.values[0] == 4

    def test_daily_pr_intensity(self, pr_series):
        vals = np.zeros(30)
        vals[0:5] = 10 / 86400  # 10 mm/day on 5 days
        pr = pr_series(vals, start="2000-01-01")
        out = daily_pr_intensity(pr, thresh="1 mm/day", freq="MS")
        np.testing.assert_allclose(out.values[0], 10.0, rtol=1e-5)

    def test_max_consecutive_wet_dry(self, pr_series):
        vals = np.zeros(60)
        vals[10:18] = 5 / 86400
        pr = pr_series(vals, start="2000-01-01")
        wet = maximum_consecutive_wet_days(pr, thresh="1 mm/day", freq="YS")
        assert wet.values[0] == 8
        dry = maximum_consecutive_dry_days(pr, thresh="1 mm/day", freq="YS")
        assert dry.values[0] == 42  # days 18..59

    def test_dry_spell_frequency(self, pr_series):
        vals = np.full(100, 5.0 / 86400)
        vals[20:30] = 0  # 10-day dry spell
        vals[50:55] = 0  # 5-day dry spell
        pr = pr_series(vals, start="2000-01-01")
        out = dry_spell_frequency(pr, thresh="1.0 mm", window=3, freq="YS")
        assert out.values[0] == 2
        tot = dry_spell_total_length(pr, thresh="1.0 mm", window=3, freq="YS")
        # rolling-sum window: days adjacent to the dry runs can also be in
        # 3-day windows with < 1mm total
        assert tot.values[0] >= 15


class TestHotSpells:
    def test_heat_wave_index(self, tasmax_series):
        vals = np.full(365, K + 20.0)
        vals[100:110] = K + 30
        tx = tasmax_series(vals, start="2000-01-01")
        out = heat_wave_index(tx, thresh="25 degC", window=5, freq="YS")
        assert out.values[0] == 10

    def test_hot_spell_max_length(self, tasmax_series):
        vals = np.full(365, K + 20.0)
        vals[100:110] = K + 35
        vals[200:203] = K + 35
        tx = tasmax_series(vals, start="2000-01-01")
        out = hot_spell_max_length(tx, thresh="30 degC", window=3, freq="YS")
        assert out.values[0] == 10

    def test_hot_spell_magnitude(self, tasmax_series):
        vals = np.full(365, K + 20.0)
        vals[100:103] = [K + 33, K + 35, K + 31]  # exceedances 3+5+1 = 9
        tx = tasmax_series(vals, start="2000-01-01")
        out = hot_spell_max_magnitude(tx, thresh="30 degC", window=3, freq="YS")
        np.testing.assert_allclose(out.values[0], 9.0, rtol=1e-5)

    def test_frequency(self, tasmax_series):
        vals = np.full(365, K + 20.0)
        vals[100:110] = K + 35
        vals[200:205] = K + 35
        tx = tasmax_series(vals, start="2000-01-01")
        out = hot_spell_frequency(tx, thresh="30 degC", window=3, freq="YS")
        assert out.values[0] == 2

    def test_tx_days_above(self, tasmax_series):
        vals = np.full(365, K + 20.0)
        vals[10:25] = K + 30
        tx = tasmax_series(vals, start="2000-01-01")
        out = tx_days_above(tx, thresh="25 degC", freq="YS")
        assert out.values[0] == 15


class TestSeaIce:
    def _data(self):
        import jax.numpy as jnp

        conc = ClimArray(jnp.asarray(np.array([[[30.0, 10.0], [60.0, 0.0]]])),
                         ("time", "lat", "lon"), {}, {"units": "%"}, "siconc")
        area = ClimArray(jnp.asarray(np.array([[1.0, 1.0], [2.0, 1.0]])),
                         ("lat", "lon"), {}, {"units": "m2"}, "areacello")
        return conc, area

    def test_area(self):
        conc, area = self._data()
        out = sea_ice_area(conc, area, thresh="15 pct")
        np.testing.assert_allclose(out.values[0], (30 * 1 + 60 * 2) / 100)

    def test_extent(self):
        conc, area = self._data()
        out = sea_ice_extent(conc, area, thresh="15 pct")
        np.testing.assert_allclose(out.values[0], 3.0)


class TestSnowSeason:
    def test_length(self, snd_series):
        vals = np.zeros(365)
        vals[100:200] = 0.5  # 50 cm for 100 days (YS-JUL period boundaries apply)
        snd = snd_series(vals, start="2000-07-01")
        out = snd_season_length(snd, thresh="2 cm", window=14, freq="YS-JUL")
        assert out.values[0] == 100

    def test_all_nan_missing(self, snd_series):
        snd = snd_series(np.full(365, np.nan), start="2000-07-01")
        out = snd_season_length(snd, thresh="2 cm", window=14, freq="YS-JUL")
        assert np.isnan(out.values[0])
