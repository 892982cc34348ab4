"""Simple indices + generic building blocks (expected values hand-computed,
mirroring the style of xclim tests/test_indices.py)."""

import numpy as np
import pytest

from xclim_tpu.indices import (
    frost_days,
    ice_days,
    max_n_day_precipitation_amount,
    tg_mean,
    tx_max,
)
from xclim_tpu.indices.generic import (
    compare,
    count_occurrences,
    cumulative_difference,
    domain_count,
    doymax,
    first_occurrence,
    get_op,
    last_occurrence,
    select_resample_op,
    spell_length_statistics,
    spell_mask,
    temperature_sum,
    threshold_count,
)


class TestTgMean:
    def test_monthly(self, tas_series):
        vals = np.arange(365.0) + 273.15
        tas = tas_series(vals, start="2000-01-01")
        out = tg_mean(tas, freq="MS")
        assert out.attrs["units"] == "K"
        np.testing.assert_allclose(out.values[0], np.mean(vals[:31]), rtol=1e-6)
        assert len(out.time) == 12
        assert out.time.month[0] == 1

    def test_yearly(self, tas_series):
        tas = tas_series(np.full(365, 280.0), start="2000-01-01")
        out = tg_mean(tas)
        np.testing.assert_allclose(out.values, [280.0], rtol=1e-6)

    def test_nan_propagation(self, tas_series):
        vals = np.full(365, 280.0)
        vals[5] = np.nan
        tas = tas_series(vals, start="2000-01-01")
        out = tg_mean(tas, freq="MS")
        # nan-skipping semantics (missing masks applied at indicator level)
        np.testing.assert_allclose(out.values[0], 280.0, rtol=1e-6)

    def test_celsius_input(self, tas_series):
        tas = tas_series(np.full(31, 20.0), units="degC", start="2000-01-01")
        out = tg_mean(tas, freq="MS")
        np.testing.assert_allclose(out.values[0], 20.0, rtol=1e-6)
        assert out.attrs["units"] == "degC"


class TestCounts:
    def test_frost_days(self, tasmin_series):
        vals = np.full(365, 5 + 273.15)
        vals[10:20] = 273.15 - 3
        tn = tasmin_series(vals, start="2000-01-01")
        out = frost_days(tn, freq="YS")
        assert out.values[0] == 10
        assert out.attrs["units"] == "d"

    def test_ice_days_thresh_conversion(self, tasmax_series):
        vals = np.full(100, 2.0)  # degC
        vals[:5] = -1.0
        tx = tasmax_series(vals, units="degC", start="2000-01-01")
        out = ice_days(tx, freq="YS")
        assert out.values[0] == 5

    def test_threshold_count_op(self, tas_series):
        tas = tas_series(np.arange(10.0) + 280)
        out = threshold_count(tas, ">=", "285 K", freq="YS")
        assert out.values[0] == 5

    def test_domain_count(self, tas_series):
        tas = tas_series(np.arange(10.0) + 280)
        out = domain_count(tas, "282 K", "285 K", freq="YS")
        assert out.values[0] == 3  # ]282, 285]: 283,284,285


class TestMaxNDay:
    def test_basic(self, pr_series):
        vals = np.zeros(60)
        vals[10:13] = 10 / 86400  # 10 mm/day for 3 days, in kg m-2 s-1
        pr = pr_series(vals, start="2000-01-01")
        out = max_n_day_precipitation_amount(pr, window=3, freq="YS")
        assert out.attrs["units"] == "mm"
        np.testing.assert_allclose(out.values[0], 30.0, rtol=1e-5)


class TestDoyMax:
    def test_basic(self, tas_series):
        vals = np.zeros(365)
        vals[199] = 10  # doy 200
        tas = tas_series(vals, units="degC", start="2000-01-01")
        out = doymax(tas, freq="YS")
        assert out.values[0] == 200
        assert out.attrs["is_dayofyear"] == 1


class TestOccurrences:
    def test_first_last(self, tas_series):
        vals = np.full(365, 270.0)
        vals[59] = 280  # doy 60 (2001 non-leap: Mar 1)
        vals[99] = 280
        tas = tas_series(vals, start="2001-01-01")
        first = first_occurrence(tas, "275 K", freq="YS", op=">")
        last = last_occurrence(tas, "275 K", freq="YS", op=">")
        assert first.values[0] == 60
        assert last.values[0] == 100

    def test_none_found(self, tas_series):
        tas = tas_series(np.full(10, 270.0))
        out = first_occurrence(tas, "275 K", freq="YS", op=">")
        assert np.isnan(out.values[0])


class TestTemperatureSum:
    def test_above(self, tas_series):
        vals = np.full(30, 12.0)
        tas = tas_series(vals, units="degC", start="2000-01-01")
        out = temperature_sum(tas, ">", "10 degC", freq="MS")
        np.testing.assert_allclose(out.values[0], 60.0, rtol=1e-6)  # 30 × 2

    def test_below_signed(self, tas_series):
        # reference flips the sign for below-threshold sums (generic.py:1351-1355)
        tas = tas_series(np.full(30, 8.0), units="degC", start="2000-01-01")
        out = temperature_sum(tas, "<", "10 degC", freq="MS")
        np.testing.assert_allclose(out.values[0], 60.0, rtol=1e-6)


class TestCumulativeDifference:
    def test_hdd(self, tas_series):
        tas = tas_series(np.full(30, 12.0), units="degC", start="2000-01-01")
        out = cumulative_difference(tas, "17 degC", op="<", freq="MS")
        np.testing.assert_allclose(out.values[0], 150.0, rtol=1e-6)  # 30 × 5


class TestSpells:
    def test_spell_mask_window1(self, tas_series):
        tas = tas_series(np.array([1.0, 5, 5, 1, 5]), units="degC")
        m = spell_mask(tas, 1, "min", ">", 3.0)
        np.testing.assert_array_equal(m.values, [False, True, True, False, True])

    def test_spell_mask_min_fastpath(self, tas_series):
        tas = tas_series(np.array([5.0, 5, 5, 1, 5, 5, 1]), units="degC")
        m = spell_mask(tas, 3, "min", ">", 3.0)
        np.testing.assert_array_equal(m.values, [1, 1, 1, 0, 0, 0, 0])

    def test_spell_mask_sum(self, pr_series):
        # 5-day windows with sum >= 20
        vals = np.array([0, 10.0, 10, 0, 0, 0, 0, 1, 1, 1])
        pr = pr_series(vals, units="mm/d")
        m = spell_mask(pr, 2, "sum", ">=", 20.0)
        # window days 1-2 sums 20 → days 1,2 in spell
        np.testing.assert_array_equal(m.values[:4], [0, 1, 1, 0])

    def test_spell_length_statistics(self, tas_series):
        vals = np.full(365, 270.0)
        vals[100:110] = 300.0  # 10-day hot spell
        vals[200:203] = 300.0  # 3-day hot spell
        tas = tas_series(vals, start="2001-01-01")
        out = spell_length_statistics(tas, "295 K", window=3, win_reducer="min",
                                      op=">", spell_reducer="max", freq="YS")
        assert out.values[0] == 10
        tot = spell_length_statistics(tas, "295 K", window=3, win_reducer="min",
                                      op=">", spell_reducer="sum", freq="YS")
        assert tot.values[0] == 13
        cnt = spell_length_statistics(tas, "295 K", window=3, win_reducer="min",
                                      op=">", spell_reducer="count", freq="YS")
        assert cnt.values[0] == 2


class TestIndexer:
    def test_select_resample_op_season(self, tas_series):
        vals = np.arange(366.0)
        tas = tas_series(vals, units="degC", start="2000-01-01")
        out = select_resample_op(tas, "count", freq="YS", season="JJA")
        assert out.values[0] == 92  # Jun+Jul+Aug

    def test_frost_days_month_indexer(self, tasmin_series):
        vals = np.full(366, 275.0)
        vals[0:31] = 270  # January
        vals[181:212] = 270  # July
        tn = tasmin_series(vals, start="2000-01-01")
        out = frost_days(tn, freq="YS", month=1)
        assert out.values[0] == 31
