"""aggregate_between_dates and select_time semantics pinned to the reference
(xclim:tests/test_generic.py:127-316, :512-700): end-exclusive bounds, NaN for
invalid/missing segments, calendar-exact string dates in leap years."""

import numpy as np
import pytest

from xclim_tpu.core.calendar import date_range, select_time_mask
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.indices.generic import aggregate_between_dates


def _ones(start, end, calendar="standard", lon=4):
    t = date_range(start, end=end, freq="D", calendar=calendar)
    data = ClimArray(np.ones((len(t), lon)), ("time", "lon"),
                     {"time": t}, {"units": "d"}, "x")
    return t, data


class TestAggregateBetweenDates:
    def test_calendars(self):
        # xclim:tests/test_generic.py:128 — sum of ones over [start, end)
        # equals end-start in days-since; NaN bounds and start>end give NaN
        t, data = _ones("1991-07-01", "1993-06-30")
        start_v = np.array([[200, 200, np.nan, np.nan], [200, 200, 60, 60]])
        end_v = np.array([[200, np.nan, 60, np.nan], [360, 60, 360, 80]])
        start = ClimArray(start_v, ("time", "lon"), attrs={"is_dayofyear": 1})
        end = ClimArray(end_v, ("time", "lon"), attrs={"is_dayofyear": 1})
        out = aggregate_between_dates(data, start, end, op="sum",
                                      freq="YS-JUL")
        # expected = e - s in days-since-segment-start (the reference's
        # doy_to_days_since formula): doy 200 falls in the segment's first
        # calendar year (d=17), doy 60 wraps into the next (d=243); s > e
        # (doy 60 start, doy 360 end) is NaN; equal bounds sum to 0
        expected = np.array([[0.0, np.nan, np.nan, np.nan],
                             [160.0, 226.0, np.nan, 20.0]])
        np.testing.assert_allclose(np.asarray(out.data), expected)

    def test_day_of_year_strings(self):
        # xclim:tests/test_generic.py:290 — leap year 1992 must give 273
        t = date_range("1990-08-01", end="1995-06-01", freq="D",
                       calendar="standard")
        data = ClimArray(np.ones(len(t)), ("time",), {"time": t},
                         {"units": "d"}, "x")
        out = aggregate_between_dates(data, "02-01", "10-31", op="sum",
                                      freq="YS")
        np.testing.assert_allclose(
            np.asarray(out.data), [np.nan, 272, 273, 272, 272, np.nan])

        with pytest.raises(ValueError):
            aggregate_between_dates(data, "02-31", "10-31", op="sum",
                                    freq="YS")

    def test_mixed_bounds(self):
        # string start + per-period doy end
        t, data = _ones("1991-01-01", "1992-12-31", lon=2)
        end = ClimArray(np.array([[100.0, np.nan], [150.0, 50.0]]),
                        ("time", "lon"), attrs={"is_dayofyear": 1})
        out = aggregate_between_dates(data, "02-01", end, op="sum",
                                      freq="YS")
        # 1991: doy 32 .. 99 inclusive = 68 days; NaN end → NaN
        # 1992 (leap): doy 32 .. 149 = 118 days; end 50 → doys 32..49 = 18
        np.testing.assert_allclose(np.asarray(out.data),
                                   [[68.0, np.nan], [118.0, 18.0]])


class TestSelectTimeDates:
    def test_leap_year_dates(self):
        # date_bounds must select calendar dates exactly in leap years
        t = date_range("2000-01-01", periods=366 + 365, freq="D",
                       calendar="standard")
        mask = select_time_mask(t, date_bounds=("12-25", "12-25"))
        idx = np.nonzero(mask)[0]
        # 2000 (leap): Dec 25 is doy 360 → index 359; 2001: index 366+358
        assert list(idx) == [359, 366 + 358]
        for i in idx:
            assert t.month[i] == 12 and t.day[i] == 25

    def test_wrap_around(self):
        t = date_range("2001-01-01", periods=365, freq="D",
                       calendar="noleap")
        mask = select_time_mask(t, date_bounds=("12-30", "01-02"))
        sel = np.nonzero(mask)[0]
        assert list(sel) == [0, 1, 363, 364]

    def test_exclusive_bounds(self):
        t = date_range("2001-01-01", periods=365, freq="D",
                       calendar="noleap")
        mask = select_time_mask(t, date_bounds=("03-01", "03-05"),
                                include_bounds=(False, True))
        sel = t.doy[mask]
        np.testing.assert_array_equal(sel, [61, 62, 63, 64])
