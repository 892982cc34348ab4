"""Run-length engine suite (VERDICT r2 #6), ported from
xclim:tests/test_run_length.py. Dask/ufunc parameterizations collapse to the
single scan kernel; every expected value is the reference's.
"""

import numpy as np
import pytest

from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.indices import run_length as rl


def vals(x):
    return np.asarray(x.values if hasattr(x, "values") else x,
                      dtype=np.float64)


def bool_series(t, start="2000-01-01", calendar="standard"):
    t = np.asarray(t)
    time = date_range(start, periods=len(t), freq="D", calendar=calendar)
    return ClimArray(t != 0, ("time",), {"time": time}, {}, "cond")


def bool_2d(t, start="2000-01-01"):
    """Two identical series stacked on dim0 (the reference's xr.concat)."""
    t = np.asarray(t)
    time = date_range(start, periods=len(t), freq="D", calendar="standard")
    data = np.stack([t != 0, t != 0])
    return ClimArray(data, ("dim0", "time"),
                     {"dim0": np.arange(2), "time": time}, {}, "cond")


class TestSuspiciousRun:
    """xclim:tests/test_run_length.py:14-62."""

    def mk(self, t, start="2000-01-01"):
        time = date_range(start, periods=len(t), freq="D")
        return ClimArray(np.asarray(t, dtype=np.float64), ("time",),
                         {"time": time}, {"units": "K"}, "tas")

    def test_simple(self):
        t = np.zeros(365)
        sus = vals(rl.suspicious_run(self.mk(t)))
        assert sus.all()

        t = np.zeros(365)
        t[30:39] = 5
        sus = vals(rl.suspicious_run(self.mk(t), thresh=0))
        assert not sus[30:39].all()
        assert not sus[0:10].all()

        t = np.zeros(365)
        t[30:40] = 1
        sus = vals(rl.suspicious_run(self.mk(t), thresh=0))
        assert sus[30:40].all()
        assert not sus[30:41].all()

    def test_above_thresh(self):
        t = np.zeros(365)
        t[30:40] = 0.1
        t[40:50] = 1e-6
        t[50:60] = 0.0001
        t[60:65] = 1e-9
        tas = self.mk(t)

        sus = vals(rl.suspicious_run(tas, thresh=0, window=5))
        assert not sus[:30].any()
        assert sus[30:65].all()
        assert not sus[65:].any()

        sus = vals(rl.suspicious_run(tas, thresh=1e-9, window=5))
        assert sus[30:60].all()
        assert not sus[60:].any()

        sus = vals(rl.suspicious_run(tas, thresh=1e-5, window=5))
        assert sus[30:40].all()
        assert not sus[40:50].any()
        assert sus[50:60].all()
        assert not sus[60:].any()

        sus = vals(rl.suspicious_run(tas, thresh=0, window=11))
        assert not sus.any()

    def test_2d(self):
        """xclim:tests/test_run_length.py:65-81 (dask case, minus dask)."""
        values = np.zeros((10, 200))
        values[:, :10] = 1
        values[9, :] = 1
        time = date_range("2015-01-01", periods=200, freq="D")
        da = ClimArray(values, ("qq", "time"),
                       {"qq": np.arange(10), "time": time}, {}, "x")
        sus = vals(rl.suspicious_run(da, thresh=0))
        assert sus[:, :10].all()
        assert not sus[1, 10:].any()
        assert sus[9].all()

        sus = vals(rl.suspicious_run(da))
        assert sus.all()


@pytest.mark.parametrize("index", ["first", "last"])
def test_rle(index):
    """xclim:tests/test_run_length.py:100-130."""
    values = np.zeros((10, 365, 4, 4))
    values[:, 1:11, ...] = 1
    time = date_range("2000-01-01", periods=365, freq="D")
    da = ClimArray(values != 0, ("a", "time", "b", "c"),
                   {"a": np.arange(10), "time": time,
                    "b": np.arange(4), "c": np.arange(4)}, {}, "x")
    out = vals(rl.rle(da, index=index)).mean(axis=(0, 2, 3))
    if index == "last":
        expected = np.zeros(365)
        expected[1:10] = np.nan
        expected[10] = 10
    else:
        expected = np.zeros(365)
        expected[1] = 10
        expected[2:11] = np.nan
    np.testing.assert_array_equal(out, expected)


@pytest.mark.parametrize("index", ["first", "last"])
def test_runs_with_holes_identity(index):
    """xclim:tests/test_run_length.py:133-147."""
    values = np.zeros((10, 365, 4, 4))
    values[:, 1:11, ...] = 1
    time = date_range("2000-01-01", periods=365, freq="D")
    da = ClimArray(values, ("a", "time", "b", "c"),
                   {"a": np.arange(10), "time": time,
                    "b": np.arange(4), "c": np.arange(4)}, {}, "x")
    events = rl.runs_with_holes(da != 0, 1, da == 0, 1)
    np.testing.assert_array_equal(vals(events), values)


def test_runs_with_holes():
    """xclim:tests/test_run_length.py:150-163."""
    values = np.zeros(365)
    a = [0, 1, 0, 1, 1, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 0,
         0, 0]
    values[: len(a)] = a
    da = bool_series(values)
    events = rl.runs_with_holes(da, 1, ~da, 3)
    expected = values * 0
    expected[1:11] = 1
    expected[15:20] = 1
    np.testing.assert_array_equal(vals(events), expected)


class TestStatisticsRun:
    """xclim:tests/test_run_length.py:166-296. 'resample before' is the
    reference's resample().map (runs cut at period boundaries); 'resample
    after' computes runs over the whole axis first."""

    def test_simple(self):
        values = np.zeros(365)
        values[1:11] = 1
        da = bool_series(values, start="2000-07-01")
        for before in (True, False):
            lt = vals(rl.rle_statistics(da, freq="ME", reducer="max",
                                        window=1, resample_before_rl=before))
            assert lt[0] == 10
            np.testing.assert_array_equal(lt[1:], 0)

    def test_start_at_0(self):
        values = np.zeros(365)
        values[0:10] = 1
        da = bool_series(values, start="2000-07-01")
        for before in (True, False):
            lt = vals(rl.rle_statistics(da, freq="ME", reducer="max",
                                        window=1, resample_before_rl=before))
            assert lt[0] == 10
            np.testing.assert_array_equal(lt[1:], 0)

    def test_end_start_at_0(self):
        values = np.zeros(365)
        values[-10:] = 1
        da = bool_series(values, start="2000-07-01")
        for before in (True, False):
            lt = vals(rl.rle_statistics(da, freq="ME", reducer="max",
                                        window=1, resample_before_rl=before))
            assert lt[-1] == 10
            np.testing.assert_array_equal(lt[:-1], 0)

    def test_all_true(self):
        values = np.ones(365)
        da = bool_series(values, start="2000-07-01")
        # resample before: each month's count
        lt = vals(rl.rle_statistics(da, freq="ME", reducer="max", window=1))
        np.testing.assert_array_equal(
            lt, [31, 31, 30, 31, 30, 31, 31, 28, 31, 30, 31, 30])
        # resample after: one 365-day run assigned to its start month
        lt = vals(rl.rle_statistics(da, freq="ME", reducer="max", window=1,
                                    resample_before_rl=False))
        expected = np.zeros(12)
        expected[0] = 365
        np.testing.assert_array_equal(lt, expected)

    def test_almost_all_true(self):
        values = np.ones(365)
        values[35] = 0
        da = bool_series(values, start="2000-07-01")
        lt = vals(rl.rle_statistics(da, freq="ME", reducer="max", window=1))
        np.testing.assert_array_equal(lt[0], 31)
        np.testing.assert_array_equal(lt[1], 26)

        lt = vals(rl.rle_statistics(da, freq="ME", reducer="max", window=1,
                                    resample_before_rl=False))
        np.testing.assert_array_equal(lt[0], 35)
        np.testing.assert_array_equal(lt[1], 365 - 35 - 1)

    def test_other_stats(self):
        values = np.ones(365)
        values[35] = 0
        da = bool_series(values, start="2000-01-01")

        for before in (True, False):
            lt = vals(rl.rle_statistics(da, freq="YS", reducer="min",
                                        window=1, resample_before_rl=before))
            assert lt == 35
            lt = vals(rl.rle_statistics(da, freq="YS", reducer="mean",
                                        window=36, resample_before_rl=before))
            assert lt == 329
            lt = vals(rl.rle_statistics(da, freq="YS", reducer="std",
                                        window=1, resample_before_rl=before))
            assert lt == 147

        lt = vals(rl.rle_statistics(da, freq="YS", reducer="q90", window=1,
                                    resample_before_rl=False))
        np.testing.assert_allclose(lt, 299.6)
        lt = vals(rl.rle_statistics(da, freq="YS", reducer="q10", window=1,
                                    resample_before_rl=False))
        np.testing.assert_allclose(lt, 64.4)
        lt = vals(rl.rle_statistics(da, freq=None, reducer="q90", window=1))
        np.testing.assert_allclose(lt, 299.6)
        lt = vals(rl.rle_statistics(da, freq=None, reducer="q10", window=1))
        np.testing.assert_allclose(lt, 64.4)

    @pytest.mark.parametrize("op", ["min", "max"])
    def test_resampling_order(self, op):
        values = np.ones(365)
        values[35:45] = 0
        da = bool_series(values, start="2000-01-01")
        before = vals(rl.rle_statistics(da, freq="MS", reducer=op, window=1))
        after = vals(rl.rle_statistics(da, freq="MS", reducer=op, window=1,
                                       resample_before_rl=False))
        assert (before != after).any()

        values = np.zeros(365)
        values[0:-1:31] = 1
        da = bool_series(values, start="2000-01-01")
        before = vals(rl.rle_statistics(da, freq="MS", reducer=op, window=1))
        after = vals(rl.rle_statistics(da, freq="MS", reducer=op, window=1,
                                       resample_before_rl=False))
        assert (before == after).any()


class TestFirstRun:
    """xclim:tests/test_run_length.py:299-353."""

    def test_real_simple(self):
        a = np.zeros(100)
        a[10:20] = 1
        i = vals(rl.first_run(bool_series(a), 5))
        assert i == 10

    @pytest.mark.parametrize("coord,expected",
                             [(False, 30), ("dayofyear", 31)])
    def test_simple(self, coord, expected):
        t = np.zeros(60)
        t[30:40] = 2
        runs = bool_2d(t)
        out = vals(rl.first_run(runs, window=1, coord=coord))
        np.testing.assert_array_equal(out, expected)

    @pytest.mark.parametrize("coord,expected",
                             [(False, [0, 0]), ("dayofyear", [1, 32])])
    def test_resample_after(self, coord, expected):
        t = np.zeros(60)
        t[0] = 2
        t[30:40] = 2
        runs = bool_2d(t)
        out = vals(rl.first_run(runs, window=1, coord=coord, freq="MS"))
        np.testing.assert_array_equal(out, np.array([expected, expected]))


class TestWindowedRunEvents:
    @pytest.mark.parametrize("index", ["first", "last"])
    def test_simple(self, index):
        a = np.zeros(50)
        a[4:7] = 1
        a[34:45] = 1
        assert vals(rl.windowed_run_events(bool_series(a), 3,
                                           index=index)) == 2


class TestWindowedRunCount:
    @pytest.mark.parametrize("index", ["first", "last"])
    def test_simple(self, index):
        a = np.zeros(50)
        a[4:7] = 1
        a[34:45] = 1
        assert vals(rl.windowed_run_count(bool_series(a), 3,
                                          index=index)) == 3 + 11


class TestWindowedMaxRunSum:
    @pytest.mark.parametrize("index", ["first", "last"])
    def test_simple(self, index):
        a = np.zeros(50)
        a[4:6] = 5    # too short
        a[25:30] = 5  # long enough, but not max
        a[35:45] = 5  # max sum => yields 10*5
        time = date_range("2000-01-01", periods=50, freq="D")
        da = ClimArray(a, ("time",), {"time": time}, {}, "x")
        assert vals(rl.windowed_max_run_sum(da, 3, index=index)) == 50


class TestLastRun:
    @pytest.mark.parametrize("coord,expected",
                             [(False, 39), ("dayofyear", 40)])
    def test_simple(self, coord, expected):
        t = np.zeros(60)
        t[30:40] = 2
        runs = bool_2d(t)
        out = vals(rl.last_run(runs, window=1, coord=coord))
        np.testing.assert_array_equal(out, expected)

    @pytest.mark.parametrize("coord,expected",
                             [(False, [30, 8]), ("dayofyear", [31, 40])])
    def test_resample_after(self, coord, expected):
        t = np.zeros(60)
        t[0] = 2
        t[30:40] = 2
        runs = bool_2d(t)
        out = vals(rl.last_run(runs, window=1, coord=coord, freq="MS"))
        np.testing.assert_array_equal(out, np.array([expected, expected]))


def test_run_bounds_synthetic():
    """xclim:tests/test_run_length.py:427-433 (time-indexed variant)."""
    a = np.array([0, 1, 1, 1, 0, 0, 1, 1, 1, 0])
    run = bool_series(a)
    bounds = vals(rl.run_bounds(run, coord=False, max_events=2))
    np.testing.assert_array_equal(bounds, [[1, 6], [4, 9]])


def test_run_bounds_doy():
    a = np.zeros(40)
    a[9:14] = 1
    a[20:30] = 1
    run = bool_series(a)
    bounds = vals(rl.run_bounds(run, coord="dayofyear", max_events=2))
    np.testing.assert_array_equal(bounds, [[10, 21], [15, 31]])


def test_keep_longest_run_synthetic():
    runs = bool_series(np.array([0, 1, 1, 1, 0, 0, 1, 1, 1, 0]))
    lrun = rl.keep_longest_run(runs)
    np.testing.assert_array_equal(
        vals(lrun), np.array([0, 1, 1, 1, 0, 0, 0, 0, 0, 0], dtype=bool))
    # keep_longest_run.sum == longest_run
    a = np.zeros(100)
    a[5:15] = 1
    a[40:45] = 1
    runs = bool_series(a)
    np.testing.assert_array_equal(vals(rl.keep_longest_run(runs)).sum(),
                                  vals(rl.longest_run(runs)))


class TestRunsWithDates:
    """xclim:tests/test_run_length.py:472-627."""

    @pytest.mark.parametrize(
        "date,end,expected",
        [("07-01", 210, 70),
         ("07-01", 190, 50),
         ("04-01", 150, 0),     # date falls early
         ("11-01", 150, 165),   # date ends late
         (None, 150, 10)])      # no date, real length
    def test_season_length(self, date, end, expected):
        t = np.zeros(360)
        t[140:end] = 1
        runs = bool_2d(t)
        out = vals(rl.season_length(runs, window=1, mid_date=date))
        np.testing.assert_array_equal(np.mean(out), expected)

    @pytest.mark.parametrize(
        "coord,date,end,expected",
        [("dayofyear", "07-01", 210, 211),
         (False, "07-01", 190, 190),
         ("dayofyear", "04-01", 150, np.nan),  # date falls early
         ("dayofyear", "11-01", 150, 306)])    # date ends late
    def test_run_end_after_date(self, coord, date, end, expected):
        t = np.zeros(360)
        t[140:end] = 1
        runs = bool_2d(t)
        out = vals(rl.run_end_after_date(runs, window=1, date=date,
                                         coord=coord))
        np.testing.assert_array_equal(np.mean(out), expected)

    @pytest.mark.parametrize(
        "coord,date,beg,expected",
        [("dayofyear", "07-01", 210, 211),
         (False, "07-01", 190, 190),
         ("dayofyear", "04-01", False, np.nan),  # no run
         ("dayofyear", "11-01", 150, 306)])      # run already started
    def test_first_run_after_date(self, coord, date, beg, expected):
        t = np.zeros(365)
        if beg:
            t[beg:] = 1
        runs = bool_2d(t)
        out = vals(rl.first_run_after_date(runs, window=1, date=date,
                                           coord=coord))
        np.testing.assert_array_equal(np.mean(out), expected)

    @pytest.mark.parametrize(
        "coord,date,end,expected",
        [("dayofyear", "07-01", 210, 183),
         (False, "07-01", 190, 182),
         ("dayofyear", "04-01", 150, np.nan),  # date falls early
         ("dayofyear", "11-01", 150, 150)])    # date ends late
    def test_last_run_before_date(self, coord, date, end, expected):
        t = np.zeros(360)
        t[140:end] = 1
        runs = bool_2d(t)
        out = vals(rl.last_run_before_date(runs, window=1, date=date,
                                           coord=coord))
        np.testing.assert_array_equal(np.mean(out), expected)

    @pytest.mark.parametrize(
        "calendar,expected",
        [("standard", [61, 60]), ("365_day", [60, 60]),
         ("366_day", [61, 61])])
    def test_run_with_dates_different_calendars(self, calendar, expected):
        time = date_range("2004-01-01", end="2005-12-31", freq="D",
                          calendar=calendar)
        tas = np.zeros(len(time))
        start = np.where((time.day == 1) & (time.month == 3))[0]
        tas[start[0]: start[0] + 250] = 5
        tas[start[1]: start[1] + 250] = 5
        da = ClimArray(tas, ("time",), {"time": time}, {}, "tas") > 0

        out = vals(rl.first_run_after_date(da, date="03-01", window=2,
                                           freq="YS-MAR"))
        np.testing.assert_array_equal(out[1:], expected)

        out = vals(rl.season_length(da, mid_date="03-02", window=2,
                                    freq="YS-MAR"))
        np.testing.assert_array_equal(out[1:], [250, 250])

        out = vals(rl.run_end_after_date(da, date="03-03", window=2,
                                         freq="YS-MAR"))
        np.testing.assert_array_equal(out[1:], np.array(expected) + 250)

        out = vals(rl.last_run_before_date(da, date="03-02", window=2,
                                           freq="YS-MAR"))
        np.testing.assert_array_equal(out[1:], np.array(expected) + 1)


def test_season():
    """xclim:tests/test_run_length.py:674-690."""
    t = np.zeros(360)
    t[140:150] = 1
    runs = bool_2d(t)
    out = rl.season(runs, window=2)
    np.testing.assert_array_equal(vals(out["start"]), [140, 140])
    np.testing.assert_array_equal(vals(out["end"]), [150, 150])
    np.testing.assert_array_equal(vals(out["length"]), [10, 10])
