"""Calendar engine tests (mirrors reference semantics from
xclim:src/xclim/core/calendar.py and tests/test_calendar.py)."""

import numpy as np
import pytest

from xclim_tpu.core.calendar import (
    TimeIndex,
    date_range,
    date_to_ordinal,
    day_of_year,
    days_in_month,
    days_in_year,
    is_leap_year,
    max_doy,
    ordinal_to_date,
    parse_offset,
    construct_offset,
    compare_offsets,
    percentile_doy_table,
    resample_segments,
    select_time_mask,
)


class TestBasics:
    def test_leap(self):
        assert is_leap_year(2000, "standard")
        assert not is_leap_year(1900, "standard")
        assert is_leap_year(1900, "julian")
        assert not is_leap_year(2000, "noleap")
        assert is_leap_year(1999, "all_leap")

    def test_days_in_month(self):
        assert days_in_month(2000, 2) == 29
        assert days_in_month(2001, 2) == 28
        assert days_in_month(2001, 2, "360_day") == 30
        assert days_in_month(2001, 1, "360_day") == 30

    def test_days_in_year(self):
        assert days_in_year(2000) == 366
        assert days_in_year(2001) == 365
        assert days_in_year(2001, "360_day") == 360

    def test_doy(self):
        assert day_of_year(2001, 1, 1) == 1
        assert day_of_year(2001, 12, 31) == 365
        assert day_of_year(2000, 12, 31) == 366
        assert day_of_year(2000, 3, 1) == 61
        assert day_of_year(2001, 3, 1) == 60

    def test_ordinal_roundtrip(self):
        for cal in ("standard", "julian", "noleap", "all_leap", "360_day"):
            y = np.arange(1900, 2101)
            m = np.full_like(y, 7)
            d = np.full_like(y, 15)
            o = date_to_ordinal(y, m, d, cal)
            yy, mm, dd = ordinal_to_date(o, cal)
            np.testing.assert_array_equal(yy, y)
            np.testing.assert_array_equal(mm, m)
            np.testing.assert_array_equal(dd, d)

    def test_ordinal_contiguous(self):
        # every calendar: consecutive days differ by 1 ordinal
        for cal in ("standard", "julian", "noleap", "all_leap", "360_day"):
            t = date_range("1999-01-01", periods=800, freq="D", calendar=cal)
            assert np.all(np.diff(t.ordinal) == 1)

    def test_vs_numpy_datetime(self):
        t = date_range("1987-05-02", periods=1000, freq="D")
        dt64 = t.to_datetime64()
        expect = np.datetime64("1987-05-02") + np.arange(1000).astype("timedelta64[D]")
        np.testing.assert_array_equal(dt64.astype("datetime64[D]"), expect)
        rt = TimeIndex.from_datetime64(dt64)
        assert rt == t


class TestDateRange:
    def test_daily(self):
        t = date_range("2000-01-01", periods=366, freq="D")
        assert len(t) == 366
        assert t.year[-1] == 2000 and t.month[-1] == 12 and t.day[-1] == 31

    def test_end(self):
        t = date_range("2000-01-01", end="2000-01-31", freq="D")
        assert len(t) == 31

    def test_monthly_start(self):
        t = date_range("2000-01-01", periods=12, freq="MS")
        assert list(t.month) == list(range(1, 13))
        assert np.all(t.day == 1)

    def test_month_end(self):
        t = date_range("2000-01-31", periods=3, freq="ME")
        assert list(t.day) == [31, 29, 31]

    def test_hourly(self):
        t = date_range("2000-01-01", periods=48, freq="h")
        assert t.hour[25] == 1 and t.day[25] == 2

    def test_yearly(self):
        t = date_range("2000-01-01", periods=5, freq="YS")
        assert list(t.year) == [2000, 2001, 2002, 2003, 2004]


class TestInferFreq:
    @pytest.mark.parametrize("freq", ["D", "7D", "h", "MS", "YS", "QS-DEC", "6h"])
    def test_roundtrip(self, freq):
        t = date_range("2000-01-01", periods=20, freq=freq)
        assert t.infer_freq() == freq

    def test_noleap(self):
        t = date_range("2000-01-01", periods=400, freq="D", calendar="noleap")
        assert t.infer_freq() == "D"
        assert max_doy("noleap") == 365


class TestParseOffset:
    @pytest.mark.parametrize(
        "freq,expected",
        [
            ("D", (1, "D", True, None)),
            ("7D", (7, "D", True, None)),
            ("MS", (1, "M", True, None)),
            ("YS", (1, "Y", True, "JAN")),
            ("YS-JUL", (1, "Y", True, "JUL")),
            ("YE", (1, "Y", False, "DEC")),
            ("QS-DEC", (1, "Q", True, "DEC")),
            ("W", (1, "W", True, None)),
            ("3h", (3, "h", True, None)),
            ("min", (1, "min", True, None)),
        ],
    )
    def test_parse(self, freq, expected):
        assert parse_offset(freq) == expected

    def test_construct(self):
        assert construct_offset(1, "Y", True, "JUL") == "YS-JUL"
        assert construct_offset(1, "M", True, None) == "MS"
        assert construct_offset(7, "D", True, None) == "7D"

    def test_compare(self):
        assert compare_offsets("D", "<", "MS")
        assert compare_offsets("YS", ">", "QS-DEC")


class TestResampleSegments:
    def test_monthly(self):
        t = date_range("2000-01-01", periods=366, freq="D")
        spec = resample_segments(t, "MS")
        assert spec.nseg == 12
        assert list(spec.counts) == [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
        assert list(spec.expected) == list(spec.counts)
        assert spec.labels.month[0] == 1 and spec.labels.day[0] == 1

    def test_yearly_anchored(self):
        t = date_range("2000-01-01", periods=365 * 3, freq="D")
        spec = resample_segments(t, "YS-JUL")
        # 1095 days: Jul1999 (partial), Jul2000, Jul2001, Jul2002 (partial) periods
        assert spec.nseg == 4
        assert spec.labels.month[0] == 7 and spec.labels.year[0] == 1999
        assert spec.expected[1] == 365  # Jul2000-Jun2001 has no Feb 29

    def test_seasonal(self):
        t = date_range("2000-01-01", periods=366, freq="D")
        spec = resample_segments(t, "QS-DEC")
        # seasons: DJF (Dec1999 start, partial), MAM, JJA, SON, DJF(Dec 2000)
        assert spec.nseg == 5
        assert spec.labels.month[0] == 12 and spec.labels.year[0] == 1999
        assert spec.counts[0] == 60  # Jan+Feb 2000
        assert spec.expected[0] == 91  # Dec+Jan+Feb

    def test_partial_period_expected(self):
        t = date_range("2000-01-15", periods=30, freq="D")
        spec = resample_segments(t, "MS")
        assert spec.counts[0] == 17  # Jan 15-31
        assert spec.expected[0] == 31

    def test_weekly(self):
        # 2000-01-03 is a Monday
        t = date_range("2000-01-03", periods=21, freq="D")
        spec = resample_segments(t, "W")
        assert spec.nseg == 3
        assert list(spec.counts) == [7, 7, 7]


class TestSelectTime:
    def test_season(self):
        t = date_range("2000-01-01", periods=366, freq="D")
        m = select_time_mask(t, season="DJF")
        assert m.sum() == 31 + 29 + 31  # Jan Feb Dec of 2000
        m2 = select_time_mask(t, season=["JJA"])
        assert m2.sum() == 30 + 31 + 31

    def test_month(self):
        t = date_range("2000-01-01", periods=366, freq="D")
        assert select_time_mask(t, month=2).sum() == 29
        assert select_time_mask(t, month=[1, 2]).sum() == 60

    def test_doy_bounds_wrap(self):
        t = date_range("2000-01-01", periods=366, freq="D")
        m = select_time_mask(t, doy_bounds=(360, 5))
        assert m.sum() == 7 + 5

    def test_date_bounds(self):
        t = date_range("2000-01-01", periods=366, freq="D")
        m = select_time_mask(t, date_bounds=("04-01", "06-30"))
        assert m.sum() == 30 + 31 + 30


class TestPercentileDoyTable:
    def test_shape_and_content(self):
        t = date_range("2000-01-01", end="2003-12-31", freq="D")
        table, doys = percentile_doy_table(t, window=5)
        assert table.shape == (366, 4 * 5)
        assert doys[0] == 1 and doys[-1] == 366
        # doy=3 of year 2000 (index 2): window indices 0..4 present
        row = table[2]
        assert set(row[:5]) == {0, 1, 2, 3, 4}
        # first doy row has -1 padding (series edge)
        assert (table[0] == -1).sum() == 2  # Dec 30-31 1999 missing
        # doy 366 only exists in 2000 → 3 years × window invalid center but
        # neighbours still contribute
        row366 = table[-1]
        assert (row366 >= 0).sum() > 0

    def test_noleap(self):
        t = date_range("2000-01-01", end="2001-12-31", freq="D", calendar="noleap")
        table, doys = percentile_doy_table(t, window=3)
        assert table.shape == (365, 2 * 3)


@pytest.mark.slow
class TestResampleFuzz:
    """Randomized cross-check of segment reductions against a pure-numpy
    per-period groupby, across frequencies and calendars."""

    @pytest.mark.parametrize("freq", ["MS", "YS", "QS-DEC", "2MS", "W",
                                      "YS-JUL", "7D"])
    @pytest.mark.parametrize("calendar", ["standard", "noleap", "360_day"])
    def test_sum_mean_max_match_numpy(self, freq, calendar):
        import jax.numpy as jnp

        from xclim_tpu.core.dataarray import ClimArray

        import zlib

        # deterministic across processes (builtin hash() is salted per run)
        rng = np.random.default_rng(zlib.crc32(f"{freq}|{calendar}".encode()))
        n = 700
        t = date_range("2000-03-15", periods=n, freq="D", calendar=calendar)
        v = rng.normal(0, 10, n).astype(np.float32)
        v[rng.random(n) < 0.05] = np.nan
        da = ClimArray(jnp.asarray(v), ("time",), {"time": t},
                       {"units": "K"}, "x")
        spec = resample_segments(t, freq)
        seg = np.asarray(spec.seg_id)
        for op, npop in [("sum", np.nansum), ("mean", np.nanmean),
                         ("max", np.nanmax), ("min", np.nanmin)]:
            got = np.asarray(getattr(da.resample(freq), op)().data)
            want = np.full(spec.nseg, np.nan, np.float32)
            import warnings as _w

            with _w.catch_warnings():
                _w.simplefilter("ignore")
                for g in range(spec.nseg):
                    vals = v[seg == g]
                    if np.isfinite(vals).any():
                        want[g] = npop(vals)
                    elif op == "sum":
                        want[g] = 0.0
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-3,
                                       err_msg=f"{freq}/{calendar}/{op}")
