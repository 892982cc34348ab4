"""Array-level calendar operations: convert_calendar, stack/unstack_periods,
mask_between_doys, run_bounds, thresholded_events, wind/synoptic indicators,
lag_snowpack_flow_peaks (reference: xclim tests/test_calendar.py et al.)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xclim_tpu.core.calendar import (
    convert_calendar,
    date_range,
    mask_between_doys,
    stack_periods,
    unstack_periods,
)
from xclim_tpu.core.dataarray import ClimArray


def _da(values, time, units=""):
    return ClimArray(jnp.asarray(np.asarray(values, dtype=np.float32)),
                     ("time",), {"time": time}, {"units": units}, "x")


class TestConvertCalendar:
    def test_standard_to_noleap(self):
        t = date_range("2000-01-01", end="2000-12-31", freq="D")
        da = _da(np.arange(366), t)
        out = convert_calendar(da, "noleap")
        assert len(out.time) == 365
        assert out.time.calendar == "noleap"
        # Feb 29 (index 59) dropped: value 59 missing
        v = np.asarray(out.data)
        assert 59.0 not in v
        assert v[58] == 58.0 and v[59] == 60.0

    def test_noleap_to_standard_missing(self):
        t = date_range("2000-01-01", end="2000-12-31", freq="D",
                       calendar="noleap")
        da = _da(np.arange(365), t)
        out = convert_calendar(da, "standard", missing=np.nan)
        assert len(out.time) == 366
        assert np.isnan(np.asarray(out.data)[59])  # Feb 29 inserted as NaN

    def test_roundtrip_identity(self):
        t = date_range("2001-01-01", end="2001-12-31", freq="D")  # non-leap
        da = _da(np.arange(365), t)
        out = convert_calendar(convert_calendar(da, "noleap"), "standard")
        np.testing.assert_array_equal(np.asarray(out.data), np.arange(365))


class TestStackPeriods:
    def test_roundtrip(self):
        t = date_range("2000-01-01", end="2005-12-31", freq="D",
                       calendar="noleap")
        da = _da(np.arange(len(t)), t)
        st = stack_periods(da, window=2, freq="YS")
        assert st.dims == ("period", "time")
        assert st.shape[0] == 3
        out = unstack_periods(st)
        np.testing.assert_array_equal(np.asarray(out.data),
                                      np.asarray(da.data))

    def test_min_length_drops_tail(self):
        t = date_range("2000-01-01", end="2004-12-31", freq="D",
                       calendar="noleap")
        da = _da(np.arange(len(t)), t)
        st = stack_periods(da, window=2, freq="YS")  # 5 years → 2 windows
        assert st.shape[0] == 2


class TestMaskBetweenDoys:
    def test_int_bounds(self):
        t = date_range("2001-01-01", end="2001-12-31", freq="D")
        da = _da(np.ones(365), t)
        m = mask_between_doys(da, (60, 70))
        assert int(np.asarray(m.data).sum()) == 11

    def test_wrapping_bounds(self):
        t = date_range("2001-01-01", end="2001-12-31", freq="D")
        da = _da(np.ones(365), t)
        m = mask_between_doys(da, (363, 3))
        assert int(np.asarray(m.data).sum()) == 6

    def test_exclusive_bounds(self):
        t = date_range("2001-01-01", end="2001-12-31", freq="D")
        da = _da(np.ones(365), t)
        m = mask_between_doys(da, (60, 70), include_bounds=(False, False))
        assert int(np.asarray(m.data).sum()) == 9


class TestRunBounds:
    def test_basic(self):
        from xclim_tpu.indices import run_length as rl

        t = date_range("2000-01-01", periods=12, freq="D")
        mask = ClimArray(
            jnp.asarray(np.array([0, 1, 1, 0, 0, 1, 0, 1, 1, 1, 0, 0],
                                 dtype=bool)),
            ("time",), {"time": t}, {}, "m")
        b = rl.run_bounds(mask, coord=False, max_events=4)
        np.testing.assert_array_equal(
            np.asarray(b.data),
            [[1, 5, 7, np.nan], [3, 6, 10, np.nan]])

    def test_doy_coord(self):
        from xclim_tpu.indices import run_length as rl

        t = date_range("2000-01-01", periods=6, freq="D")
        mask = ClimArray(jnp.asarray(np.array([0, 1, 1, 0, 0, 0], dtype=bool)),
                         ("time",), {"time": t}, {}, "m")
        b = rl.run_bounds(mask, coord="dayofyear", max_events=2)
        v = np.asarray(b.data)
        assert v[0, 0] == 2 and v[1, 0] == 4


class TestThresholdedEvents:
    def test_basic(self):
        from xclim_tpu.indices.generic import thresholded_events

        t = date_range("2000-01-01", periods=20, freq="D")
        v = np.array([0, 0, 5, 5, 5, 0, 0, 0, 6, 6, 0, 0, 0, 0, 7, 7, 7, 7,
                      0, 0], dtype=np.float32)
        pr = _da(v, t, units="mm/d")
        ds = thresholded_events(pr, "1 mm/d", ">", window=2)
        np.testing.assert_array_equal(
            np.asarray(ds["event_length"].data)[:3], [3, 2, 4])
        np.testing.assert_array_equal(
            np.asarray(ds["event_sum"].data)[:3], [15, 12, 28])
        np.testing.assert_array_equal(
            np.asarray(ds["event_start"].data)[:3], [3, 9, 15])

    def test_stop_condition(self):
        from xclim_tpu.indices.generic import thresholded_events

        t = date_range("2000-01-01", periods=10, freq="D")
        v = np.array([5, 5, 3, 3, 0, 0, 0, 0, 0, 0], dtype=np.float32)
        pr = _da(v, t, units="mm/d")
        # event continues while > 1; only ends when  <= 0.5 for 2 steps
        ds = thresholded_events(pr, "4 mm/d", ">", window=2,
                                thresh_stop="0.5 mm/d", op_stop="<=",
                                window_stop=2)
        assert np.asarray(ds["event_length"].data)[0] == 4
        assert np.asarray(ds["event_effective_length"].data)[0] == 2


class TestWindIndicators:
    def test_calm_windy(self):
        from xclim_tpu.indicators import atmos

        t = date_range("2001-01-01", end="2001-12-31", freq="D")
        v = np.full(365, 5.0, dtype=np.float32)
        v[:30] = 1.0  # calm month
        w = ClimArray(jnp.asarray(v), ("time",), {"time": t},
                      {"units": "m s-1", "standard_name": "wind_speed",
                       "cell_methods": "time: mean"}, "sfcWind")
        calm = atmos.calm_days(sfcWind=w, thresh="2 m s-1", freq="YS")
        windy = atmos.windy_days(sfcWind=w, thresh="3 m s-1", freq="YS")
        assert np.asarray(calm.data)[0] == 30
        assert np.asarray(windy.data)[0] == 335
        assert calm.attrs["units"] == "days"  # the reference keeps the declared spelling

    def test_sfcwindmax_stats(self):
        from xclim_tpu.indicators import atmos

        t = date_range("2001-01-01", end="2001-12-31", freq="D")
        v = np.linspace(1, 10, 365).astype(np.float32)
        w = ClimArray(jnp.asarray(v), ("time",), {"time": t},
                      {"units": "m s-1", "standard_name": "wind_speed",
                       "cell_methods": "time: max"}, "sfcWindmax")
        out = atmos.sfcWindmax_max(sfcWindmax=w, freq="YS")
        np.testing.assert_allclose(np.asarray(out.data)[0], 10.0, rtol=1e-6)


class TestJetStreamIndicator:
    def test_order_and_units(self):
        from xclim_tpu.indicators import atmos

        nlat = 11
        lats = np.linspace(20, 70, nlat)
        u = 20 * np.exp(-((lats[None, :] - 45) / 10) ** 2) * np.ones((365, 1))
        t = date_range("2001-01-01", periods=365, freq="D")
        ua = ClimArray(jnp.asarray(u.astype(np.float32)), ("time", "lat"),
                       {"time": t, "lat": lats},
                       {"units": "m s-1", "standard_name": "eastward_wind",
                        "cell_methods": "time: mean"}, "ua")
        jetlat, jetstr = atmos.jetstream_metric_woollings(ua=ua)
        assert jetlat.name == "jetlat" and jetstr.name == "jetstr"
        assert jetlat.attrs["units"] == "degrees_north"
        assert jetstr.attrs["units"] == "m s-1"
        lv = np.asarray(jetlat.data)
        ok = np.isfinite(lv)
        np.testing.assert_allclose(lv[ok], 45.0, atol=2.6)


class TestLagSnowpackFlowPeaks:
    def test_lag(self):
        from xclim_tpu.indices import lag_snowpack_flow_peaks

        t = date_range("2000-10-01", end="2002-09-30", freq="D",
                       calendar="noleap")
        n = len(t)
        d = np.arange(n) % 365
        snw = (np.exp(-((d - 150) / 30.0) ** 2) * 100).astype(np.float32)
        q = (np.exp(-((d - 210) / 10.0) ** 2) * 50 + 1).astype(np.float32)
        snw_a = ClimArray(jnp.asarray(snw), ("time",), {"time": t},
                          {"units": "kg m-2"}, "snw")
        q_a = ClimArray(jnp.asarray(q), ("time",), {"time": t},
                        {"units": "m3 s-1"}, "q")
        out = lag_snowpack_flow_peaks(snw_a, q_a)
        np.testing.assert_allclose(np.asarray(out.data), [60.0, 60.0],
                                   atol=1.5)
        assert out.attrs["units"] == "d"
