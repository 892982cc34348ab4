"""Indicator-level temperature suite (VERDICT r2 #6), ported from
xclim:tests/test_temperature.py. Series-based classes port exactly; classes
the reference runs on NRCAN/ERA5 files keep their assertions (K/degC
equality, NaN propagation, manual numpy value) on synthetic 3-D grids with
deliberately planted NaNs, since the image has no network.
"""

import numpy as np
import pytest

from xclim_tpu import atmos
from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray

K2C = 273.15


def grid3d(var, seed=0, T=365, ny=3, nx=2, mean=283.0, units="K",
           start="1990-01-01"):
    rng = np.random.default_rng(seed)
    v = (mean + 15 * np.sin(2 * np.pi * np.arange(T) / 365.0)[:, None, None]
         + rng.normal(0, 4, (T, ny, nx)))
    t = date_range(start, periods=T, freq="D", calendar="noleap")
    return ClimArray(v.astype(np.float32), ("time", "lat", "lon"),
                     {"time": t, "lat": np.arange(ny), "lon": np.arange(nx)},
                     {"units": units}, var), v


def vals(x):
    return np.asarray(x.values, dtype=np.float64)


class TestConsecutiveFrostDays:
    """xclim:tests/test_temperature.py:291 — exact port."""

    def _run(self, tasmin_series, a):
        # reference fixtures start 2000-07-01, one full YS-JUL period
        ts = tasmin_series(a, start="2000-07-01")
        return vals(atmos.consecutive_frost_days(ts))

    def test_one_freeze_day(self, tasmin_series):
        a = np.zeros(365) + K2C + 5.0
        a[2] -= 20
        np.testing.assert_array_equal(self._run(tasmin_series, a), [1])

    def test_three_freeze_day(self, tasmin_series):
        a = np.zeros(365) + K2C + 5.0
        a[2:5] -= 20
        np.testing.assert_array_equal(self._run(tasmin_series, a), [3])

    def test_two_equal_freeze_day(self, tasmin_series):
        a = np.zeros(365) + K2C + 5.0
        a[2:5] -= 20
        a[6:9] -= 20
        np.testing.assert_array_equal(self._run(tasmin_series, a), [3])

    def test_two_events_freeze_day(self, tasmin_series):
        a = np.zeros(365) + K2C + 5.0
        a[2:5] -= 20
        a[6:10] -= 20
        np.testing.assert_array_equal(self._run(tasmin_series, a), [4])

    def test_convert_units_freeze_day(self, tasmin_series):
        a = np.zeros(365) + 5.0
        a[2:5] -= 20
        a[6:10] -= 20
        ts = tasmin_series(a, start="2000-07-01")
        ts.attrs["units"] = "degC"
        np.testing.assert_array_equal(
            vals(atmos.consecutive_frost_days(ts)), [4])

    def test_one_nan_day(self, tasmin_series):
        a = np.zeros(365) + K2C + 5.0
        a[2] -= 20
        a[-1] = np.nan
        np.testing.assert_array_equal(self._run(tasmin_series, a), [np.nan])


class TestHeatWaveFrequency:
    """xclim:tests/test_temperature.py:698 — exact port."""

    def test_1d(self, tasmax_series, tasmin_series):
        tn1 = np.zeros(366)
        tx1 = np.zeros(366)
        tn1[:10] = np.array([20, 23, 23, 23, 23, 21, 23, 23, 23, 23])
        tx1[:10] = np.array([29, 31, 31, 31, 29, 31, 31, 31, 31, 31])
        tn = tasmin_series(tn1 + K2C, start="2000-01-01")
        tx = tasmax_series(tx1 + K2C, start="2000-01-01")
        tnC = tasmin_series(tn1, start="2000-01-01")
        tnC.attrs["units"] = "degC"
        txC = tasmax_series(tx1, start="2000-01-01")
        txC.attrs["units"] = "degC"

        hwf = atmos.heat_wave_frequency(
            tn, tx, thresh_tasmin="22 degC", thresh_tasmax="30 degC",
            freq="YS")
        hwfC = atmos.heat_wave_frequency(
            tnC, txC, thresh_tasmin="22 degC", thresh_tasmax="30 degC",
            freq="YS")
        np.testing.assert_array_equal(vals(hwf), vals(hwfC))
        np.testing.assert_allclose(vals(hwf)[:1], 2)

        hwf = atmos.heat_wave_frequency(
            tn, tx, thresh_tasmin="22 degC", thresh_tasmax="30 degC",
            window=4, freq="YS")
        np.testing.assert_allclose(vals(hwf)[:1], 1)
        hwf = atmos.heat_wave_frequency(
            tn, tx, thresh_tasmin="10 degC", thresh_tasmax="10 degC",
            freq="YS")
        np.testing.assert_allclose(vals(hwf)[:1], 1)
        hwf = atmos.heat_wave_frequency(
            tn, tx, thresh_tasmin="40 degC", thresh_tasmax="40 degC",
            freq="YS")
        np.testing.assert_allclose(vals(hwf)[:1], 0)


class TestHeatWaveMaxLength:
    """xclim:tests/test_temperature.py:728 — exact port."""

    def test_1d(self, tasmax_series, tasmin_series):
        tn1 = np.zeros(366)
        tx1 = np.zeros(366)
        tn1[:10] = np.array([20, 23, 23, 23, 23, 21, 23, 23, 23, 23])
        tx1[:10] = np.array([29, 31, 31, 31, 29, 31, 31, 31, 31, 31])
        tn = tasmin_series(tn1 + K2C, start="2000-01-01")
        tx = tasmax_series(tx1 + K2C, start="2000-01-01")

        hwf = atmos.heat_wave_max_length(
            tn, tx, thresh_tasmin="22 degC", thresh_tasmax="30 degC",
            freq="YS")
        np.testing.assert_allclose(vals(hwf)[:1], 4)
        hwf = atmos.heat_wave_max_length(
            tn, tx, thresh_tasmin="20 degC", thresh_tasmax="30 degC",
            window=4, freq="YS")
        np.testing.assert_allclose(vals(hwf)[:1], 5)
        hwf = atmos.heat_wave_max_length(
            tn, tx, thresh_tasmin="10 degC", thresh_tasmax="10 degC",
            freq="YS")
        np.testing.assert_allclose(vals(hwf)[:1], 10)
        hwf = atmos.heat_wave_max_length(
            tn, tx, thresh_tasmin="40 degC", thresh_tasmax="40 degC",
            freq="YS")
        np.testing.assert_allclose(vals(hwf)[:1], 0)


class TestHeatWaveTotalLength:
    """xclim:tests/test_temperature.py:758 — exact port (1d part)."""

    def test_1d(self, tasmax_series, tasmin_series):
        tn1 = np.zeros(366)
        tx1 = np.zeros(366)
        tn1[:10] = np.array([20, 23, 23, 23, 23, 21, 23, 23, 23, 23])
        tx1[:10] = np.array([29, 31, 31, 31, 29, 31, 31, 31, 31, 31])
        tn = tasmin_series(tn1 + K2C, start="2000-01-01")
        tx = tasmax_series(tx1 + K2C, start="2000-01-01")

        hwf = atmos.heat_wave_total_length(
            tn, tx, thresh_tasmin="22 degC", thresh_tasmax="30 degC",
            freq="YS")
        np.testing.assert_allclose(vals(hwf)[:1], 7)
        hwf = atmos.heat_wave_total_length(
            tn, tx, thresh_tasmin="20 degC", thresh_tasmax="30 degC",
            window=4, freq="YS")
        np.testing.assert_allclose(vals(hwf)[:1], 5)
        hwf = atmos.heat_wave_total_length(
            tn, tx, thresh_tasmin="10 degC", thresh_tasmax="10 degC",
            freq="YS")
        np.testing.assert_allclose(vals(hwf)[:1], 10)
        hwf = atmos.heat_wave_total_length(
            tn, tx, thresh_tasmin="40 degC", thresh_tasmax="40 degC",
            freq="YS")
        np.testing.assert_allclose(vals(hwf)[:1], 0)


class TestHeatWaveIndex:
    """xclim:tests/test_temperature.py:821 — exact port."""

    def test_simple(self, tasmax_series):
        tx = np.zeros(366)
        tx[:10] = np.array([29, 31, 31, 31, 29, 31, 31, 31, 31, 31])
        tx = tasmax_series(tx + K2C, start="2000-01-01")
        np.testing.assert_array_equal(
            vals(atmos.heat_wave_index(tx, freq="YS")), [10])

    def test_convert_units(self, tasmax_series):
        tx = np.zeros(366)
        tx[:10] = np.array([29, 31, 31, 31, 29, 31, 31, 31, 31, 31])
        tx = tasmax_series(tx, start="2000-01-01")
        tx.attrs["units"] = "degC"
        np.testing.assert_array_equal(
            vals(atmos.heat_wave_index(tx, freq="YS")), [10])

    def test_nan_presence(self, tasmax_series):
        tx = np.zeros(366)
        tx[:10] = np.array([29, 31, 31, 31, 29, 31, 31, 31, 31, 31])
        tx[-1] = np.nan
        tx = tasmax_series(tx + K2C, start="2000-01-01")
        np.testing.assert_array_equal(
            vals(atmos.heat_wave_index(tx, freq="YS")), [np.nan])


class TestHotSpells:
    """xclim:tests/test_temperature.py:1483-1546 — exact ports."""

    def _tx(self, tasmax_series):
        a = np.zeros(366)
        a[:10] = np.array([29, 31, 31, 31, 29, 31, 31, 31, 31, 31])
        return tasmax_series(a + K2C, start="2000-01-01")

    def test_frequency(self, tasmax_series):
        out = atmos.hot_spell_frequency(self._tx(tasmax_series))
        np.testing.assert_array_equal(vals(out), 2)

    def test_max_length(self, tasmax_series):
        out = atmos.hot_spell_max_length(self._tx(tasmax_series))
        np.testing.assert_array_equal(vals(out), 5)

    def test_total_length(self, tasmax_series):
        out = atmos.hot_spell_total_length(self._tx(tasmax_series))
        np.testing.assert_array_equal(vals(out), 8)

    def test_max_magnitude(self, tasmax_series):
        tx = np.zeros(366)
        tx[:5] = np.array([30, 30, 30, 30, 30])
        tx = tasmax_series(tx + K2C, start="2000-01-01")
        out = atmos.hot_spell_max_magnitude(tx, freq="YS")
        np.testing.assert_array_equal(vals(out), [25])

    def test_max_magnitude_window1(self, tasmax_series):
        tx = np.zeros(366)
        tx[5:8] = np.array([30, 0, 30])
        tx = tasmax_series(tx + K2C, start="2000-01-01")
        out = atmos.hot_spell_max_magnitude(tx, window=1, freq="YS")
        np.testing.assert_array_equal(vals(out), [5])
        tx = np.zeros(366)
        tx[5:7] = np.array([30, 30])
        tx = tasmax_series(tx + K2C, start="2000-01-01")
        out = atmos.hot_spell_max_magnitude(tx, window=1, freq="YS")
        np.testing.assert_array_equal(vals(out), [10])

    def test_max_magnitude_nan(self, tasmax_series):
        tx = np.zeros(366)
        tx[:5] = np.array([30, 30, 30, 30, 30])
        tx[-1] = np.nan
        tx = tasmax_series(tx + K2C, start="2000-01-01")
        out = atmos.hot_spell_max_magnitude(tx, freq="YS")
        np.testing.assert_array_equal(vals(out), [np.nan])


class TestColdSpells:
    """xclim:tests/test_temperature.py:1556-1588 — exact ports."""

    def _tg(self, tas_series):
        a = np.zeros(366)
        a[:10] = np.array([-9, -11, -11, -11, -9, -11, -11, -11, -11, -11])
        return tas_series(a + K2C, start="2000-01-01")

    def test_frequency(self, tas_series):
        out = atmos.cold_spell_frequency(self._tg(tas_series), freq="YS")
        np.testing.assert_array_equal(vals(out), 1)

    def test_max_length(self, tas_series):
        out = atmos.cold_spell_max_length(self._tg(tas_series), freq="YS")
        np.testing.assert_array_equal(vals(out), 5)

    def test_total_length(self, tas_series):
        out = atmos.cold_spell_total_length(self._tg(tas_series), freq="YS")
        np.testing.assert_array_equal(vals(out), 8)


class TestThresholdCounts3D:
    """The reference's NRCAN-file pattern (xclim:tests/test_temperature.py
    TestFrostDays/TestIceDays/TestTnDaysBelow/TestTxDaysAbove/TestHotDays,
    :406-474, :961-1020, :1589): K-vs-degC equality, planted-NaN
    propagation, and a manual numpy value for one cell — on synthetic 3-D."""

    @pytest.mark.parametrize("ind,var,op_thresh,kw", [
        (atmos.frost_days, "tasmin", ("<", K2C), {}),
        (atmos.ice_days, "tasmax", ("<", K2C), {}),
        (atmos.tn_days_below, "tasmin", ("<", K2C - 10),
         {"thresh": "-10 degC"}),
        (atmos.tx_days_above, "tasmax", (">", K2C + 25), {}),
        (atmos.hot_days, "tasmax", (">", K2C + 25), {}),
    ], ids=["frost_days", "ice_days", "tn_days_below", "tx_days_above",
            "hot_days"])
    def test_3d_with_nans(self, ind, var, op_thresh, kw):
        op, thresh = op_thresh
        da, raw = grid3d(var, seed=11, mean=K2C + 10)
        raw = np.asarray(da.values, np.float64).copy()
        raw[180, 1, 0] = np.nan
        da = da.copy(data=raw.astype(np.float32))
        daC = da.copy(data=(raw - K2C).astype(np.float32))
        daC.attrs = dict(da.attrs)
        daC.attrs["units"] = "degC"
        fd = ind(da, freq="YS", **kw)
        fdC = ind(daC, freq="YS", **kw)
        np.testing.assert_array_equal(vals(fd), vals(fdC))
        x1 = raw[:, 0, 0]
        want = (x1 < thresh).sum() if op == "<" else (x1 > thresh).sum()
        assert np.allclose(want, vals(fd)[0, 0, 0])
        assert np.isnan(vals(fd)[0, 1, 0])

    def test_cooling_degree_days_3d(self):
        da, _ = grid3d("tasmax", seed=12, mean=K2C + 16)
        raw = np.asarray(da.values, np.float64).copy()
        raw[180, 1, 0] = np.nan
        da = da.copy(data=raw.astype(np.float32))
        cdd = atmos.cooling_degree_days(da, thresh="18 degC", freq="YS")
        x1 = raw[:, 0, 0].astype(np.float32)
        thresh = np.float32(18 + K2C)
        want = (x1[x1 > thresh] - thresh).sum()
        np.testing.assert_allclose(want, vals(cdd)[0, 0, 0], rtol=1e-5)
        assert np.isnan(vals(cdd)[0, 1, 0])

    def test_daily_freezethaw_3d(self):
        tx, _ = grid3d("tasmax", seed=13, mean=K2C + 2)
        tn = tx.copy(data=tx.data - 5.0)
        tn.attrs = dict(tx.attrs)
        tn.name = "tasmin"
        rawn = np.asarray(tn.values, np.float64).copy()
        rawn[180, 1, 0] = np.nan
        tn = tn.copy(data=rawn.astype(np.float32))
        frzthw = atmos.daily_freezethaw_cycles(tn, tx, freq="YS")
        min1 = rawn[:, 0, 0]
        max1 = np.asarray(tx.values, np.float64)[:, 0, 0]
        want = ((min1 <= K2C) & (max1 > K2C)).sum()
        np.testing.assert_allclose(want, vals(frzthw)[0, 0, 0])
        assert np.isnan(vals(frzthw)[0, 1, 0])


class TestGrowingSeasonLength:
    """xclim:tests/test_temperature.py:904 — exact port (no-dask parts)."""

    def _ts(self, tas_series, a, units="K"):
        ts = tas_series(a, start="2000-01-01")
        if units != "K":
            ts.attrs["units"] = units
        return ts

    def test_single_year(self, tas_series):
        rng = np.random.default_rng(0)
        a = np.zeros(366) + K2C
        t = date_range("2000-01-01", periods=366, freq="D",
                       calendar="standard")
        tt = (t.month >= 5) & (t.month <= 8)
        a[tt] += rng.uniform(5.5, 23, tt.sum())
        out = atmos.growing_season_length(self._ts(tas_series, a))
        np.testing.assert_array_equal(vals(out), tt.sum())

    def test_convert_units(self, tas_series):
        rng = np.random.default_rng(1)
        a = np.zeros(366)
        t = date_range("2000-01-01", periods=366, freq="D",
                       calendar="standard")
        tt = (t.month >= 5) & (t.month <= 8)
        a[tt] += rng.uniform(5.5, 23, tt.sum())
        out = atmos.growing_season_length(self._ts(tas_series, a,
                                                   units="degC"))
        np.testing.assert_array_equal(vals(out), tt.sum())

    def test_nan_presence(self, tas_series):
        rng = np.random.default_rng(2)
        a = np.zeros(366)
        a[50] = np.nan
        t = date_range("2000-01-01", periods=366, freq="D",
                       calendar="standard")
        tt = (t.month >= 5) & (t.month <= 8)
        a[tt] += rng.uniform(5.5, 23, tt.sum())
        a[50] = np.nan
        out = atmos.growing_season_length(self._ts(tas_series, a,
                                                   units="degC"))
        np.testing.assert_array_equal(vals(out), [np.nan])

    def test_multiyear(self, tas_series):
        rng = np.random.default_rng(3)
        a = np.zeros(366 * 10)
        t = date_range("2000-01-01", periods=366 * 10, freq="D",
                       calendar="standard")
        tt = (t.month >= 5) & (t.month <= 8)
        a[tt] += rng.uniform(5.5, 23, tt.sum())
        out = atmos.growing_season_length(self._ts(tas_series, a,
                                                   units="degC"))
        np.testing.assert_array_equal(vals(out)[3], tt[0:366].sum())


class TestTxTnStats3D:
    """The reference's TestTx/TestTn pattern (xclim:tests/test_temperature.py
    :194-291): min <= mean <= max per period, unit attrs, NaN propagation."""

    def test_tx_ordering_and_nan(self):
        da, _ = grid3d("tasmax", seed=14, mean=K2C + 15)
        raw = np.asarray(da.values, np.float64).copy()
        raw[180, 1, 0] = np.nan
        da = da.copy(data=raw.astype(np.float32))
        txmin = vals(atmos.tx_min(da, freq="YS"))
        txmean = vals(atmos.tx_mean(da, freq="YS"))
        txmax = vals(atmos.tx_max(da, freq="YS"))
        ok = ~np.isnan(txmean)
        assert (txmin[ok] <= txmean[ok]).all()
        assert (txmean[ok] <= txmax[ok]).all()
        for o in (txmin, txmean, txmax):
            assert np.isnan(o[0, 1, 0])
        x1 = raw[:, 0, 0]
        np.testing.assert_allclose(txmax[0, 0, 0], x1.max(), rtol=1e-6)
        np.testing.assert_allclose(txmin[0, 0, 0], x1.min(), rtol=1e-6)
        np.testing.assert_allclose(txmean[0, 0, 0], x1.mean(), rtol=1e-5)

    def test_tn_units_attr(self):
        # the reference's TestTxMean.test_attrs checks units follow the
        # input at the INDEX level (xclim:tests/test_indices.py TestTxMean)
        from xclim_tpu import indices

        da, _ = grid3d("tasmin", seed=15, mean=K2C + 2)
        out = indices.tn_mean(da, freq="YS")
        assert out.attrs["units"] == "K"
        daC = da.copy(data=da.data - K2C)
        daC.attrs = dict(da.attrs)
        daC.attrs["units"] = "degC"
        outC = indices.tn_mean(daC, freq="YS")
        assert outC.attrs["units"] == "degC"
        np.testing.assert_allclose(vals(out) - K2C, vals(outC), atol=1e-4)
