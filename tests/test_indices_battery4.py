"""Exact-value index battery, wave 4: agroclimatic indices, holiday snow,
wind conversion, Clausius-Clapeyron scaling, Tg/Tn/Tx range statistics, wet
spells, hardiness zones, humidity conversions (expected values re-derived
from the reference's class-per-index suite, xclim:tests/test_indices.py —
VERDICT r1 #5)."""

import numpy as np
import pytest

import xclim_tpu.indices as xci
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.core.units import convert_units_to

K2C = 273.15


def _set_date(vals, da, date, value):
    """Assign `value` at the step(s) whose ISO date == `date`
    (the ClimArray analogue of the reference's ``da.loc[date] = v``)."""
    t = da.time
    iso = np.array([t.isoformat(i)[:10] for i in range(len(t))])
    out = np.asarray(vals, dtype=np.float64).copy()
    out[iso == date] = value
    return out


class TestAgroclimaticIndices:
    """xclim:tests/test_indices.py:263 (portable members)."""

    def test_qian_weighted_mean_average(self, tas_series):
        # xclim:tests/test_indices.py:506
        mg = np.zeros(365)
        mg[10:20] = [1, 2, 5, 6, 1, 2, 4, 5, 4, 1]  # false start
        mg[20:40] = np.ones(20)
        mg[40:50] = np.arange(1, 11)  # actual start
        mg = tas_series(mg + K2C)
        out = xci.qian_weighted_mean_average(mg, dim="time")
        np.testing.assert_allclose(
            np.asarray(out.data)[7:12],
            [273.15, 273.2125, 273.525, 274.3375, 275.775], rtol=1e-6)
        assert float(np.asarray(out.data)[50]) < (10 + K2C)
        assert float(np.asarray(out.data)[51]) > K2C
        assert out.attrs["units"] == "K"

    @pytest.mark.parametrize("method,expected", [("bootsma", 2267),
                                                 ("qian", 2252.0)])
    def test_effective_growing_degree_days(self, tasmax_series, tasmin_series,
                                           method, expected):
        # xclim:tests/test_indices.py:524
        mg = np.zeros(547)
        mg[192:202] = [1, 2, 5, 6, 1, 2, 4, 5, 4, 1]  # false start
        mg[202:222] = np.ones(20)
        mg[213] = 20  # outlier day to test start date (adds 15 deg days)
        mg[222:242] = np.arange(1, 21)  # actual start
        mg[242:382] = np.repeat(20, 140)
        mg[382:392] = np.array([20, 15, 12, 10, 7, 0, -1, 2, 1, -10])
        # the reference series starts 2000-07-01 (its conftest default), so
        # the growing season lands in the second YS bin
        mx = tasmax_series(mg + K2C + 10, start="2000-07-01")
        mn = tasmin_series(mg + K2C - 10, start="2000-07-01")
        out = xci.effective_growing_degree_days(tasmax=mx, tasmin=mn,
                                                method=method, freq="YS")
        np.testing.assert_array_equal(np.asarray(out.data),
                                      np.array([np.nan, expected]))

    def test_chill_units(self, tas_series):
        # xclim:tests/test_indices.py:385
        n0, n1, n05, nm05, nm1 = 10, 20, 15, 10, 5
        tas = tas_series(
            np.array(n0 * [1.1] + n05 * [2.0] + n1 * [5.6] + nm05 * [16.0]
                     + nm1 * [20.0]) + K2C, freq="h")
        out = xci.chill_units(tas)
        assert float(np.asarray(out.data)[0]) == 0.5 * n05 + n1 - 0.5 * nm05 - nm1
        out = xci.chill_units(tas, positive_only=True)
        # only the last day contains negative chill units
        assert float(np.asarray(out.data)[0]) == 0.5 * n05 + n1 - 0.5 * 3


@pytest.mark.parametrize(
    "tmin,meth,zone",
    [(-6, "usda", 16), (19, "usda", 25), (-47, "usda", 1),
     (-6, "anbg", 1), (19, "anbg", 6), (-47, "anbg", np.nan)])
def test_hardiness_zones(tasmin_series, tmin, meth, zone):
    # xclim:tests/test_indices.py:4338
    tasmin = tasmin_series(np.zeros(10957) + 20, start="1997-01-01",
                           units="degC")
    doy = tasmin.time.doy
    vals = np.asarray(tasmin.data, dtype=np.float64).copy()
    vals[doy == 1] = tmin  # series is in degC
    tasmin = tasmin.copy(data=vals)
    hz = xci.hardiness_zones(tasmin=tasmin, method=meth)
    arr = np.asarray(hz.data, dtype=np.float64)
    # 31 YS-JUL bins; the window=30 rolling mean is first complete at index
    # 29 — the only bin averaging 30 FULL years (the trailing bin is the
    # partial Jul-Dec 2026 half-year); the reference asserts the same zone
    # at its final complete window
    np.testing.assert_array_equal(arr[29], zone)
    assert np.isnan(arr[:29]).all()


@pytest.mark.parametrize(
    "pr,thresh_min,thresh_sum,window,outs",
    [
        ([1.01] * 6 + [0.01] * 3 + [0.51] * 2 + [0.75] * 2 + [0.51]
         + [0.01] * 3 + [1.01] * 3, 3, 3, 7, (1, 20, 0, 20, 0)),
        ([0.01] * 40 + [1.01] * 10 + [0.01] * 40 + [1.01] * 20 + [0.01] * 40,
         1, 2, 3, (2, 34, 30, 22, 20)),
        ([0.01] * 40 + [1.01] * 10 + [0.01] * 40 + [2.01] * 20 + [0.01] * 40,
         2, 14, 14, (1, 34, 20, 34, 20)),
    ])
def test_wet_spell(pr_series, pr, thresh_min, thresh_sum, window, outs):
    # xclim:tests/test_indices.py:4393
    pr = pr_series(np.array(pr), start="1981-01-01", units="mm/day")
    oe, otds, otdm, omds, omdm = outs
    events = xci.wet_spell_frequency(pr, thresh=f"{thresh_sum} mm",
                                     window=window, freq="YS", op="sum")
    total_d_sum = xci.wet_spell_total_length(pr, thresh=f"{thresh_sum} mm",
                                             window=window, op="sum",
                                             freq="YS")
    total_d_min = xci.wet_spell_total_length(pr, thresh=f"{thresh_min} mm",
                                             window=window, op="min",
                                             freq="YS")
    max_d_sum = xci.wet_spell_max_length(pr, thresh=f"{thresh_sum} mm",
                                         window=window, op="sum", freq="YS")
    max_d_min = xci.wet_spell_max_length(pr, thresh=f"{thresh_min} mm",
                                         window=window, op="min", freq="YS")
    np.testing.assert_allclose(np.asarray(events.data)[0], [oe], rtol=1e-1)
    np.testing.assert_allclose(np.asarray(total_d_sum.data)[0], [otds],
                               rtol=1e-1)
    np.testing.assert_allclose(np.asarray(total_d_min.data)[0], [otdm],
                               rtol=1e-1)
    np.testing.assert_allclose(np.asarray(max_d_sum.data)[0], [omds],
                               rtol=1e-1)
    np.testing.assert_allclose(np.asarray(max_d_min.data)[0], [omdm],
                               rtol=1e-1)


class TestHolidayIndices:
    """xclim:tests/test_indices.py:1956."""

    def test_xmas_days_simple(self, snd_series):
        snd = snd_series(np.zeros(365 * 5), start="2000-07-01", units="cm")
        vals = np.zeros(365 * 5)
        for d, v in [("2000-12-25", 2), ("2001-12-25", 1.5),
                     ("2002-12-25", 2), ("2003-12-25", 0),
                     ("2004-12-25", 6)]:
            vals = _set_date(vals, snd, d, v)
        snd = snd.copy(data=vals)
        out = xci.holiday_snow_days(snd)
        np.testing.assert_array_equal(np.asarray(out.data), [1, 0, 1, 0, 1, 0])

    def test_xmas_days_range(self, snd_series):
        snd = snd_series(np.zeros(365 * 5), start="2000-07-01", units="cm")
        vals = np.zeros(365 * 5)
        for d, v in [("2000-12-25", 2), ("2001-12-25", 1.5),
                     ("2002-12-24", 10), ("2002-12-25", 2),
                     ("2003-12-25", 0), ("2004-12-25", 6)]:
            vals = _set_date(vals, snd, d, v)
        snd = snd.copy(data=vals)
        out = xci.holiday_snow_days(snd, date_start="12-24",
                                    date_end="12-25")
        np.testing.assert_array_equal(np.asarray(out.data), [1, 0, 2, 0, 1, 0])

    def test_perfect_xmas_days(self, snd_series, prsn_series):
        a = np.zeros(365 * 5)
        snd = snd_series(a, start="2000-07-01", units="mm")
        prsnd = prsn_series(a.copy(), start="2000-07-01", units="cm day-1")
        sv = np.zeros(365 * 5)
        for d, v in [("2000-12-25", 20), ("2001-12-25", 15),
                     ("2001-12-26", 30), ("2002-12-25", 20),
                     ("2003-12-25", 0), ("2004-12-25", 60)]:
            sv = _set_date(sv, snd, d, v)
        snd = snd.copy(data=sv)
        pv = np.zeros(365 * 5)
        for d, v in [("2000-12-25", 5), ("2001-12-25", 2),
                     ("2001-12-26", 30), ("2002-12-25", 0.995),
                     ("2003-12-25", 0), ("2004-12-25", 10)]:
            pv = _set_date(pv, prsnd, d, v)
        prsnd = prsnd.copy(data=pv)
        # snowfall depth (cm/day) -> mass flux with 100 kg/m3 snow density
        prsn = xci.prsnd_to_prsn(prsnd)
        prsn = convert_units_to(prsn, "kg m-2 s-1", context="hydro")

        out1 = xci.holiday_snow_and_snowfall_days(snd, prsn)
        np.testing.assert_array_equal(np.asarray(out1.data), [1, 0, 0, 0, 1])
        out2 = xci.holiday_snow_and_snowfall_days(
            snd, prsn, snd_thresh="15 mm", prsn_thresh="0.5 mm")
        np.testing.assert_array_equal(np.asarray(out2.data), [1, 1, 1, 0, 1])
        out3 = xci.holiday_snow_and_snowfall_days(
            snd, prsn, snd_thresh="10 mm", prsn_thresh="0.5 mm",
            date_start="12-25", date_end="12-26")
        np.testing.assert_array_equal(np.asarray(out3.data), [1, 2, 1, 0, 1])


class TestTgMaxTgMinIndices:
    """xclim:tests/test_indices.py:2669."""

    @staticmethod
    def static_tmin_tmax_setup(tasmin_series, tasmax_series):
        max_values = np.add([22, 10, 35.2, 25.1, 18.9, 12, 16], K2C)
        min_values = np.add([17, 3.5, 22.7, 16, 12.4, 7, 12], K2C)
        return tasmin_series(min_values), tasmax_series(max_values)

    @pytest.mark.parametrize("op,expected",
                             [("max", 12.5), ("min", 4.0),
                              ("std", 2.72913233)])
    def test_static_reduce_daily_temperature_range(self, tasmin_series,
                                                   tasmax_series, op,
                                                   expected):
        tasmin, tasmax = self.static_tmin_tmax_setup(tasmin_series,
                                                     tasmax_series)
        dtr = xci.daily_temperature_range(tasmin, tasmax, freq="YS", op=op)
        assert dtr.attrs["units"] == "K"
        np.testing.assert_array_almost_equal(np.asarray(dtr.data)[0],
                                             expected)

    def test_static_daily_temperature_range(self, tasmin_series,
                                            tasmax_series):
        tasmin, tasmax = self.static_tmin_tmax_setup(tasmin_series,
                                                     tasmax_series)
        dtr = xci.daily_temperature_range(tasmin, tasmax, freq="YS")
        assert dtr.attrs["units"] == "K"
        want = np.mean(np.asarray(tasmax.data) - np.asarray(tasmin.data))
        np.testing.assert_allclose(np.asarray(dtr.data)[0], want, rtol=1e-6)

    def test_static_variable_daily_temperature_range(self, tasmin_series,
                                                     tasmax_series):
        tasmin, tasmax = self.static_tmin_tmax_setup(tasmin_series,
                                                     tasmax_series)
        dtr = xci.daily_temperature_range_variability(tasmin, tasmax,
                                                      freq="YS")
        np.testing.assert_almost_equal(np.asarray(dtr.data)[0], 2.667,
                                       decimal=3)

    def test_static_extreme_temperature_range(self, tasmin_series,
                                              tasmax_series):
        tasmin, tasmax = self.static_tmin_tmax_setup(tasmin_series,
                                                     tasmax_series)
        etr = xci.extreme_temperature_range(tasmin, tasmax)
        np.testing.assert_array_almost_equal(np.asarray(etr.data)[0], 31.7,
                                             decimal=4)

    def test_uniform_freeze_thaw_cycles(self, tasmin_series, tasmax_series):
        temp_values = np.zeros(365)
        tasmax = tasmax_series(temp_values + 5 + K2C)
        tasmin = tasmin_series(temp_values - 5 + K2C)
        ft = xci.multiday_temperature_swing(
            tasmin, tasmax, thresh_tasmin="0 degC", thresh_tasmax="0 degC",
            op="sum", window=1, freq="YS")
        np.testing.assert_array_equal([np.nansum(np.asarray(ft.data))], [365])

    def test_static_freeze_thaw_cycles(self, tasmin_series, tasmax_series):
        tasmin, tasmax = self.static_tmin_tmax_setup(tasmin_series,
                                                     tasmax_series)
        tasmin = tasmin.copy(data=np.asarray(tasmin.data) - 15)
        ft = xci.multiday_temperature_swing(
            tasmin, tasmax, thresh_tasmin="0 degC", thresh_tasmax="0 degC",
            op="sum", window=1, freq="YS")
        np.testing.assert_array_equal([np.nansum(np.asarray(ft.data))], [4])


class TestWindConversion:
    """xclim:tests/test_indices.py:3215 — exact vector/speed round trips."""

    uas = np.array([[3.6, -3.6], [-1, 0]])
    vas = np.array([[3.6, 3.6], [-1, -18]])
    wind = np.array([[np.hypot(3.6, 3.6), np.hypot(3.6, 3.6)],
                     [np.hypot(1, 1), 18]])
    windfromdir = np.array([[225, 135], [0, 360]])

    @staticmethod
    def _da(arr, units, name):
        return ClimArray(np.asarray(arr, dtype=np.float64), ("lon", "lat"),
                         attrs={"units": units}, name=name)

    def test_uas_vas_to_sfcwind(self):
        uas = self._da(self.uas, "km/h", "uas")
        vas = self._da(self.vas, "km/h", "vas")
        wind, wind_from_dir = xci.uas_vas_to_sfcwind(uas, vas)
        np.testing.assert_allclose(np.asarray(wind.data),
                                   self.wind / 3.6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(wind_from_dir.data),
                                   self.windfromdir, atol=1e-4)

    def test_sfcwind_to_uas_vas(self):
        wind = self._da(self.wind, "km/h", "sfcWind")
        wdir = self._da(self.windfromdir, "degree", "sfcWindfromdir")
        uas, vas = xci.sfcwind_to_uas_vas(wind, wdir)
        np.testing.assert_allclose(np.asarray(uas.data),
                                   np.array([[1, -1], [0, 0]]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(vas.data),
            np.array([[1, 1], [-np.hypot(1, 1) / 3.6, -5]]), atol=1e-6)


class TestClausiusClapeyronScaledPrecip:
    """xclim:tests/test_indices.py:3841 — exact scaling table."""

    def test_simple(self):
        pr_baseline = ClimArray(
            np.arange(4, dtype=np.float64).reshape(1, 2, 2),
            ("time", "lat", "lon"), attrs={"units": "mm/day"}, name="pr")
        tas_baseline = ClimArray(
            np.arange(4, dtype=np.float64).reshape(1, 2, 2),
            ("time", "lat", "lon"), attrs={"units": "degC"}, name="tas")
        tas_future = ClimArray(
            np.arange(40, dtype=np.float64).reshape(10, 2, 2),
            ("time", "lat", "lon"), attrs={"units": "degC"}, name="tas")
        delta = (np.asarray(tas_future.data)
                 - np.asarray(tas_baseline.data))  # (10, 2, 2)
        delta_tas = ClimArray(delta, ("time", "lat", "lon"),
                              attrs={"units": "delta_degC"}, name="dtas")
        out = xci.clausius_clapeyron_scaled_precipitation(delta_tas,
                                                          pr_baseline)
        got = np.asarray(out.data)  # (10, 2, 2) -> compare transposed
        want = np.array([
            [[0.0] * 10,
             [1.0, 1.31079601, 1.71818618, 2.25219159, 2.95216375,
              3.86968446, 5.07236695, 6.64883836, 8.7152708, 11.42394219]],
            [[2.0, 2.62159202, 3.43637236, 4.50438318, 5.9043275,
              7.73936892, 10.14473391, 13.29767673, 17.4305416, 22.84788438],
             [3.0, 3.93238803, 5.15455854, 6.75657477, 8.85649125,
              11.60905339, 15.21710086, 19.94651509, 26.1458124,
              34.27182657]]])
        np.testing.assert_allclose(np.moveaxis(got, 0, -1), want, rtol=1e-6)


class TestDrynessIndexProperties:
    """The reference pins dataset-specific values (xclim:tests/
    test_indices.py:4305); here the portable invariant: a wetter soil
    reserve shifts DI by exactly its surplus (di_wet == di + 100)."""

    def test_wo_offset(self, pr_series, evspsblpot_series):
        rng = np.random.default_rng(42)
        n = 365 * 3
        pr = pr_series(rng.gamma(2.0, 1.5, n) / 86400, start="1991-01-01",
                       units="kg m-2 s-1")
        pet = evspsblpot_series(rng.gamma(2.0, 1.0, n) / 86400,
                                start="1991-01-01", units="kg m-2 s-1")
        di = xci.dryness_index(pr, pet)
        di_wet = xci.dryness_index(pr, pet, wo="300 mm")
        np.testing.assert_allclose(np.asarray(di_wet.data),
                                   np.asarray(di.data) + 100, rtol=1e-5)
        assert di.attrs["units"] == "mm"


@pytest.mark.slow
class TestSPIScipyCrossCheck:
    """Independent oracle for SPI: fit gamma per calendar month with scipy on
    the calibration series and transform through the normal ppf; the JAX
    implementation must agree (the reference validates the same way against
    the `climate_indices` package, xclim:tests/test_indices.py:545-547)."""

    @pytest.mark.slow
    def test_spi_ms_gamma_vs_scipy(self, pr_series):
        import scipy.stats as sps

        from xclim_tpu.indices import standardized_precipitation_index
        from xclim_tpu.indices.stats import standardized_index_fit_params

        rng = np.random.default_rng(7)
        n_years = 30
        # monthly-varying gamma precipitation, daily series
        n = 365 * n_years
        pr_daily = pr_series(rng.gamma(2.0, 2.0, n) / 86400.0,
                             start="1950-01-01", calendar="noleap",
                             units="kg m-2 s-1")
        params = standardized_index_fit_params(
            pr_daily, freq="MS", window=1, dist="gamma", method="ML",
            zero_inflated=False)
        spi = standardized_precipitation_index(pr_daily, params=params)
        got = np.asarray(spi.data)

        # independent numpy/scipy reference
        t = pr_daily.time
        vals = np.asarray(pr_daily.data, dtype=np.float64) * 86400.0  # mm/d
        # monthly means (MS resample), noleap
        month = t.month
        year = t.year
        keys = (year - year.min()) * 12 + (month - 1)
        nm = keys.max() + 1
        sums = np.bincount(keys, weights=vals, minlength=nm)
        cnts = np.bincount(keys, minlength=nm)
        monthly = sums / cnts
        mon_of = np.arange(nm) % 12
        want = np.empty(nm)
        for m in range(12):
            sel = monthly[mon_of == m]
            a, loc, scale = sps.gamma.fit(sel, floc=0)
            cdf = sps.gamma.cdf(sel, a, loc=loc, scale=scale)
            want[mon_of == m] = sps.norm.ppf(cdf)
        ok = np.isfinite(want) & np.isfinite(got)
        assert ok.mean() > 0.95
        np.testing.assert_allclose(got[ok], want[ok], atol=0.06)
