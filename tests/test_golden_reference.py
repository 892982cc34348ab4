"""Golden-value oracles taken from the reference test suite's published
expectations (xclim:tests/test_indices.py — expected numbers sourced there
from Wikipedia, ECCC calculators, MetPy and Sonntag 1990; only the numeric
oracles are reused, the harness is this repo's own)."""

import numpy as np
import pytest

from xclim_tpu import indices as xci

K2C = 273.15


class TestHumidexOracle:
    def test_wikipedia_values(self, tas_series):
        # xclim:tests/test_indices.py:3755 — oracle from the Humidex wiki table
        tas = tas_series(np.array([15, 25, 35, 40], dtype=np.float32),
                         units="degC")
        tdps = tas_series(np.array([10, 15, 25, 25], dtype=np.float32),
                          units="degC")
        out = np.asarray(xci.humidex(tas, tdps).data)
        np.testing.assert_allclose(out, [16, 29, 47, 52], atol=0.5)

    def test_kelvin_input_same_result(self, tas_series):
        tas = tas_series(np.array([15, 25, 35, 40]) + K2C, units="K")
        tdps = tas_series(np.array([10, 15, 25, 25], dtype=np.float32),
                          units="degC")
        out = np.asarray(xci.humidex(tas, tdps).data)
        np.testing.assert_allclose(out - K2C, [16, 29, 47, 52], atol=0.5)


class TestWindChillOracle:
    def test_eccc_calculator_values(self, tas_series, sfcWind_series):
        # xclim:tests/test_indices.py:3825 — oracle from the unrounded ECCC
        # online calculator
        tas = tas_series(np.array([-1, -10, -20, 10, -15]) + K2C, units="K")
        ws = sfcWind_series(np.array([10, 60, 20, 6, 2], dtype=np.float32),
                            units="km/h")
        out = np.asarray(xci.wind_chill_index(tas=tas, sfcWind=ws).data)
        want = [-4.509267062481955, -22.619869069856854, -30.478945408950928,
                np.nan, -16.443]
        np.testing.assert_allclose(out, want, rtol=1e-4)
        assert np.isnan(out[3])


class TestSaturationVaporPressureOracle:
    def test_sonntag90_values(self, tas_series):
        # xclim:tests/test_indices.py:3299 — Sonntag 1990 reference values [Pa]
        tas = tas_series(np.array([-30, -20, -10, -1, 10, 20, 25, 30, 40, 60])
                         + K2C, units="K")
        out = np.asarray(xci.saturation_vapor_pressure(
            tas=tas, method="sonntag90").data)
        want = [51, 125, 286, 568, 1228, 2339, 3169, 4247, 7385, 19947]
        np.testing.assert_allclose(out, want, atol=0.5, rtol=0.005)

    def test_with_ice_threshold(self, tas_series):
        tas = tas_series(np.array([-30, -20, -10, -1]) + K2C, units="K")
        out = np.asarray(xci.saturation_vapor_pressure(
            tas=tas, method="sonntag90", ice_thresh="0 degC").data)
        np.testing.assert_allclose(out, [38, 103, 260, 563], atol=0.5,
                                   rtol=0.005)


class TestSpecificHumidityOracle:
    def test_metpy_value(self, tas_series):
        # xclim:tests/test_indices.py:3280 — oracle from MetPy
        tdps = tas_series(np.array([16.973], dtype=np.float32), units="degC")
        ps = tas_series(np.array([1013.25], dtype=np.float32), units="mbar")
        ps.name = "ps"
        q = np.asarray(xci.specific_humidity_from_dewpoint(tdps, ps).data)
        np.testing.assert_allclose(q, 0.012, atol=5e-4)


class TestHeatIndexOracle:
    def test_nws_values(self, tas_series, hurs_series):
        # xclim:tests/test_indices.py:3787 — NWS heat index table
        tas = tas_series(np.array([15, 20, 25, 25, 30, 30, 35, 35, 40, 40,
                                   45, 45], dtype=np.float32), units="degC")
        hurs = hurs_series(np.array([5, 5, 0, 25, 25, 50, 25, 50, 25, 50,
                                     25, 50], dtype=np.float32), units="%")
        out = np.asarray(xci.heat_index(tas, hurs).data)
        want = [np.nan, np.nan, 24, 25, 28, 31, 34, 41, 41, 55, 50, 73]
        np.testing.assert_allclose(out, want, atol=0.6)


class TestCFFWISOracle:
    """Day-1 of the canonical cffdrs-R test case (Van Wagner & Pickett 1985):
    T=17°C, RH=42%, wind 25 km/h, no rain; start-up FFMC=85, DMC=6, DC=15,
    April day-length factors at lat 55°N."""

    def test_all_six_codes(self):
        import jax.numpy as jnp

        from xclim_tpu.indices.fire._cffwis import (
            _dc_step,
            _dmc_step,
            _ffmc_step,
            build_up_index,
            fire_weather_index,
            initial_spread_index,
        )

        f32 = jnp.float32
        ffmc = float(_ffmc_step(f32(17.0), f32(0.0), f32(25.0), f32(42.0),
                                f32(85.0)))
        dmc = float(_dmc_step(f32(17.0), f32(0.0), f32(42.0), f32(12.8),
                              f32(6.0)))
        dc = float(_dc_step(f32(17.0), f32(0.0), f32(0.9), f32(15.0)))
        isi = float(initial_spread_index(f32(25.0), f32(ffmc)))
        bui = float(build_up_index(f32(dmc), f32(dc)))
        fwi = float(fire_weather_index(f32(isi), f32(bui)))
        np.testing.assert_allclose(ffmc, 87.6930, atol=2e-3)
        np.testing.assert_allclose(dmc, 8.5451, atol=2e-3)
        np.testing.assert_allclose(dc, 19.0140, atol=2e-3)
        np.testing.assert_allclose(isi, 10.8537, atol=2e-3)
        np.testing.assert_allclose(bui, 8.4904, atol=2e-3)
        np.testing.assert_allclose(fwi, 10.0964, atol=2e-3)


class TestUTCIOracle:
    @pytest.mark.parametrize("wind_cap_min,wind,expected",
                             [(False, 2, 17.70), (False, 1, np.nan),
                              (True, 1, 17.76)])
    def test_utci_values(self, tas_series, hurs_series, sfcWind_series,
                         wind_cap_min, wind, expected):
        # xclim:tests/test_indices.py:4247 — wind given in km/h
        tas = tas_series(np.array([16.0]) + K2C, units="K")
        hurs = hurs_series(np.array([36.0], dtype=np.float32), units="%")
        mrt = tas_series(np.array([22.0]) + K2C, units="K")
        w = sfcWind_series(np.array([float(wind)], dtype=np.float32),
                           units="km/h")
        out = np.asarray(xci.universal_thermal_climate_index(
            tas=tas, hurs=hurs, sfcWind=w, mrt=mrt,
            wind_cap_min=wind_cap_min).data) - K2C
        if np.isnan(expected):
            assert np.isnan(out[0])
        else:
            np.testing.assert_allclose(out[0], expected, atol=0.05)


class TestMeanRadiantTemperatureOracle:
    @pytest.mark.parametrize("stat,expected", [("sunlit", 295.0),
                                               ("instant", 294.9)])
    def test_mrt_values(self, tas_series, stat, expected):
        # xclim:tests/test_indices.py:4271 — fluxes measured at Alice Springs
        def flux(v, name):
            da = tas_series(np.array([v], dtype=np.float32), units="W m-2")
            da.name = name
            da.coords["lat"] = np.float64(-21.45)
            da.coords["lon"] = np.float64(133.125)
            return da

        mrt = xci.mean_radiant_temperature(
            flux(195.08, "rsds"), flux(36.686, "rsus"),
            flux(294.91, "rlds"), flux(396.19, "rlus"), stat=stat)
        # within 0.5 K of the reference value (residual differences are in
        # solar-geometry minutiae: decimal-year day angle at one timestamp)
        np.testing.assert_allclose(np.asarray(mrt.data)[0], expected,
                                   atol=0.5)


class TestSnowfallApproximationOracle:
    """xclim:tests/test_indices.py:3424 — CLASS/Dai snowfall partitioning."""

    @pytest.mark.parametrize("method,kws,exp", [
        ("binary", {"thresh": "2 degC"}, [1, 1, 1, 0, 0, 0, 0, 0, 0, 0]),
        ("brown", {"thresh": "2 degC"}, [1, 1, 1, 0.5, 0, 0, 0, 0, 0, 0]),
        ("auer", {"thresh": "2 degC"},
         [1, 1, 1, 0.89805, 0.593292, 0.289366, 0.116624, 0.055821, 0, 0]),
        ("dai_annual", {},
         [0.82387, 0.55053, 0.23377, 0.07485, 0.02674, 0.01459, 0.01166,
          0.01097, 0.01081, 0.01077]),
        ("dai_annual", {"clip_temp": "5 degC"},
         [0.84246, 0.55791, 0.22817, 0.06274, 0.01265, 0, 0, 0, 0, 0]),
        ("dai_annual", {"landmask": False},
         [0.78895, 0.65031, 0.46730, 0.28835, 0.15796, 0.08192, 0.04319,
          0.02483, 0.01642, 0.01263]),
    ])
    def test_snowfall(self, pr_series, tas_series, method, kws, exp):
        pr = pr_series(np.ones(10, dtype=np.float32), units="kg m-2 s-1")
        tas = tas_series(np.arange(10, dtype=np.float32), units="degC")
        out = np.asarray(xci.snowfall_approximation(pr, tas=tas,
                                                    method=method,
                                                    **kws).data)
        np.testing.assert_allclose(out, exp, atol=1e-4, rtol=2e-3)

    @pytest.mark.parametrize("method,kws,exp", [
        ("binary", {"thresh": "5 degC"}, [0, 0, 0, 0, 0, 0, 1, 1, 1, 1]),
        ("dai_annual", {},
         [0.12941, 0.34293, 0.65902, 0.86974, 0.94718, 0.96909, 0.97481,
          0.97627, 0.97664, 0.976732]),
    ])
    def test_rain(self, pr_series, tas_series, method, kws, exp):
        pr = pr_series(np.ones(10, dtype=np.float32), units="kg m-2 s-1")
        tas = tas_series(np.arange(10, dtype=np.float32), units="degC")
        out = np.asarray(xci.rain_approximation(pr, tas=tas, method=method,
                                                **kws).data)
        np.testing.assert_allclose(out, exp, atol=1e-4, rtol=2e-3)


class TestDegreeDaysExceedanceDateOracle:
    def test_values(self, tas_series):
        # xclim:tests/test_indices.py:3405
        tas = tas_series(np.ones(366, dtype=np.float32) + K2C,
                         start="2000-01-01", units="K")
        o1 = xci.degree_days_exceedance_date(tas, thresh="0 degC", op=">",
                                             sum_thresh="150 K days")
        o2 = xci.degree_days_exceedance_date(tas, thresh="2 degC", op="<",
                                             sum_thresh="150 degC days")
        o3 = xci.degree_days_exceedance_date(tas, thresh="2 degC", op="<",
                                             sum_thresh="150 K days",
                                             after_date="04-15")
        assert float(np.asarray(o1.data)[0]) == 151
        assert float(np.asarray(o2.data)[0]) == 151
        assert float(np.asarray(o3.data)[0]) == 256


class TestPETOracle:
    @pytest.mark.parametrize("method,expected", [("BR65", 3.861079),
                                                 ("HG85", 4.030339)])
    def test_pet_methods(self, tasmin_series, tasmax_series, tas_series,
                         method, expected):
        # xclim:tests/test_indices.py:3943 — daily PET at lat 45, July
        tn = tasmin_series(np.array([0, 5, 10]) + K2C, units="K",
                           start="2000-07-01")
        tx = tasmax_series(np.array([10, 15, 20]) + K2C, units="K",
                           start="2000-07-01")
        tm = tas_series(np.array([5, 10, 15]) + K2C, units="K",
                        start="2000-07-01")
        kw = {"tasmin": tn, "tasmax": tx, "lat": 45.0, "method": method}
        if method == "HG85":
            kw["tas"] = tm
        out = np.asarray(xci.potential_evapotranspiration(**kw).data)
        np.testing.assert_allclose(out[2] * 86400, expected, rtol=1e-2)


class TestAgroOracles:
    def test_corn_heat_units(self, tasmin_series, tasmax_series):
        # xclim:tests/test_indices.py:264
        tn = tasmin_series(np.array([-10, 5, 4, 3, 10]) + K2C, units="K")
        tx = tasmax_series(np.array([-5, 9, 10, 16, 20]) + K2C, units="K")
        out = np.asarray(xci.corn_heat_units(
            tn, tx, thresh_tasmin="4.44 degC", thresh_tasmax="10 degC").data)
        np.testing.assert_allclose(out, [0, 0.504, 0, 8.478, 17.454],
                                   atol=1e-3)

    def test_cooling_degree_days_approximation(self, tas_series,
                                               tasmin_series, tasmax_series):
        # xclim:tests/test_indices.py:248 (July-start series → 184-day period)
        tmin = np.zeros(365, np.float32) + 16
        tmin[:7] += [-3, -2, -1, 0, 1, 2, 3]
        tas = tas_series(np.zeros(365, np.float32) + 18 + K2C, units="K",
                         start="2000-07-01")
        tn = tasmin_series(tmin + K2C, units="K", start="2000-07-01")
        tx = tasmax_series(np.zeros(365, np.float32) + 20 + K2C, units="K",
                           start="2000-07-01")
        out = np.asarray(
            xci.cooling_degree_days_approximation(tx, tn, tas).data)
        np.testing.assert_allclose(out[0], 91.0)

    @pytest.mark.parametrize("method,end_date,deg_days,max_deg_days", [
        ("gladstones", "11-01", 1090.1, 1926.0),
        ("huglin", "11-01", 1112.8, 1926.0),
        ("icclim", "10-01", 915.0, 1647.0),
        ("interpolated", "11-01", 1102.1, 1926.0),
    ])
    def test_bedd(self, method, end_date, deg_days, max_deg_days):
        # xclim:tests/test_indices.py:272 — constant 10/20 degC at 3 latitudes
        import jax.numpy as jnp

        from xclim_tpu.core.calendar import date_range
        from xclim_tpu.core.dataarray import ClimArray

        t = date_range("1992-01-01", end="1995-06-01", freq="D")
        lats = np.array([35, 45, 48])
        lat = ClimArray(jnp.asarray(lats.astype(np.float32)), ("lat",),
                        {"lat": lats}, {"units": "degrees_north"}, "lat")

        def mk(v):
            d = np.zeros((len(t), 3), np.float32) + v + K2C
            return ClimArray(jnp.asarray(d), ("time", "lat"),
                             {"time": t, "lat": lats}, {"units": "K"}, "x")

        b = xci.biologically_effective_degree_days(
            tasmin=mk(10), tasmax=mk(20), lat=lat, method=method,
            end_date=end_date, freq="YS")
        np.testing.assert_allclose(np.asarray(b.data)[:3, 1], deg_days,
                                   atol=0.25)
        bh = xci.biologically_effective_degree_days(
            tasmin=mk(10), tasmax=mk(50), lat=lat, method=method,
            end_date=end_date, freq="YS")
        np.testing.assert_allclose(np.asarray(bh.data)[:3, 0], max_deg_days,
                                   atol=0.1)


class TestHydrologyOracles:
    def test_base_flow_index(self, q_series):
        # xclim:tests/test_hydrology.py:17 (q_series starts Jan 1)
        a = np.zeros(365, np.float32) + 10
        a[10:17] = 1
        q = q_series(a, start="2000-01-01", units="m3 s-1")
        out = float(np.asarray(xci.base_flow_index(q).data)[0])
        np.testing.assert_allclose(out, 1.0 / a.mean(), rtol=1e-6)

    def test_rb_flashiness(self, q_series):
        # xclim:tests/test_hydrology.py:26
        a = np.zeros(365, np.float32)
        a[10] = 10
        q = q_series(a, start="2000-01-01", units="m3 s-1")
        out = float(np.asarray(xci.rb_flashiness_index(q).data)[0])
        np.testing.assert_allclose(out, 2.0)

    def test_snw_max(self, snw_series):
        # xclim:tests/test_hydrology.py:83
        a = np.zeros(366, np.float32)
        a[10:20] = np.arange(0, 10)
        snw = snw_series(a, start="1999-01-01", units="kg m-2")
        out = np.asarray(xci.snw_max(snw, freq="YS").data)
        np.testing.assert_array_equal(out, [9, 0])


class TestGenericOracles:
    """xclim:tests/test_generic.py:14-60 — resample-op semantics."""

    def test_count_month(self, q_series):
        from xclim_tpu.indices import generic

        q = q_series(np.arange(1000, dtype=np.float32), start="2000-01-01")
        o = generic.select_resample_op(q, "count", freq="YS", month=3)
        np.testing.assert_array_equal(np.asarray(o.data)[:2], [31, 31])

    def test_season_default(self, q_series):
        from xclim_tpu.indices import generic

        q = q_series(np.arange(1000, dtype=np.float32), start="2000-01-01")
        o = np.asarray(generic.select_resample_op(q, "min",
                                                  season="DJF").data)
        assert o[0] == 0 and o[1] == 366

    def test_season_anchored(self, q_series):
        from xclim_tpu.indices import generic

        q = q_series(np.arange(1000, dtype=np.float32), start="2000-01-01")
        o = generic.select_resample_op(q, "count", freq="YS-DEC",
                                       season="DJF")
        assert np.asarray(o.data)[0] == 31 + 29

    def test_rolling_max(self, q_series):
        from xclim_tpu.indices import generic

        q = q_series(np.arange(1, 366 + 365 + 365 + 1, dtype=np.float32),
                     start="2000-01-01")
        o = generic.select_rolling_resample_op(q, "max", window=14,
                                               window_center=False,
                                               window_op="mean")
        np.testing.assert_allclose(np.asarray(o.data),
                                   [359.5, 724.5, 1089.5])

    def test_rolling_min_indexed(self, q_series):
        from xclim_tpu.indices import generic

        q = q_series(np.arange(1, 366 + 365 + 365 + 1, dtype=np.float32),
                     start="2000-01-01")
        o = generic.select_rolling_resample_op(q, "min", window=14,
                                               window_center=False,
                                               window_op="max", season="DJF")
        np.testing.assert_allclose(np.asarray(o.data), [14, 367, 732])


class TestHeatWaveOracles:
    """xclim:tests/test_indices.py:1859-2090 — the spell-kernel battery."""

    @pytest.fixture
    def hw_series(self, tasmin_series, tasmax_series):
        tn = tasmin_series(
            np.array([20, 23, 23, 23, 23, 22, 23, 23, 23, 23],
                     dtype=np.float32) + K2C, units="K")
        tx = tasmax_series(
            np.array([29, 31, 31, 31, 29, 31, 31, 31, 31, 31],
                     dtype=np.float32) + K2C, units="K")
        return tn, tx

    @pytest.mark.parametrize("thn,thx,window,expected", [
        ("22 degC", "30 degC", 3, 2), ("22 degC", "30 degC", 4, 1),
        ("10 degC", "10 degC", 3, 1), ("40 degC", "40 degC", 3, 0)])
    def test_frequency(self, hw_series, thn, thx, window, expected):
        tn, tx = hw_series
        out = xci.heat_wave_frequency(tn, tx, thresh_tasmin=thn,
                                      thresh_tasmax=thx, window=window)
        assert float(np.asarray(out.data)[0]) == expected

    @pytest.mark.parametrize("thn,thx,window,expected", [
        ("22 degC", "30 degC", 3, 4), ("10 degC", "10 degC", 3, 10),
        ("40 degC", "40 degC", 3, 0), ("22 degC", "30 degC", 5, 0)])
    def test_max_length(self, hw_series, thn, thx, window, expected):
        tn, tx = hw_series
        out = xci.heat_wave_max_length(tn, tx, thresh_tasmin=thn,
                                       thresh_tasmax=thx, window=window)
        assert float(np.asarray(out.data)[0]) == expected

    @pytest.mark.parametrize("thn,thx,window,expected", [
        ("22 degC", "30 degC", 3, 7), ("10 degC", "10 degC", 3, 10),
        ("40 degC", "40 degC", 3, 0), ("22 degC", "30 degC", 5, 0)])
    def test_total_length(self, hw_series, thn, thx, window, expected):
        tn, tx = hw_series
        out = xci.heat_wave_total_length(tn, tx, thresh_tasmin=thn,
                                         thresh_tasmax=thx, window=window)
        assert float(np.asarray(out.data)[0]) == expected

    @pytest.mark.parametrize("thresh,window,op,expected", [
        ("30 degC", 3, ">", 2), ("30 degC", 4, ">", 1),
        ("29 degC", 3, ">", 2), ("29 degC", 3, ">=", 1),
        ("10 degC", 3, ">", 1), ("40 degC", 5, ">", 0)])
    def test_hot_spell_frequency(self, hw_series, thresh, window, op,
                                 expected):
        _, tx = hw_series
        out = xci.hot_spell_frequency(tx, thresh=thresh, window=window, op=op)
        assert float(np.asarray(out.data)[0]) == expected

    @pytest.mark.parametrize("resample_before_rl,expected", [(True, 1),
                                                             (False, 0)])
    def test_resampling_order(self, tasmax_series, resample_before_rl,
                              expected):
        a = np.zeros(365, np.float32)
        a[5:35] = 31
        tx = tasmax_series(a + K2C, units="K", start="2000-01-01")
        out = xci.hot_spell_frequency(tx,
                                      resample_before_rl=resample_before_rl,
                                      freq="MS")
        assert float(np.asarray(out.data)[1]) == expected
