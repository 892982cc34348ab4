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
