"""Per-method oracle battery for the humidity/wind converter matrix.

Every method enum in the reference's converters gets at least one
exact-value case, hand-ported from:
xclim:tests/test_indices.py:3261-3410 (humidity matrix), :3825-3837
(wind chill), and xclim:tests/test_converters.py:17-60 (wind vectors).
"""

import numpy as np
import pytest

from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.core.units import convert_units_to
from xclim_tpu.indices import converters as conv

K2C = 273.15


def _s(vals, units, var=None):
    vals = np.asarray(vals, dtype=np.float32)
    t = date_range("2000-01-01", periods=len(vals), freq="D",
                   calendar="standard")
    return ClimArray(vals, ("time",), {"time": t}, {"units": units}, var)


class TestSaturationVaporPressureMatrix:
    """xclim:tests/test_indices.py:3290-3317."""

    @pytest.mark.parametrize("method", ["tetens30", "sonntag90",
                                        "goffgratch46", "wmo08", "its90",
                                        "buck81", "aerk96", "ecmwf"])
    @pytest.mark.parametrize(
        "ice_thresh,power,exp0",
        [(None, None, [51, 125, 286, 568]),
         ("0 degC", None, [38, 103, 260, 563]),
         ("-23 degC", 2, [38, 103, 268, 568])],
    )
    @pytest.mark.parametrize("temp_units", ["degC", "K"])
    def test_values(self, method, ice_thresh, power, exp0, temp_units):
        tas = _s(np.array([-30, -20, -10, -1, 10, 20, 25, 30, 40, 60]) + K2C,
                 "K")
        tas = convert_units_to(tas, temp_units)
        e_sat_exp = exp0 + [1228, 2339, 3169, 4247, 7385, 19947]
        e_sat = conv.saturation_vapor_pressure(
            tas, method=method, ice_thresh=ice_thresh, interp_power=power)
        vals = e_sat.values
        if method == "tetens30":  # tetens is bad at very low temps
            vals, e_sat_exp = vals[1:], e_sat_exp[1:]
        np.testing.assert_allclose(vals, e_sat_exp, atol=0.5, rtol=0.005)


class TestRelativeHumidityMatrix:
    """xclim:tests/test_indices.py:3261-3276 and :3348-3367."""

    @pytest.mark.parametrize("method", ["bohren98", "tetens30", "sonntag90",
                                        "goffgratch46", "wmo08"])
    @pytest.mark.parametrize("invalid_values,exp0",
                             [("clip", 100), ("mask", np.nan), (None, 151)])
    def test_from_dewpoint(self, method, invalid_values, exp0):
        tas = _s(np.array([-20, -10, -1, 10, 20, 25, 30, 40, 60]) + K2C, "K")
        tdps = _s(np.array([-15, -10, -2, 5, 10, 20, 29, 20, 30]) + K2C, "K")
        out = conv.relative_humidity(tas, tdps=tdps, method=method,
                                     invalid_values=invalid_values)
        np.testing.assert_allclose(
            out.values, [exp0, 100, 93, 71, 52, 73, 94, 31, 20],
            rtol=0.02, atol=1)

    @pytest.mark.parametrize("method", ["tetens30", "sonntag90",
                                        "goffgratch46", "wmo08"])
    @pytest.mark.parametrize("invalid_values,exp0",
                             [("clip", 100), ("mask", np.nan), (None, 188)])
    def test_from_specific_humidity(self, method, invalid_values, exp0):
        tas = _s(np.array([-10, -10, 10, 20, 35, 50, 75, 95]) + K2C, "K")
        ps = _s([101325] * 8, "Pa")
        huss = _s([0.003, 0.001] + [0.005] * 6, "1")
        out = conv.relative_humidity(tas, huss=huss, ps=ps, method=method,
                                     invalid_values=invalid_values,
                                     ice_thresh="0 degC")
        np.testing.assert_allclose(
            out.values, [exp0, 62.5, 66.0, 35.0, 14.5, 6.5, 2.0, 1.0],
            atol=0.5, rtol=0.005)


class TestSpecificHumidityMatrix:
    """xclim:tests/test_indices.py:3369-3387."""

    @pytest.mark.parametrize("method", ["tetens30", "sonntag90",
                                        "goffgratch46", "wmo08"])
    @pytest.mark.parametrize("invalid_values,exp0",
                             [("clip", 1.4e-2), ("mask", np.nan),
                              (None, 2.2e-2)])
    def test_values(self, method, invalid_values, exp0):
        tas = _s(np.array([20, -10, 10, 20, 35, 50, 75, 95]) + K2C, "K")
        hurs = _s([150, 10, 90, 20, 80, 50, 70, 40], "%")
        ps = _s(1000 * np.array([100] * 4 + [101] * 4), "Pa")
        out = conv.specific_humidity(tas, hurs, ps, method=method,
                                     invalid_values=invalid_values,
                                     ice_thresh="0 degC")
        np.testing.assert_allclose(
            out.values,
            [exp0, 1.6e-4, 6.9e-3, 3.0e-3, 2.9e-2, 4.1e-2, 2.1e-1, 5.7e-1],
            atol=1e-4, rtol=0.05)

    def test_from_dewpoint_metpy(self):
        """xclim:tests/test_indices.py:3278-3289 (MetPy cross-check)."""
        ps = _s([1013.25], "mbar")
        tdps = _s([16.973], "degC")
        q = conv.specific_humidity_from_dewpoint(tdps, ps)
        np.testing.assert_allclose(q.values, 0.012, atol=1e-3)

    @pytest.mark.parametrize("method", ["tetens30", "wmo08", "aerk96",
                                        "buck81"])
    def test_dewpoint_inverse(self, method):
        """xclim:tests/test_indices.py:3389-3407."""
        huss = _s(np.linspace(0, 0.01, 8), "1")
        ps = _s(1000 * np.array([100] * 4 + [101] * 4), "Pa")
        out = conv.dewpoint_from_specific_humidity(huss, ps, method=method)
        np.testing.assert_allclose(
            out.values,
            [np.nan, 260.3, 269.3, 274.8, 279.0, 282.3, 285.0, 287.3],
            atol=0.1, rtol=0.05)


class TestVaporPressure:
    """xclim:tests/test_indices.py:3319-3346."""

    def test_roundtrip_buck81(self):
        tas = _s(np.array([-1, 10, 20, 25, 30, 40, 60]) + K2C, "K")
        ps = _s([101325] * 7, "Pa")
        huss = conv.specific_humidity_from_dewpoint(tdps=tas, ps=ps,
                                                    method="buck81")
        vp = conv.vapor_pressure(huss=huss, ps=ps)
        esat = conv.saturation_vapor_pressure(tas, method="buck81")
        np.testing.assert_allclose(vp.values, esat.values, rtol=1e-5)

    @pytest.mark.parametrize("method", ["tetens30", "sonntag90",
                                        "goffgratch46", "wmo08", "its90"])
    def test_vpd(self, method):
        tas = _s(np.array([-1, 10, 20, 25, 30, 40, 60]) + K2C, "K")
        # NB: the reference fixture passes these tiny values with '%' units,
        # so the deficit is ~the full saturation pressure
        hurs = _s(np.array([0, 0.5, 0.8, 0.9, 0.95, 0.99, 1]), "%")
        vpd = conv.vapor_pressure_deficit(tas, hurs, method=method)
        np.testing.assert_allclose(
            vpd.values, [567, 1220, 2317, 3136, 4200, 7300, 19717],
            atol=0.5, rtol=0.005)


class TestWindVectors:
    """xclim:tests/test_converters.py:17-60."""

    def test_speed_from_vectors(self):
        uas = _s([3.0, -3.0], "m s-1")
        vas = _s([4.0, -4.0], "m s-1")
        wind, wind_dir = conv.uas_vas_to_sfcwind(uas, vas)
        np.testing.assert_allclose(wind.values, [5.0, 5.0], rtol=1e-6)
        np.testing.assert_allclose(wind_dir.values,
                                   [216.86989764584402, 36.86989764584402],
                                   rtol=1e-5)

    def test_speed_missing(self):
        uas = _s([np.nan, -3.0], "m s-1")
        vas = _s([4.0, -4.0], "m s-1")
        wind, wind_dir = conv.uas_vas_to_sfcwind(uas, vas)
        np.testing.assert_array_equal(np.isnan(wind.values), [True, False])
        np.testing.assert_array_equal(np.isnan(wind_dir.values),
                                      [True, False])

    def test_calm_and_northerly(self):
        uas = _s([0.0, 0.0], "m s-1")
        vas = _s([0.9, -1.1], "m s-1")
        wind, wind_dir = conv.uas_vas_to_sfcwind(uas, vas,
                                                 calm_wind_thresh="1 m/s")
        np.testing.assert_allclose(wind.values, [0.9, 1.1], rtol=1e-6)
        np.testing.assert_allclose(wind_dir.values, [0.0, 360.0])

    def test_vector_from_speed(self):
        sfcWind = _s([3.0, 5.0, 0.2], "m s-1")
        wdir = _s([360.0, 36.86989764584402, 0.0], "degree")
        uas, vas = conv.sfcwind_to_uas_vas(sfcWind, wdir)
        np.testing.assert_allclose(uas.values, [0.0, -3.0, 0.0], atol=1e-5)
        np.testing.assert_allclose(vas.values, [-3.0, -4.0, -0.2], atol=1e-5)


class TestWindChill:
    """xclim:tests/test_indices.py:3825-3837 (ECCC calculator values)."""

    def test_values(self):
        tas = _s(np.array([-1, -10, -20, 10, -15]) + K2C, "K")
        sfcWind = _s([10, 60, 20, 6, 2], "km/h")
        out = conv.wind_chill_index(tas=tas, sfcWind=sfcWind)
        np.testing.assert_allclose(
            out.values,
            [-4.509267062481955, -22.619869069856854, -30.478945408950928,
             np.nan, -16.443],
            rtol=1e-5)
        out = conv.wind_chill_index(tas=tas, sfcWind=sfcWind, method="US")
        assert np.isnan(out.values[-1])
