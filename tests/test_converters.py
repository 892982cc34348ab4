"""Physical converter tests (expected values hand-computed or from published
references; style of xclim tests/test_converters.py)."""

import numpy as np
import pytest

from xclim_tpu.indices import converters as conv
from xclim_tpu.testing.helpers import test_timeseries


def _s(vals, var="tas", units=None):
    return test_timeseries(np.asarray(vals, dtype=np.float32), var, units=units,
                           start="2000-07-01")


class TestHumidity:
    def test_saturation_vapor_pressure_magnus(self):
        tas = _s([20.0], units="degC")
        e = conv.saturation_vapor_pressure(tas, method="tetens30")
        # Tetens at 20degC ≈ 2338 Pa
        np.testing.assert_allclose(e.values[0], 2338, rtol=0.01)

    def test_esat_0C(self):
        tas = _s([0.0], units="degC")
        for m in ("tetens30", "wmo08", "buck81", "aerk96", "sonntag90",
                  "goffgratch46", "its90"):
            e = conv.saturation_vapor_pressure(tas, method=m)
            np.testing.assert_allclose(e.values[0], 611, rtol=0.01)

    def test_relative_humidity_dewpoint(self):
        tas = _s([25.0], units="degC")
        tdps = _s([15.0], units="degC", var="tdps")
        h = conv.relative_humidity(tas, tdps=tdps)
        # RH ≈ e_sat(15)/e_sat(25) ≈ 1705/3169 ≈ 54%
        np.testing.assert_allclose(h.values[0], 53.8, atol=2)

    def test_specific_humidity_roundtrip(self):
        tas = _s([25.0], units="degC")
        hurs = _s([60.0], units="%", var="hurs")
        ps = _s([101325.0], units="Pa", var="ps")
        q = conv.specific_humidity(tas, hurs, ps)
        h2 = conv.relative_humidity(tas, huss=q, ps=ps)
        # w = w_sat·RH is an approximation (same as the reference) → ~1% gap
        np.testing.assert_allclose(h2.values[0], 60.0, rtol=0.02)

    def test_dewpoint_roundtrip(self):
        tdps = _s([10.0], units="degC", var="tdps")
        ps = _s([101325.0], units="Pa", var="ps")
        q = conv.specific_humidity_from_dewpoint(tdps, ps, method="wmo08")
        td2 = conv.dewpoint_from_specific_humidity(q, ps, method="wmo08")
        np.testing.assert_allclose(td2.values[0], 283.15, atol=0.2)

    def test_vpd(self):
        tas = _s([25.0], units="degC")
        hurs = _s([100.0], units="%", var="hurs")
        vpd = conv.vapor_pressure_deficit(tas, hurs)
        np.testing.assert_allclose(vpd.values[0], 0.0, atol=1e-3)


class TestComfort:
    def test_humidex(self):
        # Masterton & Richardson (1979) formula: T=30degC, Td=21.1degC → ≈38.5
        tas = _s([30.0], units="degC")
        tdps = _s([21.1], units="degC", var="tdps")
        h = conv.humidex(tas, tdps=tdps)
        np.testing.assert_allclose(h.values[0], 38.5, atol=0.5)

    def test_heat_index(self):
        tas = _s([30.0], units="degC")
        hurs = _s([70.0], units="%", var="hurs")
        hi = conv.heat_index(tas, hurs)
        np.testing.assert_allclose(hi.values[0], 35.0, atol=1.5)

    def test_heat_index_cold_nan(self):
        tas = _s([10.0], units="degC")
        hurs = _s([70.0], units="%", var="hurs")
        hi = conv.heat_index(tas, hurs)
        assert np.isnan(hi.values[0])

    def test_wind_chill(self):
        # ECCC example: T=-20degC, V=30km/h → WCI ≈ -33
        tas = _s([-20.0], units="degC")
        wind = _s([30.0], units="km/h", var="sfcWind")
        w = conv.wind_chill_index(tas, wind)
        np.testing.assert_allclose(w.values[0], -32.6, atol=1)


class TestWind:
    def test_uv_roundtrip(self):
        uas = _s([3.0, 0.0, -4.0], units="m/s", var="uas")
        vas = _s([4.0, 5.0, 0.0], units="m/s", var="vas")
        wind, wdir = conv.uas_vas_to_sfcwind(uas, vas)
        np.testing.assert_allclose(wind.values, [5.0, 5.0, 4.0], rtol=1e-5)
        u2, v2 = conv.sfcwind_to_uas_vas(wind, wdir)
        np.testing.assert_allclose(u2.values, uas.values, atol=1e-4)
        np.testing.assert_allclose(v2.values, vas.values, atol=1e-4)

    def test_wind_profile(self):
        w = _s([10.0], units="m/s", var="sfcWind")
        out = conv.wind_profile(w, h="100 m", h_r="10 m")
        np.testing.assert_allclose(out.values[0], 10 * 10 ** (1 / 7), rtol=1e-5)

    def test_wind_power_potential(self):
        w = _s([1.0, 8.0, 20.0, 30.0], units="m/s", var="sfcWind")
        out = conv.wind_power_potential(w)
        v = np.asarray(out.values)
        assert v[0] == 0 and v[3] == 0 and v[2] == 1.0
        assert 0 < v[1] < 1


class TestSnow:
    def test_snd_snw_roundtrip(self):
        snd = _s([0.5], units="m", var="snd")
        snw = conv.snd_to_snw(snd)
        np.testing.assert_allclose(snw.values[0], 0.5 * 312, rtol=1e-5)
        snd2 = conv.snw_to_snd(snw)
        np.testing.assert_allclose(snd2.values[0], 0.5, rtol=1e-5)

    def test_snowfall_approx_binary(self):
        pr = _s([10.0, 10.0], units="mm/d", var="pr")
        tas = _s([-5.0, 5.0], units="degC")
        prsn = conv.snowfall_approximation(pr, tas, method="binary")
        np.testing.assert_allclose(prsn.values, [10.0, 0.0])
        rain = conv.rain_approximation(pr, tas, method="binary")
        np.testing.assert_allclose(rain.values, [0.0, 10.0])

    def test_snowfall_approx_brown(self):
        pr = _s([10.0, 10.0, 10.0], units="mm/d", var="pr")
        tas = _s([-5.0, 1.0, 5.0], units="degC")
        prsn = conv.snowfall_approximation(pr, tas, method="brown")
        v = np.asarray(prsn.values)
        assert v[0] == 10.0 and v[2] == 0.0 and 0 < v[1] < 10


class TestRadiation:
    def test_net_radiation(self):
        rlds = _s([300.0], units="W m-2", var="rlds")
        rls = _s([50.0], units="W m-2", var="rls")
        rlus = conv.longwave_upwelling_radiation_from_net_downwelling(rls, rlds)
        np.testing.assert_allclose(rlus.values[0], 250.0)

    def test_clearness_roundtrip(self):
        rsds = test_timeseries(np.full(10, 150.0), "rsds", start="2000-07-01",
                               units="W m-2")
        rsds.coords["lat"] = np.asarray(45.0)
        ci = conv.clearness_index(rsds)
        v = np.asarray(ci.values)
        assert (v > 0).all() and (v < 1).all()


class TestUTCI:
    def test_reference_value(self):
        # UTCI reference table (www.utci.org): Ta=25C, Tmrt=25C, va=1m/s,
        # RH=50% → UTCI ≈ 24.8±0.5
        tas = _s([25.0], units="degC")
        hurs = _s([50.0], units="%", var="hurs")
        wind = _s([1.0], units="m/s", var="sfcWind")
        mrt = _s([25.0 + 273.15], units="K")
        out = conv.universal_thermal_climate_index(tas, hurs, wind, mrt=mrt)
        np.testing.assert_allclose(out.values[0] - 273.15, 24.9, atol=1.0)

    def test_hot_humid(self):
        # hot humid: Ta=35, RH=80, va=1, mrt=35 → UTCI well above Ta
        tas = _s([35.0], units="degC")
        hurs = _s([80.0], units="%", var="hurs")
        wind = _s([1.0], units="m/s", var="sfcWind")
        mrt = _s([35.0 + 273.15], units="K")
        out = conv.universal_thermal_climate_index(tas, hurs, wind, mrt=mrt)
        assert out.values[0] - 273.15 > 40


class TestPET:
    def _txn(self, n=31):
        rng = np.random.default_rng(0)
        tx = test_timeseries(np.full(n, 25.0), "tasmax", units="degC",
                             start="2000-07-01")
        tn = test_timeseries(np.full(n, 15.0), "tasmin", units="degC",
                             start="2000-07-01")
        for a in (tx, tn):
            a.coords["lat"] = np.asarray(45.0)
        return tn, tx

    @pytest.mark.parametrize("method", ["BR65", "HG85", "MB05"])
    def test_positive_summer(self, method):
        tn, tx = self._txn()
        pet = conv.potential_evapotranspiration(tasmin=tn, tasmax=tx, method=method)
        v = np.asarray(pet.values) * 86400  # mm/day
        assert (v > 0.5).all() and (v < 15).all()

    def test_fao_pm98(self):
        tn, tx = self._txn()
        n = 31
        mk = lambda v, var, u: test_timeseries(np.full(n, v), var, units=u,
                                               start="2000-07-01")
        pet = conv.potential_evapotranspiration(
            tasmin=tn, tasmax=tx, method="FAO_PM98",
            hurs=mk(60.0, "hurs", "%"), rsds=mk(250.0, "rsds", "W m-2"),
            rsus=mk(50.0, "rsus", "W m-2"), rlds=mk(300.0, "rlds", "W m-2"),
            rlus=mk(350.0, "rlus", "W m-2"), sfcWind=mk(2.0, "sfcWind", "m/s"))
        v = np.asarray(pet.values) * 86400
        assert (v > 1).all() and (v < 12).all()


class TestWaterBudget:
    def test_with_pet(self):
        pr = test_timeseries(np.full(5, 5 / 86400), "pr", start="2000-07-01")
        pet = test_timeseries(np.full(5, 2 / 86400), "evspsblpot", start="2000-07-01")
        wb = conv.water_budget(pr, evspsblpot=pet)
        np.testing.assert_allclose(np.asarray(wb.values) * 86400, 3.0, rtol=1e-5)
