"""Value-level tests for the second-wave indicator declarations
(reference behaviors: xclim:src/xclim/indicators/...)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.indicators import atmos, convert, land


def series(values, var, units, start="2001-01-01", calendar="noleap"):
    from xclim_tpu.core.variables import VARIABLES

    t = date_range(start, periods=len(values), freq="D", calendar=calendar)
    attrs = {"units": units}
    meta = VARIABLES.get(var, {})
    if meta.get("standard_name"):
        attrs["standard_name"] = meta["standard_name"]
    if meta.get("cell_methods"):
        attrs["cell_methods"] = meta["cell_methods"]
    return ClimArray(jnp.asarray(np.asarray(values, np.float32)), ("time",),
                     {"time": t}, attrs, var)


class TestDegreeDays:
    def test_freezing_degree_days(self):
        # 10 days at -5°C → 50 K·days
        v = np.full(365, 10.0)
        v[:10] = -5.0
        tas = series(v + 273.15, "tas", "K")
        out = atmos.freezing_degree_days(tas=tas, freq="YS")
        np.testing.assert_allclose(np.asarray(out.data)[0], 50.0, rtol=1e-5)

    def test_thawing_degree_days(self):
        v = np.full(365, -10.0)
        v[:20] = 3.0  # 20 days at +3 → 60
        tas = series(v + 273.15, "tas", "K")
        out = atmos.thawing_degree_days(tas=tas, freq="YS")
        np.testing.assert_allclose(np.asarray(out.data)[0], 60.0, rtol=1e-5)


class TestFreezeThaw:
    def test_dlyfrzthw_count(self):
        tx = np.full(365, -5.0)
        tn = np.full(365, -10.0)
        tx[100:115] = 5.0  # 15 freeze-thaw days (tx > 0, tn <= 0)
        tasmax = series(tx + 273.15, "tasmax", "K")
        tasmin = series(tn + 273.15, "tasmin", "K")
        out = atmos.dlyfrzthw(tasmin=tasmin, tasmax=tasmax, freq="YS")
        np.testing.assert_allclose(np.asarray(out.data)[0], 15.0)

    def test_spell_stats(self):
        tx = np.full(365, -5.0)
        tn = np.full(365, -10.0)
        # two spells: 5 days and 3 days
        tx[50:55] = 5.0
        tx[70:73] = 5.0
        tasmax = series(tx + 273.15, "tasmax", "K")
        tasmin = series(tn + 273.15, "tasmin", "K")
        freq_n = atmos.freezethaw_spell_frequency(tasmin=tasmin,
                                                  tasmax=tasmax, window=2,
                                                  freq="YS")
        mx = atmos.freezethaw_spell_max_length(tasmin=tasmin, tasmax=tasmax,
                                               window=2, freq="YS")
        np.testing.assert_allclose(np.asarray(freq_n.data)[0], 2.0)
        np.testing.assert_allclose(np.asarray(mx.data)[0], 5.0)


class TestHeatSpells:
    def test_frequency_and_length(self):
        tn = np.full(365, 10.0)
        tx = np.full(365, 20.0)
        tn[180:187] = 22.0  # 7-day heat spell
        tx[180:187] = 35.0
        tasmin = series(tn + 273.15, "tasmin", "K")
        tasmax = series(tx + 273.15, "tasmax", "K")
        f = atmos.heat_spell_frequency(tasmin=tasmin, tasmax=tasmax,
                                       freq="YS")
        ml = atmos.heat_spell_max_length(tasmin=tasmin, tasmax=tasmax,
                                         freq="YS")
        assert np.asarray(f.data)[0] == 1
        # 3-day rolling means stay above thresholds for the full block
        assert np.asarray(ml.data)[0] >= 7


class TestPrecipPhase:
    def test_liquid_solid_split(self):
        pr = np.full(365, 10.0 / 86400.0)  # 10 mm/day
        tas = np.full(365, 5.0)
        tas[:100] = -5.0  # first 100 days solid
        pr_a = series(pr, "pr", "kg m-2 s-1")
        tas_a = series(tas + 273.15, "tas", "K")
        liq = atmos.liquidprcpavg(pr=pr_a, tas=tas_a, freq="YS")
        sol = atmos.solidprcpavg(pr=pr_a, tas=tas_a, freq="YS")
        ratio = atmos.liquid_precip_ratio(pr=pr_a, tas=tas_a, freq="YS")
        np.testing.assert_allclose(np.asarray(ratio.data)[0], 265 / 365,
                                   rtol=1e-4)
        assert np.asarray(liq.data)[0] > 0
        assert np.asarray(sol.data)[0] > 0

    def test_snowfall_frequency_intensity(self):
        prsn = np.zeros(365)
        prsn[:40] = 5.0 / 86400.0  # 40 snowy days at 5 mm/day
        prsn_a = series(prsn, "prsn", "kg m-2 s-1", start="2001-07-01")
        f = atmos.snowfall_frequency(prsn=prsn_a, freq="YS-JUL")
        i = atmos.snowfall_intensity(prsn=prsn_a, freq="YS-JUL")
        np.testing.assert_allclose(np.asarray(f.data)[0], 40 / 365 * 100,
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(i.data)[0], 5.0, rtol=1e-4)


class TestHardinessZones:
    def test_usda_monotone_in_temperature(self):
        rng = np.random.default_rng(0)
        n = 365 * 31
        cold = series(rng.normal(-20, 3, n) + 273.15, "tasmin", "K",
                      start="1970-07-01")
        warm = series(rng.normal(0, 3, n) + 273.15, "tasmin", "K",
                      start="1970-07-01")
        zc = np.asarray(atmos.usda_hardiness_zones(tasmin=cold,
                                                   freq="YS-JUL").data)
        zw = np.asarray(atmos.usda_hardiness_zones(tasmin=warm,
                                                   freq="YS-JUL").data)
        vc = zc[np.isfinite(zc)]
        vw = zw[np.isfinite(zw)]
        assert vw.mean() > vc.mean()


class TestConverters:
    def test_vapor_pressure(self):
        huss = series(np.full(10, 0.008), "huss", "1")
        ps = series(np.full(10, 101325.0), "ps", "Pa")
        e = convert.vapor_pressure(huss=huss, ps=ps)
        # e = q*p/(eps + (1-eps) q) ≈ 1293 Pa
        np.testing.assert_allclose(np.asarray(e.data)[0], 1293, rtol=0.02)

    def test_upwelling_radiation(self):
        rls = series(np.full(10, -50.0), "rls", "W m-2")
        rlds = series(np.full(10, 300.0), "rlds", "W m-2")
        out = convert.longwave_upwelling_radiation_from_net_downwelling(
            rls=rls, rlds=rlds)
        np.testing.assert_allclose(np.asarray(out.data), 350.0)

    def test_mean_temp(self):
        tn = series(np.full(10, 280.0), "tasmin", "K")
        tx = series(np.full(10, 290.0), "tasmax", "K")
        out = convert.mean_temperature_from_max_and_min(tasmin=tn, tasmax=tx)
        np.testing.assert_allclose(np.asarray(out.data), 285.0)


class TestLandIndicators:
    def test_runoff_ratio(self):
        q = series(np.full(365, 10.0), "q", "m3 s-1")  # 10 m3/s
        pr = series(np.full(365, 1e-5), "pr", "kg m-2 s-1")
        out = land.runoff_ratio(q=q, pr=pr, area="1000 km2", freq="YS")
        # runoff depth = 10*86400*365/1e9 m ; precip = 1e-5*86400*365 mm ...
        v = float(np.asarray(out.data)[0])
        assert 0 < v < 2

    def test_sen_slope_indicator(self):
        q = series(np.linspace(5, 10, 365 * 3), "q", "m3 s-1")
        s, p = land.sen_slope(q=q, freq="YS")
        # one slope over the annual means; strongly positive trend
        assert float(np.asarray(s.data)) > 0
        assert float(np.asarray(p.data)) <= 1.0


class TestHourlyChill:
    def test_chill_portions_and_units_from_hourly(self):
        from xclim_tpu.indices.helpers import make_hourly_temperature

        rng = np.random.default_rng(0)
        n = 365
        tn = series(rng.normal(2, 3, n) + 273.15, "tasmin", "K")
        tx = series(rng.normal(12, 3, n) + 273.15, "tasmax", "K")
        hourly = make_hourly_temperature(tn, tx)
        assert hourly.time.infer_freq() == "h"
        cp = atmos.cp(tas=hourly, freq="YS")
        cu = atmos.cu(tas=hourly, freq="YS")
        assert float(np.asarray(cp.data)[0]) > 50  # substantial chill accum.
        assert float(np.asarray(cu.data)[0]) > 500
