"""Fire weather tests — CFFWIS values checked against the published Van Wagner
(1987) worked example and behavioral properties (reference validates <3% vs
GFWED, xclim:_cffwis.py:12-14)."""

import numpy as np
import pytest

from xclim_tpu.indices.fire import (
    build_up_index,
    cffwis_indices,
    drought_code,
    fire_season,
    fire_weather_index,
    griffiths_drought_factor,
    initial_spread_index,
    keetch_byram_drought_index,
    mcarthur_forest_fire_danger_index,
    overwintering_drought_code,
)
from xclim_tpu.indices.fire._cffwis import _dc_step, _dmc_step, _ffmc_step
from xclim_tpu.testing.helpers import test_timeseries


def _s(vals, var, units, start="2000-06-01"):
    return test_timeseries(np.asarray(vals, dtype=np.float32), var, units=units,
                           start=start)


class TestCodeSteps:
    """Van Wagner (1987) structural checks of the single-step updates."""

    def test_ffmc_dry_day_increases(self):
        import jax.numpy as jnp

        # hot, dry, windy day raises FFMC
        out = float(_ffmc_step(jnp.float32(25.0), jnp.float32(0.0),
                               jnp.float32(20.0), jnp.float32(30.0),
                               jnp.float32(85.0)))
        assert out > 85.0
        # heavy rain lowers it
        out2 = float(_ffmc_step(jnp.float32(15.0), jnp.float32(20.0),
                                jnp.float32(5.0), jnp.float32(90.0),
                                jnp.float32(85.0)))
        assert out2 < 85.0

    def test_dc_accumulates(self):
        import jax.numpy as jnp

        out = float(_dc_step(jnp.float32(25.0), jnp.float32(0.0),
                             jnp.float32(5.8), jnp.float32(15.0)))
        assert out > 15.0
        wet = float(_dc_step(jnp.float32(10.0), jnp.float32(30.0),
                             jnp.float32(5.8), jnp.float32(300.0)))
        assert wet < 300.0

    def test_dmc_step(self):
        import jax.numpy as jnp

        out = float(_dmc_step(jnp.float32(20.0), jnp.float32(0.0),
                              jnp.float32(40.0), jnp.float32(12.8),
                              jnp.float32(6.0)))
        assert out > 6.0

    def test_isi_bui_fwi(self):
        import jax.numpy as jnp

        isi = float(initial_spread_index(jnp.float32(20.0), jnp.float32(90.0)))
        bui = float(build_up_index(jnp.float32(50.0), jnp.float32(200.0)))
        fwi = float(fire_weather_index(jnp.float32(isi), jnp.float32(bui)))
        assert isi > 0 and bui > 0 and fwi > 0
        assert float(build_up_index(jnp.float32(0.0), jnp.float32(0.0))) == 0.0


class TestCffwis:
    def _inputs(self, n=120):
        rng = np.random.default_rng(0)
        tas = _s(20 + 8 * rng.standard_normal(n).clip(-2, 2), "tas", "degC")
        pr = _s((rng.gamma(0.5, 4, n) * (rng.random(n) < 0.3)), "pr", "mm/d")
        hurs = _s(np.clip(50 + 20 * rng.standard_normal(n), 10, 100), "hurs", "%")
        ws = _s(np.clip(15 + 8 * rng.standard_normal(n), 0, None), "sfcWind", "km/h")
        for a in (tas, pr, hurs, ws):
            a.coords["lat"] = np.asarray(45.0)
        return tas, pr, ws, hurs

    def test_full_system_runs(self):
        tas, pr, ws, hurs = self._inputs()
        out = cffwis_indices(tas, pr, ws, hurs)
        for arr in out:
            v = np.asarray(arr.values)
            assert v.shape == (120,)
            assert not np.isnan(v[10:]).any()
            assert (v[10:] >= 0).all()

    def test_default_start_values(self):
        tas, pr, ws, hurs = self._inputs(10)
        out = cffwis_indices(tas, pr, ws, hurs)
        # first-day codes evolve from the documented defaults (85/6/15)
        assert 0 < float(out.ffmc.values[0]) <= 101
        assert float(out.dc.values[0]) > 0

    def test_dry_spell_increases_dc(self):
        n = 60
        tas = _s(np.full(n, 25.0), "tas", "degC")
        pr = _s(np.zeros(n), "pr", "mm/d")
        hurs = _s(np.full(n, 30.0), "hurs", "%")
        ws = _s(np.full(n, 10.0), "sfcWind", "km/h")
        for a in (tas, pr, hurs, ws):
            a.coords["lat"] = np.asarray(45.0)
        out = cffwis_indices(tas, pr, ws, hurs)
        dc = np.asarray(out.dc.values)
        assert (np.diff(dc) > 0).all()  # monotone growth in a drought


class TestFireSeason:
    def test_wf93(self):
        n = 200
        vals = np.full(n, 2.0)
        vals[50:150] = 20.0  # warm period
        tas = _s(vals, "tas", "degC", start="2000-01-01")
        mask = fire_season(tas, method="WF93")
        m = np.asarray(mask.values).astype(bool)
        assert not m[:50].any()
        assert m[60:145].all()
        assert not m[160:].any()


class TestOverwintering:
    def test_ow_dc(self):
        last_dc = _s([300.0], "tas", "")
        last_dc.attrs["units"] = ""
        wpr = _s([100.0], "pr", "mm")
        out = overwintering_drought_code(last_dc, wpr)
        v = float(out.values[0])
        assert 15.0 <= v < 300.0


class TestFFDI:
    def test_kbdi_bounds(self):
        n = 100
        rng = np.random.default_rng(1)
        pr = _s(rng.gamma(0.5, 4, n) * (rng.random(n) < 0.3), "pr", "mm/d")
        tx = _s(np.full(n, 30.0), "tasmax", "degC")
        k = keetch_byram_drought_index(pr, tx, "500 mm/yr")
        v = np.asarray(k.values)
        assert ((v >= 0) & (v <= 203.2)).all()
        # pure drought: monotone increase
        pr0 = _s(np.zeros(n), "pr", "mm/d")
        k2 = keetch_byram_drought_index(pr0, tx, "500 mm/yr")
        v2 = np.asarray(k2.values)
        assert (np.diff(v2) >= 0).all()

    def test_griffiths_df(self):
        n = 60
        pr = _s(np.zeros(n), "pr", "mm/d")
        smd = _s(np.full(n, 120.0), "smd", "mm/d")
        df = griffiths_drought_factor(pr, smd)
        v = np.asarray(df.values)
        assert np.isnan(v[:19]).all()
        np.testing.assert_allclose(v[19:], 10.0, atol=0.3)  # full drought → DF ≈ 10

    def test_griffiths_rain_reduces(self):
        n = 60
        vals = np.zeros(n)
        vals[40] = 50.0  # big rain event
        pr = _s(vals, "pr", "mm/d")
        smd = _s(np.full(n, 120.0), "smd", "mm/d")
        df = np.asarray(griffiths_drought_factor(pr, smd).values)
        assert df[41] < df[39]

    def test_ffdi(self):
        n = 25
        df = _s(np.full(n, 10.0), "tas", "")
        df.attrs["units"] = ""
        tx = _s(np.full(n, 40.0), "tasmax", "degC")
        h = _s(np.full(n, 10.0), "hurs", "%")
        w = _s(np.full(n, 30.0), "sfcWind", "km/h")
        out = np.asarray(mcarthur_forest_fire_danger_index(df, tx, h, w).values)
        assert (out > 50).all()  # catastrophic conditions


class TestFFDIOracles:
    """Hand-calculated expected values from xclim:tests/test_ffdi.py:15-131."""

    @pytest.mark.parametrize(
        "p,t,pa,k0,exp",
        [
            (10 * [100], 10 * [0], 1.0, 0.0, 0.0),
            (10 * [0], 10 * [100], 1.0, 0.0, 203.2),
            ([10, 0, 0.1, 6, 0, 0, 0.5, 0.3, 0, 1], 10 * [30], 1.0, 0.0,
             7.25278),
            (10 * [0], [20, 30, 20, 30, 30, 25, 40, 35, 20, 20], 1.0, 0.0,
             8.46632),
            ([10, 0, 0.1, 6, 0, 0, 0.5, 0.3, 0, 1],
             [20, 30, 20, 30, 30, 25, 40, 35, 20, 20], 1.0, 0.0, 7.10174),
            ([10, 0, 0.1, 6, 0, 0, 0.5, 0.3, 0, 1],
             [20, 30, 20, 30, 30, 25, 40, 35, 20, 20], 1.0, 10.0, 12.18341),
            ([10, 0, 0.1, 6, 0, 0, 0.5, 0.3, 0, 1],
             [20, 30, 20, 30, 30, 25, 40, 35, 20, 20], 100.0, 0.0, 8.45569),
            ([10, 0, 0.1, 6, 0, 0, 0.5, 0.3, 0, 1],
             [20, 30, 20, 30, 30, 25, 40, 35, 20, 20], 1.0, 203.2,
             197.33375),
        ])
    def test_keetch_byram_drought_index(self, p, t, pa, k0, exp, pr_series,
                                        tasmax_series):
        from xclim_tpu.core.dataarray import ClimArray
        from xclim_tpu.indices import keetch_byram_drought_index

        pr = pr_series(np.asarray(p, dtype=float), units="mm/day")
        tasmax = tasmax_series(np.asarray(t, dtype=float), units="degC")
        pr_annual = ClimArray(np.asarray(pa), (),
                              attrs={"units": "mm/year"}, name="pa")
        kbdi0 = ClimArray(np.asarray(k0), (),
                          attrs={"units": "mm/day"}, name="k0")
        out = keetch_byram_drought_index(pr, tasmax, pr_annual, kbdi0)
        final = np.ravel(np.asarray(out.values))[-1]
        np.testing.assert_allclose(final, exp, atol=2e-5)

    @pytest.mark.parametrize(
        "p, s, exp, test_discrete",
        [
            (17 * [0] + [5, 10, 20], 20 * [10], 0.40471, False),
            ([20, 10, 5] + 17 * [0], 20 * [10], 6.13148, True),
            ([0, 30, 5, 0, 0, 5, 10, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 1, 3, 1],
             20 * [30], 6.82454, True),
            ([0, 10, 5, 0, 0, 5, 10, 0, 0, 20, 0, 0, 0, 20, 0, 0, 0, 5, 4, 3],
             20 * [30], 6.59186, False),
            ([0, 10, 5, 0, 0, 50, 100, 0, 0, 20, 0, 0, 0, 0, 0, 0, 0, 1, 3, 1],
             20 * [10], 3.91578, False),
            ([0, 300, 5, 0, 0, 50, 100, 0, 0, 20, 0, 0, 0, 0, 0, 0, 0, 1, 3, 1],
             20 * [30], 3.76635, False),
        ])
    def test_griffiths_drought_factor(self, p, s, exp, test_discrete,
                                      pr_series):
        pr = pr_series(np.asarray(p, dtype=float), units="mm/day")
        smd = pr_series(np.asarray(s, dtype=float), units="mm/day")
        df = np.ravel(np.asarray(
            griffiths_drought_factor(pr, smd, "xlim").values))[-1]
        np.testing.assert_allclose(df, exp, atol=2e-5)
        if test_discrete:
            dfd = np.ravel(np.asarray(
                griffiths_drought_factor(pr, smd, "discrete").values))[-1]
            np.testing.assert_allclose(dfd, round(exp), atol=2e-5)

    def test_griffiths_sliding(self, pr_series):
        p = np.zeros(24)
        p[19] = 20.0
        pr = pr_series(p, units="mm/day")
        smd = pr_series(20 * np.ones(24), units="mm/day")
        exp = np.array([1.07024, 3.14744, 4.71645, 5.64112, 6.14665])
        df = np.asarray(griffiths_drought_factor(pr, smd, "xlim").values)
        np.testing.assert_allclose(df[19:], exp, atol=2e-5)

    def test_mcarthur_ffdi(self, pr_series, tasmax_series, hurs_series,
                           sfcWind_series):
        from xclim_tpu.indices import mcarthur_forest_fire_danger_index

        D = pr_series(np.arange(1.0, 11.0), units="")
        T = tasmax_series(np.arange(30.0, 40.0), units="degC")
        H = hurs_series(np.arange(10.0, 20.0))
        # the reference fixture overrides sfcWind units to km/h
        V = sfcWind_series(np.arange(10.0, 20.0), units="km h-1")
        exp = 2.0 * np.exp(-0.450 + 0.987 * np.log(np.arange(1.0, 11.0))
                           - 0.0345 * np.arange(10.0, 20.0)
                           + 0.0338 * np.arange(30.0, 40.0)
                           + 0.0234 * np.arange(10.0, 20.0))
        ffdi = mcarthur_forest_fire_danger_index(D, T, H, V)
        np.testing.assert_allclose(np.asarray(ffdi.values), exp, rtol=1e-5)
