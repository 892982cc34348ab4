"""Hydrology, ANUCLIM and synoptic indices."""

import numpy as np
import pytest

from xclim_tpu.indices import (
    antecedent_precipitation_index,
    aridity_index,
    base_flow_index,
    flow_index,
    high_flow_frequency,
    isothermality,
    jetstream_metric_woollings,
    low_flow_frequency,
    prcptot,
    prcptot_wetdry_quarter,
    precip_seasonality,
    rb_flashiness_index,
    sen_slope,
    snd_max_doy,
    snow_melt_we_max,
    standardized_streamflow_index,
    temperature_seasonality,
    tg_mean_warmcold_quarter,
    tg_mean_wetdry_quarter,
)
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.testing.helpers import test_timeseries


class TestHydrology:
    def test_base_flow_index(self, q_series):
        q = q_series(np.full(365, 10.0), start="2001-01-01")
        out = base_flow_index(q, freq="YS")
        np.testing.assert_allclose(out.values[0], 1.0, rtol=1e-5)

    def test_rb_flashiness(self, q_series):
        q = q_series(np.array([10.0, 10, 10, 10]), start="2001-01-01")
        out = rb_flashiness_index(q, freq="YS")
        np.testing.assert_allclose(out.values[0], 0.0, atol=1e-6)
        q2 = q_series(np.array([10.0, 20, 10, 20]), start="2001-01-01")
        out2 = rb_flashiness_index(q2, freq="YS")
        assert out2.values[0] > 0.4

    def test_flow_frequency(self, q_series):
        vals = np.full(365, 10.0)
        vals[10:15] = 100.0  # 5 high-flow days
        vals[100:120] = 1.0  # 20 low-flow days
        q = q_series(vals, start="2000-10-01")
        hi = high_flow_frequency(q, threshold_factor=9, freq="YS-OCT")
        assert hi.values[0] == 5
        lo = low_flow_frequency(q, threshold_factor=0.2, freq="YS-OCT")
        assert lo.values[0] == 20

    def test_flow_index(self, q_series):
        q = q_series(np.arange(1.0, 101.0), start="2001-01-01")
        out = flow_index(q, 0.95)
        assert 1.5 < float(out.values) < 2.1

    def test_api(self, pr_series):
        vals = np.zeros(30)
        vals[10] = 10 / 86400  # 10mm on day 10
        pr = pr_series(vals, start="2001-01-01")
        out = antecedent_precipitation_index(pr, window=7, p_exp=0.935)
        v = np.asarray(out.values)
        np.testing.assert_allclose(v[10], 10.0, rtol=1e-5)
        np.testing.assert_allclose(v[11], 10 * 0.935, rtol=1e-4)

    def test_snow_melt(self, snw_series):
        vals = np.full(60, 100.0)
        vals[30:] = 40.0  # 60 kg/m2 melt on day 30
        snw = snw_series(vals, start="2001-01-01")
        out = snow_melt_we_max(snw, window=3, freq="YS")
        np.testing.assert_allclose(out.values[0], 60.0, rtol=1e-5)

    def test_snd_max_doy(self, snd_series):
        vals = np.zeros(365)
        vals[99] = 1.0
        snd = snd_series(vals, start="2000-07-02")
        out = snd_max_doy(snd, freq="YS-JUL")
        # 2000-07-02 + 99 days = 2000-10-09 → doy 283
        assert out.values[0] == 283

    def test_sen_slope(self, q_series):
        n = 365 * 10
        trend = np.linspace(0, 10, n)
        q = q_series((100 + trend).astype(np.float32), start="2001-01-01")
        slope, p = sen_slope(q, freq="YS")
        assert float(slope.values) > 0.9  # ~1 unit/year
        assert float(p.values) < 0.05

    def test_ssi(self, q_series):
        rng = np.random.default_rng(0)
        q = q_series(rng.lognormal(2, 0.4, 365 * 12).astype(np.float32),
                     start="1981-01-01")
        out = standardized_streamflow_index(q, freq="MS", dist="genextreme")
        v = np.asarray(out.values)
        ok = v[~np.isnan(v)]
        assert abs(ok.mean()) < 0.25


class TestAnuclim:
    def test_temperature_seasonality(self, tas_series):
        n = 365 * 2
        doy = np.arange(n) % 365
        vals = 280 + 10 * np.sin(2 * np.pi * doy / 365)
        tas = tas_series(vals.astype(np.float32), start="2001-01-01")
        out = temperature_seasonality(tas, freq="YS")
        v = np.asarray(out.values)
        np.testing.assert_allclose(v, 10 / np.sqrt(2) / 280 * 100, rtol=0.05)

    def test_isothermality(self, tasmin_series, tasmax_series):
        n = 365
        tn = tasmin_series(np.full(n, 275.0), start="2001-01-01")
        tx = tasmax_series(np.full(n, 285.0), start="2001-01-01")
        out = isothermality(tn, tx, freq="YS")
        np.testing.assert_allclose(out.values[0], 100.0, rtol=1e-4)

    def test_quarters(self, tas_series, pr_series):
        n = 365 * 2
        doy = np.arange(n) % 365
        tvals = 280 + 10 * np.sin(2 * np.pi * (doy - 196) / 365)  # warm mid-July
        tas = tas_series(tvals.astype(np.float32), start="2001-01-01")
        warm = tg_mean_warmcold_quarter(tas, op="warmest", freq="YS")
        cold = tg_mean_warmcold_quarter(tas, op="coldest", freq="YS")
        assert (np.asarray(warm.values) > np.asarray(cold.values)).all()

    def test_wetdry_quarter(self, tas_series, pr_series):
        n = 365
        pvals = np.full(n, 1.0 / 86400)
        pvals[180:270] = 10 / 86400  # wet JJA-ish
        tvals = np.full(n, 280.0)
        tvals[180:270] = 300.0
        pr = pr_series(pvals, start="2001-01-01")
        tas = tas_series(tvals, start="2001-01-01")
        out = tg_mean_wetdry_quarter(tas, pr, op="wettest", freq="YS")
        assert float(out.values[0]) > 290

    def test_prcptot(self, pr_series):
        pr = pr_series(np.full(365, 2 / 86400), start="2001-01-01")
        out = prcptot(pr, freq="YS")
        np.testing.assert_allclose(out.values[0], 2 * 365, rtol=1e-4)


class TestJetstream:
    def test_basic(self):
        import jax.numpy as jnp

        from xclim_tpu.core.calendar import date_range

        n, nlat = 365, 21
        lats = np.linspace(20, 70, nlat)
        rng = np.random.default_rng(0)
        # jet centred at 45N
        u = 20 * np.exp(-((lats[None, :] - 45) / 10) ** 2) + \
            rng.normal(0, 1, (n, nlat))
        time = date_range("2001-01-01", periods=n, freq="D")
        ua = ClimArray(jnp.asarray(u.astype(np.float32)), ("time", "lat"),
                       {"time": time, "lat": lats}, {"units": "m/s"}, "ua")
        la, s = jetstream_metric_woollings(ua)
        sv = np.asarray(s.values)
        lv = np.asarray(la.values)
        ok = ~np.isnan(lv)
        assert abs(np.nanmean(lv[ok]) - 45) < 3
        assert np.nanmean(sv[ok]) > 15


class TestAridity:
    def test_basic(self, pr_series, evspsblpot_series):
        pr = pr_series(np.full(365, 2 / 86400), start="2001-01-01")
        pet = evspsblpot_series(np.full(365, 4 / 86400), start="2001-01-01")
        out = aridity_index(pr, pet, freq="YS")
        np.testing.assert_allclose(out.values[0], 0.5, rtol=1e-5)
