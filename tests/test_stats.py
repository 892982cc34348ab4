"""Distribution fitting & standardized indices (reference: xclim
tests/test_stats.py; validation vs scipy)."""

import numpy as np
import pytest
from scipy import stats as spstats

from xclim_tpu.indices.stats import (
    fa,
    fit,
    frequency_analysis,
    parametric_cdf,
    parametric_quantile,
    standardized_index,
    standardized_index_fit_params,
)
from xclim_tpu.testing.helpers import test_timeseries


def _series(vals, var="pr", units="kg m-2 s-1", start="1981-01-01", freq="D"):
    return test_timeseries(np.asarray(vals, dtype=np.float32), var, start=start,
                           freq=freq, units=units)


class TestFit:
    def test_norm_vs_scipy(self):
        rng = np.random.default_rng(0)
        x = rng.normal(10, 3, 500).astype(np.float32)
        da = _series(x, var="tas", units="K")
        p = fit(da, "norm")
        np.testing.assert_allclose(p.values[0], x.mean(), rtol=1e-5)
        np.testing.assert_allclose(p.values[1], x.std(), rtol=1e-3)

    def test_gamma_approx_ml(self):
        rng = np.random.default_rng(1)
        a_true, scale_true = 4.0, 2.5
        x = rng.gamma(a_true, scale_true, 3000).astype(np.float32)
        da = _series(x)
        p = fit(da, "gamma", method="ML")
        a, loc, scale = np.asarray(p.values)
        assert abs(a - a_true) / a_true < 0.1
        assert abs(scale - scale_true) / scale_true < 0.1

    def test_gumbel_pwm(self):
        rng = np.random.default_rng(2)
        x = spstats.gumbel_r.rvs(loc=20, scale=5, size=3000,
                                 random_state=rng).astype(np.float32)
        da = _series(x, var="tas", units="K")
        p = fit(da, "gumbel_r", method="PWM")
        loc, scale = np.asarray(p.values)
        assert abs(loc - 20) < 0.5 and abs(scale - 5) < 0.3

    def test_genextreme_lmoments(self):
        rng = np.random.default_rng(3)
        x = spstats.genextreme.rvs(0.1, loc=15, scale=3, size=5000,
                                   random_state=rng).astype(np.float32)
        da = _series(x, var="tas", units="K")
        p = fit(da, "genextreme", method="PWM")
        c, loc, scale = np.asarray(p.values)
        assert abs(c - 0.1) < 0.06
        assert abs(loc - 15) < 0.3
        assert abs(scale - 3) < 0.3

    def test_scipy_fallback(self):
        rng = np.random.default_rng(4)
        x = rng.normal(5, 2, 200).astype(np.float32)
        da = _series(x, var="tas", units="K")
        p = fit(da, "norm", method="ML_scipy")
        np.testing.assert_allclose(np.asarray(p.values), [x.mean(), x.std()],
                                   rtol=1e-3)


class TestParametric:
    def test_quantile_cdf_roundtrip(self):
        rng = np.random.default_rng(5)
        x = rng.gamma(3.0, 2.0, 2000).astype(np.float32)
        da = _series(x)
        p = fit(da, "gamma")
        q = parametric_quantile(p, [0.5, 0.9])
        v50 = float(np.asarray(q.values)[0])
        c = parametric_cdf(p, v50)
        np.testing.assert_allclose(np.asarray(c.values)[0], 0.5, atol=1e-3)

    def test_gamma_ppf_vs_scipy(self):
        rng = np.random.default_rng(6)
        x = rng.gamma(2.0, 1.5, 2000).astype(np.float32)
        da = _series(x)
        p = fit(da, "gamma")
        a, loc, scale = (float(v) for v in np.asarray(p.values))
        ours = float(np.asarray(parametric_quantile(p, [0.9]).values)[0])
        ref = spstats.gamma.ppf(0.9, a, loc=loc, scale=scale)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)


class TestFrequencyAnalysis:
    def test_fa_return_levels(self):
        rng = np.random.default_rng(7)
        annual_max = spstats.gumbel_r.rvs(loc=30, scale=4, size=50,
                                          random_state=rng).astype(np.float32)
        da = _series(annual_max, var="tas", units="K", freq="YS")
        out = fa(da, t=[10, 100], dist="gumbel_r", mode="max")
        v = np.asarray(out.values)
        # higher return period → higher level; T=100 around loc+scale·ln(99)…
        assert v[1] > v[0] > 30

    def test_frequency_analysis_daily(self):
        rng = np.random.default_rng(8)
        q = rng.lognormal(1, 0.5, 365 * 20).astype(np.float32)
        da = _series(q, var="q", units="m3 s-1")
        out = frequency_analysis(da, mode="max", t=10, dist="gumbel_r", freq="YS")
        assert np.asarray(out.values).shape == (1,)
        assert float(np.asarray(out.values)[0]) > np.median(q)


@pytest.mark.slow
class TestStandardizedIndex:
    def test_spi_zero_mean(self):
        # SPI of the calibration data should be ~N(0,1)
        rng = np.random.default_rng(9)
        n = 365 * 20
        pr = rng.gamma(2.0, 2e-5, n) * (rng.random(n) < 0.6)
        da = _series(pr)
        si = standardized_index(da, freq="MS", window=1, dist="gamma",
                                method="APP")
        v = np.asarray(si.values)
        ok = v[~np.isnan(v)]
        assert abs(ok.mean()) < 0.15
        assert 0.7 < ok.std() < 1.3

    def test_spi_dry_wet(self):
        rng = np.random.default_rng(10)
        n = 365 * 10
        base = rng.gamma(2.0, 2e-5, n)
        da = _series(base)
        params = standardized_index_fit_params(da, freq="MS", window=1,
                                               dist="gamma", method="APP")
        # a very wet month should map to strongly positive SPI
        wet = _series(np.full(400, 3 * base.mean()))
        si = standardized_index(wet, params=params)
        v = np.asarray(si.values)
        assert np.nanmean(v) > 1.0

    def test_spi_window(self):
        rng = np.random.default_rng(11)
        n = 365 * 8
        pr = rng.gamma(2.0, 2e-5, n)
        da = _series(pr)
        si3 = standardized_index(da, freq="MS", window=3, dist="gamma",
                                 method="APP")
        v = np.asarray(si3.values)
        assert np.isnan(v[:2]).all()  # window spin-up
        ok = v[~np.isnan(v)]
        assert abs(ok.mean()) < 0.25
