"""Distribution-fitting oracles (xclim:tests/test_stats.py).

The weibull_min / genextreme series and their expected ML parameters are the
reference's own fixed fixtures (test_stats.py:36-122,147-157) — they
specifically catch fits that diverge without good initial conditions.
scipy is used as an independent cross-check where the reference used it.
"""

import numpy as np
import pytest
import scipy.stats as sps

from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.indices import stats

WEIBULL_DATA = np.array([
    4836.6, 823.6, 3131.7, 1343.4, 709.7, 610.6, 3034.2, 1973, 7358.5,
    265, 4590.5, 5440.4, 4613.7, 4763.1, 115.3, 5385.1, 6398.1, 8444.6,
    2397.1, 3259.7, 307.5, 4607.4, 6523.7, 600.3, 2813.5, 6119.8, 6438.8,
    2799.1, 2849.8, 5309.6, 3182.4, 705.5, 5673.3, 2939.9, 2631.8, 5002.1,
    1967.3, 2810.4, 2948, 6904.8])

GEV_DATA = np.array([279, 302, 450, 272, 401, 222, 311, 327, 294, 299, 348,
                     286, 492, 296, 227, 437, 340, 376, 444, 177],
                    dtype=float)


def _series(vals):
    t = date_range("2045-02-02", periods=len(vals), freq="D")
    return ClimArray(np.asarray(vals, dtype=np.float64), ("time",),
                     {"time": t}, {"units": ""}, "q")


class TestMLFitOracles:
    def test_weibull_min_fit(self):
        # xclim:tests/test_stats.py:147 — diverges without good x0
        p = np.asarray(stats.fit(_series(WEIBULL_DATA), "weibull_min").data)
        np.testing.assert_allclose(p, (1.7760067, -322.092552, 4355.262679),
                                   rtol=1e-3)

    def test_genextreme_fit(self):
        # xclim:tests/test_stats.py:153
        p = np.asarray(stats.fit(_series(GEV_DATA), "genextreme").data)
        np.testing.assert_allclose(p, (0.20949, 297.954091, 75.7911863),
                                   rtol=1e-3)

    def test_lognorm_vs_scipy(self):
        rng = np.random.default_rng(0)
        vals = rng.lognormal(2, 1, 200)
        p = np.asarray(stats.fit(_series(vals), "lognorm").data)
        p0 = sps.lognorm.fit(vals)
        # same likelihood surface; allow small optimizer differences
        ll_ours = np.sum(sps.lognorm.logpdf(vals, *p))
        ll_scipy = np.sum(sps.lognorm.logpdf(vals, *p0))
        assert ll_ours >= ll_scipy - 0.5

    def test_fit_nan_equals_censor(self):
        # xclim:tests/test_stats.py:192 — NaNs are dropped, not poisoned
        vals = np.asarray(GEV_DATA, dtype=float).copy()
        da = _series(vals)
        vals_nan = vals.copy()
        vals_nan[0] = np.nan
        p_nan = np.asarray(stats.fit(_series(vals_nan), "genextreme").data)
        p_censor = np.asarray(stats.fit(_series(vals[1:]),
                                        "genextreme").data)
        np.testing.assert_allclose(p_nan, p_censor, rtol=1e-5)


class TestFA:
    def test_fa_vs_scipy_ppf(self):
        # xclim:tests/test_stats.py:175 — return level = ppf(1 - 1/T)
        T = 10
        da = _series(GEV_DATA)
        q = np.asarray(stats.fa(da, T, "genextreme", mode="max",
                                method="ML").data)
        p = np.asarray(stats.fit(da, "genextreme", method="ML").data)
        q0 = sps.genextreme.ppf(1 - 1.0 / T, *p)
        np.testing.assert_allclose(np.ravel(q)[0], q0, rtol=1e-5)


class TestPWMRecovery:
    """PWM/L-moment fits recover generating parameters (the reference
    validates against the lmoments3 package; here the generating
    parameters themselves are the oracle, xclim:tests/test_stats.py:259)."""

    CASES = {
        "gumbel_r": dict(loc=2.285519, scale=1.647295),
        "norm": dict(loc=3.236364, scale=2.023820),
        "expon": dict(loc=0.9527273, scale=2.2836364),
        "genextreme": dict(c=-0.1555609, loc=2.1792884, scale=1.3956404),
    }

    @pytest.mark.parametrize("dist", sorted(CASES))
    def test_recovery(self, dist):
        par = self.CASES[dist]
        rng = np.random.default_rng(42)
        vals = getattr(sps, dist)(**par).rvs(size=4000, random_state=rng)
        p = np.asarray(stats.fit(_series(vals), dist, method="PWM").data)
        want = np.array(list(par.values()))
        np.testing.assert_allclose(p, want, rtol=0.2, atol=0.3)


class TestParametric:
    def test_parametric_quantile_roundtrip(self):
        rng = np.random.default_rng(3)
        vals = rng.gumbel(2, 1.5, 3000)
        p = stats.fit(_series(vals), "gumbel_r", method="ML")
        q = np.asarray(stats.parametric_quantile(p, [0.1, 0.5, 0.9]).data)
        pw = np.asarray(p.data)
        want = sps.gumbel_r.ppf([0.1, 0.5, 0.9], *pw)
        np.testing.assert_allclose(np.ravel(q), want, rtol=1e-4)

    def test_parametric_cdf_pdf_vs_scipy(self):
        rng = np.random.default_rng(4)
        vals = rng.normal(5, 2, 1000)
        p = stats.fit(_series(vals), "norm", method="ML")
        pw = np.asarray(p.data)
        x = [3.0, 5.0, 8.0]
        cdf = np.asarray(stats.parametric_cdf(p, x).data)
        np.testing.assert_allclose(np.ravel(cdf), sps.norm.cdf(x, *pw),
                                   rtol=1e-4)
