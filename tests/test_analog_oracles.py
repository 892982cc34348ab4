"""Dissimilarity-metric oracles (xclim:tests/test_analog.py, after
flyingpigeon).

The "Matlab sample" expected values come from Patrick Grenier's Matlab code
for "An Assessment of Six Dissimilarity Metrics for Climate Analogs" — the
same external oracle the reference pins.
"""

import numpy as np
import pytest
import scipy.stats as sps
from numpy.testing import assert_almost_equal
from scipy import integrate

import xclim_tpu.analog as xca


def matlab_sample(n=30):
    z = 1.0 * (np.arange(n) + 1) / n - 0.5
    x = np.vstack([z * 2 + 30, z * 3 + 40, z]).T
    y = np.vstack([z * 2.2 + 31, z[::-1] * 2.8 + 38, z * 1.1]).T
    return x, y


def exact_randn(rng, mean, std, shape):
    r = rng.standard_normal(shape)
    r1 = r / r.std(0, ddof=1) * np.array(std)
    return r1 - r1.mean(0) + np.array(mean)


def _val(metric, x, y, **kw):
    return float(np.asarray(getattr(xca, metric)(x, y, **kw)))


class TestSEuclidean:
    def test_simple(self):
        rng = np.random.default_rng(0)
        x = exact_randn(rng, 0, 1, (25, 2))
        y = exact_randn(rng, [1, 2], 1, (30, 2))
        assert_almost_equal(_val("seuclidean", x, y), np.hypot(1, 2), 2)
        y = exact_randn(rng, [1, 2], 2, (30, 2))
        assert_almost_equal(_val("seuclidean", x, y), np.hypot(1, 2), 2)

    def test_compare_with_matlab(self):
        x, y = matlab_sample()
        assert_almost_equal(_val("seuclidean", x, y), 2.8463, 4)


class TestNN:
    def test_simple(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((200, 2))
        y = rng.standard_normal((200, 2))
        assert_almost_equal(_val("nearest_neighbor", x + 0.001, x), 0, 2)
        assert_almost_equal(_val("nearest_neighbor", x, y), 0.5, 1)
        assert_almost_equal(_val("nearest_neighbor", x + 10, y), 1, 2)

    def test_compare_with_matlab(self):
        x, y = matlab_sample()
        assert_almost_equal(_val("nearest_neighbor", x, y), 1, 4)


class TestZAE:
    def test_simple(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((200, 2))
        assert _val("zech_aslan", x + 0.001, x) < 0

    def test_compare_with_matlab(self):
        x, y = matlab_sample()
        assert_almost_equal(_val("zech_aslan", x, y), 0.77802, 4)


class TestFR:
    def test_simple(self):
        # 7 points, 2 same-sample MST edges (xclim:tests/test_analog.py:186)
        x = np.array([[1, 2], [2, 2], [3, 1]], dtype=float)
        y = np.array([[1, 1], [2, 4], [3, 2], [4, 2]], dtype=float)
        assert_almost_equal(_val("friedman_rafsky", x, y), 2.0 / 7, 3)

    def test_compare_with_matlab(self):
        x, y = matlab_sample()
        assert_almost_equal(_val("friedman_rafsky", x, y), 0.96667, 4)


class TestKS:
    def test_1D_vs_scipy(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(50) + 1
        y = rng.standard_normal(50)
        s, _p = sps.ks_2samp(x, y)
        assert_almost_equal(_val("kolmogorov_smirnov", x[:, None],
                                 y[:, None]), s, 3)

    def test_compare_with_matlab(self):
        x, y = matlab_sample()
        assert_almost_equal(_val("kolmogorov_smirnov", x, y), 0.96667, 4)


def analytical_KLDiv(p, q):
    def func(x):
        return p.pdf(x) * np.log(p.pdf(x) / q.pdf(x))

    a = 1e-5
    return integrate.quad(func, max(p.ppf(a), q.ppf(a)),
                          min(p.isf(a), q.isf(a)))[0]


@pytest.mark.slow
class TestKLDIV:
    def test_against_analytic(self):
        rng = np.random.default_rng(4)
        p = sps.norm(2, 1)
        q = sps.norm(2.6, 1.4)
        ra = analytical_KLDiv(p, q)
        N = 10000
        re = _val("kldiv", p.rvs(N, random_state=rng)[:, None],
                  q.rvs(N, random_state=rng)[:, None])
        assert_almost_equal(re, ra, 1)

    def test_mvnormal(self):
        # figure-2 values of the Perez-Cruz kNN estimator paper (the
        # reference uses n=30000; n=8000 keeps the kNN estimate within the
        # 1-decimal tolerance and the pairwise-distance matrix tractable)
        rng = np.random.default_rng(5)
        n = 8000
        p = rng.normal(0, 1, size=(n, 2))
        q = rng.multivariate_normal([0.5, -0.5],
                                    [[0.5, 0.1], [0.1, 0.3]], size=n)
        assert_almost_equal(_val("kldiv", p, q), 1.39, 1)
        assert_almost_equal(_val("kldiv", q, p), 0.62, 1)


def test_szekely_rizzo():
    # the reference checks against the R `energy` package on iris
    from sklearn import datasets

    iris = datasets.load_iris().data
    v80 = float(np.asarray(xca.szekely_rizzo(iris[:80], iris[80:],
                                             standardize=False)))
    np.testing.assert_allclose(v80, 116.1987, atol=5e-4)
    v50 = float(np.asarray(xca.szekely_rizzo(iris[:50], iris[50:],
                                             standardize=False)))
    np.testing.assert_allclose(v50, 199.6205, atol=5e-4)
