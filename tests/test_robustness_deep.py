"""Deeper ensembles-robustness and partitioning tests
(reference behaviors: xclim:src/xclim/ensembles/_robustness.py,
_partitioning.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray, concat


def _ens(nreal, n, mean_shift=0.0, seed=0, start="2000-01-01"):
    rng = np.random.default_rng(seed)
    t = date_range(start, periods=n, freq="D", calendar="noleap")
    members = []
    for i in range(nreal):
        v = (rng.normal(280 + mean_shift, 2, n)).astype(np.float32)
        members.append(ClimArray(jnp.asarray(v), ("time",), {"time": t},
                                 {"units": "K"}, "tas"))
    return concat(members, dim="realization")


class TestRobustnessTests:
    @pytest.mark.parametrize("test", ["ttest", "welch-ttest",
                                      "mannwhitney-utest"])
    def test_significant_change_detected(self, test):
        from xclim_tpu.ensembles import robustness_fractions

        hist = _ens(12, 200, mean_shift=0.0, seed=1)
        fut = _ens(12, 200, mean_shift=3.0, seed=2)  # strong warming
        fr = robustness_fractions(fut, hist, test=test)
        assert float(np.asarray(fr["changed"].data)) > 0.9

    def test_brownforsythe_detects_variance_change(self):
        # Brown-Forsythe tests equality of variances, not means
        from xclim_tpu.ensembles import robustness_fractions

        rng = np.random.default_rng(9)
        t = date_range("2000-01-01", periods=200, freq="D",
                       calendar="noleap")

        def ens(std, seed):
            r = np.random.default_rng(seed)
            return concat([ClimArray(
                jnp.asarray(r.normal(280, std, 200).astype(np.float32)),
                ("time",), {"time": t}, {"units": "K"}, "tas")
                for _ in range(12)], dim="realization")

        fr = robustness_fractions(ens(6.0, 1), ens(2.0, 2),
                                  test="brownforsythe-test")
        assert float(np.asarray(fr["changed"].data)) > 0.9

    @pytest.mark.parametrize("test", ["ttest", "welch-ttest", "mannwhitney-utest",
                                      "brownforsythe-test"])
    def test_no_change_not_detected(self, test):
        from xclim_tpu.ensembles import robustness_fractions

        hist = _ens(12, 200, mean_shift=0.0, seed=3)
        fut = _ens(12, 200, mean_shift=0.0, seed=4)
        fr = robustness_fractions(fut, hist, test=test)
        assert float(np.asarray(fr["changed"].data)) < 0.4

    def test_sign_agreement(self):
        from xclim_tpu.ensembles import robustness_fractions

        hist = _ens(10, 200, 0.0, seed=5)
        fut = _ens(10, 200, 5.0, seed=6)
        fr = robustness_fractions(fut, hist, test="ttest")
        assert float(np.asarray(fr["positive"].data)) > 0.9
        assert float(np.asarray(fr["agree"].data)) > 0.9

    def test_robustness_categories(self):
        from xclim_tpu.ensembles import (robustness_categories,
                                         robustness_fractions)

        hist = _ens(10, 200, 0.0, seed=7)
        fut = _ens(10, 200, 5.0, seed=8)
        fr = robustness_fractions(fut, hist, test="ttest")
        cat = robustness_categories(fr)
        # robust significant change → category 1 ("robust change")
        assert int(np.asarray(cat.data)) == 1


class TestPartitioning:
    def _cube(self):
        # (time=yearly, scenario, model) mean temperature trajectories
        rng = np.random.default_rng(0)
        years = 30
        t = date_range("2000-01-01", periods=years, freq="YS",
                       calendar="noleap")
        scen_trend = np.array([0.02, 0.04, 0.08])  # K/yr per scenario
        data = np.zeros((years, 3, 4), np.float32)
        for s in range(3):
            for m in range(4):
                data[:, s, m] = (280 + m * 0.5
                                 + scen_trend[s] * np.arange(years)
                                 + rng.normal(0, 0.05, years))
        return ClimArray(jnp.asarray(data), ("time", "scenario", "model"),
                         {"time": t, "scenario": np.array(["a", "b", "c"]),
                          "model": np.arange(4)}, {"units": "K"}, "tas")

    def test_hawkins_sutton_components_sum_to_total(self):
        from xclim_tpu.ensembles import hawkins_sutton

        mean, var = hawkins_sutton(self._cube())
        u = list(var.coords["uncertainty"])
        frac = np.asarray(var.data)
        uax = var.dims.index("uncertainty")
        parts = sum(np.take(frac, u.index(k), axis=uax)
                    for k in ("variability", "model", "scenario"))
        total = np.take(frac, u.index("total"), axis=uax)
        np.testing.assert_allclose(parts[-5:], total[-5:], rtol=1e-3)

    def test_scenario_uncertainty_grows(self):
        from xclim_tpu.ensembles import hawkins_sutton

        mean, var = hawkins_sutton(self._cube())
        u = list(var.coords["uncertainty"])
        si = u.index("scenario")
        frac = np.asarray(var.data)
        tax = var.dims.index("time")
        s_frac = np.take(frac, si, axis=var.dims.index("uncertainty"))
        # scenario spread dominates late century vs early
        assert s_frac[-1] > s_frac[2]


class TestReduction:
    def test_kkz_selects_extremes(self):
        from xclim_tpu.ensembles import kkz_reduce_ensemble

        rng = np.random.default_rng(0)
        crit = ClimArray(
            jnp.asarray(rng.normal(0, 1, (20, 3)).astype(np.float32)),
            ("realization", "criteria"),
            {"realization": np.arange(20), "criteria": np.arange(3)},
            {}, "crit")
        sel = kkz_reduce_ensemble(crit, num_select=5)
        assert len(sel) == 5
        assert len(set(sel)) == 5

    def test_kmeans_reduces(self):
        from xclim_tpu.ensembles import kmeans_reduce_ensemble

        rng = np.random.default_rng(1)
        crit = ClimArray(
            jnp.asarray(rng.normal(0, 1, (20, 3)).astype(np.float32)),
            ("realization", "criteria"),
            {"realization": np.arange(20), "criteria": np.arange(3)},
            {}, "crit")
        sel, clusters, fig_data = kmeans_reduce_ensemble(
            crit, method={"n_clusters": 4}, random_state=0, make_graph=False)
        assert len(sel) == 4


class TestRobustnessExactFractions:
    """Exact arithmetic cases from the reference
    (xclim:tests/test_ensembles.py:685-760)."""

    def test_delta_threshold(self):
        from xclim_tpu.core.dataarray import ClimArray
        from xclim_tpu.ensembles import robustness_fractions

        delta = ClimArray(np.array([-2.0, 1, -2, -1, 0, 0]),
                          ("realization",), attrs={"units": "K"}, name="d")
        fr = robustness_fractions(delta, test="threshold", abs_thresh=1.5)
        np.testing.assert_allclose(np.asarray(fr["changed"].data), 2 / 6)
        np.testing.assert_allclose(
            np.asarray(fr["changed_positive"].data), 0.0)
        np.testing.assert_allclose(np.asarray(fr["positive"].data), 1 / 6)
        np.testing.assert_allclose(np.asarray(fr["agree"].data), 3 / 6)

    def test_delta_threshold_weighted(self):
        from xclim_tpu.core.dataarray import ClimArray
        from xclim_tpu.ensembles import robustness_fractions

        delta = ClimArray(np.array([-2.0, 1, -2, -1]), ("realization",),
                          attrs={"units": "K"}, name="d")
        w = np.array([4.0, 3, 2, 1])
        fr = robustness_fractions(delta, test="threshold", abs_thresh=1.5,
                                  weights=w)
        np.testing.assert_allclose(np.asarray(fr["changed"].data), 0.6)
        np.testing.assert_allclose(np.asarray(fr["positive"].data), 0.3)
        np.testing.assert_allclose(np.asarray(fr["agree"].data), 0.7)

    def test_delta_not_strict(self):
        from xclim_tpu.core.dataarray import ClimArray
        from xclim_tpu.ensembles import robustness_fractions

        delta = ClimArray(np.array([-2.0, 1, -2, -1, 2, 0]),
                          ("realization",), attrs={"units": "K"}, name="d")
        fr = robustness_fractions(delta, test=None, strict_sign=False)
        np.testing.assert_allclose(np.asarray(fr["changed"].data), 1)
        np.testing.assert_allclose(np.asarray(fr["positive"].data), 3 / 6)
        np.testing.assert_allclose(np.asarray(fr["agree"].data), 4 / 6)

    def test_all_nan_empty(self):
        from xclim_tpu.core.calendar import date_range
        from xclim_tpu.core.dataarray import ClimArray
        from xclim_tpu.ensembles import robustness_fractions

        t = date_range("1900-01-01", periods=10, freq="D")
        r = np.full((20, 10), np.nan)
        ref = ClimArray(r, ("realization", "time"), {"time": t},
                        {"units": "K"}, "tas")
        fut = ClimArray(r.copy(), ("realization", "time"), {"time": t},
                        {"units": "K"}, "tas")
        fr = robustness_fractions(fut, ref, test="ttest")
        np.testing.assert_allclose(np.asarray(fr["changed"].data), 0)
        np.testing.assert_allclose(np.asarray(fr["valid"].data), 0)


class TestRobustnessCoefficient:
    """xclim:tests/test_ensembles.py:742 — exact fixed-data values."""

    def test_high_and_low(self):
        from xclim_tpu.core.dataarray import ClimArray
        from xclim_tpu.ensembles import robustness_coefficient

        ref = ClimArray(np.array([274, 275, 274.5, 276, 274.3, 273.3]),
                        ("time",), attrs={"units": "K"}, name="tas")
        fut_hi = ClimArray(np.array(
            [[277, 277.1, 278, 278.4, 278.1, 276.9],
             [275, 275.8, 276, 275.2, 276.2, 275.7]]),
            ("realization", "time"), attrs={"units": "K"}, name="tas")
        R = float(np.asarray(robustness_coefficient(fut_hi, ref).data))
        np.testing.assert_almost_equal(R, 0.91972477, decimal=6)

        fut_mid = ClimArray(np.array(
            [[277, 277.1, 278, 278.4, 278.1, 276.9],
             [274, 274.8, 273.7, 274.2, 273.9, 274.5]]),
            ("realization", "time"), attrs={"units": "K"}, name="tas")
        R2 = float(np.asarray(robustness_coefficient(fut_mid, ref).data))
        assert R2 < R
