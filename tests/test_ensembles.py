"""Ensemble tools tests (reference: xclim tests/test_ensembles.py)."""

import numpy as np
import pytest
from scipy import stats as spstats

from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.ensembles import (
    create_ensemble,
    ensemble_mean_std_max_min,
    ensemble_percentiles,
    fractional_uncertainty,
    hawkins_sutton,
    kkz_reduce_ensemble,
    kmeans_reduce_ensemble,
    make_criteria,
    robustness_categories,
    robustness_coefficient,
    robustness_fractions,
)
from xclim_tpu.testing.helpers import test_timeseries


def _members(n=5, nt=100, seed=0, offset=0.0):
    rng = np.random.default_rng(seed)
    return [test_timeseries(rng.normal(280 + offset, 3, nt).astype(np.float32), "tas",
                            start="2000-01-01") for _ in range(n)]


class TestCreateEnsemble:
    def test_basic(self):
        ens = create_ensemble(_members(4))
        assert ens.dims == ("realization", "time")
        assert ens.shape == (4, 100)

    def test_mixed_calendars(self):
        a = test_timeseries(np.zeros(365), "tas", start="2000-01-01",
                            calendar="standard")
        b = test_timeseries(np.zeros(365), "tas", start="2000-01-01",
                            calendar="noleap")
        ens = create_ensemble([a, b])
        # intersection: noleap lacks Feb 29, the standard member ends Dec 30
        assert ens.shape[1] == 364


class TestStats:
    def test_mean_std(self):
        ens = create_ensemble(_members(10))
        from xclim_tpu.core.dataarray import ClimDataset

        out = ensemble_mean_std_max_min(ClimDataset({"tas": ens}))
        assert "tas_mean" in out and "tas_stdev" in out
        v = np.asarray(out["tas_mean"].values)
        assert v.shape == (100,)

    def test_percentiles(self):
        ens = create_ensemble(_members(30))
        out = ensemble_percentiles(ens, values=[10, 50, 90], split=False)
        assert out.dims[0] == "percentiles"
        v = np.asarray(out.values)
        assert (v[0] <= v[1]).all() and (v[1] <= v[2]).all()
        # median close to numpy
        ref = np.quantile(np.stack([np.asarray(m.values) for m in _members(30)]),
                          0.5, axis=0)
        np.testing.assert_allclose(v[1], ref, atol=1e-4)

    def test_percentiles_weighted(self):
        ens = create_ensemble(_members(4))
        w = np.array([1.0, 1, 1, 100.0])
        out = ensemble_percentiles(ens, values=[50], weights=w, split=False)
        # heavily-weighted member dominates the median
        heavy = np.asarray(ens.values)[3]
        np.testing.assert_allclose(np.asarray(out.values)[0], heavy, atol=1.0)

    def test_percentiles_nan(self):
        ms = _members(5)
        vals = np.asarray(ms[0].values).copy()
        vals[:] = np.nan
        import jax.numpy as jnp

        ms[0] = ms[0].copy(data=jnp.asarray(vals))
        ens = create_ensemble(ms)
        out = ensemble_percentiles(ens, values=[50], split=False)
        assert not np.isnan(np.asarray(out.values)).any()


class TestRobustness:
    def _fut_ref(self, shift=2.0, n=20, nt=30):
        rng = np.random.default_rng(1)
        base = rng.normal(280, 1, (n, nt)).astype(np.float32)
        member_offsets = rng.normal(0, 0.3, (n, 1)).astype(np.float32) if shift else 0.0
        fut = rng.normal(280, 1, (n, nt)).astype(np.float32) + shift + member_offsets
        t_ref = test_timeseries(np.zeros(nt), "tas", start="2000-01-01", freq="YS").time
        t_fut = test_timeseries(np.zeros(nt), "tas", start="2050-01-01", freq="YS").time
        import jax.numpy as jnp

        ref = ClimArray(jnp.asarray(base), ("realization", "time"),
                        {"time": t_ref, "realization": np.arange(n)}, {"units": "K"})
        futx = ClimArray(jnp.asarray(fut), ("realization", "time"),
                         {"time": t_fut, "realization": np.arange(n)}, {"units": "K"})
        return futx, ref

    def test_no_test(self):
        fut, ref = self._fut_ref(shift=2.0)
        out = robustness_fractions(fut, ref)
        np.testing.assert_allclose(out["changed"].values, 1.0)
        np.testing.assert_allclose(out["positive"].values, 1.0)
        np.testing.assert_allclose(out["valid"].values, 1.0)

    @pytest.mark.parametrize("test", ["ttest", "welch-ttest", "mannwhitney-utest"])
    def test_significant_shift(self, test):
        fut, ref = self._fut_ref(shift=3.0)
        out = robustness_fractions(fut, ref, test=test)
        assert float(out["changed"].values) > 0.9

    @pytest.mark.parametrize("test", ["ttest", "welch-ttest"])
    def test_no_shift(self, test):
        fut, ref = self._fut_ref(shift=0.0)
        out = robustness_fractions(fut, ref, test=test)
        assert float(out["changed"].values) < 0.3

    def test_ttest_pvals_vs_scipy(self):
        fut, ref = self._fut_ref(shift=0.5, n=6)
        out = robustness_fractions(fut, ref, test="ttest")
        pv = np.asarray(out["pvals"].values)
        f = np.asarray(fut.values)
        r = np.asarray(ref.values)
        ref_mean = r.mean(axis=1)
        expected = spstats.ttest_1samp(f, ref_mean[:, None], axis=1)[1]
        # float32 betainc vs scipy float64
        np.testing.assert_allclose(pv, expected, rtol=5e-3)

    def test_threshold(self):
        fut, ref = self._fut_ref(shift=2.0)
        out = robustness_fractions(fut, ref, test="threshold", abs_thresh=1.0)
        np.testing.assert_allclose(out["changed"].values, 1.0)
        out2 = robustness_fractions(fut, ref, test="threshold", abs_thresh=10.0)
        np.testing.assert_allclose(out2["changed"].values, 0.0)

    def test_categories(self):
        fut, ref = self._fut_ref(shift=3.0)
        fr = robustness_fractions(fut, ref, test="ttest")
        cat = robustness_categories(fr)
        assert int(cat.values) == 1  # robust signal

    def test_coefficient(self):
        fut, ref = self._fut_ref(shift=3.0)
        R = robustness_coefficient(fut, ref.isel(realization=0))
        assert np.asarray(R.values).shape == ()


class TestReduce:
    def _crit(self):
        rng = np.random.default_rng(0)
        return rng.normal(0, 1, (12, 6))

    def test_kkz(self):
        ids = kkz_reduce_ensemble(self._crit(), 5)
        assert len(ids) == 5
        assert len(set(ids)) == 5

    def test_kmeans(self):
        ids, labels, _ = kmeans_reduce_ensemble(self._crit(),
                                                method={"n_clusters": 4},
                                                random_state=0)
        assert len(ids) == 4
        assert labels.shape == (12,)

    def test_kmeans_rsq_graph_and_plot(self):
        """make_graph=True fills fig_data; plot_rsqprofile renders it
        (xclim:ensembles/_reduce.py:451)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from xclim_tpu.ensembles import plot_rsqprofile

        for method in ({"rsq_cutoff": 0.75}, {"rsq_optimize": None},
                       {"n_clusters": 4}):
            ids, labels, fig_data = kmeans_reduce_ensemble(
                self._crit(), method=method, make_graph=True, random_state=0)
            assert fig_data["realizations"] == 12
            assert len(fig_data["rsq"]) == 12
            assert fig_data["n_clusters"] == len(ids)
            # R² is a nondecreasing profile reaching 1 at k = n
            rsq = np.asarray(fig_data["rsq"])
            assert rsq[-1] > 0.999
            plot_rsqprofile(fig_data)
            plt.close("all")

    def test_make_criteria(self):
        ens = create_ensemble(_members(5, nt=10))
        crit = make_criteria(ens)
        assert crit.dims == ("realization", "criteria")
        assert crit.shape == (5, 10)


class TestPartitioning:
    def test_hawkins_sutton(self):
        rng = np.random.default_rng(2)
        nt, ns, nm = 60, 3, 4
        t = np.arange(nt)
        trend = np.linspace(0, 3, nt)[:, None, None] * (1 + 0.3 * np.arange(ns))[None, :, None]
        data = 280 + trend + rng.normal(0, 0.5, (nt, ns, nm))
        time = test_timeseries(np.zeros(nt), "tas", start="1971-01-01", freq="YS").time
        import jax.numpy as jnp

        da = ClimArray(jnp.asarray(data.astype(np.float32)),
                       ("time", "scenario", "model"),
                       {"time": time, "scenario": np.array(["a", "b", "c"]),
                        "model": np.arange(nm)}, {"units": "K"})
        g, u = hawkins_sutton(da, baseline=("1971", "2000"))
        assert u.dims == ("uncertainty", "time")
        assert u.shape == (4, nt)
        frac = fractional_uncertainty(u)
        tot = np.asarray(frac.values)[-1]
        np.testing.assert_allclose(tot, 100.0, rtol=1e-5)
        # scenario spread grows with time → scenario uncertainty increases
        scen = np.asarray(u.values)[2]
        assert scen[-1] > scen[5]
