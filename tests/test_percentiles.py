"""percentile_doy / resample_doy / bootstrap (reference semantics:
xclim:src/xclim/core/calendar.py:396, core/bootstrapping.py,
tests/test_bootstrapping.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xclim_tpu.core.percentiles import percentile_doy, resample_doy
from xclim_tpu.indices import tg90p, tn10p, tx90p, days_over_precip_thresh


class TestPercentileDoy:
    def test_constant_series(self, tas_series):
        tas = tas_series(np.full(365 * 4 + 1, 280.0), start="2000-01-01")
        p = percentile_doy(tas, window=5, per=90)
        assert p.dims == ("dayofyear", "percentiles")
        assert p.shape[0] == 366
        np.testing.assert_allclose(p.values, 280.0, rtol=1e-6)
        assert p.attrs["climatology_bounds"] == ["2000-01-01", "2003-12-31"]
        assert p.attrs["window"] == 5

    def test_seasonal_values(self, tas_series):
        # daily cycle: values equal to doy → p50 for doy d ≈ d
        n = 365 * 4
        doys = np.concatenate([np.arange(1, 366)] * 4).astype(float)
        tas = tas_series(doys + 273.15, start="2001-01-01")
        p = percentile_doy(tas, window=5, per=50)
        vals = np.asarray(p.values)[:, 0] - 273.15
        # away from edges, median of window [d-2, d+2] over years = d
        np.testing.assert_allclose(vals[10:350], np.arange(11, 351), atol=0.5)

    def test_multiple_percentiles(self, tas_series):
        rng = np.random.default_rng(42)
        tas = tas_series(rng.normal(280, 5, 365 * 3).astype(np.float32),
                         start="2001-01-01")
        p = percentile_doy(tas, window=5, per=[10, 50, 90])
        assert p.shape == (365, 3)
        v = np.asarray(p.values)
        assert (v[:, 0] <= v[:, 1]).all() and (v[:, 1] <= v[:, 2]).all()

    def test_resample_doy(self, tas_series):
        tas = tas_series(np.zeros(730), start="2001-01-01")
        p = percentile_doy(tas, window=5, per=50)
        p50 = p.isel(percentiles=0)
        ts = resample_doy(p50, tas)
        assert ts.dims == ("time",)
        assert ts.shape[0] == 730


class TestPercentileIndices:
    def test_tg90p_simple(self, tas_series):
        rng = np.random.default_rng(0)
        tas = tas_series(rng.normal(280, 5, 365 * 4).astype(np.float32),
                         start="2001-01-01")
        p90 = percentile_doy(tas, window=5, per=90).isel(percentiles=0)
        out = tg90p(tas, p90, freq="YS")
        assert out.attrs["units"] == "d"
        # ~10% of days above the 90th percentile
        v = np.asarray(out.values)
        assert 365 * 0.04 < v.mean() < 365 * 0.20

    def test_tn10p(self, tasmin_series):
        rng = np.random.default_rng(1)
        tn = tasmin_series(rng.normal(275, 5, 365 * 4).astype(np.float32),
                           start="2001-01-01")
        p10 = percentile_doy(tn, window=5, per=10).isel(percentiles=0)
        out = tn10p(tn, p10, freq="MS")
        assert len(out.time) == 48


class TestBootstrap:
    @pytest.mark.parametrize("use_func,var,per,expected_higher", [
        ("tx90p", "tasmax", 90, True),
        ("tn10p", "tasmin", 10, True),
    ])
    def test_bootstrap_increases_inbase(self, use_func, var, per, expected_higher,
                                        tasmax_series, tasmin_series):
        """Bootstrapped in-base exceedance counts are >= plain counts on average
        (discontinuity-smoothing property; reference tests/test_bootstrapping.py:43)."""
        rng = np.random.default_rng(7)
        n = 365 * 6
        series = {"tasmax": tasmax_series, "tasmin": tasmin_series}[var]
        da = series(rng.normal(285, 4, n).astype(np.float32), start="2001-01-01")
        p = percentile_doy(da, window=5, per=per).isel(percentiles=0)
        fn = {"tx90p": tx90p, "tn10p": tn10p}[use_func]
        kw = {var: da, f"{var}_per": p}
        plain = fn(**kw, freq="YS", bootstrap=False)
        boot = fn(**kw, freq="YS", bootstrap=True)
        pv = np.asarray(plain.values)
        bv = np.asarray(boot.values)
        assert bv.shape == pv.shape
        # exceedances should increase on average for in-base years
        assert bv.mean() > pv.mean()

    def test_bootstrap_no_clim_bounds_raises(self, tasmax_series):
        from xclim_tpu.core.dataarray import ClimArray
        import jax.numpy as jnp

        da = tasmax_series(np.random.rand(365).astype(np.float32), start="2001-01-01")
        fake_per = ClimArray(jnp.zeros(365), ("dayofyear",),
                             {"dayofyear": np.arange(1, 366)}, {"units": "K"}, "per")
        with pytest.raises(KeyError):
            tx90p(da, fake_per, freq="YS", bootstrap=True)

    def test_bootstrap_out_of_base_unchanged(self, tasmax_series):
        rng = np.random.default_rng(3)
        n = 365 * 8
        da = tasmax_series(rng.normal(285, 4, n).astype(np.float32), start="2001-01-01")
        # climatology on first 4 years only
        clim = da.sel_time(mask=da.time.year <= 2004)
        p = percentile_doy(clim, window=5, per=90).isel(percentiles=0)
        plain = tx90p(da, p, freq="YS", bootstrap=False)
        boot = tx90p(da, p, freq="YS", bootstrap=True)
        pv = np.asarray(plain.values)
        bv = np.asarray(boot.values)
        # out-of-base years (2005+) identical
        np.testing.assert_allclose(bv[4:], pv[4:])
        # in-base years changed
        assert not np.allclose(bv[:4], pv[:4])


class TestTopkBootstrapKernel:
    """topk_replaced_year_quantile must equal a full re-sort exactly."""

    @pytest.mark.parametrize("q", [0.9, 0.1, 0.75, 0.25])
    def test_exact_vs_resort(self, q):
        import bench
        from xclim_tpu.ops.bootstrap import (
            topk_capacity,
            topk_rank_tables,
            topk_replaced_year_quantile,
        )
        from xclim_tpu.ops.quantile import nan_quantile

        nyears, window, C = 10, 5, 4
        time_idx, table, _, _ = bench._tables(nyears)
        n_doy = table.shape[0]
        tbl = jnp.asarray(table.reshape(n_doy, nyears, window))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(295, 5, (len(time_idx), C))
                        .astype(np.float32))
        D = jnp.where((tbl >= 0)[..., None], x[jnp.maximum(tbl, 0)], jnp.nan)
        N = nyears * window
        year_id = np.arange(nyears).repeat(window)
        K = topk_capacity(N, window, q)
        tabs = topk_rank_tables(D.reshape(n_doy, N, C), year_id, K)
        Dt = D.transpose(0, 3, 1, 2)
        for b, o in [(0, 1), (4, 7), (9, 2)]:
            per = topk_replaced_year_quantile(*tabs, Dt[:, :, b], Dt[:, :, o],
                                              b, q)
            onehot = (jnp.arange(nyears) == b).reshape(1, nyears, 1, 1)
            Dmod = jnp.where(onehot, D[:, o][:, None], D)
            ref = nan_quantile(Dmod.reshape(n_doy, N, C), jnp.array([q]),
                               axis=1, alpha=1 / 3, beta=1 / 3)[0]
            # v0+g(v1-v0) vs the quantile kernel's (1-g)v0+g*v1: equal
            # to the 1e-6 contract, not to the last ulp
            np.testing.assert_allclose(np.asarray(per), np.asarray(ref),
                                       rtol=1e-6, atol=1e-5)

    def test_bench_kernels_agree(self):
        import bench

        r1, gen, _ = bench.make_tpu_bench(nyears=6, cells=(2, 2),
                                          kernel="topk")
        r2, _, _ = bench.make_tpu_bench(nyears=6, cells=(2, 2), kernel="sort")
        import jax

        x = gen(jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(r1(x)), np.asarray(r2(x)),
                                   rtol=1e-6, atol=1e-5)


class TestBootstrapTopkPath:
    """The tail-percentile top-k path in bootstrap_func must be bit-identical
    to the dense re-sort path, end-to-end through the index call."""

    @pytest.mark.parametrize("index,var,perv", [("tx90p", "tasmax", 90.0),
                                                ("tn10p", "tasmin", 10.0)])
    def test_paths_identical(self, index, var, perv):
        import xclim_tpu.core.bootstrapping as B
        from xclim_tpu.core.percentiles import percentile_doy
        from xclim_tpu import indices
        from xclim_tpu.testing import test_timeseries as ts

        rng = np.random.default_rng(1)
        da = ts(rng.normal(300, 5, 365 * 6).astype(np.float32), var,
                start="2001-01-01", units="K")
        per = percentile_doy(da.sel_time(mask=(da.time.year <= 2004)),
                             per=perv)
        fn = getattr(indices, index)
        kw = {var: da, f"{var}_per": per, "freq": "YS", "bootstrap": True}
        assert B.USE_TOPK_KERNEL
        r_topk = np.asarray(fn(**kw).data)
        B.USE_TOPK_KERNEL = False
        try:
            r_dense = np.asarray(fn(**kw).data)
        finally:
            B.USE_TOPK_KERNEL = True
        np.testing.assert_allclose(r_topk, r_dense, rtol=1e-6, atol=1e-5)


class TestBootstrapVsNumpyReference:
    """End-to-end tx90p-with-bootstrap against an independent pure-numpy
    implementation of the reference algorithm (xclim:core/bootstrapping.py:
    81-212 semantics: per in-base year, replace by each other year, recompute
    the doy-window percentile, recompute the index, average)."""

    def test_within_1e6(self):
        import jax.numpy as jnp

        from xclim_tpu.core.calendar import date_range, percentile_doy_table
        from xclim_tpu.core.dataarray import ClimArray
        from xclim_tpu.core.percentiles import percentile_doy
        from xclim_tpu.indices import tx90p

        nyears, window = 6, 5
        rng = np.random.default_rng(42)
        time = date_range("2001-01-01", end=f"{2000 + nyears}-12-31",
                          freq="D", calendar="noleap")
        T = len(time)
        x = rng.normal(295.0, 5.0, T).astype(np.float32)
        da = ClimArray(jnp.asarray(x), ("time",), {"time": time},
                       {"units": "K"}, "tasmax")

        # --- framework result (all years in-base → all bootstrapped) ---
        per = percentile_doy(da, window=window, per=90.0)
        got = np.asarray(tx90p(tasmax=da, tasmax_per=per, freq="YS",
                               bootstrap=True).data).squeeze()

        # --- independent numpy implementation ---
        table, doys = percentile_doy_table(time, window=window)
        n_doy = len(doys)
        tbl = table.reshape(n_doy, nyears, window)
        D = np.where(tbl >= 0, x[np.maximum(tbl, 0)], np.nan)
        year_of = time.year - time.year[0]
        doy_idx = time.doy - 1
        want = np.zeros(nyears)
        for b in range(nyears):
            counts = []
            for o in range(nyears):
                if o == b:
                    continue
                Dmod = D.copy()
                Dmod[:, b] = D[:, o]
                per_bo = np.nanquantile(Dmod.reshape(n_doy, -1), 0.9,
                                        axis=1, method="median_unbiased")
                thresh = per_bo[doy_idx]
                in_b = year_of == b
                counts.append(((x > thresh) & in_b).sum())
            want[b] = np.mean(counts)

        np.testing.assert_allclose(got, want, atol=1e-4)  # float32 inputs
        # and to much tighter tolerance relative to the count magnitude
        np.testing.assert_allclose(got / 365.0, want / 365.0, atol=1e-6)
