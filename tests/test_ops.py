"""Kernel substrate tests: segment reductions, quantile, run-length scans."""

import jax.numpy as jnp
import numpy as np
import pytest

from xclim_tpu.core.calendar import date_range, resample_segments
from xclim_tpu.ops.quantile import nan_percentile, nan_quantile
from xclim_tpu.ops import runlength as rl
from xclim_tpu.ops.segments import (
    rolling_reduce,
    segment_argminmax,
    segment_reduce,
)


@pytest.fixture
def monthly_spec():
    t = date_range("2000-01-01", periods=366, freq="D")
    return t, resample_segments(t, "MS")


class TestSegmentReduce:
    def test_sum_mean(self, monthly_spec):
        t, spec = monthly_spec
        x = jnp.ones(366)
        np.testing.assert_allclose(segment_reduce(x, spec, "sum"),
                                   [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])
        np.testing.assert_allclose(segment_reduce(x, spec, "mean"), np.ones(12))

    def test_max_min(self, monthly_spec):
        t, spec = monthly_spec
        x = jnp.arange(366.0)
        np.testing.assert_allclose(np.asarray(segment_reduce(x, spec, "min"))[:2], [0, 31])
        np.testing.assert_allclose(np.asarray(segment_reduce(x, spec, "max"))[-1], 365)

    def test_nan_skipping(self, monthly_spec):
        t, spec = monthly_spec
        x = jnp.ones(366).at[0:31].set(jnp.nan).at[31].set(jnp.nan)
        out = np.asarray(segment_reduce(x, spec, "mean"))
        assert np.isnan(out[0])  # all-NaN January
        assert out[1] == 1.0  # Feb mean skips single NaN
        cnt = np.asarray(segment_reduce(x, spec, "count"))
        assert cnt[0] == 0 and cnt[1] == 28

    def test_2d(self, monthly_spec):
        t, spec = monthly_spec
        x = jnp.stack([jnp.ones(366), jnp.arange(366.0)], axis=1)  # (T, 2)
        out = np.asarray(segment_reduce(x, spec, "sum", axis=0))
        assert out.shape == (12, 2)
        np.testing.assert_allclose(out[0, 0], 31)

    def test_time_axis_last(self, monthly_spec):
        t, spec = monthly_spec
        x = jnp.broadcast_to(jnp.arange(366.0), (3, 366))
        out = np.asarray(segment_reduce(x, spec, "max", axis=1))
        assert out.shape == (3, 12)

    def test_argmax(self, monthly_spec):
        t, spec = monthly_spec
        x = jnp.zeros(366).at[40].set(5.0)  # Feb 10
        idx, has = segment_argminmax(x, spec, "max")
        assert np.asarray(idx)[1] == 40
        assert np.asarray(has).all()


class TestRolling:
    def test_sum(self):
        x = jnp.arange(10.0)
        out = np.asarray(rolling_reduce(x, 3, "sum"))
        assert np.isnan(out[0]) and np.isnan(out[1])
        np.testing.assert_allclose(out[2:], [3, 6, 9, 12, 15, 18, 21, 24])

    def test_min_periods(self):
        x = jnp.arange(5.0)
        out = np.asarray(rolling_reduce(x, 3, "sum", min_periods=1))
        np.testing.assert_allclose(out, [0, 1, 3, 6, 9])

    def test_center_max(self):
        x = jnp.array([0, 5, 0, 0, 7.0])
        out = np.asarray(rolling_reduce(x, 3, "max", center=True, min_periods=1))
        np.testing.assert_allclose(out, [5, 5, 5, 7, 7])

    def test_nan(self):
        x = jnp.array([1.0, jnp.nan, 2.0, 3.0])
        out = np.asarray(rolling_reduce(x, 2, "sum", min_periods=1))
        np.testing.assert_allclose(out, [1, 1, 2, 5])


class TestQuantile:
    def test_vs_numpy_linear(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(5, 101)).astype(np.float32)
        q = np.array([0.1, 0.5, 0.9], dtype=np.float32)
        ours = np.asarray(nan_quantile(jnp.asarray(x), q, axis=1))
        ref = np.quantile(x, q, axis=1)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_with_nans(self):
        x = np.array([[1.0, np.nan, 3.0, 2.0, np.nan]], dtype=np.float32)
        out = np.asarray(nan_quantile(jnp.asarray(x), np.array([0.5]), axis=1))
        assert out[0, 0] == 2.0

    def test_single_valid(self):
        x = np.array([[np.nan, 7.0, np.nan]], dtype=np.float32)
        out = np.asarray(nan_quantile(jnp.asarray(x), np.array([0.1, 0.9]), axis=1))
        np.testing.assert_allclose(out[:, 0], [7.0, 7.0])

    def test_all_nan(self):
        x = np.full((1, 4), np.nan, dtype=np.float32)
        out = np.asarray(nan_quantile(jnp.asarray(x), np.array([0.5]), axis=1))
        assert np.isnan(out).all()

    def test_type8(self):
        # alpha=beta=1/3 (H&F type 8, used by percentile_doy)
        x = np.arange(1.0, 11.0, dtype=np.float32)[None]
        out = np.asarray(nan_quantile(jnp.asarray(x), np.array([0.25]),
                                      axis=1, alpha=1 / 3, beta=1 / 3))
        # R: quantile(1:10, .25, type=8) = 2.9166667
        np.testing.assert_allclose(out[0, 0], 2.9166667, rtol=1e-5)

    def test_percentile_axis_order(self):
        x = np.random.rand(4, 20).astype(np.float32)
        out = np.asarray(nan_percentile(jnp.asarray(x), [10, 90], axis=1))
        assert out.shape == (4, 2)


class TestRunLength:
    def test_cumsum_reset(self):
        x = jnp.array([1, 0, 0, 1, 1, 0, 1, 1, 1], dtype=jnp.float32)
        out = np.asarray(rl.cumsum_reset(x))
        np.testing.assert_allclose(out, [1, 0, 0, 1, 2, 0, 1, 2, 3])
        outf = np.asarray(rl.cumsum_reset(x, index="first"))
        np.testing.assert_allclose(outf, [1, 0, 0, 2, 1, 0, 3, 2, 1])

    def test_rle(self):
        x = jnp.array([1, 1, 1, 0, 1, 1, 0, 0, 1], dtype=bool)
        out = np.asarray(rl.rle(x))
        np.testing.assert_allclose(out, [3, np.nan, np.nan, 0, 2, np.nan, 0, 0, 1])

    def test_longest_run(self):
        x = jnp.array([1, 1, 0, 1, 1, 1, 0, 1], dtype=bool)
        assert np.asarray(rl.longest_run(x)) == 3.0
        assert np.asarray(rl.longest_run(jnp.zeros(5, dtype=bool))) == 0.0

    def test_windowed_run_count(self):
        x = jnp.array([1, 1, 0, 1, 1, 1, 0, 1], dtype=bool)
        assert np.asarray(rl.windowed_run_count(x, 2)) == 5.0
        assert np.asarray(rl.windowed_run_count(x, 3)) == 3.0
        assert np.asarray(rl.windowed_run_count(x, 1)) == 6.0

    def test_windowed_run_events(self):
        x = jnp.array([1, 1, 0, 1, 1, 1, 0, 1], dtype=bool)
        assert np.asarray(rl.windowed_run_events(x, 1)) == 3.0
        assert np.asarray(rl.windowed_run_events(x, 2)) == 2.0
        assert np.asarray(rl.windowed_run_events(x, 3)) == 1.0

    def test_first_last_run(self):
        x = jnp.array([0, 1, 1, 0, 1, 1, 1, 0], dtype=bool)
        assert np.asarray(rl.first_run(x, 2)) == 1.0
        assert np.asarray(rl.first_run(x, 3)) == 4.0
        assert np.asarray(rl.last_run(x, 2)) == 6.0
        assert np.isnan(np.asarray(rl.first_run(x, 4)))

    def test_with_freq(self):
        t = date_range("2000-01-01", periods=60, freq="D")
        spec = resample_segments(t, "MS")
        x = np.zeros(60, dtype=bool)
        x[5:10] = True   # 5-day run in Jan
        x[29:35] = True  # 6-day run crossing Jan→Feb, starts in Jan
        x[40:42] = True  # 2-day run in Feb
        # default resample-before-rl: the Jan→Feb run is split at the boundary
        out = np.asarray(rl.windowed_run_count(jnp.asarray(x), 3, spec=spec))
        np.testing.assert_allclose(out, [5, 4])
        lr = np.asarray(rl.longest_run(jnp.asarray(x), spec=spec))
        np.testing.assert_allclose(lr, [5, 4])
        # resample-after-rl: whole run attributed to the period of its first day
        out2 = np.asarray(rl.windowed_run_count(jnp.asarray(x), 3, spec=spec,
                                                resample_before_rl=False))
        np.testing.assert_allclose(out2, [11, 0])
        ev2 = np.asarray(rl.windowed_run_events(jnp.asarray(x), 2, spec=spec,
                                                resample_before_rl=False))
        np.testing.assert_allclose(ev2, [2, 1])
        lr2 = np.asarray(rl.longest_run(jnp.asarray(x), spec=spec,
                                        resample_before_rl=False))
        np.testing.assert_allclose(lr2, [6, 2])

    def test_windowed_max_run_sum(self):
        x = jnp.array([0, 2.0, 3.0, 0, 5.0, 0], dtype=jnp.float32)
        assert np.asarray(rl.windowed_max_run_sum(x, 1)) == 5.0
        assert np.asarray(rl.windowed_max_run_sum(x, 2)) == 5.0

    def test_2d(self):
        x = jnp.stack([jnp.array([1, 1, 1, 0, 0]), jnp.array([0, 1, 0, 1, 1])], axis=1).astype(bool)
        out = np.asarray(rl.longest_run(x))
        np.testing.assert_allclose(out, [3, 2])


class TestMergeRankBootstrapKernel:
    """merge_rank_replaced_year_quantile must be bit-identical to the full
    re-sort ground truth (the reference's per-pair percentile_doy recompute,
    xclim:core/bootstrapping.py:195-201) across NaN patterns, ties and
    quantile regimes."""

    @pytest.mark.parametrize("q", [0.9, 0.1, 0.5])
    @pytest.mark.parametrize("mode", ["plain", "nans", "ties", "dead_lane"])
    def test_vs_full_resort(self, q, mode):
        from xclim_tpu.ops.bootstrap import (
            merge_rank_replaced_year_quantile,
            topk_capacity,
            topk_rank_tables,
        )
        from xclim_tpu.ops.quantile import nan_quantile

        rng = np.random.default_rng(hash((q, mode)) % 2**32)
        Y, w, C = 6, 5, 48
        N = Y * w
        D = rng.normal(0, 1, (Y, w, C)).astype(np.float32)
        if mode == "nans":
            D[rng.random((Y, w, C)) < 0.2] = np.nan
        elif mode == "ties":
            D = np.round(D * 2) / 2
        elif mode == "dead_lane":
            D[:, :, 0] = np.nan
        flat = D.reshape(N, C)
        year_id = np.arange(Y).repeat(w)
        K = topk_capacity(N, w, q)
        tabs = topk_rank_tables(jnp.asarray(flat), year_id, K)
        Dt = jnp.asarray(D).transpose(2, 0, 1)
        for b in range(Y):
            for o in range(Y):
                if o == b:
                    continue
                got = np.asarray(merge_rank_replaced_year_quantile(
                    *tabs, Dt[:, b, :], Dt[:, o, :], b, q))
                Dmod = D.copy()
                Dmod[b] = D[o]
                want = np.asarray(nan_quantile(
                    jnp.asarray(Dmod.reshape(N, C)), jnp.asarray([q]),
                    axis=0, alpha=1 / 3, beta=1 / 3)[0])
                np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
                ok = ~np.isnan(want)
                # the two kernels interpolate as v0+g(v1-v0) vs the one-hot
                # (1-g)v0+g·v1 — identical to a couple float32 ulps,
                # not to the last one
                np.testing.assert_allclose(got[ok], want[ok], rtol=2e-6,
                                           atol=1e-5)
