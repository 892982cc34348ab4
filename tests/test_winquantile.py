"""Windowed doy-quantile kernel: XLA path exactness + Pallas interpret parity.

The Pallas merge kernel (ops/pallas/winquantile.py) replaces the round-2
windowed gather+sort in sdba training (reference contract: xsdba grouped
quantiles — xclim:src/xclim/sdba.py shim; docs/sdba.rst:23-56). These tests
pin (a) the XLA reference path against nan_quantile on explicit windowed
gathers, (b) the Pallas kernel (interpret mode) against the XLA path across
window sizes, NaN densities and non-power-of-two shapes, and (c) the
sdba trainers' doy fast path against the plain gather path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xclim_tpu.ops.pallas.winquantile import (
    doy_window_quantiles,
    doy_window_quantiles_xla,
)

Q = np.array([0.001, 0.02, 0.1, 0.39, 0.5, 0.62, 0.9, 0.98, 0.999])


def _close(a, b, rtol=1e-5, atol=1e-5):
    a, b = np.asarray(a), np.asarray(b)
    assert (np.isnan(a) == np.isnan(b)).all(), "NaN patterns differ"
    m = ~np.isnan(a)
    np.testing.assert_allclose(a[m], b[m], rtol=rtol, atol=atol)


class TestXlaPath:
    def test_matches_explicit_window_gather(self):
        rng = np.random.default_rng(7)
        x = rng.normal(5, 2, (30, 4, 9)).astype(np.float32)
        x[rng.random(x.shape) < 0.15] = np.nan
        out = np.asarray(doy_window_quantiles_xla(x, Q, 7))
        from xclim_tpu.ops.quantile import nan_quantile

        for d in [0, 3, 29]:
            rows = (np.arange(d - 3, d + 4)) % 30
            g = x[rows].reshape(-1, 9)
            exp = np.asarray(nan_quantile(
                jnp.asarray(g), jnp.asarray(Q, jnp.float32), axis=0,
                alpha=1.0, beta=1.0))
            _close(out[d], exp, rtol=1e-6, atol=1e-6)

    def test_window_one_is_per_doy(self):
        rng = np.random.default_rng(3)
        x = rng.normal(0, 1, (12, 6, 5)).astype(np.float32)
        from xclim_tpu.ops.quantile import nan_quantile

        out = np.asarray(doy_window_quantiles_xla(x, Q, 1))
        exp = np.moveaxis(np.asarray(nan_quantile(
            jnp.asarray(x), jnp.asarray(Q, jnp.float32), axis=1)), 0, 1)
        _close(out, exp, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
class TestPallasInterpret:
    """Interpret-mode kernel vs the XLA path (bit-near: the engines may
    differ by ~1 ulp of the interpolation weight — XLA constant-folds the
    Hyndman-Fan offset chain differently)."""

    @pytest.mark.parametrize(
        "n_doy,Y,C,W,nanfrac",
        [(73, 6, 130, 11, 0.2),   # NaN-ful, C not a lane multiple
         (40, 8, 16, 5, 0.5),     # heavy NaN -> full-selection fallback
         (37, 6, 40, 1, 0.1),     # window=1: no merge phases
         (60, 3, 40, 31, 0.3)],   # window > typical, tiny Y
    )
    def test_matches_xla(self, n_doy, Y, C, W, nanfrac):
        rng = np.random.default_rng(0)
        x = rng.normal(10, 3, (n_doy, Y, C)).astype(np.float32)
        x[rng.random(x.shape) < nanfrac] = np.nan
        ref = doy_window_quantiles_xla(x, Q, W)
        got = doy_window_quantiles(x, Q, W, interpret=True, db=16)
        _close(got, ref)

    def test_all_nan_lane_and_slice(self):
        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, (20, 4, 8)).astype(np.float32)
        x[:, :, 2] = np.nan        # a fully-missing lane
        x[5, :, :] = np.nan        # a fully-missing doy slice
        ref = doy_window_quantiles_xla(x, Q, 5)
        got = doy_window_quantiles(x, Q, 5, interpret=True, db=8)
        _close(got, ref)


@pytest.mark.slow
class TestSortNetwork:
    """The bitonic presort + merge phases against np.sort (pure jnp)."""

    def test_phases_sort_exactly(self, monkeypatch):
        import xclim_tpu.ops.pallas.winquantile as wq

        monkeypatch.setattr(wq, "_roll", lambda x, s, a: jnp.roll(x, s, a))
        rng = np.random.default_rng(1)
        presort = jax.jit(
            lambda raw: wq._bitonic_phases(
                raw, 1, 16, axis=1,
                flip=(jax.lax.broadcasted_iota(jnp.int32, raw.shape, 0) & 1)
                == 1))
        merge = jax.jit(lambda arr: wq._bitonic_phases(arr, 32, 512))
        raw = rng.normal(0, 1, (34, 32, 4)).astype(np.float32)
        sl = np.asarray(presort(jnp.asarray(raw)))
        for s in range(34):
            exp = np.sort(raw[s], axis=0)
            np.testing.assert_array_equal(sl[s], exp if s % 2 == 0
                                          else exp[::-1])
        for g in (0, 1, 3):  # even and odd window starts
            win = sl[g:g + 31].reshape(31 * 32, 4)
            arr = np.concatenate(
                [win, np.full((32, 4), wq.BIG, np.float32)])
            out = np.asarray(merge(jnp.asarray(arr)))
            np.testing.assert_array_equal(out, np.sort(arr, axis=0))


class TestSdbaDoyPath:
    """The trainers' doy fast path equals the plain windowed-gather path."""

    def test_eqm_qdm_dqm_doy_vs_gather(self):
        from xclim_tpu.core.calendar import date_range
        from xclim_tpu.core.dataarray import ClimArray
        from xclim_tpu.sdba import Grouper
        from xclim_tpu.sdba.adjustment import (
            _dqm_train_core, _dqm_train_core_doy, _qm_train_core,
            _qm_train_core_doy)

        t = date_range("2000-01-01", periods=4 * 365, freq="D",
                       calendar="noleap")
        rng = np.random.default_rng(5)
        mkd = lambda k: jnp.asarray(
            rng.normal(280 + k, 5, (4 * 365, 6)).astype(np.float32))
        xr_, xh = mkd(0), mkd(2)
        g = Grouper("time.dayofyear", 31)
        da = ClimArray(xr_, ("time", "cell"), {"time": t}, {"units": "K"}, "x")
        q = np.array([0.1, 0.5, 0.9])
        af_d, hq_d = _qm_train_core_doy(
            xr_, xh, g.device_doy_table(t), g.device_doy_table(t),
            q_tuple=tuple(q), kind="+", window=31)
        af_g, hq_g = _qm_train_core(
            xr_, xh, g.device_train_table(t), g.device_train_table(t),
            jnp.asarray(q, jnp.float32), kind="+")
        _close(af_d, af_g)
        _close(hq_d, hq_g)
        gid = jnp.asarray(g.group_of_step(t))
        r_d = _dqm_train_core_doy(xr_, xh, g.device_doy_table(t),
                                  g.device_doy_table(t), gid,
                                  q_tuple=tuple(q), kind="+", window=31)
        r_g = _dqm_train_core(xr_, xh, g.device_train_table(t),
                              g.device_train_table(t), gid,
                              jnp.asarray(q, jnp.float32), kind="+")
        # windowed_doy_mean accumulates per-doy partial sums (vs the flat
        # 124-sample gather sum): f32 reassociation moves the group means by
        # ~|x|*n*eps, which shifts the scaled hist quantiles accordingly
        for a, b in zip(r_d, r_g):
            _close(a, b, rtol=2e-4, atol=2e-4)

    def test_grouped_rank_small_vs_sort(self):
        from xclim_tpu.sdba.utils import grouped_rank

        rng = np.random.default_rng(2)
        gdat = rng.normal(0, 1, (7, 30, 5)).astype(np.float32)
        gdat[rng.random(gdat.shape) < 0.2] = np.nan
        gdat[2, :, 1] = gdat[2, 0, 1]  # ties
        gj = jnp.asarray(gdat)
        nv = jnp.sum(~jnp.isnan(gj), axis=1).astype(jnp.int32)
        small = np.asarray(grouped_rank(gj, nv))           # count path
        # force the sort path by tiling beyond the 128 cutoff
        big = jnp.concatenate([gj] + [jnp.full_like(gj, np.nan)] * 4, axis=1)
        ranks_big = np.asarray(grouped_rank(big, nv))[:, :30]
        valid = ~np.isnan(gdat)
        np.testing.assert_allclose(small[valid], ranks_big[valid], rtol=1e-6)
