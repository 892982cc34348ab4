"""Small-axis quantile kernel: interpret-mode parity with the XLA path.

The Pallas kernel (ops/pallas/axisquantile.py) serves short reduce axes —
ensemble realizations (xclim:src/xclim/ensembles/_base.py:214-376) and
per-group year samples (xclim:src/xclim/core/utils.py:279 calc_perc) — where
XLA's variadic sort is lane-starved on the TPU backend. These tests pin the
kernel (interpret mode, CPU) against ``nan_quantile``'s XLA path across
shapes, Hyndman-Fan parameterizations and NaN densities, plus the dispatch
rules of the public ``nan_quantile`` wrapper.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from xclim_tpu.ops.pallas.axisquantile import MAX_AXIS, axis_quantile_small
from xclim_tpu.ops.quantile import nan_quantile

Q = np.array([0.0, 0.01, 0.1, 0.5, 0.9, 0.99, 1.0])


def _close(a, b, rtol=1e-5, atol=1e-5):
    a, b = np.asarray(a), np.asarray(b)
    assert (np.isnan(a) == np.isnan(b)).all(), "NaN patterns differ"
    m = ~np.isnan(a)
    np.testing.assert_allclose(a[m], b[m], rtol=rtol, atol=atol)


class TestKernelParity:
    @pytest.mark.parametrize(
        "M,C,nanfrac,ab",
        [(30, 600, 0.0, (1.0, 1.0)),     # ensemble realizations, linear H-F
         (30, 600, 0.3, (1.0, 1.0)),     # NaN-ful
         (13, 130, 0.2, (1 / 3, 1 / 3)), # odd axis, median-unbiased
         (64, 512, 0.1, (1.0, 1.0)),     # MAX_AXIS exactly
         (2, 520, 0.5, (0.0, 0.0)),      # minimal axis, type-4-style
         (9, 1025, 0.15, (1.0, 1.0))],   # C % lanes != 0
    )
    def test_matches_xla(self, M, C, nanfrac, ab):
        rng = np.random.default_rng(M * C)
        x = rng.normal(8, 4, (M, C)).astype(np.float32)
        x[rng.random(x.shape) < nanfrac] = np.nan
        got = axis_quantile_small(x, Q, alpha=ab[0], beta=ab[1],
                                  interpret=True)
        exp = nan_quantile(jnp.asarray(x), jnp.asarray(Q, jnp.float32),
                           axis=0, alpha=ab[0], beta=ab[1], _no_pallas=True)
        _close(got, exp)

    def test_all_nan_and_single_valid_lanes(self):
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (24, 520)).astype(np.float32)
        x[:, 3] = np.nan            # all-NaN lane -> NaN outputs
        x[1:, 7] = np.nan           # single-valid lane -> that value
        got = np.asarray(axis_quantile_small(x, Q, interpret=True))
        assert np.isnan(got[:, 3]).all()
        np.testing.assert_allclose(got[:, 7], np.full(len(Q), x[0, 7]),
                                   rtol=1e-6)
        exp = nan_quantile(jnp.asarray(x), jnp.asarray(Q, jnp.float32),
                           axis=0, _no_pallas=True)
        _close(got, exp)

    def test_ties_and_sorted_input(self):
        x = np.tile(np.arange(16, dtype=np.float32)[:, None], (1, 512))
        x[5:9] = 5.0  # tie run
        got = axis_quantile_small(x, Q, interpret=True)
        exp = nan_quantile(jnp.asarray(x), jnp.asarray(Q, jnp.float32),
                           axis=0, _no_pallas=True)
        _close(got, exp)

    def test_axis_too_long_raises(self):
        with pytest.raises(ValueError, match="axis too long"):
            axis_quantile_small(np.zeros((MAX_AXIS + 1, 8), np.float32),
                                Q, interpret=True)


class TestDispatchRules:
    """nan_quantile only reroutes short axes with big enough lane counts and
    a concrete q; everything else keeps the XLA sort path bit-exactly."""

    def test_small_rest_stays_xla(self):
        # rest < 2048 -> dispatch returns None -> identical objects
        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, (30, 40)).astype(np.float32)
        a = nan_quantile(jnp.asarray(x), jnp.asarray(Q, jnp.float32), axis=0)
        b = nan_quantile(jnp.asarray(x), jnp.asarray(Q, jnp.float32), axis=0,
                         _no_pallas=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_long_axis_stays_xla(self):
        rng = np.random.default_rng(2)
        x = rng.normal(0, 1, (100, 3000)).astype(np.float32)
        a = nan_quantile(jnp.asarray(x), jnp.asarray([0.5], jnp.float32),
                         axis=0)
        b = nan_quantile(jnp.asarray(x), jnp.asarray([0.5], jnp.float32),
                         axis=0, _no_pallas=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_nonfloat32_stays_xla(self):
        x = jnp.arange(30 * 2100, dtype=jnp.float64 if False else jnp.int32)
        # int input: wrapper must not attempt the f32-only kernel
        out = nan_quantile(x.reshape(30, 2100).astype(jnp.bfloat16),
                           jnp.asarray([0.5], jnp.float32), axis=0)
        assert out.shape == (1, 2100)


class TestInterpHatNodes:
    """The bracketed-linear rewrite against a numpy per-lane np.interp."""

    @pytest.mark.parametrize("eps", [1e-4, None])
    def test_matches_np_interp(self, eps):
        from xclim_tpu.sdba.utils import equally_spaced_nodes, interp_hat_nodes

        q = np.asarray(equally_spaced_nodes(15, eps), np.float32)
        rng = np.random.default_rng(3)
        G, ms, nq, C = 5, 11, len(q), 7
        tau = rng.uniform(-0.1, 1.1, (G, ms, C)).astype(np.float32)
        tau[rng.random(tau.shape) < 0.1] = np.nan
        yq = np.sort(rng.normal(0, 2, (G, nq, C)).astype(np.float32), axis=1)
        got = np.asarray(interp_hat_nodes(jnp.asarray(tau), q,
                                          jnp.asarray(yq)))
        for g in range(G):
            for c in range(C):
                exp = np.interp(np.clip(tau[g, :, c], q[0], q[-1]), q,
                                yq[g, :, c])
                mask = ~np.isnan(tau[g, :, c])
                np.testing.assert_allclose(got[g, :, c][mask],
                                           exp[mask], rtol=1e-5, atol=1e-5)
                assert np.isnan(got[g, :, c][~mask]).all()


class TestNetworkQuantile:
    """Sorting-network short-axis path (ops/quantile.py
    small_axis_nan_quantile_network) — exact parity with the XLA kernel."""

    @pytest.mark.parametrize("M", [2, 3, 13, 30, 32, 64])
    @pytest.mark.parametrize("ab", [(1.0, 1.0), (1 / 3, 1 / 3)])
    def test_matches_xla(self, M, ab):
        from xclim_tpu.ops.quantile import (
            nan_quantile,
            small_axis_nan_quantile_network,
        )

        rng = np.random.default_rng(M)
        x = rng.normal(0, 5, (M, 300)).astype(np.float32)
        x[rng.random((M, 300)) < 0.25] = np.nan
        x[:, 0] = np.nan
        q = np.array([0.1, 0.5, 0.9], np.float32)
        got = np.asarray(small_axis_nan_quantile_network(
            jnp.asarray(x), q, 0, *ab))
        want = np.asarray(nan_quantile(jnp.asarray(x), jnp.asarray(q), axis=0,
                                       alpha=ab[0], beta=ab[1],
                                       _no_pallas=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   equal_nan=True)

    def test_dispatch_serves_short_axes(self):
        """nan_quantile routes short axes through the network path when the
        Pallas kernel is unavailable (CPU)."""
        from xclim_tpu.ops import quantile as qmod

        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (30, 5000)).astype(np.float32)
        q = np.array([0.5], np.float32)
        via_dispatch = np.asarray(qmod.nan_quantile(jnp.asarray(x), q, axis=0))
        direct = np.asarray(qmod.small_axis_nan_quantile_network(
            jnp.asarray(x), q, 0, 1.0, 1.0))
        np.testing.assert_allclose(via_dispatch, direct, rtol=1e-6)
