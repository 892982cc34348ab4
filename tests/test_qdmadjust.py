"""Fused QDM-adjust kernel: interpret-mode parity with the XLA rank+interp
path (reference semantics: xsdba.QuantileDeltaMapping.adjust, Cannon 2015 —
xclim re-exports xsdba as xclim.sdba, xclim:src/xclim/sdba.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from xclim_tpu.ops.pallas.qdmadjust import qdm_adjust_doy, rank_weight_matrix
from xclim_tpu.sdba.utils import (
    equally_spaced_nodes,
    grouped_rank,
    interp_hat_nodes,
)


def _reference(xd, af, q, kind):
    gj = jnp.asarray(xd)
    nv = jnp.sum(~jnp.isnan(gj), axis=1).astype(jnp.int32)
    af_v = interp_hat_nodes(grouped_rank(gj, nv), jnp.asarray(q),
                            jnp.asarray(af))
    exp = np.asarray(gj + af_v if kind == "+" else gj * af_v)
    return np.where(np.isnan(xd), np.nan, exp)


def _close(got, exp):
    assert (np.isnan(got) == np.isnan(exp)).all(), "NaN patterns differ"
    m = ~np.isnan(exp)
    np.testing.assert_allclose(got[m], exp[m], rtol=2e-5, atol=2e-5)


class TestKernelParity:
    @pytest.mark.parametrize("kind", ["+", "*"])
    @pytest.mark.parametrize(
        "G,Y,C,nanfrac",
        [(7, 30, 140, 0.0),    # fast path everywhere
         (7, 30, 140, 0.2),    # general path
         (5, 13, 40, 0.5),     # odd year count, heavy NaN
         (3, 64, 260, 0.1)],   # Y at the kernel cap
    )
    def test_matches_xla(self, kind, G, Y, C, nanfrac):
        rng = np.random.default_rng(G * C + Y)
        q = np.asarray(equally_spaced_nodes(20), np.float32)
        xd = rng.normal(5, 3, (G, Y, C)).astype(np.float32)
        xd[rng.random(xd.shape) < nanfrac] = np.nan
        af = np.sort(rng.normal(0, 2, (G, len(q), C)).astype(np.float32),
                     axis=1)
        got = np.asarray(qdm_adjust_doy(xd, af, q, kind=kind, interpret=True))
        _close(got, _reference(xd, af, q, kind))

    def test_ties_all_nan_lane_single_valid(self):
        rng = np.random.default_rng(2)
        q = np.asarray(equally_spaced_nodes(50), np.float32)
        xd = rng.normal(0, 1, (4, 30, 140)).astype(np.float32)
        xd[1, :, 7] = xd[1, 0, 7]          # full tie run
        xd[:, :, 3] = np.nan               # all-NaN lane
        xd[2, 1:, 9] = np.nan              # single valid sample
        af = np.sort(rng.normal(0, 2, (4, len(q), 140)).astype(np.float32),
                     axis=1)
        got = np.asarray(qdm_adjust_doy(xd, af, q, kind="+", interpret=True))
        _close(got, _reference(xd, af, q, "+"))

    def test_year_cap_raises(self):
        with pytest.raises(ValueError, match="year slots"):
            qdm_adjust_doy(np.zeros((2, 65, 8), np.float32),
                           np.zeros((2, 3, 8), np.float32),
                           [0.1, 0.5, 0.9], interpret=True)


class TestRankWeightMatrix:
    def test_rows_reproduce_hat_interp(self):
        """W @ af == interp_hat_nodes at tau=(r+1)/Y for full-valid lanes."""
        rng = np.random.default_rng(0)
        q = np.asarray(equally_spaced_nodes(20), np.float32)
        Y = 30
        W = rank_weight_matrix(Y, q)
        np.testing.assert_allclose(W.sum(axis=1), 1.0, rtol=1e-6)
        af = np.sort(rng.normal(0, 1, (1, len(q), 5)).astype(np.float32),
                     axis=1)
        got = np.einsum("rk,gkc->grc", W, af)
        tau = ((np.arange(Y, dtype=np.float32) + 1) / np.float32(Y))
        tau = np.broadcast_to(tau[None, :, None], (1, Y, 5)).copy()
        exp = np.asarray(interp_hat_nodes(jnp.asarray(tau), jnp.asarray(q),
                                          jnp.asarray(af)))
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


class TestQdmDispatchEquivalence:
    def test_core_doy_matches_core(self):
        """The new jitted core equals _qdm_adjust_core on a real grouper
        table (kernel in interpret mode via monkeypatched call)."""
        from xclim_tpu.core.calendar import date_range
        from xclim_tpu.sdba import Grouper
        from xclim_tpu.sdba.adjustment import _qdm_adjust_core

        rng = np.random.default_rng(1)
        t = date_range("2001-01-01", periods=4 * 365, freq="D",
                       calendar="noleap")
        g = Grouper("time.dayofyear", 31)
        table, gid, flat_pos = g.device_adjust_table(t)
        xf = jnp.asarray(rng.normal(280, 6, (4 * 365, 6)).astype(np.float32))
        q = np.asarray(equally_spaced_nodes(10), np.float32)
        af = jnp.asarray(np.sort(
            rng.normal(0, 2, (365, len(q), 6)).astype(np.float32), axis=1))

        exp = np.asarray(_qdm_adjust_core(
            xf, table, flat_pos, af, jnp.asarray(q), kind="+",
            interp="linear", extrapolation="constant"))

        # run the doy core with the kernel in interpret mode
        from xclim_tpu.ops.pallas.qdmadjust import qdm_adjust_doy
        from xclim_tpu.sdba.utils import gather_groups

        xd = gather_groups(xf, table)
        out_d = qdm_adjust_doy(xd, af, q, kind="+", interpret=True)
        flat = out_d.reshape((-1,) + out_d.shape[2:])
        got = np.asarray(flat[flat_pos])
        _close(got, exp)
