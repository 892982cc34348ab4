"""Golden tests for the sdba second wave (VERDICT r1 #7): externally-derivable
expected values for OTC/dOTC (closed-form optimal-transport maps), MBCn's
npdf_transform (multivariate Gaussian rotation recovery) and ExtremeValues
(GPD parameter recovery and closed-form extreme mapping).

Contracts match xsdba's train/adjust API (reference: xclim:docs/sdba.rst and
xclim:src/xclim/sdba.py shim); the numerical oracles come from
  * Gaussian→Gaussian 1-D OT:  T(x) = μ_r + (σ_r/σ_h)(x − μ_h)
  * Robin, Vrac & Naveau 2019 (dOTC): scen = OTC(sim → ref ∘ evolution)
  * Cannon 2018 (MBCn): npdf transfer reproduces ref's full covariance
  * GPD threshold stability: over a higher POT level t, shape k is unchanged
    and scale becomes σ − k·(t − u) (Hosking & Wallis parameterization).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.sdba import OTC, ExtremeValues, dOTC
from xclim_tpu.sdba.adjustment import npdf_transform


def _series(values, units="K", name="x", start="2000-01-01"):
    t = date_range(start, periods=len(values), freq="D", calendar="noleap")
    return ClimArray(jnp.asarray(values, dtype=jnp.float32), ("time",),
                     {"time": t}, {"units": units}, name)


def _multivar(M, units=""):
    t = date_range("2000-01-01", periods=M.shape[1], freq="D",
                   calendar="noleap")
    return ClimArray(jnp.asarray(M, dtype=jnp.float32), ("multivar", "time"),
                     {"time": t, "multivar": np.array(["a", "b"])},
                     {"units": units}, "mv")


@pytest.mark.slow
class TestOTCGolden:
    def test_gaussian_affine_map(self):
        """1-D N(0,1)→N(5,2): the unique monotone OT map is T(x) = 5 + 2x."""
        rng = np.random.default_rng(0)
        n = 1500
        hist = rng.normal(0, 1, n)
        ref = rng.normal(5, 2, n)
        out = OTC.adjust(_series(ref), _series(hist), reg=0.01, n_iter=300)
        o = np.asarray(out.values)
        expected = 5 + 2 * hist
        rms = np.sqrt(((o - expected) ** 2).mean())
        assert rms < 0.3, rms
        assert abs(o.mean() - 5) < 0.15
        assert abs(o.std() - 2) < 0.15

    def test_monotone(self):
        """The 1-D OT map is monotone: order of hist is preserved."""
        rng = np.random.default_rng(0)
        hist = rng.normal(0, 1, 1500)
        ref = rng.normal(5, 2, 1500)
        o = np.asarray(OTC.adjust(_series(ref), _series(hist),
                                  reg=0.01, n_iter=300).values)
        idx = np.argsort(hist)
        assert (np.diff(o[idx]) < -0.05).sum() == 0

    def test_two_point_discrete(self):
        """Equal-mass atoms {0,1} → {10,11}: the optimal plan is diagonal,
        so T(0)=10, T(1)=11 (up to entropic smoothing)."""
        h = np.repeat([0.0, 1.0], 400)
        r = np.repeat([10.0, 11.0], 400)
        o = np.asarray(OTC.adjust(_series(r), _series(h),
                                  reg=0.005, n_iter=500).values)
        np.testing.assert_allclose(o[:400].mean(), 10.0, atol=0.2)
        np.testing.assert_allclose(o[400:].mean(), 11.0, atol=0.2)


@pytest.mark.slow
class TestDOTCGolden:
    def test_additive_evolution(self):
        """hist~N(0,1), sim=hist+3, ref~N(5,2): dOTC evolves ref by +3 and
        maps sim onto it → scen ~ N(8,2) (Robin et al. 2019, §2.4)."""
        rng = np.random.default_rng(0)
        n = 1500
        hist = rng.normal(0, 1, n)
        ref = rng.normal(5, 2, n)
        sim = hist + 3.0
        o = np.asarray(dOTC.adjust(_series(ref), _series(hist), _series(sim),
                                   reg=0.01, n_iter=300).values)
        assert abs(o.mean() - 8.0) < 0.2, o.mean()
        assert abs(o.std() - 2.0) < 0.2, o.std()
        # the change signal's ordering is preserved
        rank = lambda a: np.argsort(np.argsort(a))
        assert np.corrcoef(rank(o), rank(sim))[0, 1] > 0.99

    def test_multiplicative_evolution(self):
        """kind='*': sim = 2·hist doubles the evolved reference."""
        rng = np.random.default_rng(0)
        n = 1500
        hist = rng.lognormal(0, 0.3, n)
        ref = rng.lognormal(1.0, 0.3, n)
        sim = 2.0 * hist
        o = np.asarray(dOTC.adjust(_series(ref, units="mm/d"),
                                   _series(hist, units="mm/d"),
                                   _series(sim, units="mm/d"),
                                   reg=0.01, n_iter=300, kind="*").values)
        ratio = o.mean() / ref.mean()
        assert abs(ratio - 2.0) < 0.1, ratio


class TestNpdfTransformGolden:
    def test_correlation_recovery(self):
        """Independent hist mapped onto a ρ=0.8 Gaussian ref recovers the
        correlation and unit marginals (Cannon 2018 property)."""
        rng = np.random.default_rng(1)
        n = 2000
        L = np.linalg.cholesky(np.array([[1, 0.8], [0.8, 1]]))
        ref = L @ rng.normal(0, 1, (2, n))
        hist = rng.normal(0, 1, (2, n))
        ha, sa = npdf_transform(_multivar(ref), _multivar(hist),
                                _multivar(hist.copy()), n_iter=25,
                                nquantiles=50)
        h = np.asarray(ha.values)
        assert abs(np.corrcoef(h)[0, 1] - 0.8) < 0.05
        np.testing.assert_allclose(h.std(axis=1), [1.0, 1.0], atol=0.1)
        # sim == hist here, so sim_adj must follow hist_adj
        np.testing.assert_allclose(np.asarray(sa.values), h, atol=1e-5)

    def test_rotation_covariance_recovery(self):
        """ref = R·diag(2,0.5)·z: the full covariance R·diag(4,.25)·Rᵀ is
        recovered from an isotropic hist."""
        rng = np.random.default_rng(1)
        n = 2000
        th = 0.7
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        ref = R @ (rng.normal(0, 1, (2, n)) * np.array([[2.0], [0.5]]))
        hist = rng.normal(0, 1, (2, n))
        ha, _ = npdf_transform(_multivar(ref), _multivar(hist), None,
                               n_iter=30, nquantiles=50)
        cov = np.cov(np.asarray(ha.values))
        expected = R @ np.diag([4.0, 0.25]) @ R.T
        np.testing.assert_allclose(cov, expected, atol=0.15)


class TestExtremeValuesGolden:
    @staticmethod
    def _pot_series(scale, k_hosking, n_days=365 * 60, seed=42):
        """Wet day every 3rd step: 1 mm/d + GPD(k, scale) exceedance
        (isolated exceedances → each is its own cluster maximum)."""
        from scipy import stats

        vals = np.zeros(n_days)
        wet = np.arange(0, n_days, 3)
        # scipy's genpareto c = −k (Hosking sign convention)
        vals[wet] = 1.0 + stats.genpareto.rvs(
            -k_hosking, scale=scale, size=len(wet),
            random_state=np.random.RandomState(seed))
        return vals

    def test_gpd_parameter_recovery(self):
        """Train on synthetic GPD exceedances: the L-moment fit over the POT
        level recovers k and the threshold-stability scale σ − k·(t − u)."""
        k_true, sig = 0.1, 5.0
        vals = self._pot_series(sig, k_true)
        hist = _series(vals, units="mm/d", start="1951-01-01")
        EV = ExtremeValues.train(hist, hist, cluster_thresh="1 mm/d",
                                 q_thresh=0.95)
        th = float(EV.ds["thresh_hist"])
        kh = float(EV.ds["k_hist"])
        sh = float(EV.ds["s_hist"])
        expected_scale = sig - k_true * (th - 1.0)
        assert abs(kh - k_true) < 0.08, kh
        np.testing.assert_allclose(sh, expected_scale, rtol=0.15)

    def test_identity_adjust(self):
        """ref == hist: the GPD transfer is the identity on extremes."""
        vals = self._pot_series(5.0, 0.1)
        hist = _series(vals, units="mm/d", start="1951-01-01")
        EV = ExtremeValues.train(hist, hist, cluster_thresh="1 mm/d",
                                 q_thresh=0.95)
        out = np.asarray(EV.adjust(hist, hist, frac=0.25, power=1.0).values)
        th = float(EV.ds["thresh_hist"])
        mask = vals > th
        np.testing.assert_allclose(out[mask], vals[mask], rtol=1e-4)

    def test_known_scale_transfer(self):
        """ref exceedances exactly double hist's (same exponential shape):
        thresholds and GPD scales double, and the most extreme sim values map
        through the closed form th_r + 2·(x − th_h)."""
        from scipy import stats

        n = 365 * 60
        wet = np.arange(0, n, 3)
        e = stats.expon.rvs(scale=3.0, size=len(wet),
                            random_state=np.random.RandomState(7))
        v_h = np.zeros(n)
        v_r = np.zeros(n)
        v_h[wet] = 1.0 + e
        v_r[wet] = 1.0 + 2.0 * e
        hist = _series(v_h, units="mm/d", start="1951-01-01")
        ref = _series(v_r, units="mm/d", start="1951-01-01")
        EV = ExtremeValues.train(ref, hist, cluster_thresh="1 mm/d",
                                 q_thresh=0.95)
        th_h = float(EV.ds["thresh_hist"])
        th_r = float(EV.ds["thresh_ref"])
        np.testing.assert_allclose(th_r, 1 + 2 * (th_h - 1), rtol=0.02)
        s_ratio = float(EV.ds["s_ref"]) / float(EV.ds["s_hist"])
        np.testing.assert_allclose(s_ratio, 2.0, rtol=0.05)
        out = np.asarray(EV.adjust(hist, hist, frac=0.25, power=1.0).values)
        top = np.argsort(v_h)[-3:]  # weight ≈ 1 at the most extreme values
        expected = th_r + 2.0 * (v_h[top] - th_h)
        np.testing.assert_allclose(out[top], expected, rtol=0.03)
