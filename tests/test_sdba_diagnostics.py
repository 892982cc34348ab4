"""sdba properties and measures (reference: xsdba properties/measures
modules re-exported through xclim.sdba)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.sdba import measures as M
from xclim_tpu.sdba import properties as P


@pytest.fixture
def tas():
    rng = np.random.default_rng(0)
    t = date_range("2000-01-01", periods=3650, freq="D", calendar="noleap")
    doy = np.arange(3650) % 365
    v = (280 + 15 * np.sin(2 * np.pi * (doy - 180) / 365)
         + rng.normal(0, 3, 3650)).astype(np.float32)
    return ClimArray(jnp.asarray(v), ("time",), {"time": t}, {"units": "K"},
                     "tas"), v


@pytest.fixture
def pr():
    rng = np.random.default_rng(1)
    t = date_range("2000-01-01", periods=3650, freq="D", calendar="noleap")
    v = np.where(rng.random(3650) < 0.35, rng.gamma(2, 4, 3650),
                 0).astype(np.float32)
    return ClimArray(jnp.asarray(v), ("time",), {"time": t},
                     {"units": "mm/d"}, "pr"), v


class TestProperties:
    def test_moments(self, tas):
        da, v = tas
        np.testing.assert_allclose(float(np.asarray(P.mean(da).data)),
                                   v.mean(), rtol=1e-5)
        np.testing.assert_allclose(float(np.asarray(P.var(da).data)),
                                   v.var(), rtol=1e-4)
        np.testing.assert_allclose(float(np.asarray(P.std(da).data)),
                                   v.std(), rtol=1e-4)

    def test_monthly_mean_dims(self, tas):
        da, _ = tas
        out = P.mean(da, "time.month")
        assert out.dims == ("month",)
        assert out.shape == (12,)
        # July warmer than January
        v = np.asarray(out.data)
        assert v[6] > v[0]

    def test_quantile(self, pr):
        da, v = pr
        np.testing.assert_allclose(float(np.asarray(P.quantile(da, 0.98).data)),
                                   np.quantile(v, 0.98), rtol=1e-4)

    def test_skewness_positive_for_gamma(self, pr):
        da, _ = pr
        assert float(np.asarray(P.skewness(da).data)) > 1.0

    def test_relative_frequency(self, pr):
        da, v = pr
        out = float(np.asarray(
            P.relative_frequency(da, ">=", "1 mm/d").data))
        np.testing.assert_allclose(out, (v >= 1).mean(), atol=1e-6)

    def test_transition_probability(self, pr):
        da, v = pr
        out = float(np.asarray(P.transition_probability(da).data))
        wet = v >= 1
        expected = (wet[:-1] & wet[1:]).sum() / wet[:-1].sum()
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_annual_cycle(self, tas):
        da, _ = tas
        amp = float(np.asarray(P.annual_cycle_amplitude(da).data))
        assert 35 < amp < 50  # 2×15 amplitude + noise extremes
        phase = float(np.asarray(P.annual_cycle_phase(da).data))
        assert 250 < phase < 300  # sin peak at doy 271

    def test_trend_detects_warming(self):
        t = date_range("2000-01-01", periods=3650, freq="D",
                       calendar="noleap")
        v = (280 + 0.01 * np.arange(3650) / 365).astype(np.float32)
        da = ClimArray(jnp.asarray(v), ("time",), {"time": t},
                       {"units": "K"}, "tas")
        out = P.trend(da)
        np.testing.assert_allclose(float(np.asarray(out.data)), 0.01,
                                   rtol=0.05)
        assert out.attrs["units"] == "K yr-1"

    def test_corr_btw_var_self(self, tas):
        da, _ = tas
        np.testing.assert_allclose(
            float(np.asarray(P.corr_btw_var(da, da).data)), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            float(np.asarray(P.corr_btw_var(da, da, "Pearson").data)), 1.0,
            atol=1e-5)

    def test_spell_length(self, pr):
        da, v = pr
        out = float(np.asarray(
            P.spell_length_distribution(da, ">=", "1 mm/d", "mean").data))
        # hand-computed mean spell length
        wet = v >= 1
        runs = []
        c = 0
        for b in wet:
            if b:
                c += 1
            elif c:
                runs.append(c)
                c = 0
        if c:
            runs.append(c)
        np.testing.assert_allclose(out, np.mean(runs), rtol=1e-5)

    def test_return_value(self, tas):
        da, v = tas
        rv = float(np.asarray(P.return_value(da, period=20).data))
        ymax = v.reshape(10, 365).max(1)
        assert ymax.max() - 2 < rv < ymax.max() + 8

    def test_acf_bounds(self, tas):
        da, _ = tas
        out = np.asarray(P.acf(da, 1, "time.season").data)
        assert out.shape == (4,)
        assert (np.abs(out) <= 1).all()


class TestMeasures:
    def test_bias_ratio(self, tas):
        da, _ = tas
        m1 = P.mean(da, "time.month")
        m2 = m1 + 2.0
        m2.attrs["units"] = "K"
        np.testing.assert_allclose(np.asarray(M.bias(m2, m1).data), 2.0,
                                   atol=1e-5)
        r = np.asarray(M.ratio(m2, m1).data)
        assert (r > 1).all() and (r < 1.02).all()

    def test_circular_bias(self):
        a = ClimArray(jnp.asarray([360.0, 10.0]), ("x",), {"x": [0, 1]},
                      {"units": ""}, "a")
        b = ClimArray(jnp.asarray([10.0, 360.0]), ("x",), {"x": [0, 1]},
                      {"units": ""}, "b")
        out = np.asarray(M.circular_bias(a, b).data)
        np.testing.assert_allclose(out, [-15.25, 15.25])

    def test_rmse_mae(self, tas):
        da, _ = tas
        shifted = da + 0.5
        shifted.attrs["units"] = "K"
        np.testing.assert_allclose(float(np.asarray(M.rmse(shifted, da).data)),
                                   0.5, atol=1e-5)
        np.testing.assert_allclose(float(np.asarray(M.mae(shifted, da).data)),
                                   0.5, atol=1e-5)

    def test_annual_cycle_correlation(self, tas):
        da, _ = tas
        shifted = da + 0.5
        shifted.attrs["units"] = "K"
        np.testing.assert_allclose(
            float(np.asarray(M.annual_cycle_correlation(da, shifted).data)),
            1.0, atol=1e-4)


class TestProcessing:
    def _pr(self, dry_frac, seed=0, n=3650):
        rng = np.random.default_rng(seed)
        t = date_range("2000-01-01", periods=n, freq="D", calendar="noleap")
        v = np.where(rng.random(n) < dry_frac, 0,
                     rng.gamma(2, 4, n)).astype(np.float32)
        return ClimArray(jnp.asarray(v), ("time",), {"time": t},
                         {"units": "mm/d"}, "pr"), v

    def test_jitter_under_thresh(self):
        from xclim_tpu.sdba.processing import jitter_under_thresh

        da, v = self._pr(0.5)
        out = np.asarray(jitter_under_thresh(da, "0.1 mm/d").data)
        assert (out > 0).all()
        assert (out[v == 0] < 0.1).all()
        np.testing.assert_array_equal(out[v >= 0.1], v[v >= 0.1])

    def test_adapt_freq_matches_dry_fraction(self):
        from xclim_tpu.sdba.processing import adapt_freq

        ref, refv = self._pr(0.4, seed=0)
        sim, simv = self._pr(0.7, seed=1)
        sim_ad, pth, dP0 = adapt_freq(ref, sim, thresh="0.1 mm/d")
        sa = np.asarray(sim_ad.data)
        np.testing.assert_allclose((sa < 0.1).mean(), (refv < 0.1).mean(),
                                   atol=0.02)
        # wet values untouched
        np.testing.assert_allclose(np.sort(sa[simv >= 0.1]),
                                   np.sort(simv[simv >= 0.1]))
        assert float(np.asarray(dP0.data)) > 0.3

    def test_normalize_roundtripish(self):
        from xclim_tpu.sdba.processing import normalize

        rng = np.random.default_rng(2)
        t = date_range("2000-01-01", periods=3650, freq="D",
                       calendar="noleap")
        v = (280 + 10 * np.sin(2 * np.pi * np.arange(3650) / 365)
             + rng.normal(0, 2, 3650)).astype(np.float32)
        da = ClimArray(jnp.asarray(v), ("time",), {"time": t},
                       {"units": "K"}, "tas")
        nrm, norm = normalize(da, group="time.month")
        assert abs(float(np.asarray(nrm.data).mean())) < 0.05
        assert norm.dims == ("month",)

    def test_standardize_roundtrip(self):
        from xclim_tpu.sdba.processing import standardize, unstandardize

        da, v = self._pr(0.3)
        st, mu, sd = standardize(da)
        back = unstandardize(st, mu, sd)
        np.testing.assert_allclose(np.asarray(back.data), v, atol=1e-3)

    def test_reordering(self):
        from xclim_tpu.sdba.processing import reordering

        rng = np.random.default_rng(3)
        t = date_range("2000-01-01", periods=400, freq="D",
                       calendar="noleap")
        r = ClimArray(jnp.asarray(rng.normal(0, 1, 400).astype(np.float32)),
                      ("time",), {"time": t}, {"units": "K"}, "r")
        s = ClimArray(jnp.asarray(rng.normal(5, 2, 400).astype(np.float32)),
                      ("time",), {"time": t}, {"units": "K"}, "s")
        out = np.asarray(reordering(r, s).data)
        rv = np.asarray(r.data)
        sv = np.asarray(s.data)
        # same multiset as sim, same rank order as ref
        np.testing.assert_allclose(np.sort(out), np.sort(sv))
        np.testing.assert_array_equal(np.argsort(np.argsort(out)),
                                      np.argsort(np.argsort(rv)))

    def test_additive_space_roundtrip(self):
        from xclim_tpu.sdba.processing import (
            from_additive_space,
            to_additive_space,
        )

        da, v = self._pr(0.0, seed=4)
        add = to_additive_space(da, "0 mm/d", trans="log")
        back = from_additive_space(add)
        np.testing.assert_allclose(np.asarray(back.data), v, rtol=1e-4)
        assert back.attrs["units"] == "mm/d"
        # logit
        hurs_v = np.clip(np.random.default_rng(5).random(100) * 100, 1, 99) \
            .astype(np.float32)
        t = date_range("2000-01-01", periods=100, freq="D")
        hurs = ClimArray(jnp.asarray(hurs_v), ("time",), {"time": t},
                         {"units": "%"}, "hurs")
        add2 = to_additive_space(hurs, 0, 100, trans="logit")
        back2 = from_additive_space(add2)
        np.testing.assert_allclose(np.asarray(back2.data), hurs_v, rtol=1e-3)

    def test_stack_unstack(self):
        from xclim_tpu.core.dataarray import ClimDataset
        from xclim_tpu.sdba.processing import stack_variables, unstack_variables

        da1, v1 = self._pr(0.3, seed=6)
        da2, v2 = self._pr(0.5, seed=7)
        da2.attrs["units"] = "K"
        da2.name = "tas"
        ds = ClimDataset({"pr": da1, "tas": da2})
        stk = stack_variables(ds)
        assert stk.dims[0] == "multivar"
        us = unstack_variables(stk)
        np.testing.assert_array_equal(np.asarray(us["pr"].data), v1)
        assert us["tas"].attrs["units"] == "K"

    def test_escore(self):
        from xclim_tpu.core.dataarray import ClimDataset
        from xclim_tpu.sdba.processing import escore, stack_variables

        da1, _ = self._pr(0.3, seed=8, n=500)
        stk = stack_variables(ClimDataset({"pr": da1}))
        assert escore(stk, stk) == 0.0
        shifted = stk + 5.0
        assert escore(stk, shifted) > 1.0
