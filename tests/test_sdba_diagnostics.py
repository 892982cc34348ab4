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
