"""spell_mask exact cases (xclim:tests/test_generic.py:702-800)."""

import numpy as np
import pytest

from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.indices import generic

K2C = 273.15


def _da(vals):
    t = date_range("2000-01-01", periods=len(vals), freq="D")
    return ClimArray(np.asarray(vals, dtype=np.float64), ("time",),
                     {"time": t}, {"units": "K"}, "x")


class TestSpellMask:
    def test_single_variable(self):
        data = _da([0, 1, 2, 3, 2, 1, 0, 0])
        out = generic.spell_mask(data, 3, "min", ">=", 2)
        np.testing.assert_array_equal(np.asarray(out.data),
                                      np.array([0, 0, 1, 1, 1, 0, 0, 0],
                                               dtype=bool))
        out = generic.spell_mask(data, 3, "max", ">=", 2)
        np.testing.assert_array_equal(np.asarray(out.data),
                                      np.array([1, 1, 1, 1, 1, 1, 1, 0],
                                               dtype=bool))
        out = generic.spell_mask(data, 2, "mean", ">=", 2)
        np.testing.assert_array_equal(np.asarray(out.data),
                                      np.array([0, 0, 1, 1, 1, 0, 0, 0],
                                               dtype=bool))
        out = generic.spell_mask(data, 3, "mean", ">", 2,
                                 weights=[0.2, 0.4, 0.4])
        np.testing.assert_array_equal(np.asarray(out.data),
                                      np.array([0, 1, 1, 1, 1, 0, 0, 0],
                                               dtype=bool))

    def test_multiple_variables(self):
        d1 = _da([0, 1, 2, 3, 2, 1, 0, 0])
        d2 = _da([1, 2, 3, 2, 1, 0, 0, 0])
        out = generic.spell_mask([d1, d2], 3, "min", ">=", [2, 2])
        np.testing.assert_array_equal(np.asarray(out.data),
                                      np.zeros(8, dtype=bool))
        out = generic.spell_mask([d1, d2], 3, "min", ">=", [2, 2],
                                 var_reducer="any")
        np.testing.assert_array_equal(np.asarray(out.data),
                                      np.array([0, 1, 1, 1, 1, 0, 0, 0],
                                               dtype=bool))
        out = generic.spell_mask([d1, d2], 2, "mean", ">=", [2, 2])
        np.testing.assert_array_equal(np.asarray(out.data),
                                      np.array([0, 0, 1, 1, 0, 0, 0, 0],
                                               dtype=bool))
        out = generic.spell_mask([d1, d2], 3, "mean", ">", [2, 1.5],
                                 weights=[0.2, 0.4, 0.4])
        np.testing.assert_array_equal(np.asarray(out.data),
                                      np.array([0, 1, 1, 1, 1, 0, 0, 0],
                                               dtype=bool))

    def test_errors(self):
        data = _da([0, 1, 2, 3, 2, 1, 0, 0])
        with pytest.raises(ValueError):
            generic.spell_mask([data, data], 3, "min", "<=", 2)
        with pytest.raises(ValueError):
            generic.spell_mask([data, data], 3, "min", "<=", [2])
        with pytest.raises(ValueError):
            generic.spell_mask(data, 3, "min", "<=", 2, weights=[1, 2, 3])
        with pytest.raises(ValueError):
            generic.spell_mask(data, 3, "mean", "<=", 2, weights=[1, 2])


def test_spell_length_statistics_quantified(tasmin_series):
    # per-site array threshold (xclim:tests/test_generic.py:756)
    base = np.arange(365) + K2C
    t = date_range("2001-01-01", periods=365, freq="D")
    tn = ClimArray(np.stack([base, base], axis=1), ("time", "site"),
                   {"time": t}, {"units": "K"}, "tasmin")
    thresh = ClimArray(np.array([330.0, 360.0]), ("site",),
                       attrs={"units": "°C"}, name="t")
    out = generic.spell_length_statistics(
        tn, thresh, window=1, win_reducer="min", op=">",
        spell_reducer="sum", freq="YS")
    np.testing.assert_allclose(np.asarray(out.data), [[34, 4]])


def test_bivariate_spell_length_statistics_multi(tasmin_series,
                                                 tasmax_series):
    tn = tasmin_series(np.zeros(365) + 270, start="2001-01-01")
    tx = tasmax_series(np.zeros(365) + 270, start="2001-01-01")
    outc, outs, outm = generic.bivariate_spell_length_statistics(
        tn, "0 °C", tx, "1°C", window=5, win_reducer="min", op="<",
        spell_reducer=["count", "sum", "max"], freq="YS")
    np.testing.assert_allclose(np.asarray(outs.data),
                               np.asarray(outm.data))
    np.testing.assert_allclose(np.asarray(outc.data), 1)


class TestCumulativeDifference:
    """xclim:tests/test_generic.py:316."""

    @pytest.mark.parametrize(
        "op, expected",
        [("gt", [0, 5, 10, 0, 0]), (">=", [0, 5, 10, 0, 0]),
         ("<", [20, 0, 0, 7, 0])])
    def test_simple(self, tas_series, op, expected):
        tas = tas_series(np.array([-10, 15, 20, 3, 10]) + K2C)
        out = generic.cumulative_difference(tas, threshold="10 degC", op=op)
        out_k = generic.cumulative_difference(tas, threshold="283.15 degK",
                                              op=op)
        np.testing.assert_allclose(np.asarray(out.data), expected)
        np.testing.assert_allclose(np.asarray(out.data),
                                   np.asarray(out_k.data))

    def test_forbidden(self, tas_series):
        tas = tas_series(np.array([-10, 15, 20, 3, 10]) + K2C)
        with pytest.raises((NotImplementedError, ValueError)):
            generic.cumulative_difference(tas, threshold="10 degC", op="!=")


class TestFirstDayThreshold:
    """xclim:tests/test_generic.py:343."""

    @pytest.mark.parametrize("op, expected",
                             [(">", 6), (">=", 5), ("==", 5), ("!=", 1)])
    def test_generic_precip_above(self, pr_series, op, expected):
        a = np.zeros(365)
        a[:8] = np.arange(8) / 1000
        pr = pr_series(a, start="2000-01-01")
        fda = generic.first_day_threshold_reached(
            pr, threshold="0.004 kg m-2 s-1", op=op, after_date="01-01",
            window=1, freq="YS")
        assert float(np.asarray(fda.data)[0]) == expected

    @pytest.mark.parametrize("op, expected",
                             [("lt", 5), ("le", 4), ("eq", 4), ("ne", 1)])
    def test_generic_precip_below(self, pr_series, op, expected):
        a = np.zeros(365)
        a[:8] = np.flip(np.arange(8) / 1000)
        pr = pr_series(a, start="2000-01-01")
        fdb = generic.first_day_threshold_reached(
            pr, threshold="0.004 kg m-2 s-1", op=op, after_date="01-01",
            window=1, freq="YS")
        assert float(np.asarray(fdb.data)[0]) == expected

    def test_generic_forbidden_op(self, pr_series):
        a = np.zeros(365)
        a[:8] = np.flip(np.arange(8) / 1000)
        pr = pr_series(a, start="2000-01-01")
        with pytest.raises(ValueError):
            generic.first_day_threshold_reached(
                pr, threshold="0.004 kg m-2 s-1", op=">",
                after_date="01-01", window=1, freq="YS",
                constrain=("<", "<="))
