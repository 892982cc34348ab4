"""Missing-value methods (reference semantics: xclim:src/xclim/core/missing.py,
tests/test_missing.py)."""

import numpy as np
import pytest

from xclim_tpu.core.missing import (
    at_least_n_valid,
    expected_count,
    missing_any,
    missing_pct,
    missing_wmo,
)
from xclim_tpu.core.calendar import date_range


class TestExpectedCount:
    def test_monthly(self):
        t = date_range("2000-01-01", periods=366, freq="D")
        cnt = expected_count(t, "MS", "D")
        np.testing.assert_array_equal(cnt, [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])

    def test_with_indexer(self):
        t = date_range("2000-01-01", periods=366, freq="D")
        cnt = expected_count(t, "YS", "D", month=1)
        np.testing.assert_array_equal(cnt, [31])


class TestMissingAny:
    def test_complete(self, tas_series):
        tas = tas_series(np.zeros(31), start="2000-01-01")
        m = missing_any(tas, "MS")
        assert not m.values[0]

    def test_nan(self, tas_series):
        vals = np.zeros(31)
        vals[5] = np.nan
        tas = tas_series(vals, start="2000-01-01")
        m = missing_any(tas, "MS")
        assert m.values[0]

    def test_partial_period(self, tas_series):
        tas = tas_series(np.zeros(40), start="2000-01-01")
        m = missing_any(tas, "MS")
        # Jan complete, Feb partial (9 of 29 days)
        np.testing.assert_array_equal(m.values, [False, True])

    def test_indexer(self, tas_series):
        vals = np.zeros(366)
        vals[180] = np.nan  # a NaN in July
        tas = tas_series(vals, start="2000-01-01")
        m = missing_any(tas, "YS", season="DJF")
        assert not m.values[0]  # July NaN doesn't matter for DJF
        m2 = missing_any(tas, "YS", season="JJA")
        assert m2.values[0]


class TestMissingWMO:
    def test_below_thresholds(self, tas_series):
        vals = np.zeros(366)
        vals[10:14] = np.nan  # 4 consecutive — below nc=5
        tas = tas_series(vals, start="2000-01-01")
        m = missing_wmo(tas, "YS")
        assert not m.values[0]

    def test_consecutive(self, tas_series):
        vals = np.zeros(366)
        vals[10:16] = np.nan  # 6 consecutive ≥ nc=5
        tas = tas_series(vals, start="2000-01-01")
        m = missing_wmo(tas, "YS")
        assert m.values[0]

    def test_total(self, tas_series):
        vals = np.zeros(366)
        # 11 missing days in January, non-consecutive
        vals[0:31:3] = np.nan
        tas = tas_series(vals, start="2000-01-01")
        m = missing_wmo(tas, "YS")
        assert m.values[0]


class TestMissingPct:
    def test_tolerance(self, tas_series):
        vals = np.zeros(30)
        vals[:2] = np.nan  # 2/30 < 0.1
        tas = tas_series(vals, start="2000-04-01")
        assert not missing_pct(tas, "MS", tolerance=0.1).values[0]
        vals[:5] = np.nan  # 5/30 > 0.1
        tas = tas_series(vals, start="2000-04-01")
        assert missing_pct(tas, "MS", tolerance=0.1).values[0]


class TestAtLeastN:
    def test_n(self, tas_series):
        vals = np.full(31, np.nan)
        vals[:25] = 0
        tas = tas_series(vals, start="2000-01-01")
        assert not at_least_n_valid(tas, "MS", n=20).values[0]
        assert at_least_n_valid(tas, "MS", n=28).values[0]


class TestMissingTwoSteps:
    """Two-step masks (xclim:core/missing.py:338): compute at subfreq, merge
    into the target freq with the 'any' rule."""

    def test_pct_subfreq_monthly(self, tas_series):
        from xclim_tpu.core.missing import MissingPct

        # 20 missing days all inside January: 20/366 ≈ 5% of the year (below
        # tolerance in one step), but 20/31 ≈ 65% of January (above) — the
        # two-step method must flag the year
        vals = np.zeros(366)
        vals[:20] = np.nan
        tas = tas_series(vals, start="2000-01-01")
        assert not MissingPct(tolerance=0.3)(tas, "YS").values[0]
        assert MissingPct(tolerance=0.3, subfreq="MS")(tas, "YS").values[0]

    def test_at_least_n_subfreq(self, tas_series):
        from xclim_tpu.core.missing import AtLeastNValid

        # 345 valid days in the year (≥300 in one step), but January has only
        # 11 valid days (<20) — subfreq='MS' must flag the year
        vals = np.zeros(366)
        vals[:20] = np.nan
        tas = tas_series(vals, start="2000-01-01")
        assert not AtLeastNValid(n=300)(tas, "YS").values[0]
        assert AtLeastNValid(n=20, subfreq="MS")(tas, "YS").values[0]

    def test_incomplete_subperiod_coverage(self, tas_series):
        from xclim_tpu.core.missing import MissingPct

        # only 6 complete months of 2000: YS period lacks expected months →
        # missing under the two-step merge even with zero NaNs
        vals = np.zeros(182)
        tas = tas_series(vals, start="2000-01-01")
        m = MissingPct(tolerance=0.9, subfreq="MS")(tas, "YS")
        assert m.values[0]

    def test_freq_finer_than_subfreq_raises(self, tas_series):
        from xclim_tpu.core.missing import MissingPct

        tas = tas_series(np.zeros(366), start="2000-01-01")
        with pytest.raises(ValueError, match="cannot be finer"):
            MissingPct(tolerance=0.1, subfreq="YS")(tas, "MS")

    def test_wmo_is_two_steps(self):
        from xclim_tpu.core.missing import MissingTwoSteps, MissingWMO

        assert issubclass(MissingWMO, MissingTwoSteps)

    def test_subfreq_none_single_step(self, tas_series):
        from xclim_tpu.core.missing import MissingPct

        vals = np.zeros(366)
        vals[:10] = np.nan
        tas = tas_series(vals, start="2000-01-01")
        a = MissingPct(tolerance=0.1)(tas, "YS").values
        b = MissingPct(tolerance=0.1, subfreq=None)(tas, "YS").values
        np.testing.assert_array_equal(a, b)
