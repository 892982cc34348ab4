"""Compound precip+temperature indicator suite, ported from
xclim:tests/test_preciptemp.py (exact expected values) plus the series-based
cases of tests/test_atmos.py.
"""

import numpy as np

from xclim_tpu import atmos
from xclim_tpu.core.percentiles import percentile_doy

K2C = 273


class TestColdAndDry:
    """xclim:tests/test_preciptemp.py:11-25."""

    def test_simple(self, tas_series, pr_series):
        raw_temp = np.full(365 * 4, 20.0) + K2C
        raw_temp[10:20] -= 10
        ts = tas_series(raw_temp)
        ts_per = percentile_doy(ts, 5, 25).isel(percentiles=0)
        raw_prec = np.full(365 * 4, 10.0)
        raw_prec[10:20] = 0
        pr = pr_series(raw_prec)
        pr_per = percentile_doy(pr, 5, 25).isel(percentiles=0)

        result = atmos.cold_and_dry_days(ts, pr, ts_per, pr_per, freq="MS")
        assert np.asarray(result.values)[0] == 10


class TestWarmAndDry:
    """xclim:tests/test_preciptemp.py:28-42."""

    def test_simple(self, tas_series, pr_series):
        raw_temp = np.full(365 * 4, 20.0) + K2C
        raw_temp[10:30] += 10
        ts = tas_series(raw_temp)
        ts_per = percentile_doy(ts, 5, 75).isel(percentiles=0)
        raw_prec = np.full(365 * 4, 10.0)
        raw_prec[10:30] = 0
        pr = pr_series(raw_prec)
        pr_per = percentile_doy(pr, 5, 25).isel(percentiles=0)

        result = atmos.warm_and_dry_days(ts, pr, ts_per, pr_per, freq="MS")
        assert np.asarray(result.values)[0] == 20


class TestWarmAndWet:
    """xclim:tests/test_preciptemp.py:45-59."""

    def test_simple(self, tas_series, pr_series):
        raw_temp = np.full(365 * 4, 20.0) + K2C
        raw_temp[10:30] += 10
        ts = tas_series(raw_temp)
        ts_per = percentile_doy(ts, 5, 75).isel(percentiles=0)
        raw_prec = np.full(365 * 4, 10.0)
        raw_prec[10:30] += 20
        pr = pr_series(raw_prec)
        pr_per = percentile_doy(pr, 5, 75).isel(percentiles=0)

        result = atmos.warm_and_wet_days(ts, pr, ts_per, pr_per, freq="MS")
        assert np.asarray(result.values)[0] == 20


class TestColdAndWet:
    """xclim:tests/test_preciptemp.py:62-76."""

    def test_simple(self, tas_series, pr_series):
        raw_temp = np.full(365 * 4, 20.0) + K2C
        raw_temp[10:25] -= 20
        ts = tas_series(raw_temp)
        ts_per = percentile_doy(ts, 5, 75).isel(percentiles=0)
        raw_prec = np.full(365 * 4, 10.0)
        raw_prec[15:30] += 20
        pr = pr_series(raw_prec)
        pr_per = percentile_doy(pr, 5, 75).isel(percentiles=0)

        result = atmos.cold_and_wet_days(ts, pr, ts_per, pr_per, freq="MS")
        assert np.asarray(result.values)[0] == 10


def test_high_precip_low_temp(pr_series, tasmin_series):
    """xclim:tests/test_atmos.py:22-33."""
    pr = np.zeros(365)
    pr[1:3] = [1, 2]
    pr = pr_series(pr, start="1999-01-01")

    tas = np.zeros(365)
    tas[2:4] = [1, 1]
    tas += 273.16
    tas = tasmin_series(tas, start="1999-01-01")

    out = atmos.high_precip_low_temp(pr, tas, pr_thresh="1 kg m-2 s-1",
                                     tas_thresh="1 C")
    np.testing.assert_array_equal(np.asarray(out.values), [1])


class TestAridityIndex:
    """xclim:tests/test_atmos.py:114-127 (indicator level)."""

    def test_simple(self, pr_series, evspsblpot_series):
        pr = np.ones(365 * 2)
        pet = np.ones(365 * 2) * 0.8
        pr[:365] = 3
        pet[:365] = 1.5
        expected = [3 / 1.5, 1 / 0.8]
        pr = pr_series(pr, start="2001-01-01")
        pet = evspsblpot_series(pet, start="2001-01-01")
        out = atmos.aridity_index(pr, pet)

        assert out.attrs["units"] == "1"
        # float32 pipeline: the reference's exact check at float64 precision
        np.testing.assert_allclose(np.asarray(out.values), expected,
                                   rtol=1e-6)
