"""Health-check oracle battery ported from the reference suite
(xclim:tests/test_checks.py) — same cases, rewritten on the
ClimArray/TimeIndex API (no cftime/pandas dimension: one calendar-aware
host-side index)."""

from collections import namedtuple

import numpy as np
import pytest

import xclim_tpu
from xclim_tpu.core import cfchecks, datachecks
from xclim_tpu.core._exceptions import ValidationError
from xclim_tpu.core.calendar import TimeIndex, date_range
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.core.options import set_options

K2C = 273.15

TestObj = namedtuple("TestObj", ["test"])

TAS_ATTRS = {
    "units": "K",
    "cell_methods": "time: mean within days",
    "standard_name": "air_temperature",
}


def _tas(time, n=None):
    n = len(time) if n is None else n
    return ClimArray(np.arange(n, dtype="float32") + K2C, dims=("time",),
                     coords={"time": time}, name="tas",
                     attrs=dict(TAS_ATTRS))


def setup_module(module):
    set_options(cf_compliance="raise", data_validation="raise")


def teardown_module(module):
    set_options(cf_compliance="warn", data_validation="raise")


@pytest.mark.parametrize(
    "value,expected",
    [
        ("a string", "a string"),
        ("a long string", "a * string"),
        ("a string", ["not correct", "a string"]),
    ],
)
def test_check_valid_ok(value, expected):
    d = TestObj(value)

    class Var:
        attrs = {"test": value}

    cfchecks.check_valid(Var(), "test", expected)
    assert d.test == value


@pytest.mark.parametrize(
    "value,expected",
    [
        (None, "a string"),
        ("a long string", "a * strings"),
        ("a string", ["not correct", "also not correct"]),
    ],
)
def test_check_valid_raise(value, expected):
    class Var:
        attrs = {} if value is None else {"test": value}

    with pytest.raises(ValidationError):
        cfchecks.check_valid(Var(), "test", expected)


@pytest.mark.parametrize(
    "value,expected",
    [
        (None, "expecto: patronum"),
        ("test: mean", "expecto: patronum"),
    ],
)
def test_check_cell_methods_nok(value, expected):
    with pytest.raises(ValidationError):
        cfchecks._check_cell_methods(value, expected)


@pytest.mark.parametrize(
    "value,expected",
    [
        ("expecto: patronum", "expecto: patronum"),
        ("area: mean expecto: patronum", "expecto: patronum"),
        ("expecto: patronum within days", "expecto: patronum"),
        ("complex: thing expecto: patronum within days very: complex",
         "expecto: patronum"),
        ("expecto: pa-tro_num (area-weighted)",
         "expecto: pa-tro_num (area-weighted)"),
    ],
)
def test_check_cell_methods_ok(value, expected):
    assert cfchecks._check_cell_methods(value, expected) is None


class TestDateHandling:
    def test_assert_daily(self):
        # one day short of a full year still passes the daily check
        times = date_range("2000-01-01", freq="D", periods=365)
        xclim_tpu.atmos.tg_mean(_tas(times))

    def test_bad_frequency(self):
        with pytest.raises(ValidationError):
            times = date_range("2000-01-01", freq="12h", periods=365)
            xclim_tpu.atmos.tg_mean(_tas(times))

    def test_decreasing_index(self):
        with pytest.raises(ValidationError):
            times = date_range("2000-01-01", freq="12h", periods=365)[::-1]
            xclim_tpu.atmos.tg_mean(_tas(times))

    def test_missing_one_day_between_two_years(self):
        with pytest.raises(ValidationError):
            a = date_range("2000-01-01", freq="D", periods=365)
            b = date_range("2001-01-01", freq="D", periods=365)
            times = TimeIndex(
                year=np.concatenate([a.year, b.year]),
                month=np.concatenate([a.month, b.month]),
                day=np.concatenate([a.day, b.day]))
            xclim_tpu.atmos.tg_mean(_tas(times))

    def test_duplicate_dates(self):
        with pytest.raises(ValidationError):
            a = date_range("2000-01-01", freq="D", periods=365)
            b = date_range("2000-12-29", freq="D", periods=365)
            times = TimeIndex(
                year=np.concatenate([a.year, b.year]),
                month=np.concatenate([a.month, b.month]),
                day=np.concatenate([a.day, b.day]))
            xclim_tpu.atmos.tg_mean(_tas(times))


class TestDataCheck:
    def test_check_hourly(self):
        da = _tas(date_range("2000-01-01", freq="h", periods=100))
        datachecks.check_freq(da, "h")

        da = _tas(date_range("2000-01-01", freq="3h", periods=100))
        with pytest.raises(ValidationError):
            datachecks.check_freq(da, "h")
        with pytest.raises(ValidationError):
            datachecks.check_freq(da, ["h", "D"])

        datachecks.check_freq(da, "h", strict=False)
        datachecks.check_freq(da, ["h", "D"], strict=False)
        datachecks.check_freq(da, "3h")
        datachecks.check_freq(da, ["h", "3h"])

        gappy = _tas(date_range("2000-01-01", freq="3h",
                                periods=100)[[0, 1, 4, 6, 10]], n=5)
        with pytest.raises(ValidationError,
                           match="Unable to infer the frequency of"):
            datachecks.check_freq(gappy, "3h")

    def test_common_time(self):
        da = _tas(date_range("2000-01-01", freq="h", periods=100))

        # no inferable frequency
        db = _tas(date_range("2000-01-01", freq="h",
                             periods=100)[[0, 1, 4, 6, 10]], n=5)
        with pytest.raises(
                ValidationError,
                match="Unable to infer the frequency of the time series."):
            datachecks.check_common_time([db, da])

        # not the same frequency
        db = _tas(date_range("2000-01-01", freq="6h", periods=100))
        with pytest.raises(ValidationError,
                           match="Inputs have different frequencies"):
            datachecks.check_common_time([db, da])

        # same frequency, different anchor minutes
        db = _tas(date_range("2000-01-01T00:30", freq="h", periods=100))
        with pytest.raises(
                ValidationError,
                match=r"All inputs have the same frequency \(h\), but they "
                      r"are not anchored on the same minutes"):
            datachecks.check_common_time([db, da])
