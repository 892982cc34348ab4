"""Generic-realm indicator suite (VERDICT r2 #6), ported from
xclim:tests/test_generic_indicators.py (TestFit/TestReturnLevel/TestStats).
"""

import numpy as np
import pytest

from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.core.options import set_options
from xclim_tpu.indicators import generic


def vals(x):
    return np.asarray(x.values, dtype=np.float64)


def pr_nd(shape=(1000, 1, 2), seed=0):
    rng = np.random.default_rng(seed)
    t = date_range("2000-01-01", periods=shape[0], freq="D",
                   calendar="noleap")
    coords = {"time": t, "lat": np.arange(shape[1]),
              "lon": np.arange(shape[2])}
    return ClimArray(rng.random(shape).astype(np.float32),
                     ("time", "lat", "lon"), coords,
                     {"units": "kg m-2 s-1"}, "pr")


def ndq(seed=1):
    """The reference's ndq_series: (5000 d from 1900, 2, 3) streamflow."""
    rng = np.random.default_rng(seed)
    t = date_range("1900-01-01", periods=5000, freq="D", calendar="noleap")
    coords = {"time": t, "x": np.arange(2), "y": np.arange(3)}
    return ClimArray(rng.lognormal(1.0, 0.5, (5000, 2, 3)).astype(np.float32),
                     ("time", "x", "y"), coords, {"units": "m3 s-1"}, "q")


class TestFit:
    """xclim:tests/test_generic_indicators.py:9."""

    def test_simple(self):
        pr = pr_nd(seed=2)
        ts = generic.stats(pr, freq="YS", op="max")
        p = generic.fit(ts, dist="gumbel_r")
        assert p.attrs["estimator"] == "Maximum likelihood"
        assert "time" not in p.dims

    def test_nan(self, pr_series):
        rng = np.random.default_rng(3)
        r = rng.random(22)
        r[0] = np.nan
        pr = pr_series(r)
        out = generic.fit(pr, dist="norm")
        assert np.isnan(vals(out)[0])
        with set_options(check_missing="skip"):
            out = generic.fit(pr, dist="norm")
            assert not np.isnan(vals(out)[0])

    def test_ndim(self):
        pr = pr_nd(shape=(100, 1, 2), seed=4)
        out = generic.fit(pr, dist="norm")
        assert out.shape == (2, 1, 2)
        assert not np.isnan(vals(out)).any()

    def test_options(self, q_series):
        rng = np.random.default_rng(5)
        q = q_series(rng.random(19))
        out = generic.fit(q, dist="norm")
        assert not np.isnan(vals(out)).any()
        with set_options(check_missing="at_least_n",
                         missing_options={"at_least_n": {"n": 10}}):
            out = generic.fit(q, dist="norm")
        assert not np.isnan(vals(out)).any()


class TestReturnLevel:
    """xclim:tests/test_generic_indicators.py:44."""

    def test_seasonal(self):
        q = ndq(seed=6)
        out = generic.return_level(q, mode="max", t=[2, 5], dist="gamma",
                                   season="DJF")
        assert "winter" in out.attrs["description"]
        assert "gamma" in out.attrs["description"]
        assert out.name == "fa_1maxwinter"
        assert out.shape == (2, 2, 3)  # nrt, nx, ny
        assert not np.isnan(vals(out)).any()

    def test_any_variable(self, pr_series):
        rng = np.random.default_rng(7)
        pr = pr_series(rng.random(100))
        out = generic.return_level(pr, mode="max", t=2, dist="gamma")
        assert out.attrs["units"] == pr.attrs["units"]

    def test_no_indexer(self):
        q = ndq(seed=8)
        out = generic.return_level(q, mode="max", t=[2, 5], dist="gamma")
        assert "annual" in out.attrs["description"]
        assert out.name == "fa_1maxannual"
        assert out.shape == (2, 2, 3)
        assert not np.isnan(vals(out)).any()

    def test_q27(self):
        q = ndq(seed=9)
        out = generic.return_level(q, mode="max", t=2, dist="gamma", window=7)
        assert out.shape == (1, 2, 3)

    def test_empty(self):
        q = ndq(seed=10)
        raw = np.asarray(q.values).copy()
        raw[:, 0, 0] = np.nan
        q = q.copy(data=raw)
        q.attrs["units"] = "m3 s-1"
        out = generic.return_level(q, mode="max", t=2, dist="genextreme",
                                   window=6, freq="YS")
        assert np.isnan(vals(out)[:, 0, 0]).all()


class TestStats:
    """xclim:tests/test_generic_indicators.py:80."""

    @pytest.mark.parametrize("op,word", [("min", "Minimum"),
                                         ("integral", "Integral"),
                                         ("doymin", "Day of minimum")])
    def test_simple(self, pr_series, op, word):
        rng = np.random.default_rng(11)
        pr = pr_series(rng.random(400))
        out = generic.stats(pr, freq="YS", op=op)
        assert out.attrs["long_name"] == f"{word} of variable"

    def test_ndq(self):
        q = ndq(seed=12)
        out = generic.stats(q, freq="YS", op="min", season="MAM")
        assert out.attrs["units"] == "m3 s-1"

    def test_missing(self):
        q = ndq(seed=13)
        raw = np.asarray(q.values).copy()
        # NaN on doy 5 of 1902 (noleap: 1902 starts at day 730)
        raw[730 + 4] = np.nan
        q = q.copy(data=raw)
        q.attrs["units"] = "m3 s-1"
        out = generic.stats(q, op="max", month=1)
        years = out.time.year
        y1900 = vals(out)[years == 1900]
        y1902 = vals(out)[years == 1902]
        assert not np.isnan(y1900).any()
        assert np.isnan(y1902).all()
