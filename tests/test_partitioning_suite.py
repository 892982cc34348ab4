"""Uncertainty-partitioning logic oracles, ported from the reference's
tests/test_partitioning.py (synthetic constructions and expected values:
test_hawkins_sutton_synthetic :25-68, test_lafferty_sriver_synthetic
:71-101; the file-backed cases are replaced by the same logic on
synthetic cubes). Calling code rewritten for this framework."""

from __future__ import annotations

import numpy as np
import pytest

from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.ensembles import (
    fractional_uncertainty,
    general_partition,
    hawkins_sutton,
    lafferty_sriver,
)


def _unc(u, name):
    names = list(np.asarray(u.coords["uncertainty"]))
    return np.asarray(u.values)[names.index(name)]


def _da(x, dims):
    time = date_range("1970-01-01", periods=x.shape[-1], freq="YS",
                      calendar="noleap")
    coords = {"time": time}
    for i, d in enumerate(dims[:-1]):
        coords[d] = np.arange(x.shape[i])
    return ClimArray(x.astype(np.float32), dims, coords, {"units": "K"}, "tas")


class TestHawkinsSutton:
    """Reference test_partitioning.py:25-68."""

    def _cube(self, rng, drift=0.0):
        sm = np.arange(10, 41, 10)          # scenario mean (4)
        mm = np.arange(-6, 7, 1)            # model mean (13)
        mean = mm[np.newaxis, :] + sm[:, np.newaxis]
        r = rng.standard_normal((4, 13, 60)) + drift * np.arange(60)
        return r + mean[:, :, np.newaxis]

    def test_synthetic(self):
        rng = np.random.default_rng(12345)
        da = _da(self._cube(rng), ("scenario", "model", "time"))
        m, v = hawkins_sutton(da)
        vm = np.asarray(v.values).mean(axis=-1)
        names = list(np.asarray(v.coords["uncertainty"]))

        # mean change relative to the baseline is ~zero
        np.testing.assert_array_almost_equal(
            np.asarray(m.values).mean(), 0, decimal=1)
        # scenarios don't change over time -> scenario uncertainty ~ 0
        np.testing.assert_array_almost_equal(
            vm[names.index("scenario")], 0, decimal=1)
        # model uncertainty > internal variability
        assert vm[names.index("model")] > vm[names.index("variability")]

    def test_multiplicative_time_evolving(self):
        # same absolute slope per scenario but different reference means ->
        # relative scenario spread must grow over time (reference :59-68)
        rng = np.random.default_rng(12345)
        da = _da(self._cube(rng, drift=1.0), ("scenario", "model", "time"))
        m, v = hawkins_sutton(da, kind="*")
        su = _unc(v, "scenario")
        assert su[50:].mean() > su[30:41].mean()

    def test_user_supplied_smooth(self):
        # smoke: a caller-provided smoothed field is accepted (reference :54-56)
        rng = np.random.default_rng(0)
        da = _da(self._cube(rng), ("scenario", "model", "time"))
        sm = da.copy(data=np.asarray(da.values))  # identity "fit"
        m, v = hawkins_sutton(da, sm=sm)
        assert v.shape[0] == 4


class TestLaffertySriver:
    """Reference test_partitioning.py:71-101."""

    def _cube(self, rng):
        sm = np.arange(10, 41, 10)          # scenario mean (4)
        mm = np.arange(-6, 7, 1)            # model mean (13)
        dm = np.arange(-2, 3, 1)            # downscaling mean (5)
        mean = (dm[np.newaxis, np.newaxis, :]
                + mm[np.newaxis, :, np.newaxis]
                + sm[:, np.newaxis, np.newaxis])
        r = rng.standard_normal((4, 13, 5, 60))
        return r + mean[:, :, :, np.newaxis]

    def test_synthetic(self):
        rng = np.random.default_rng(12345)
        da = _da(self._cube(rng), ("scenario", "model", "downscaling", "time"))
        m, v = lafferty_sriver(da)
        vm = np.asarray(v.values).mean(axis=-1)
        names = list(np.asarray(v.coords["uncertainty"]))

        # grand mean is the mean of the construction: mean(sm)=25 (+0-mean rest)
        np.testing.assert_array_almost_equal(
            np.asarray(m.values).mean(), 25, decimal=1)
        assert vm[names.index("model")] > vm[names.index("variability")]
        # downscaling spread (var of dm) is real but smaller than model's
        assert vm[names.index("downscaling")] > 0
        assert vm[names.index("model")] > vm[names.index("downscaling")]

    def test_fractional_uncertainty_sums(self):
        rng = np.random.default_rng(7)
        da = _da(self._cube(rng), ("scenario", "model", "downscaling", "time"))
        _g, u = lafferty_sriver(da)
        fu = fractional_uncertainty(u)
        names = list(np.asarray(fu.coords["uncertainty"]))
        vals = np.asarray(fu.values)
        np.testing.assert_allclose(vals[names.index("total")], 100.0,
                                   atol=1e-3)
        # components sum to the total (no covariance terms in this scheme)
        comp = sum(vals[names.index(n)] for n in
                   ("variability", "model", "scenario", "downscaling"))
        np.testing.assert_allclose(comp, 100.0, atol=1e-2)


class TestGeneralPartition:
    def test_matches_lafferty_sriver_shape(self):
        rng = np.random.default_rng(3)
        sm = np.arange(10, 41, 10)
        mm = np.arange(-6, 7, 1)
        mean = mm[np.newaxis, :] + sm[:, np.newaxis]
        x = rng.standard_normal((4, 13, 60)) + mean[:, :, np.newaxis]
        da = _da(x, ("scenario", "model", "time"))
        g, u = general_partition(da, var_first=["model"],
                                 mean_first=["scenario"])
        names = list(np.asarray(u.coords["uncertainty"]))
        assert "total" in names and "variability" in names


class TestFilters:
    """Reference tests exercise these via the file-backed smoke test
    (test_partitioning.py:15-22); here with synthetic members."""

    def test_concat_hist_and_single_member(self):
        from xclim_tpu.ensembles._filters import (
            _concat_hist,
            _model_in_all_scens,
            _single_member,
        )

        time = date_range("2000-01-01", periods=10, freq="YS",
                          calendar="noleap")
        x = np.arange(3 * 3 * 2 * 10, dtype=np.float32).reshape(3, 3, 2, 10)
        # the reference layout (_filters.py:30-49): historical covers the
        # early period, scenarios the late period
        x[0, :, :, 5:] = np.nan           # historical ends at t=5
        x[1:, :, :, :5] = np.nan          # scenarios start at t=5
        # model C has no data in ssp585 (reference docstring example,
        # _filters.py:86-97); member r2 of model B is missing in ssp245
        x[2, 2, :, :] = np.nan
        x[1, 1, 1, :] = np.nan
        da = ClimArray(x, ("scenario", "model", "member", "time"),
                       {"time": time,
                        "scenario": np.array(["historical", "ssp245",
                                              "ssp585"]),
                        "model": np.array(["A", "B", "C"]),
                        "member": np.array(["r1", "r2"])},
                       {"units": "K"}, "tas")
        # reference pipeline order (test_partitioning.py:18-21):
        # filter models first, then stitch historical, then pick members
        sub = _model_in_all_scens(da)
        # model C dropped: no ssp585 data
        assert list(np.asarray(sub.coords["model"])) == ["A", "B"]

        out = _concat_hist(sub, scenario="historical")
        assert "historical" not in list(np.asarray(out.coords["scenario"]))
        assert out.shape[out.dims.index("scenario")] == 2

        one = _single_member(out)
        assert "member" not in one.dims
        v = np.asarray(one.transpose("scenario", "model", "time").values)
        assert not np.isnan(v).any()   # picked members all have data

    def test_rename_mapping(self):
        from xclim_tpu.ensembles._filters import _model_in_all_scens

        time = date_range("2000-01-01", periods=4, freq="YS",
                          calendar="noleap")
        x = np.ones((2, 3, 4), dtype=np.float32)
        x[1, 2] = np.nan
        da = ClimArray(x, ("scen", "run", "time"),
                       {"time": time, "scen": np.array(["a", "b"]),
                        "run": np.arange(3)}, {"units": "K"}, "tas")
        out = _model_in_all_scens(da, dimensions={"scen": "scenario",
                                                  "run": "model"})
        assert out.dims == ("scen", "run", "time")  # names restored
        assert out.shape[1] == 2                     # run 2 dropped
