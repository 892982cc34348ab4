"""Spatial analogs + data quality flags."""

import numpy as np
import pytest

import jax.numpy as jnp

from xclim_tpu.analog import metrics, spatial_analogs
from xclim_tpu.core.dataarray import ClimArray, ClimDataset
from xclim_tpu.core.dataflags import (
    DataQualityException,
    data_flags,
    ecad_compliant,
    tasmax_below_tasmin,
    temperature_extremely_high,
    values_repeating_for_n_or_more_days,
)
from xclim_tpu.core.calendar import date_range
from xclim_tpu.testing.helpers import test_timeseries


def _sample(rng, n, d, shift=0.0):
    return rng.normal(shift, 1, (n, d)).astype(np.float32)


class TestAnalogMetrics:
    @pytest.mark.parametrize("name", ["seuclidean", "zech_aslan", "szekely_rizzo",
                                      "mahalanobis", "kolmogorov_smirnov", "kldiv",
                                      "nearest_neighbor", "friedman_rafsky"])
    def test_separates_distributions(self, name):
        rng = np.random.default_rng(0)
        x = jnp.asarray(_sample(rng, 80, 2))
        same = jnp.asarray(_sample(rng, 80, 2))
        far = jnp.asarray(_sample(rng, 80, 2, shift=3.0))
        fn = metrics[name]
        if name == "friedman_rafsky":
            d_same = fn(np.asarray(x), np.asarray(same))
            d_far = fn(np.asarray(x), np.asarray(far))
        else:
            d_same = float(fn(x, same))
            d_far = float(fn(x, far))
        assert d_far > d_same

    def test_spatial_analogs(self):
        rng = np.random.default_rng(1)
        n, d, S = 100, 2, 5
        time = date_range("2000-01-01", periods=n, freq="D")
        target = ClimArray(jnp.asarray(_sample(rng, n, d)), ("time", "variables"),
                           {"time": time}, {}, "target")
        cand = np.stack([_sample(rng, n, d, shift=s) for s in range(S)], axis=-1)
        candidates = ClimArray(jnp.asarray(cand), ("time", "variables", "site"),
                               {"time": time, "site": np.arange(S)}, {}, "cand")
        out = spatial_analogs(target, candidates, method="szekely_rizzo")
        v = np.asarray(out.values)
        assert v.shape == (S,)
        assert np.argmin(v) == 0  # unshifted candidate most similar


class TestDataFlags:
    def test_tasmax_below_tasmin(self, tasmax_series, tasmin_series):
        tx = tasmax_series(np.array([290.0, 280.0]))
        tn = tasmin_series(np.array([285.0, 285.0]))
        out = tasmax_below_tasmin(tx, tn)
        np.testing.assert_array_equal(out.values, [False, True])

    def test_extremes(self, tas_series):
        tas = tas_series(np.array([280.0, 340.0]))
        out = temperature_extremely_high(tas)
        np.testing.assert_array_equal(out.values, [False, True])

    def test_repeating(self, pr_series):
        vals = np.random.default_rng(0).random(30).astype(np.float32)
        vals[10:17] = 0.123  # 7 identical values
        pr = pr_series(vals)
        out = values_repeating_for_n_or_more_days(pr, n=5)
        v = np.asarray(out.values)
        assert v[10:17].all()
        assert not v[:9].any()

    def test_data_flags_driver(self, tas_series):
        tas = tas_series(np.full(40, 280.0))
        flags = data_flags(tas)
        assert len(flags.data_vars) > 0
        # constant series triggers the repetition flag (keys carry the
        # reference's generated names since the r5 parity pass)
        assert bool(np.asarray(flags["values_repeating_for_5_or_more_days"].values))

    def test_raise_flags(self, tas_series):
        tas = tas_series(np.full(40, 400.0))  # extremely hot
        with pytest.raises(DataQualityException):
            data_flags(tas, raise_flags=True)

    def test_ecad_compliant(self, tas_series, pr_series):
        rng = np.random.default_rng(2)
        ds = ClimDataset({
            "tas": tas_series(280 + rng.normal(0, 3, 40).astype(np.float32)),
            "pr": pr_series(rng.gamma(1, 2e-5, 40).astype(np.float32)),
        })
        out = ecad_compliant(ds)
        assert "ecad_qc_flag" in out
        assert bool(np.asarray(out["ecad_qc_flag"].values))
