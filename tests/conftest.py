"""Test configuration: force CPU with 8 virtual devices so sharding tests can
exercise a multi-chip mesh without TPU hardware (stand-in for v5p-8; see
SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

import xclim_tpu  # noqa: E402  (import after env setup)
from xclim_tpu.core.calendar import TimeIndex, date_range
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.testing.helpers import test_timeseries


@pytest.fixture
def timeseries():
    return test_timeseries


def _series_fixture(variable, units=None):
    @pytest.fixture
    def _fix():
        def _make(values, start="2000-01-01", freq="D", calendar="standard", units=units):
            return test_timeseries(values, variable=variable, start=start, freq=freq,
                                   calendar=calendar, units=units)
        return _make
    return _fix


tas_series = _series_fixture("tas")
tasmax_series = _series_fixture("tasmax")
tasmin_series = _series_fixture("tasmin")
pr_series = _series_fixture("pr")
prsn_series = _series_fixture("prsn")
q_series = _series_fixture("q")
snd_series = _series_fixture("snd")
snw_series = _series_fixture("snw")
hurs_series = _series_fixture("hurs")
sfcWind_series = _series_fixture("sfcWind")
evspsblpot_series = _series_fixture("evspsblpot")
