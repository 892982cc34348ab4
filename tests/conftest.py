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

# the capability probes' retry backoff exists for transient TUNNEL errors;
# on the CPU test platform a failed Mosaic compile is deterministic, so the
# 5/10 s sleeps only burn suite wall-clock (VERDICT r4 #8: <15 min subset)
import xclim_tpu.ops.pallas.capability as _cap  # noqa: E402

_cap._PROBE_BACKOFF_S = 0.0
from xclim_tpu.core.calendar import TimeIndex, date_range
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.testing.helpers import test_timeseries


# series fixtures live in the package so downstream suites can reuse them
pytest_plugins = ["xclim_tpu.testing.fixtures"]
