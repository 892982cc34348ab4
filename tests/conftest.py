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

# persistent XLA compile cache: the suite is compile-bound on a 1-CPU host
# (hundreds of small per-test compiles — min_compile_time must be 0 or the
# cache captures almost nothing; measured on test_percentiles.py: 41.9 s
# cold -> 15.4 s warm). Warm runs land the default subset well under the
# reference's 900 s session budget; delete .jax_cache_cpu for a cold run
# or set XCLIM_TPU_TEST_CACHE=0 to disable
if os.environ.get("XCLIM_TPU_TEST_CACHE", "1") != "0":
    _cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache_cpu")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

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
