"""Synthetic test-data generators (reference: xclim:src/xclim/testing/helpers.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.calendar import TimeIndex, date_range
from xclim_tpu.core.dataarray import ClimArray, ClimDataset
from xclim_tpu.core.variables import VARIABLES

__all__ = ["test_timeseries", "generate_atmos", "test_grid"]

# keep pytest from collecting the helpers as tests
__test__ = False


def test_timeseries(
    values,
    variable: str = "tas",
    start: str = "2000-07-01",
    freq: str = "D",
    units: str | None = None,
    calendar: str = "standard",
    as_dataset: bool = False,
):
    """Build a 1-D ClimArray with correct CF attrs from the variable vocabulary
    (xclim:src/xclim/testing/helpers.py:163-217)."""
    values = np.asarray(values)
    time = date_range(start, periods=len(values), freq=freq, calendar=calendar)
    meta = VARIABLES.get(variable, {})
    attrs = {
        "units": units if units is not None else meta.get("canonical_units", ""),
    }
    if meta.get("standard_name"):
        attrs["standard_name"] = meta["standard_name"]
    if meta.get("cell_methods"):
        attrs["cell_methods"] = meta["cell_methods"]
    da = ClimArray(jnp.asarray(values, dtype=jnp.float32 if values.dtype.kind == "f" or values.dtype.kind == "i" else None),
                   dims=("time",), coords={"time": time}, attrs=attrs, name=variable)
    if as_dataset:
        return ClimDataset({variable: da})
    return da


def test_grid(values, variable: str = "tas", start: str = "2000-01-01", freq: str = "D",
              units: str | None = None, calendar: str = "standard"):
    """(T, Y, X) grid ClimArray from a 3-D numpy array."""
    values = np.asarray(values, dtype=np.float32)
    T, Y, X = values.shape
    time = date_range(start, periods=T, freq=freq, calendar=calendar)
    meta = VARIABLES.get(variable, {})
    attrs = {"units": units if units is not None else meta.get("canonical_units", "")}
    if meta.get("standard_name"):
        attrs["standard_name"] = meta["standard_name"]
    return ClimArray(jnp.asarray(values), dims=("time", "lat", "lon"),
                     coords={"time": time,
                             "lat": np.linspace(-60, 60, Y),
                             "lon": np.linspace(0, 360, X, endpoint=False)},
                     attrs=attrs, name=variable)


def generate_atmos(seed: int = 0, nyears: int = 4, calendar: str = "standard") -> ClimDataset:
    """Small synthetic multivariate daily dataset (tas/tasmax/tasmin/pr)
    — stand-in for the reference's atmosds fixture (testing/helpers.py:35-79)."""
    rng = np.random.default_rng(seed)
    time = date_range("2000-01-01", end=f"{2000 + nyears - 1}-12-31", freq="D", calendar=calendar)
    n = len(time)
    doy = time.doy
    seasonal = 10 * np.cos(2 * np.pi * (doy - 200) / 365.25)
    tas = 283.15 + seasonal + rng.normal(0, 3, n)
    dtr = 5 + rng.normal(0, 1, n).clip(-3, 3)
    tasmax = tas + dtr / 2
    tasmin = tas - dtr / 2
    pr = rng.gamma(0.9, 4e-5, n) * (rng.random(n) < 0.35)

    def mk(name, vals):
        meta = VARIABLES[name]
        return ClimArray(jnp.asarray(vals, dtype=jnp.float32), ("time",), {"time": time},
                         {"units": meta["canonical_units"],
                          "standard_name": meta["standard_name"],
                          "cell_methods": meta["cell_methods"]}, name)

    return ClimDataset({
        "tas": mk("tas", tas),
        "tasmax": mk("tasmax", tasmax),
        "tasmin": mk("tasmin", tasmin),
        "pr": mk("pr", pr),
    })


test_timeseries.__test__ = False  # noqa: E305  — pytest: not a test
test_grid.__test__ = False


class _LazinessGuard:
    """Context manager asserting no host transfer happens inside the block
    (the reference's `assert_lazy` guards against dask compute:
    xclim:src/xclim/testing/helpers.py:220-238). Here it counts device→host
    transfers via jax's transfer guard. Note: on the CPU backend host and
    device memory are one and the guard never fires; it is effective on
    TPU, which is where accidental transfers actually cost."""

    def __enter__(self):
        import jax

        self._cm = jax.transfer_guard_device_to_host("disallow")
        self._cm.__enter__()
        return self

    def __exit__(self, *exc):
        return self._cm.__exit__(*exc)


assert_lazy = _LazinessGuard()
