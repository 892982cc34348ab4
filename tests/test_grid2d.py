"""2-D (time, lat, lon) grid regression tests: latitude-dependent indices
must accept both 1-D lat vectors and full (lat, lon) grids and agree where
the grids are constant-in-lon."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xclim_tpu import indices as xi
from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray


@pytest.fixture
def grid():
    t = date_range("2001-01-01", periods=730, freq="D", calendar="noleap")
    rng = np.random.default_rng(0)

    def mk(mean, std, units, nm, positive=False):
        v = rng.normal(mean, std, (730, 2, 3)).astype(np.float32)
        if positive:
            v = np.abs(v)
        return ClimArray(jnp.asarray(v), ("time", "lat", "lon"),
                         {"time": t, "lat": np.arange(2),
                          "lon": np.arange(3)}, {"units": units}, nm)

    def lat(shape):
        vals = np.full(shape, 45.0, np.float32)
        dims = ("lat", "lon")[: len(shape)]
        coords = {"lat": np.arange(shape[0])}
        if len(shape) > 1:
            coords["lon"] = np.arange(shape[1])
        return ClimArray(jnp.asarray(vals), dims, coords,
                         {"units": "degrees_north"}, "lat")

    return mk, lat, t


def _close(a, b):
    np.testing.assert_allclose(np.nan_to_num(np.asarray(a.data)),
                               np.nan_to_num(np.asarray(b.data)), rtol=1e-5)


class TestLat2D:
    def test_day_lengths_shapes(self, grid):
        from xclim_tpu.indices.helpers import day_lengths

        mk, lat, t = grid
        dl2 = day_lengths(t, lat((2, 3)))
        assert dl2.dims == ("time", "lat", "lon")
        dl1 = day_lengths(t, lat((2,)))
        np.testing.assert_allclose(np.asarray(dl2.data)[:, :, 0],
                                   np.asarray(dl1.data))

    def test_bedd(self, grid):
        mk, lat, t = grid
        tn, tx = mk(280, 5, "K", "tasmin"), mk(290, 5, "K", "tasmax")
        r2 = xi.biologically_effective_degree_days(tn, tx, lat=lat((2, 3)))
        r1 = xi.biologically_effective_degree_days(tn, tx, lat=lat((2,)))
        assert r2.shape == (2, 2, 3)
        _close(r2, r1)

    def test_potential_evapotranspiration(self, grid):
        mk, lat, t = grid
        tn, tx = mk(280, 5, "K", "tasmin"), mk(290, 5, "K", "tasmax")
        r2 = xi.potential_evapotranspiration(tasmin=tn, tasmax=tx,
                                             lat=lat((2, 3)))
        r1 = xi.potential_evapotranspiration(tasmin=tn, tasmax=tx,
                                             lat=lat((2,)))
        assert r2.shape == (730, 2, 3)
        _close(r2, r1)

    def test_cffwis(self, grid):
        mk, lat, t = grid
        args = (mk(285, 5, "K", "tas"),
                mk(3e-5, 2e-5, "kg m-2 s-1", "pr", True),
                mk(5, 2, "m s-1", "sfcWind", True),
                mk(70, 10, "%", "hurs", True))
        r2 = xi.cffwis_indices(*args, lat=lat((2, 3)))
        r1 = xi.cffwis_indices(*args, lat=lat((2,)))
        for a, b in zip(r2, r1):
            assert a.shape == (730, 2, 3)
            _close(a, b)

    def test_kbdi(self, grid):
        mk, lat, t = grid
        pa = ClimArray(jnp.asarray(np.full((2, 3), 800.0, np.float32)),
                       ("lat", "lon"),
                       {"lat": np.arange(2), "lon": np.arange(3)},
                       {"units": "mm/yr"}, "pr_annual")
        r = xi.keetch_byram_drought_index(
            mk(3e-5, 2e-5, "kg m-2 s-1", "pr", True),
            mk(290, 5, "K", "tasmax"), pr_annual=pa)
        assert r.shape == (730, 2, 3)
        assert np.isfinite(np.asarray(r.data)).all()
