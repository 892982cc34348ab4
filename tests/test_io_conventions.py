"""CF packing-convention decoding tests (VERDICT r1 missing #5): real-world
NetCDF files ship short-int packed data with scale_factor/add_offset and
_FillValue/missing_value sentinels (reference behavior: xarray's
mask_and_scale decoding used throughout xclim's test data).

Covers all three reader paths: the native C++ mmap nc3 reader, the scipy
netcdf_file fallback, and the h5py netCDF4/HDF5 path.
"""

import numpy as np
import pytest

from xclim_tpu.io import open_dataset
from xclim_tpu.io.netcdf import _open_nc3, _open_nc3_native


def _write_packed_nc3(path, with_missing_value=False):
    from scipy.io import netcdf_file

    f = netcdf_file(str(path), "w")
    f.createDimension("time", 365)
    f.createDimension("lat", 3)
    tv = f.createVariable("time", "f8", ("time",))
    tv[:] = np.arange(365)
    tv.units = b"days since 2000-01-01"
    tv.calendar = b"noleap"
    v = f.createVariable("tas", "h", ("time", "lat"))
    raw = (np.round((280.0 + np.sin(np.arange(365 * 3) / 50.0).reshape(365, 3)
                     * 15 - 250.0) / 0.1)).astype(np.int16)
    raw[10, 1] = -32768
    raw[200, 0] = -32768
    v[:] = raw
    if with_missing_value:
        v.missing_value = np.int16(-32768)
    else:
        v._FillValue = np.int16(-32768)
    v.scale_factor = np.float32(0.1)
    v.add_offset = np.float32(250.0)
    v.units = b"K"
    v.standard_name = b"air_temperature"
    f.close()
    return raw


class TestPackedNC3:
    def test_public_open(self, tmp_path):
        p = tmp_path / "packed.nc"
        raw = _write_packed_nc3(p)
        tas = open_dataset(p)["tas"]
        a = np.asarray(tas.values)
        assert a.dtype.kind == "f"
        assert np.isnan(a[10, 1]) and np.isnan(a[200, 0])
        ok = raw != -32768
        np.testing.assert_allclose(a[ok], raw[ok] * 0.1 + 250.0, rtol=1e-5)
        # packing attrs consumed, science attrs kept
        assert "scale_factor" not in tas.attrs
        assert "_FillValue" not in tas.attrs
        assert tas.attrs["units"] == "K"
        assert tas.attrs["standard_name"] == "air_temperature"

    def test_native_reader(self, tmp_path):
        pytest.importorskip("xclim_tpu.io.native")
        p = tmp_path / "packed.nc"
        raw = _write_packed_nc3(p)
        tas = _open_nc3_native(p, True)["tas"]
        a = np.asarray(tas.values)
        assert np.isnan(a[10, 1])
        ok = raw != -32768
        np.testing.assert_allclose(a[ok], raw[ok] * 0.1 + 250.0, rtol=1e-5)

    def test_scipy_fallback(self, tmp_path, monkeypatch):
        p = tmp_path / "packed.nc"
        raw = _write_packed_nc3(p)
        import xclim_tpu.io.netcdf as mod

        def boom(path, decode_times):
            raise RuntimeError("native disabled for test")

        monkeypatch.setattr(mod, "_open_nc3_native", boom)
        tas = _open_nc3(p, True)["tas"]
        a = np.asarray(tas.values)
        assert np.isnan(a[10, 1])
        ok = raw != -32768
        np.testing.assert_allclose(a[ok], raw[ok] * 0.1 + 250.0, rtol=1e-5)

    def test_missing_value_attr(self, tmp_path):
        """Legacy missing_value is honored like _FillValue."""
        p = tmp_path / "packed_mv.nc"
        _write_packed_nc3(p, with_missing_value=True)
        tas = open_dataset(p)["tas"]
        a = np.asarray(tas.values)
        assert np.isnan(a[10, 1]) and np.isnan(a[200, 0])
        assert "missing_value" not in tas.attrs

    def test_end_to_end_indicator(self, tmp_path):
        """A packed file drives a real indicator; masked steps become NaN
        inputs handled by the missing-value machinery."""
        import xclim_tpu.indices as xci

        p = tmp_path / "packed.nc"
        _write_packed_nc3(p)
        tas = open_dataset(p)["tas"]
        out = xci.tg_mean(tas, freq="MS")
        v = np.asarray(out.values)
        assert v.shape == (12, 3)
        assert np.isfinite(v).all()
        assert out.attrs["units"] == "K"


class TestPackedHDF5:
    def test_h5_packed(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        p = tmp_path / "packed.h5.nc"
        raw = np.arange(24, dtype=np.int16).reshape(12, 2)
        raw[5, 0] = -1
        with h5py.File(p, "w") as f:
            t = f.create_dataset("time", data=np.arange(12.0))
            t.make_scale("time")
            t.attrs["units"] = "days since 2000-01-01"
            t.attrs["calendar"] = "noleap"
            la = f.create_dataset("lat", data=np.array([10.0, 20.0]))
            la.make_scale("lat")
            d = f.create_dataset("pr", data=raw)
            d.dims[0].attach_scale(t)
            d.dims[1].attach_scale(la)
            d.attrs["_FillValue"] = np.int16(-1)
            d.attrs["scale_factor"] = np.float32(0.5)
            d.attrs["add_offset"] = np.float32(100.0)
            d.attrs["units"] = "mm"
        pr = open_dataset(p)["pr"]
        a = np.asarray(pr.values)
        assert np.isnan(a[5, 0])
        ok = raw != -1
        np.testing.assert_allclose(a[ok], raw[ok] * 0.5 + 100.0, rtol=1e-6)
        assert pr.attrs["units"] == "mm"
