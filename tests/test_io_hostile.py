"""Hostile-NetCDF integration battery (VERDICT r2 #8).

The image has no network, so the role of the reference's real-data tests
(ERA5/NRCAN files fetched through nimbus/pooch,
xclim:src/xclim/testing/utils.py:469-569) is filled by a generator that
writes maximally-hostile files — short-int packing with scale/offset,
``_FillValue``/``missing_value`` sentinels (including both at once),
360_day calendars, descending latitudes, wrong ``cell_methods``, degC
units — and round-trips indicators through the real CLI, checking the
output against independently-computed numpy expectations.
"""

import numpy as np
import pytest
from click.testing import CliRunner

from xclim_tpu.cli import cli
from xclim_tpu.io import open_dataset

FILL = -32768


def write_hostile(
    path,
    var="tas",
    nyears=2,
    ny=2,
    nx=3,
    calendar="noleap",
    units="K",
    mean=280.0,
    amp=15.0,
    pack="i2",
    scale=0.05,
    offset=None,
    fill_attr="_FillValue",
    fill_days=(),
    lat_descending=False,
    cell_methods=None,
    time_units="days since 2000-01-01",
    seed=0,
):
    """Write a hostile classic-NetCDF3 file; return the decoded truth array
    (float64, NaN where masked) with shape (time, lat, lon)."""
    from scipy.io import netcdf_file

    ylen = {"noleap": 365, "360_day": 360, "standard": None}[calendar]
    if ylen is None:
        raise ValueError("use noleap/360_day here: deterministic year length")
    T = nyears * ylen
    rng = np.random.default_rng(seed)
    truth = (mean + amp * np.sin(np.arange(T) / 30.0)[:, None, None]
             + rng.normal(0, 2.0, (T, ny, nx)))

    if offset is None:
        offset = mean
    fillv = {"b": -128, "f4": np.float32(FILL)}.get(pack, FILL)
    if pack == "f4":
        raw = truth.astype(np.float32)
        scale_used = None
    else:
        raw = np.round((truth - offset) / scale).astype(pack)
        scale_used = scale
    for d in fill_days:
        raw[d, 0, 0] = fillv
    decoded = raw.astype(np.float64)
    if scale_used is not None:
        # reproduce the reader's float32 unpack arithmetic exactly
        decoded = (raw.astype(np.float32) * np.float32(scale)
                   + np.float32(offset)).astype(np.float64)

    for d in fill_days:
        decoded[d, 0, 0] = np.nan

    lats = np.linspace(60.0, 40.0, ny) if lat_descending else \
        np.linspace(40.0, 60.0, ny)

    with netcdf_file(str(path), "w") as f:
        f.createDimension("time", T)
        f.createDimension("lat", ny)
        f.createDimension("lon", nx)
        tv = f.createVariable("time", "f8", ("time",))
        step = 24.0 if time_units.startswith("hours") else 1.0
        tv[:] = np.arange(T) * step
        tv.units = time_units.encode()
        tv.calendar = calendar.encode()
        lv = f.createVariable("lat", "f4", ("lat",))
        lv[:] = lats.astype(np.float32)
        lv.units = b"degrees_north"
        ov = f.createVariable("lon", "f4", ("lon",))
        ov[:] = np.linspace(0, 10, nx).astype(np.float32)
        ov.units = b"degrees_east"
        v = f.createVariable(var, pack if pack != "f4" else "f", ("time", "lat", "lon"))
        v[:] = raw
        if fill_attr in ("_FillValue", "both"):
            v._FillValue = np.float32(fillv) if pack == "f4" else np.dtype(pack).type(fillv)
        if fill_attr in ("missing_value", "both"):
            v.missing_value = np.float32(fillv) if pack == "f4" else np.dtype(pack).type(fillv)
        if scale_used is not None:
            v.scale_factor = np.float32(scale)
            v.add_offset = np.float32(offset)
        v.units = units.encode()
        v.standard_name = b"air_temperature"
        if cell_methods is not None:
            v.cell_methods = cell_methods.encode()
    return decoded


def yearly_masked(truth, ylen, reducer):
    """numpy expectation under the framework's default missing='any':
    any NaN day in a period -> NaN output for that (year, cell)."""
    nyears = truth.shape[0] // ylen
    out = np.empty((nyears,) + truth.shape[1:])
    for y in range(nyears):
        blk = truth[y * ylen:(y + 1) * ylen]
        val = reducer(blk)
        val = np.where(np.isnan(blk).any(axis=0), np.nan, val)
        out[y] = val
    return out


def run_cli(infile, outfile, *args):
    res = CliRunner().invoke(
        cli, ["-i", str(infile), "-o", str(outfile), *args])
    assert res.exit_code == 0, res.output
    return open_dataset(outfile)


# ---------------------------------------------------------------------------
# decoding-level checks
# ---------------------------------------------------------------------------


class TestHostileDecoding:
    def test_packed_fillvalue(self, tmp_path):
        p = tmp_path / "a.nc"
        truth = write_hostile(p, fill_days=(3, 100))
        a = np.asarray(open_dataset(p)["tas"].values, np.float64)
        assert np.isnan(a[3, 0, 0]) and np.isnan(a[100, 0, 0])
        ok = ~np.isnan(truth)
        np.testing.assert_allclose(a[ok], truth[ok], rtol=1e-6)

    def test_packed_missing_value(self, tmp_path):
        p = tmp_path / "b.nc"
        truth = write_hostile(p, fill_attr="missing_value", fill_days=(7,))
        a = np.asarray(open_dataset(p)["tas"].values, np.float64)
        assert np.isnan(a[7, 0, 0])
        ok = ~np.isnan(truth)
        np.testing.assert_allclose(a[ok], truth[ok], rtol=1e-6)

    def test_both_fill_attrs(self, tmp_path):
        p = tmp_path / "c.nc"
        truth = write_hostile(p, fill_attr="both", fill_days=(1, 2))
        tas = open_dataset(p)["tas"]
        a = np.asarray(tas.values, np.float64)
        assert np.isnan(a[1, 0, 0]) and np.isnan(a[2, 0, 0])
        # packing attrs are consumed, not leaked into metadata
        for k in ("_FillValue", "missing_value", "scale_factor", "add_offset"):
            assert k not in tas.attrs
        ok = ~np.isnan(truth)
        np.testing.assert_allclose(a[ok], truth[ok], rtol=1e-6)

    def test_byte_packed(self, tmp_path):
        p = tmp_path / "d.nc"
        truth = write_hostile(p, pack="b", scale=0.5, amp=10.0, fill_days=())
        a = np.asarray(open_dataset(p)["tas"].values, np.float64)
        np.testing.assert_allclose(a, truth, rtol=1e-6)

    def test_unpacked_float_fill(self, tmp_path):
        p = tmp_path / "e.nc"
        truth = write_hostile(p, pack="f4", fill_days=(42,))
        a = np.asarray(open_dataset(p)["tas"].values, np.float64)
        assert np.isnan(a[42, 0, 0])
        ok = ~np.isnan(truth)
        np.testing.assert_allclose(a[ok], truth[ok], rtol=1e-6)

    def test_360day_calendar(self, tmp_path):
        p = tmp_path / "f.nc"
        write_hostile(p, calendar="360_day", nyears=1)
        tas = open_dataset(p)["tas"]
        assert tas.time.calendar == "360_day"
        assert len(tas.time) == 360
        assert tas.time.year[-1] == 2000
        assert int(tas.time.doy[-1]) == 360

    def test_hours_since_units(self, tmp_path):
        p = tmp_path / "g.nc"
        write_hostile(p, nyears=1, time_units="hours since 2000-01-01")
        tas = open_dataset(p)["tas"]
        assert tas.time.year[0] == 2000 and tas.time.year[-1] == 2000
        assert int(tas.time.doy[1]) == 2  # 24h step decodes to daily

    def test_descending_lat_preserved(self, tmp_path):
        p = tmp_path / "h.nc"
        write_hostile(p, lat_descending=True)
        tas = open_dataset(p)["tas"]
        lat = np.asarray(tas.coords["lat"])
        assert lat[0] > lat[-1]

    def test_scale_only_offset_only(self, tmp_path):
        # scale_factor without add_offset (offset=0) still unpacks
        from scipy.io import netcdf_file

        p = tmp_path / "i.nc"
        with netcdf_file(str(p), "w") as f:
            f.createDimension("time", 4)
            t = f.createVariable("time", "f8", ("time",))
            t[:] = np.arange(4)
            t.units = b"days since 2000-01-01"
            t.calendar = b"noleap"
            v = f.createVariable("tas", "h", ("time",))
            v[:] = np.array([100, 200, 300, 400], np.int16)
            v.scale_factor = np.float32(0.1)
            v.units = b"K"
            w = f.createVariable("pr", "h", ("time",))
            w[:] = np.array([1, 2, 3, 4], np.int16)
            w.add_offset = np.float32(250.0)
            w.units = b"K"
        ds = open_dataset(p)
        np.testing.assert_allclose(np.asarray(ds["tas"].values),
                                   [10, 20, 30, 40], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ds["pr"].values),
                                   [251, 252, 253, 254], rtol=1e-6)


# ---------------------------------------------------------------------------
# CLI end-to-end against numpy expectations
# ---------------------------------------------------------------------------


class TestHostileCLI:
    def test_tg_mean_packed(self, tmp_path):
        p = tmp_path / "in.nc"
        truth = write_hostile(p, fill_days=())
        out = run_cli(p, tmp_path / "out.nc", "tg_mean", "--freq", "YS")
        exp = yearly_masked(truth, 365, lambda b: b.mean(axis=0))
        np.testing.assert_allclose(np.asarray(out["tg_mean"].values), exp,
                                   rtol=1e-5)
        assert out["tg_mean"].attrs["units"] == "K"

    def test_tg_mean_missing_any(self, tmp_path):
        # year 0 cell (0,0) has a fill day -> NaN under missing='any';
        # year 1 and other cells intact
        p = tmp_path / "in.nc"
        truth = write_hostile(p, fill_days=(10,))
        out = run_cli(p, tmp_path / "out.nc", "tg_mean", "--freq", "YS")
        a = np.asarray(out["tg_mean"].values)
        exp = yearly_masked(truth, 365, lambda b: b.mean(axis=0))
        assert np.isnan(a[0, 0, 0]) and not np.isnan(a[1, 0, 0])
        np.testing.assert_allclose(a[~np.isnan(exp)], exp[~np.isnan(exp)],
                                   rtol=1e-5)

    def test_tg_mean_360day(self, tmp_path):
        p = tmp_path / "in.nc"
        truth = write_hostile(p, calendar="360_day")
        out = run_cli(p, tmp_path / "out.nc", "tg_mean", "--freq", "YS")
        exp = yearly_masked(truth, 360, lambda b: b.mean(axis=0))
        np.testing.assert_allclose(np.asarray(out["tg_mean"].values), exp,
                                   rtol=1e-5)

    def test_tx_days_above_degC_thresh(self, tmp_path):
        p = tmp_path / "in.nc"
        truth = write_hostile(p, var="tasmax", mean=295.0, seed=3)
        out = run_cli(p, tmp_path / "out.nc", "tx_days_above",
                      "--thresh", "25 degC", "--freq", "YS")
        exp = yearly_masked(truth, 365,
                            lambda b: (b > 273.15 + 25.0).sum(axis=0).astype(float))
        np.testing.assert_allclose(np.asarray(out["tx_days_above"].values),
                                   exp, atol=0.01)

    def test_frost_days_degC_data(self, tmp_path):
        # data stored in degC; indicator threshold is 0 degC
        p = tmp_path / "in.nc"
        truth = write_hostile(p, var="tasmin", units="degC", mean=2.0,
                              amp=8.0, offset=0.0, scale=0.02, seed=4)
        out = run_cli(p, tmp_path / "out.nc", "frost_days", "--freq", "YS")
        exp = yearly_masked(truth, 365,
                            lambda b: (b < 0.0).sum(axis=0).astype(float))
        np.testing.assert_allclose(np.asarray(out["frost_days"].values),
                                   exp, atol=0.01)

    def test_inverted_lat_roundtrip(self, tmp_path):
        p = tmp_path / "in.nc"
        truth = write_hostile(p, lat_descending=True, seed=5)
        out = run_cli(p, tmp_path / "out.nc", "tg_mean", "--freq", "YS")
        lat = np.asarray(out["tg_mean"].coords["lat"])
        assert lat[0] > lat[-1], "descending lat must survive the round-trip"
        exp = yearly_masked(truth, 365, lambda b: b.mean(axis=0))
        np.testing.assert_allclose(np.asarray(out["tg_mean"].values), exp,
                                   rtol=1e-5)

    def test_bad_cell_methods_warns_not_fails(self, tmp_path):
        # tas marked 'time: maximum' — a cf_compliance warning, not an error
        p = tmp_path / "in.nc"
        truth = write_hostile(p, cell_methods="time: maximum", seed=6)
        with pytest.warns(UserWarning):
            out = run_cli(p, tmp_path / "out.nc", "tg_mean", "--freq", "YS")
        exp = yearly_masked(truth, 365, lambda b: b.mean(axis=0))
        np.testing.assert_allclose(np.asarray(out["tg_mean"].values), exp,
                                   rtol=1e-5)

    def test_chained_on_hostile(self, tmp_path):
        p = tmp_path / "in.nc"
        truth = write_hostile(p, fill_days=(400,), seed=7)
        out = run_cli(p, tmp_path / "out.nc",
                      "tg_mean", "--freq", "YS",
                      "heating_degree_days", "--freq", "YS")
        assert "tg_mean" in out and "heating_degree_days" in out
        a = np.asarray(out["tg_mean"].values)
        assert np.isnan(a[1, 0, 0]) and not np.isnan(a[0, 0, 0])
        exp = yearly_masked(truth, 365, lambda b: b.mean(axis=0))
        m = ~np.isnan(exp)
        np.testing.assert_allclose(a[m], exp[m], rtol=1e-5)

    def test_dataflags_on_hostile(self, tmp_path):
        p = tmp_path / "in.nc"
        write_hostile(p, fill_days=(3,), seed=8)
        res = CliRunner().invoke(cli, ["-i", str(p), "dataflags", "-v", "tas"])
        assert res.exit_code == 0, res.output

    def test_hdf5_packed_cli(self, tmp_path):
        # the same hostility through the h5 reader path
        import h5py

        p = tmp_path / "in.h5nc"
        T = 365
        rng = np.random.default_rng(9)
        truth = 280.0 + rng.normal(0, 5, (T, 2, 2))
        raw = np.round((truth - 280.0) / 0.05).astype(np.int16)
        raw[5, 0, 0] = FILL
        truth = (raw.astype(np.float32) * np.float32(0.05)
                 + np.float32(280.0)).astype(np.float64)
        truth[5, 0, 0] = np.nan
        with h5py.File(p, "w") as f:
            tv = f.create_dataset("time", data=np.arange(T, dtype=np.float64))
            tv.make_scale("time")
            tv.attrs["units"] = "days since 2000-01-01"
            tv.attrs["calendar"] = "noleap"
            lv = f.create_dataset("lat", data=np.array([50.0, 51.0]))
            lv.make_scale("lat")
            ov = f.create_dataset("lon", data=np.array([0.0, 1.0]))
            ov.make_scale("lon")
            v = f.create_dataset("tas", data=raw)
            v.dims[0].attach_scale(tv)
            v.dims[1].attach_scale(lv)
            v.dims[2].attach_scale(ov)
            v.attrs["scale_factor"] = np.float32(0.05)
            v.attrs["add_offset"] = np.float32(280.0)
            v.attrs["_FillValue"] = np.int16(FILL)
            v.attrs["units"] = "K"
        out = run_cli(p, tmp_path / "out.nc", "tg_mean", "--freq", "YS")
        a = np.asarray(out["tg_mean"].values)
        exp = yearly_masked(truth, 365, lambda b: b.mean(axis=0))
        assert np.isnan(a[0, 0, 0])
        m = ~np.isnan(exp)
        np.testing.assert_allclose(a[m], exp[m], rtol=1e-5)
