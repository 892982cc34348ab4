"""Date-bounded run-length functions and unit-parser edge cases
(reference behaviors: xclim run_length.py:1148-1333, core/units.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.indices import run_length as rl


def bool_series(mask, start="2001-01-01"):
    t = date_range(start, periods=len(mask), freq="D", calendar="noleap")
    return ClimArray(jnp.asarray(np.asarray(mask, dtype=bool)), ("time",),
                     {"time": t}, {}, "m")


class TestDateBoundedRuns:
    def test_first_run_after_date(self):
        m = np.zeros(365, bool)
        m[50:60] = True    # before July 1 (doy 182)
        m[200:210] = True  # after
        da = bool_series(m)
        out = rl.first_run_after_date(da, window=3, date="07-01", freq="YS")
        np.testing.assert_allclose(np.asarray(out.data)[0], 201)  # doy of day 200

    def test_first_run_before_date(self):
        m = np.zeros(365, bool)
        m[50:60] = True
        m[200:210] = True
        da = bool_series(m)
        out = rl.first_run_before_date(da, window=3, date="07-01", freq="YS")
        np.testing.assert_allclose(np.asarray(out.data)[0], 51)

    def test_run_end_after_date(self):
        m = np.zeros(365, bool)
        m[150:220] = True  # run straddling July 1, ends day 219 → end idx 220
        da = bool_series(m)
        out = rl.run_end_after_date(da, window=3, date="07-01", freq="YS")
        v = float(np.asarray(out.data)[0])
        assert 219 <= v <= 221

    def test_no_run_gives_nan(self):
        da = bool_series(np.zeros(365, bool))
        out = rl.first_run_after_date(da, window=3, date="07-01", freq="YS")
        assert np.isnan(np.asarray(out.data)[0])


class TestSeasonMachinery:
    def test_season_start_end_length(self):
        m = np.zeros(365, bool)
        m[100:250] = True
        da = bool_series(m)
        start = rl.season_start(da, window=5, freq="YS", coord="dayofyear")
        end = rl.season_end(da, window=5, freq="YS", coord="dayofyear")
        length = rl.season_length(da, window=5, freq="YS")
        np.testing.assert_allclose(np.asarray(start.data)[0], 101)
        assert 248 <= float(np.asarray(end.data)[0]) <= 252
        assert 145 <= float(np.asarray(length.data)[0]) <= 155

    def test_keep_longest_run(self):
        m = np.zeros(30, bool)
        m[2:5] = True    # len 3
        m[10:20] = True  # len 10 (longest)
        m[25:27] = True
        da = bool_series(m)
        out = np.asarray(rl.keep_longest_run(da).data)
        want = np.zeros(30, bool)
        want[10:20] = True
        np.testing.assert_array_equal(out.astype(bool), want)


class TestUnitsEdgeCases:
    @pytest.mark.parametrize("s,scale", [
        ("1e6 kg m-2 s-1", 1e6),
        ("1E6 kg m-2 s-1", 1e6),
        ("0.5 mm", 0.0005),
        ("2.5e-3 m", 0.0025),
        ("100 km", 1e5),
    ])
    def test_numeric_scalars(self, s, scale):
        from xclim_tpu.core.units import parse_units

        np.testing.assert_allclose(parse_units(s).scale, scale, rtol=1e-9)

    def test_dot_as_multiplier(self):
        from xclim_tpu.core.units import parse_units

        a = parse_units("kg.m-2")
        b = parse_units("kg m-2")
        assert a.dims == b.dims and a.scale == b.scale

    def test_half_mm_per_day_conversion(self):
        from xclim_tpu.core.units import convert_units_to, str2pint

        # the once-buggy case: '0.5 mm' parsed as '5 mm'
        np.testing.assert_allclose(
            convert_units_to(str2pint("0.5 mm/day"), "mm/day"), 0.5)

    def test_agg_units_doymax(self):
        from xclim_tpu.core.units import to_agg_units
        from xclim_tpu.testing import test_timeseries as ts

        tas = ts(np.arange(365, dtype=np.float32), "tas",
                 start="2001-01-01", units="K")
        out = tas.resample("YS").argmax_doy()
        res = to_agg_units(out, tas, "doymax")
        assert res.attrs["units"] == "1"


class TestIORoundtripDeep:
    def test_3d_with_attrs_and_calendar(self, tmp_path):
        from xclim_tpu.io import open_dataset, to_netcdf
        from xclim_tpu.core.dataarray import ClimDataset

        rng = np.random.default_rng(0)
        t = date_range("2001-01-01", periods=100, freq="D",
                       calendar="noleap")
        da = ClimArray(jnp.asarray(rng.normal(280, 5, (100, 3, 4))
                                   .astype(np.float32)),
                       ("time", "lat", "lon"),
                       {"time": t, "lat": np.linspace(-45, 45, 3),
                        "lon": np.linspace(0, 270, 4)},
                       {"units": "K", "standard_name": "air_temperature"},
                       "tas")
        ds = ClimDataset({"tas": da})
        p = tmp_path / "t.nc"
        to_netcdf(ds, p)
        back = open_dataset(p)
        b = back["tas"]
        np.testing.assert_allclose(np.asarray(b.data), np.asarray(da.data),
                                   rtol=1e-6)
        assert b.attrs["units"] == "K"
        assert b.time.calendar in ("noleap", "365_day")
        np.testing.assert_allclose(np.asarray(b.coords["lat"]),
                                   [-45, 0, 45])
        assert b.time.year[0] == 2001 and int(b.time.doy[0]) == 1
