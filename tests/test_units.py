"""Units engine tests (semantics from xclim:src/xclim/core/units.py and
tests/test_units.py)."""

import numpy as np
import pytest

from xclim_tpu.core.units import (
    Quantity,
    UnitError,
    check_units,
    convert_units_to,
    declare_units,
    parse_units,
    pint2cfunits,
    rate2amount,
    amount2rate,
    amount2lwethickness,
    str2pint,
    to_agg_units,
    units2pint,
)
from xclim_tpu.testing.helpers import test_timeseries


class TestParse:
    @pytest.mark.parametrize(
        "s,cf",
        [
            ("kg m-2 s-1", "kg m-2 s-1"),
            ("mm/day", "mm d-1"),
            ("degC", "degC"),
            ("°C", "degC"),
            ("K", "K"),
            ("W/m^2", "W m-2"),
            ("W m-2", "W m-2"),
            ("%", "%"),
            ("m3 s-1", "m3 s-1"),
            ("", "1"),
            ("1", "1"),
        ],
    )
    def test_cf_roundtrip(self, s, cf):
        assert parse_units(s).to_cf() == cf

    def test_str2pint(self):
        q = str2pint("30 degC")
        assert q.magnitude == 30
        assert q.units.to_cf() == "degC"
        q2 = str2pint("5 mm d-1")
        assert q2.magnitude == 5

    def test_dimensionality(self):
        assert parse_units("mm/day").dims == parse_units("m s-1").dims
        assert parse_units("kg m-2 s-1").dims != parse_units("mm/day").dims


class TestConvert:
    def test_temperature_offset(self):
        q = str2pint("25 degC").to("K")
        assert q.magnitude == pytest.approx(298.15)
        q2 = str2pint("300 K").to("degC")
        assert q2.magnitude == pytest.approx(26.85)
        q3 = str2pint("32 degF").to("degC")
        assert q3.magnitude == pytest.approx(0.0, abs=1e-10)

    def test_scale(self):
        assert str2pint("1 m").to("mm").magnitude == pytest.approx(1000)
        assert str2pint("1 d").to("s").magnitude == pytest.approx(86400)
        assert str2pint("3.6 km/h").to("m/s").magnitude == pytest.approx(1.0)

    def test_delta_in_compound(self):
        # degree-days: degC d → K d is a delta conversion (no offset)
        q = str2pint("10 degC d").to("K d")
        assert q.magnitude == pytest.approx(10)

    def test_hydro(self):
        # 1 kg m-2 s-1 of water = 1 mm/s depth
        q = str2pint("1 kg m-2 s-1").to("mm/s", context="hydro")
        assert q.magnitude == pytest.approx(1.0)
        q2 = str2pint("1 mm/d").to("kg m-2 s-1", context="hydro")
        assert q2.magnitude == pytest.approx(1 / 86400)

    def test_incompatible(self):
        with pytest.raises(UnitError):
            str2pint("1 m").to("s")

    def test_climarray(self):
        tas = test_timeseries(np.array([0.0, 10.0]), "tas", units="degC")
        out = convert_units_to(tas, "K")
        np.testing.assert_allclose(out.values, [273.15, 283.15])
        assert out.attrs["units"] == "K"

    def test_climarray_hydro_infer(self):
        pr = test_timeseries(np.array([1.0]), "pr", units="kg m-2 s-1")
        out = convert_units_to(pr, "mm/d", context="infer")
        np.testing.assert_allclose(out.values, [86400.0])


class TestDeclareUnits:
    def test_check(self):
        tas = test_timeseries(np.array([280.0]), "tas")
        check_units(tas, "[temperature]")
        with pytest.raises(UnitError):
            check_units(tas, "[precipitation]")
        pr = test_timeseries(np.array([1.0]), "pr")
        check_units(pr, "[precipitation]")
        # hydro-flexible: mm/day also accepted as precipitation
        pr2 = test_timeseries(np.array([1.0]), "pr", units="mm/d")
        check_units(pr2, "[precipitation]")
        check_units("5 mm/d", "[precipitation]")

    def test_decorator(self):
        @declare_units(tas="[temperature]", thresh="[temperature]")
        def f(tas, thresh="0 degC"):
            return tas

        tas = test_timeseries(np.array([280.0]), "tas")
        f(tas)
        f(tas, thresh="25 degC")
        with pytest.raises(UnitError):
            f(tas, thresh="25 mm")
        assert f.in_units == {"tas": "[temperature]", "thresh": "[temperature]"}


class TestAggUnits:
    def test_count(self):
        tas = test_timeseries(np.arange(365.0), "tas", units="degC")
        cnt = (tas > 100).sum(dim="time")
        out = to_agg_units(cnt, tas, "count")
        assert out.attrs["units"] == "d"

    def test_integral_degdays(self):
        tas = test_timeseries(np.arange(52.0) + 10, "tas", units="degC", freq="7D")
        tas.attrs["units_metadata"] = "temperature: difference"
        dd = tas.sum(dim="time")
        out = to_agg_units(dd, tas, "integral")
        # 7D sampling reports as one week (xclim:core/units.py:548-551 and
        # its to_agg_units docstring example: 'degC week')
        assert out.attrs["units"] == "degC week"
        np.testing.assert_allclose(out.values, (np.arange(52.0) + 10).sum())
        out_kd = convert_units_to(out, "K d")
        np.testing.assert_allclose(out_kd.values, (np.arange(52.0) + 10).sum() * 7)

    def test_doymax(self):
        tas = test_timeseries(np.arange(10.0), "tas")
        m = tas.max(dim="time")
        out = to_agg_units(m, tas, "doymax")
        assert out.attrs["units"] == "1"
        assert out.attrs["is_dayofyear"] == 1


class TestRateAmount:
    def test_rate2amount_daily(self):
        # the amount unit cancels against the rate's own time denominator:
        # 1 mm/d over a 1-day step is 1 mm, printed as 'mm' directly
        pr = test_timeseries(np.ones(10), "pr", units="mm/d")
        out = rate2amount(pr)
        np.testing.assert_allclose(out.values, np.ones(10))
        assert out.attrs["units"] == "mm"
        out2 = rate2amount(pr, out_units="mm")
        np.testing.assert_allclose(out2.values, np.ones(10))

    def test_rate2amount_monthly(self):
        pr = test_timeseries(np.ones(3), "pr", units="mm/d", start="2000-01-01", freq="MS")
        out = rate2amount(pr, out_units="mm")
        np.testing.assert_allclose(out.values, [31.0, 29.0, 31.0])

    def test_amount2rate_roundtrip(self):
        pr = test_timeseries(np.random.rand(10).astype(np.float32), "pr", units="kg m-2 s-1")
        rt = amount2rate(rate2amount(pr), out_units="kg m-2 s-1")
        np.testing.assert_allclose(rt.values, pr.values, rtol=1e-6)

    def test_amount2lwethickness(self):
        snw = test_timeseries(np.array([100.0]), "snw", units="kg m-2")
        out = amount2lwethickness(snw)
        np.testing.assert_allclose(out.values, [100.0])  # 100 kg m-2 = 100 mm
        assert out.attrs["units"] == "mm"
        assert out.attrs["standard_name"].startswith("lwe_thickness_of_")
