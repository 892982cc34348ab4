"""Units-engine oracle battery ported from the reference suite
(xclim:tests/test_units.py) — exact values and unit strings, rewritten on
the ClimArray API. One case per reference test; fixture data preserved."""

import numpy as np
import pytest

from xclim_tpu.core.units import (
    UnitError,
    amount2lwethickness,
    amount2rate,
    check_units,
    convert_units_to,
    declare_relative_units,
    declare_units,
    infer_context,
    infer_sampling_units,
    lwethickness2amount,
    parse_units,
    pint2cfattrs,
    pint2cfunits,
    pint_multiply,
    rate2amount,
    str2pint,
    to_agg_units,
    units2pint,
)
from xclim_tpu.testing.helpers import test_timeseries


class TestUnitsAlgebra:
    """xclim:tests/test_units.py TestUnits / TestUnitConversion."""

    def test_temperature_aliases(self):
        for alias in ("Celsius", "degC", "C", "deg_C", "celsius", "°C"):
            assert parse_units(alias).to_cf() == "degC"

    def test_hydro(self):
        with pytest.raises(UnitError):
            convert_units_to("1 kg m-2", "m")
        q = convert_units_to("1 kg m-2 s-1", "mm/day", context="hydro")
        np.testing.assert_allclose(q, 86400.0)

    def test_fraction(self):
        # 5 percent == 0.05 dimensionless (test_units.py::test_fraction)
        assert convert_units_to("5 %", "") == pytest.approx(0.05)
        da = test_timeseries(np.array([10.0]), "tas", units="%")
        out = convert_units_to(da, "")
        np.testing.assert_allclose(out.values, [0.1])

    def test_offset_confusion(self):
        # "degC days" are delta-degrees: 10 degC days == 10 K days
        assert convert_units_to("10 degC days", "K days") == pytest.approx(10)

    def test_pint2cfunits(self):
        assert pint2cfunits(parse_units("mm/d")) == "mm d-1"
        assert pint2cfunits(parse_units("percent")) == "%"

    def test_units2pint(self):
        pr = test_timeseries(np.array([1.0, 2.0]), "pr")
        assert pint2cfunits(units2pint(pr)) == "kg m-2 s-1"
        assert pint2cfunits(units2pint("m^3 s-1")) == "m3 s-1"
        assert pint2cfunits(units2pint("%")) == "%"
        assert pint2cfunits(units2pint("1")) == "1"

    def test_pint_multiply(self):
        # (kg m-2 s-1) × 1 day: data × 86400, symbols cancel to kg m-2
        a = test_timeseries(np.array([1.0, 2.0, 3.0]), "pr")
        out = pint_multiply(a, str2pint("1 d"))
        np.testing.assert_allclose(out.values, [86400.0, 172800.0, 259200.0])
        assert out.attrs["units"] == "kg m-2"

    def test_str2pint(self):
        q = str2pint("-0.78 m")
        assert q.magnitude == pytest.approx(-0.78)
        assert q.units.to_cf() == "m"
        assert str2pint("m kg/s").magnitude == 1
        q2 = str2pint("11.8 degC days")
        assert q2.magnitude == pytest.approx(11.8)
        assert q2.units.dims == parse_units("K d").dims
        q3 = str2pint("nan m^2 K^-3")
        assert np.isnan(q3.magnitude)
        assert q3.units.dims == parse_units("m2 K-3").dims


class TestCheckUnitsComparison:
    """xclim:tests/test_units.py TestCheckUnits."""

    def test_basic(self):
        check_units("%", "[]")
        check_units("mm/day", "[precipitation]")
        check_units("mm/s", "[precipitation]")
        check_units("kg/m2/s", "[precipitation]")
        check_units("m3/s", "[discharge]")
        check_units("m/s", "[speed]")
        check_units("km/h", "[speed]")
        check_units("degC", "[temperature]")
        with pytest.raises(UnitError):
            check_units("mm", "[precipitation]")
        with pytest.raises(UnitError):
            check_units("m3", "[discharge]")

    def test_comparison(self):
        # same dimensionality across unit systems is fine
        check_units("mm/day", "m/hour")
        with pytest.raises(UnitError):
            check_units("mm/day", "m")
        t1 = test_timeseries(np.array([1.0]), "tas", units="degC")
        t2 = test_timeseries(np.array([1.0]), "tas", units="degK")
        check_units(t1, t2.attrs["units"])
        with pytest.raises(UnitError):
            check_units(t1, "2 mm")
        with pytest.raises(UnitError):
            # no context to bridge mass flux and thickness rate
            check_units("kg/m2/s", "mm/day")


@pytest.mark.parametrize(
    "in_u,opname,op,exp,exp_u",
    [
        ("m/h", "sum", "integral", 8760, "m"),
        ("m/h", "sum", "sum", 365, "m/h"),
        ("K", "mean", "mean", 1, "K"),
        ("", "sum", "count", 365, "d"),
        ("kg m-2", "var", "var", 0, "kg2 m-4"),
        ("degC", "max", "doymax", None, "1"),
        ("degC", "sum", "integral", 365, ("degC d", "d degC")),
        ("degF", "sum", "integral", 365, ("d degF", "degF d")),
    ],
)
def test_to_agg_units(in_u, opname, op, exp, exp_u):
    """xclim:tests/test_units.py::test_to_agg_units, same matrix."""
    da = test_timeseries(np.ones(365), "tas", units=in_u, start="1993-01-01")
    if in_u and parse_units(in_u).is_temperature:
        da.attrs["units_metadata"] = "temperature: difference"
    agg = getattr(da, opname)(dim="time")
    out = to_agg_units(agg, da, op)
    if exp is not None:
        np.testing.assert_allclose(np.asarray(out.values), exp)
    if isinstance(exp_u, tuple):
        assert out.attrs["units"] in exp_u
    else:
        assert out.attrs["units"] == exp_u


def test_pint2cfattrs():
    """xclim:tests/test_units.py::test_pint2cfattrs."""
    attrs = pint2cfattrs(parse_units("degK"), is_difference=True)
    assert attrs == {"units": "K", "units_metadata": "temperature: difference"}
    attrs = pint2cfattrs(parse_units("m"), is_difference=True)
    assert "units_metadata" not in attrs
    attrs = pint2cfattrs(parse_units("delta_degC"))
    assert attrs == {"units": "degC",
                     "units_metadata": "temperature: difference"}


def test_temp_difference_roundtrip():
    """xclim:tests/test_units.py::test_temp_difference_rountrip."""
    da = test_timeseries(np.array([1.0]), "tas", units="degC")
    da.attrs["units_metadata"] = "temperature: difference"
    pu = units2pint(da)
    assert pu.delta
    assert pint2cfattrs(pu) == {"units": "degC",
                                "units_metadata": "temperature: difference"}


@pytest.mark.parametrize(
    "freq,expm,expu",
    [("3D", 3, "d"), ("MS", 1, "month"), ("QS-DEC", 3, "month"),
     ("W", 1, "week"), ("min", 1, "min")],
)
def test_infer_sampling_units(freq, expm, expu):
    """xclim:tests/test_units.py::test_infer_sampling_units."""
    da = test_timeseries(np.arange(10.0), "tas", start="2025-04-14", freq=freq)
    assert infer_sampling_units(da) == (expm, expu)


def test_infer_sampling_units_errors():
    da = test_timeseries(np.arange(10.0), "tas")
    da = da.isel(time=[0, 1, 5, 6])
    with pytest.raises(ValueError, match="Unable to find"):
        infer_sampling_units(da)


@pytest.mark.parametrize(
    "std_name,dim,exp",
    [
        ("precipitation_flux", None, "hydro"),
        ("snowfall_flux", None, "none"),
        ("air_temperature", "[precipitation]", "hydro"),
        (None, None, "none"),
    ],
)
def test_infer_context(std_name, dim, exp):
    """xclim:tests/test_units.py::test_infer_context."""
    assert infer_context(std_name, dim) == exp


class TestRateAmountExact:
    """xclim:tests/test_units.py::test_rate2amount / test_amount2rate."""

    def test_rate2amount_daily(self):
        pr = test_timeseries(np.ones(365 + 366 + 365), "pr",
                             start="2019-01-01")
        am = rate2amount(pr)
        np.testing.assert_array_equal(np.asarray(am.values), 86400.0)
        assert am.attrs["standard_name"] == "precipitation_amount"

    def test_rate2amount_resampled(self):
        pr = test_timeseries(np.ones(365 + 366 + 365), "pr",
                             start="2019-01-01")
        pr_ms = pr.resample("MS").mean()
        pr_ms.attrs["units"] = pr.attrs["units"]
        am_ms = rate2amount(pr_ms)
        np.testing.assert_allclose(np.asarray(am_ms.values)[:4],
                                   86400.0 * np.array([31, 28, 31, 30]))
        pr_ys = pr.resample("YS").mean()
        pr_ys.attrs["units"] = pr.attrs["units"]
        am_ys = rate2amount(pr_ys)
        np.testing.assert_allclose(np.asarray(am_ys.values),
                                   86400.0 * np.array([365, 366, 365]))

    @pytest.mark.parametrize("srcfreq,exp",
                             [("h", 3600.0), ("min", 60.0), ("s", 1.0)])
    def test_rate2amount_subdaily(self, srcfreq, exp):
        pr = test_timeseries(np.ones(1000), "pr", start="2019-01-01",
                             freq=srcfreq)
        am = rate2amount(pr)
        np.testing.assert_allclose(np.asarray(am.values), exp)

    def test_amount2rate_roundtrip_resampled(self):
        pr = test_timeseries(np.ones(365 + 366 + 365), "pr",
                             start="2019-01-01")
        am = rate2amount(pr)
        np.testing.assert_allclose(np.asarray(amount2rate(am).values),
                                   np.asarray(pr.values))
        am_ms = am.resample("MS").sum()
        am_ms.attrs["units"] = am.attrs["units"]
        np.testing.assert_allclose(np.asarray(amount2rate(am_ms).values), 1.0)
        am_ys = am.resample("YS").sum()
        am_ys.attrs["units"] = am.attrs["units"]
        np.testing.assert_allclose(np.asarray(amount2rate(am_ys).values), 1.0)

    def test_amount2lwethickness_roundtrip(self):
        snw = test_timeseries(np.ones(365), "snw", start="2019-01-01")
        swe = amount2lwethickness(snw, out_units="mm")
        assert swe.attrs["standard_name"] == \
            "lwe_thickness_of_surface_snow_amount"
        np.testing.assert_allclose(np.asarray(swe.values), 1.0)
        back = lwethickness2amount(swe)
        assert back.attrs["standard_name"] == "surface_snow_amount"


class TestDeclareUnits:
    """xclim:tests/test_units.py::test_declare_units /
    test_declare_relative_units."""

    def test_quantified_must_be_declared(self):
        with pytest.raises(ValueError):
            @declare_units(pr="[precipitation]",
                           evspsblpot="[precipitation]")
            def dryness_index(pr, evspsblpot, lat=None,
                              wo: "Quantified" = "200 mm",
                              freq: str = "YS"):
                pass

    def test_declare_relative_units(self):
        def index(data, thresh, dthreshdt):
            return None

        ir = declare_relative_units(thresh="<data>",
                                    dthreshdt="<data>/[time]")(index)
        assert hasattr(ir, "relative_units")

        full_mm = declare_units(data="mm")(ir)
        assert full_mm.in_units == {"data": "mm", "thresh": "(mm)",
                                    "dthreshdt": "(mm)/[time]"}
        full_area = declare_units(data="[area]")(ir)
        assert full_area.in_units == {"data": "[area]",
                                      "thresh": "([area])",
                                      "dthreshdt": "([area])/[time]"}
        # compatible magnitudes pass, wrong dimensions raise
        full_mm("1 mm", "2 km", "3 mm/s")
        with pytest.raises(UnitError):
            full_mm("1 mm", "2 Pa", "3 mm/s")
        # call-time check of the bracketed-ref composition ([area] → ([area]))
        full_area("1 m2", "2 km2", "3 m2/s")
        with pytest.raises(UnitError):
            full_area("1 m2", "2 m", "3 m2/s")

    def test_declare_relative_units_slash_ref(self):
        """A referenced declaration containing '/' must keep its meaning
        after composition — '(mm/day)' is a rate, not mm·day."""
        def index(data, thresh, dthreshdt):
            return None

        ir = declare_relative_units(thresh="<data>",
                                    dthreshdt="<data>/[time]")(index)
        full = declare_units(data="mm/day")(ir)
        # correct rate threshold passes; an amount must raise
        full("1 mm/day", "2 mm/day", "3 mm/day/day")
        with pytest.raises(UnitError):
            full("1 mm/day", "2 mm", "3 mm/day/day")
        with pytest.raises(UnitError):
            # (mm/day)/[time] is T^-2·L — a bare rate must not slip through
            full("1 mm/day", "2 mm/day", "3 mm/day")
