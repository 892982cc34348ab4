"""Data-flags oracle battery ported from the reference suite
(xclim:tests/test_flags.py) — same data, flag names and expected verdicts,
rewritten on the ClimArray/ClimDataset API."""

import numpy as np
import pytest

from xclim_tpu.core import dataflags as df
from xclim_tpu.core._exceptions import ValidationError
from xclim_tpu.core.dataarray import ClimDataset

K2C = 273.15


def _val(flagged, name):
    v = flagged[name]
    return None if v is None else bool(np.asarray(v.values).any())


class TestDataFlags:
    @pytest.mark.parametrize(
        "vars_dropped, flags",
        [
            (["tasmin"], dict(tas_exceeds_tasmax=False, tas_below_tasmin=None)),
            (["tasmax"], dict(tas_exceeds_tasmax=None, tas_below_tasmin=False)),
            ([], dict(tas_exceeds_tasmax=False, tas_below_tasmin=False)),
        ],
    )
    def test_tas_temperature_flags(self, vars_dropped, flags, tas_series,
                                   tasmax_series, tasmin_series):
        ds = ClimDataset()
        for series, val in zip([tas_series, tasmax_series, tasmin_series],
                               [0, 10, -10]):
            vals = val + K2C + np.sin(2 * np.pi * np.arange(366 * 3) / 366)
            arr = series(vals.astype("float32"), start="1971-01-01")
            ds[arr.name] = arr
        for name in vars_dropped:
            del ds.data_vars[name]

        flagged = df.data_flags(ds["tas"], ds)
        assert _val(flagged, "temperature_extremely_high") is False
        assert _val(flagged, "temperature_extremely_low") is False
        assert _val(flagged, "values_repeating_for_5_or_more_days") is False
        assert _val(
            flagged, "outside_5_standard_deviations_of_climatology") is False
        for flag, val in flags.items():
            assert _val(flagged, flag) is val

    def test_pr_precipitation_flags(self, pr_series):
        pr = pr_series(np.zeros(365, dtype="float32"), start="1971-01-01")
        data = pr.data + np.float32(1 / 3600 / 24)
        data = data.at[0:7].add(10 / 3600 / 24).at[-7:].add(11 / 3600 / 24)
        pr = pr.copy(data=data)

        flagged = df.data_flags(pr)
        assert _val(flagged, "negative_accumulation_values") is False
        assert _val(flagged, "very_large_precipitation_events") is False
        assert _val(
            flagged, "values_eq_5_repeating_for_5_or_more_days") is False
        assert _val(
            flagged, "values_eq_1_repeating_for_10_or_more_days") is True

    def test_suspicious_pr_data(self, pr_series):
        bad_pr = pr_series(np.zeros(365, dtype="float32"), start="1971-01-01")
        data = bad_pr.data
        data = data.at[8].set(-1e-6)                 # negative values
        data = data.at[120].set(301 / 3600 / 24)     # 301 mm/day
        data = data.at[121:141].set(1 / 3600 / 24)   # 1 mm/day
        data = data.at[200:300].set(5 / 3600 / 24)   # 5 mm/day
        bad_pr = bad_pr.copy(data=data)

        flagged = df.data_flags(bad_pr)
        assert _val(flagged, "negative_accumulation_values") is True
        assert _val(flagged, "very_large_precipitation_events") is True
        assert _val(
            flagged, "values_eq_1_repeating_for_10_or_more_days") is True
        assert _val(
            flagged, "values_eq_5_repeating_for_5_or_more_days") is True

    def test_suspicious_tas_data(self, tas_series, tasmax_series,
                                 tasmin_series):
        bad_ds = ClimDataset()
        for series, val in zip([tas_series, tasmax_series, tasmin_series],
                               [0, 10, -10]):
            vals = val + K2C + np.sin(2 * np.pi * np.arange(366 * 7) / 366)
            arr = series(vals.astype("float32"), start="1971-01-01")
            bad_ds[arr.name] = arr

        # swap entire variable arrays
        tmin_data = bad_ds["tasmin"].data
        bad_ds["tasmin"] = bad_ds["tasmin"].copy(data=bad_ds["tasmax"].data)
        bad_ds["tasmax"] = bad_ds["tasmax"].copy(data=tmin_data)

        bad_tas = bad_ds["tas"].data
        bad_tas = bad_tas.at[5].set(58 + K2C)         # >5 sigma fluke
        bad_tas = bad_tas.at[600:610].set(80 + K2C)   # repeating hot extreme
        bad_tas = bad_tas.at[950].set(-95 + K2C)      # cold extreme
        bad_ds["tas"] = bad_ds["tas"].copy(data=bad_tas)

        flagged = df.data_flags(bad_ds["tas"], bad_ds)
        assert _val(flagged, "temperature_extremely_high") is True
        assert _val(flagged, "temperature_extremely_low") is True
        assert _val(flagged, "values_repeating_for_5_or_more_days") is True
        assert _val(
            flagged, "outside_5_standard_deviations_of_climatology") is True
        assert _val(flagged, "tas_exceeds_tasmax") is True
        assert _val(flagged, "tas_below_tasmin") is True

    def test_raises(self, tasmax_series, tasmin_series):
        bad_ds = ClimDataset()
        for series, val in zip([tasmax_series, tasmin_series], [10, -10]):
            vals = val + K2C + np.sin(2 * np.pi * np.arange(366 * 3) / 366)
            arr = series(vals.astype("float32"), start="1971-01-01")
            bad_ds[arr.name] = arr

        # not yet suspicious
        df.data_flags(bad_ds["tasmax"], bad_ds, raise_flags=True)

        # swap entire variable arrays
        tmin_data = bad_ds["tasmin"].data
        bad_ds["tasmin"] = bad_ds["tasmin"].copy(data=bad_ds["tasmax"].data)
        bad_ds["tasmax"] = bad_ds["tasmax"].copy(data=tmin_data)

        with pytest.raises(
                df.DataQualityException,
                match="Maximum temperature values found below minimum "
                      "temperatures."):
            df.data_flags(bad_ds["tasmax"], bad_ds, raise_flags=True)

    def test_names(self, pr_series):
        pr = pr_series(np.zeros(365, dtype="float32"), start="1971-01-01")
        flgs = df.data_flags(
            pr,
            flags={
                "values_op_thresh_repeating_for_n_or_more_days": {
                    "op": "==", "n": 5, "thresh": "-5.1 mm d-1"}
            },
        )
        assert (list(flgs.data_vars.keys())[0]
                == "values_eq_minus5point1_repeating_for_5_or_more_days")

    def test_unregistered_variable_raises(self, tas_series):
        odd = tas_series(np.zeros(365, dtype="float32") + K2C,
                         start="1971-01-01").rename("notavariable")
        with pytest.raises(NotImplementedError,
                           match="checks do not exist"):
            df.data_flags(odd, raise_flags=True)
        assert len(df.data_flags(odd)) == 0


class TestSpecificDischarge:
    # the reference uses a 1e-7 epsilon; device arrays are float32 here, so
    # the probe values use an f32-representable margin instead
    @pytest.mark.parametrize(
        "value, thresh, flag_expected",
        [(100.001, "100 m/s", True), (99.999, "100 m/s", False),
         (100.001, "100000 m**3/day", None)],
    )
    def test_variable_specific_discharge(self, value, thresh, flag_expected):
        from xclim_tpu.testing.helpers import test_timeseries

        qspec = test_timeseries(np.ones(365, dtype="float64") * 10, "qspec",
                                start="2000-01-01", units="m/s")
        qspec = qspec.copy(data=qspec.data.at[300].set(value))

        if flag_expected is None:
            with pytest.raises(ValidationError):
                df.specific_discharge_extremely_high(qspec, thresh=thresh)
        else:
            flagged = df.specific_discharge_extremely_high(qspec,
                                                           thresh=thresh)
            if flag_expected:
                assert bool(np.asarray(flagged.values).any())
                assert (f"found above {thresh}"
                        in flagged.attrs["description"])
            else:
                assert not bool(np.asarray(flagged.values).any())
