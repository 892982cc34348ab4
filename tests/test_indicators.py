"""Indicator engine tests (reference: xclim tests/test_indicators.py)."""

import numpy as np
import pytest

import xclim_tpu
from xclim_tpu import atmos
from xclim_tpu.core._exceptions import MissingVariableError, ValidationError
from xclim_tpu.core.dataarray import ClimDataset
from xclim_tpu.core.indicator import registry
from xclim_tpu.core.options import set_options


class TestCallPipeline:
    def test_basic_call(self, tas_series):
        tas = tas_series(np.full(365, 280.0), start="2001-01-01")
        out = atmos.tg_mean(tas, freq="MS")
        assert out.name == "tg_mean"
        assert out.attrs["units"] == "K"
        assert out.attrs["long_name"] == "Mean daily mean temperature"
        assert "monthly mean of daily mean temperature" in out.attrs["description"].lower()
        assert out.attrs["cell_methods"] == "time: mean over days"
        assert "tg_mean" in out.attrs["history"]
        np.testing.assert_allclose(out.values, 280.0)

    def test_units_conversion_output(self, tas_series):
        tas = tas_series(np.full(365, 20.0), units="degC", start="2001-01-01")
        out = atmos.tg_mean(tas, freq="YS")
        # declared output units are K
        assert out.attrs["units"] == "K"
        np.testing.assert_allclose(out.values, 293.15, rtol=1e-6)

    def test_threshold_formatting(self, tasmax_series):
        tx = tasmax_series(np.full(365, 300.0), start="2001-01-01")
        out = atmos.tx_days_above(tx, thresh="25.0 degC", freq="YS")
        assert "25.0 degC" in out.attrs["long_name"]
        assert out.attrs["units"] in ("d", "days")

    def test_missing_masking(self, tas_series):
        vals = np.full(365, 280.0)
        vals[40] = np.nan  # a NaN in February
        tas = tas_series(vals, start="2001-01-01")
        out = atmos.tg_mean(tas, freq="MS")
        v = np.asarray(out.values)
        assert not np.isnan(v[0])
        assert np.isnan(v[1])  # February masked by missing_any

    def test_missing_skip_option(self, tas_series):
        vals = np.full(365, 280.0)
        vals[40] = np.nan
        tas = tas_series(vals, start="2001-01-01")
        with set_options(check_missing="skip"):
            out = atmos.tg_mean(tas, freq="MS")
        assert not np.isnan(np.asarray(out.values)).any()

    def test_dataset_input(self, tas_series):
        tas = tas_series(np.full(365, 280.0), start="2001-01-01")
        ds = ClimDataset({"tas": tas})
        out = atmos.tg_mean(ds=ds, freq="YS")
        np.testing.assert_allclose(out.values, 280.0)

    def test_variable_name_binding(self, tas_series):
        tas = tas_series(np.full(365, 280.0), start="2001-01-01")
        ds = ClimDataset({"mon_tas": tas})
        out = atmos.tg_mean(tas="mon_tas", ds=ds, freq="YS")
        np.testing.assert_allclose(out.values, 280.0)

    def test_missing_variable_error(self):
        with pytest.raises(MissingVariableError):
            atmos.tg_mean(ds=ClimDataset({}), freq="YS")

    def test_bad_freq_datacheck(self, tas_series):
        tas = tas_series(np.full(24, 280.0), start="2001-01-01", freq="h")
        with pytest.raises(ValidationError):
            atmos.tg_mean(tas, freq="YS")

    def test_cfcheck_warns(self, tas_series):
        tas = tas_series(np.full(365, 280.0), start="2001-01-01")
        tas.attrs["standard_name"] = "wrong_name"
        with pytest.warns(UserWarning):
            atmos.tg_mean(tas, freq="YS")

    def test_as_dataset(self, tas_series):
        tas = tas_series(np.full(365, 280.0), start="2001-01-01")
        with set_options(as_dataset=True):
            out = atmos.tg_mean(tas, freq="YS")
        assert isinstance(out, ClimDataset)
        assert "tg_mean" in out


class TestRegistry:
    def test_registered(self):
        assert "TG_MEAN" in registry
        assert "TX90P" in registry
        assert registry["TG_MEAN"].realm == "atmos"

    def test_json_export(self):
        meta = registry["TX_DAYS_ABOVE"].json()
        assert meta["identifier"] == "tx_days_above"
        assert "tasmax" in meta["variables"]
        assert "thresh" in meta["parameters"]


class TestLocales:
    def test_french(self, tas_series):
        tas = tas_series(np.full(365, 280.0), start="2001-01-01")
        with set_options(metadata_locales=["fr"]):
            out = atmos.tg_mean(tas, freq="MS")
        assert "long_name_fr" in out.attrs
        # reference fr.json keeps long_name frequency-free; the {freq:f}
        # adjective lives in the description (xclim:data/fr.json TG_MEAN)
        assert "Moyenne" in out.attrs["long_name_fr"]
        assert "mensuelle" in out.attrs["description_fr"]


class TestInjectedParams:
    def test_injected_op(self, tasmin_series, tasmax_series):
        tn = tasmin_series(np.full(365, 280.0), start="2001-01-01")
        tx = tasmax_series(np.full(365, 290.0), start="2001-01-01")
        out = atmos.daily_temperature_range(tasmin=tn, tasmax=tx, freq="YS")
        np.testing.assert_allclose(out.values, 10.0)
        out2 = atmos.max_daily_temperature_range(tasmin=tn, tasmax=tx, freq="YS")
        np.testing.assert_allclose(out2.values, 10.0)

    def test_freshet(self, tas_series):
        vals = np.full(365, 270.0)
        vals[59:] = 280
        tas = tas_series(vals, start="2001-01-01")
        out = atmos.freshet_start(tas, freq="YS")
        assert out.values[0] == 60


class TestIndexing:
    def test_indexer_kwarg(self, tasmin_series):
        vals = np.full(365, 275.0)
        vals[0:31] = 270  # January frost
        vals[181:212] = 270  # July frost
        tn = tasmin_series(vals, start="2001-01-01")
        out = atmos.frost_days(tn, freq="YS", month=1)
        assert out.values[0] == 31


class TestDictBatchApply:
    """dict-of-datasets mapping — the analogue of the reference's DataTree
    dispatch (xclim:core/indicator.py:858-877)."""

    def test_tree_map(self):
        from xclim_tpu.core.dataarray import ClimDataset
        from xclim_tpu.testing.helpers import generate_atmos

        tree = {"m1": generate_atmos(0, nyears=2),
                "m2": generate_atmos(1, nyears=2),
                "empty": ClimDataset()}
        res = atmos.tg_mean(ds=tree, tas="tas", freq="YS")
        assert set(res) == {"m1", "m2", "empty"}
        assert "tg_mean" in res["m1"] and "tg_mean" in res["m2"]
        assert len(res["empty"]) == 0
        v1 = np.asarray(res["m1"]["tg_mean"].values)
        v2 = np.asarray(res["m2"]["tg_mean"].values)
        assert v1.shape == (2,) and not np.allclose(v1, v2)

    def test_matches_single_call(self, tas_series):
        from xclim_tpu.core.dataarray import ClimDataset

        tas = tas_series(np.random.default_rng(3).normal(283, 4, 730),
                         start="2001-01-01")
        ds = ClimDataset({"tas": tas})
        tree_out = atmos.tg_mean(ds={"only": ds}, tas="tas", freq="MS")
        single = atmos.tg_mean(tas, freq="MS")
        np.testing.assert_allclose(
            np.asarray(tree_out["only"]["tg_mean"].values),
            np.asarray(single.values))


class TestMultiOutput:
    """Multi-output declaration forms and validation
    (xclim:tests/test_indicators.py:335-430)."""

    @staticmethod
    def _compute(tas, freq="YS"):
        from xclim_tpu.indices.generic import select_resample_op

        tmin = select_resample_op(tas, "min", freq)
        tmax = select_resample_op(tas, "max", freq)
        return tmin, tmax

    def test_cf_attrs_list(self, tas_series):
        from xclim_tpu.core.indicator import Daily

        ind = Daily(
            realm="atmos", identifier="minmaxtemp_t1",
            cf_attrs=[
                dict(var_name="tmin", units="K", standard_name="Min temp",
                     description="Grouped computation of tmax and tmin"),
                dict(var_name="tmax", units="K",
                     description="Grouped computation of tmax and tmin"),
            ],
            compute=self._compute)
        tas = tas_series(np.arange(366.0) + 200.0, start="2000-01-01")
        tmin, tmax = ind(tas, freq="YS")
        assert float(np.asarray(tmin.data)[0]) == 200.0
        assert float(np.asarray(tmax.data)[0]) == 565.0
        assert tmin.attrs["standard_name"] == "Min temp"
        assert tmax.attrs["description"] == ("Grouped computation of tmax "
                                             "and tmin")
        assert ind.units == ["K", "K"]

    def test_keyword_lists(self, tas_series):
        from xclim_tpu.core.indicator import Daily

        ind = Daily(
            realm="atmos", identifier="minmaxtemp_t2",
            var_name=["tmin", "tmax"], units="K",
            standard_name=["Min temp", ""],
            description="Grouped computation of tmax and tmin",
            compute=self._compute)
        tas = tas_series(np.arange(366.0) + 200.0, start="2000-01-01")
        tmin, tmax = ind(tas, freq="YS")
        assert tmin.name == "tmin" and tmax.name == "tmax"
        assert tmin.attrs["standard_name"] == "Min temp"
        assert ind.units == ["K", "K"]

    def test_missing_var_name(self):
        from xclim_tpu.core.indicator import Daily

        with pytest.raises(ValueError, match="missing a"):
            Daily(realm="atmos", identifier="minmaxtemp_t3",
                  cf_attrs=[dict(var_name="tmin", units="K"),
                            dict(units="K")],
                  compute=self._compute)

    def test_length_mismatch(self):
        from xclim_tpu.core.indicator import Daily

        with pytest.raises(ValueError, match="has 1 elements"):
            Daily(realm="atmos", identifier="minmaxtemp_t4",
                  var_name=["tmin", "tmax"], units="K",
                  standard_name=["Min temp"],
                  compute=self._compute)

    def test_wrong_output_count(self, tas_series):
        from xclim_tpu.core.indicator import Daily
        from xclim_tpu.indices.generic import select_resample_op

        ind = Daily(realm="atmos", identifier="minmaxtemp_t5",
                    var_name=["tmin", "tmax"], units="K",
                    compute=lambda tas, freq="YS":
                    select_resample_op(tas, "min", freq))
        tas = tas_series(np.arange(366.0) + 200.0, start="2000-01-01")
        with pytest.raises(ValueError, match="produced 1 outputs"):
            ind(tas, freq="YS")


class TestMissingBehavior:
    """Missing-value handling through options and indexers
    (xclim:tests/test_indicators.py:431-470)."""

    def test_default_any(self, tas_series):
        from xclim_tpu.indicators import atmos

        a = np.ones(365)
        a[5] = np.nan
        tas = tas_series(a + 273.15, start="2000-01-01")
        out = atmos.tg_mean(tas, freq="MS")
        assert np.isnan(np.asarray(out.data)[0])
        assert not np.isnan(np.asarray(out.data)[1])

    def test_pct_tolerance(self, tas_series):
        from xclim_tpu.core.options import set_options
        from xclim_tpu.indicators import atmos

        a = np.ones(365)
        a[5] = np.nan
        tas = tas_series(a + 273.15, start="2000-01-01")
        with set_options(check_missing="pct",
                         missing_options={"pct": {"tolerance": 0.05}}):
            out = atmos.tg_mean(tas, freq="MS")
        assert not np.isnan(np.asarray(out.data)[0])
        with set_options(check_missing="pct",
                         missing_options={"pct": {"tolerance": 0.01}}):
            out = atmos.tg_mean(tas, freq="MS")
        assert np.isnan(np.asarray(out.data)[0])

    def test_indexer_scopes_missing(self, tas_series):
        # a NaN in January must not poison a February-only computation
        # (xclim:tests/test_indicators.py:452-457)
        from xclim_tpu.indicators import atmos

        a = np.ones(365)
        a[5] = np.nan  # Jan 6
        tas = tas_series(a + 273.15, start="2000-01-01")
        out_feb = atmos.tg_mean(tas, freq="YS", month=[2])
        assert not np.isnan(np.asarray(out_feb.data)[0])
        out_jan = atmos.tg_mean(tas, freq="YS", month=[1])
        assert np.isnan(np.asarray(out_jan.data)[0])


class TestDictBatchApply:
    """One indicator across a dict of datasets in a single call — the
    analogue of the reference's DataTree mapping
    (xclim:core/indicator.py:858-877): results keyed like the input,
    empty/None nodes pass through, outputs are datasets."""

    def test_batch_over_dict(self):
        from xclim_tpu.testing.helpers import generate_atmos

        nodes = {"cityA": generate_atmos(seed=1, nyears=1),
                 "cityB": generate_atmos(seed=2, nyears=1),
                 "empty": None}
        out = atmos.tg_mean(ds=nodes, freq="YS")
        assert set(out) == {"cityA", "cityB", "empty"}
        assert out["empty"] is None
        for key in ("cityA", "cityB"):
            assert isinstance(out[key], ClimDataset)
            assert "tg_mean" in out[key]
            ref = atmos.tg_mean(ds=nodes[key], freq="YS")
            np.testing.assert_array_equal(
                np.asarray(out[key]["tg_mean"].values),
                np.asarray(ref.values))

    def test_batch_results_differ_by_node(self):
        from xclim_tpu.testing.helpers import generate_atmos

        nodes = {"a": generate_atmos(seed=3, nyears=1),
                 "b": generate_atmos(seed=4, nyears=1)}
        out = atmos.tg_mean(ds=nodes, freq="YS")
        assert not np.allclose(np.asarray(out["a"]["tg_mean"].values),
                               np.asarray(out["b"]["tg_mean"].values))
