"""YAML virtual modules (reference: xclim tests/test_modules.py)."""

import numpy as np
import pytest

import xclim_tpu
from xclim_tpu.indicators import anuclim, cf, icclim
from xclim_tpu.testing.helpers import generate_atmos


@pytest.fixture(scope="module")
def atmos_ds():
    return generate_atmos(nyears=3)


class TestICCLIM:
    def test_built(self):
        names = [k for k, v in vars(icclim).items() if hasattr(v, "identifier")]
        assert len(names) == 55

    def test_tg(self, atmos_ds):
        out = icclim.TG(ds=atmos_ds, freq="MS")
        assert out.name == "TG"
        assert out.attrs["units"] == "K"
        assert len(out.time) == 36

    def test_su_injected_thresh(self, atmos_ds):
        out = icclim.SU(ds=atmos_ds, freq="YS")
        v = np.asarray(out.values)
        assert v.shape == (3,)
        ref = xclim_tpu.indices.tx_days_above(atmos_ds["tasmax"], thresh="25 degC",
                                              freq="YS")
        np.testing.assert_allclose(v, np.asarray(ref.values))

    def test_r10mm(self, atmos_ds):
        out = icclim.R10mm(ds=atmos_ds, freq="YS")
        assert out.attrs["units"] in ("d", "days")

    def test_fd(self, atmos_ds):
        out = icclim.FD(ds=atmos_ds, freq="YS")
        ref = xclim_tpu.indices.frost_days(atmos_ds["tasmin"], thresh="0 degC",
                                           freq="YS")
        np.testing.assert_allclose(np.asarray(out.values), np.asarray(ref.values))


class TestAnuclim:
    def test_built(self):
        names = [k for k, v in vars(anuclim).items() if hasattr(v, "identifier")]
        assert len(names) == 19

    def test_p1(self, atmos_ds):
        out = anuclim.P1_AnnMeanTemp(ds=atmos_ds, freq="YS")
        assert out.attrs["units"] == "K"
        np.testing.assert_allclose(
            np.asarray(out.values),
            np.asarray(xclim_tpu.indices.tg_mean(atmos_ds["tas"], freq="YS").values))

    def test_p4(self, atmos_ds):
        out = anuclim.P4_TempSeasonality(ds=atmos_ds, freq="YS")
        assert out.attrs["units"] == "%"


class TestCF:
    def test_built(self):
        names = [k for k, v in vars(cf).items() if hasattr(v, "identifier")]
        assert len(names) >= 30

    def test_tg(self, atmos_ds):
        out = cf.tg(ds=atmos_ds, freq="YS")
        assert out.attrs["units"] == "K"

    def test_cfd_count(self, atmos_ds):
        out = cf.cfd(ds=atmos_ds, freq="YS")
        ref = xclim_tpu.indices.frost_days(atmos_ds["tasmin"], freq="YS")
        np.testing.assert_allclose(np.asarray(out.values), np.asarray(ref.values))


class TestCustomYaml:
    def test_build_from_file(self, tmp_path):
        yml = tmp_path / "custom.yml"
        yml.write_text("""
module: custom_test
realm: atmos
indicators:
  my_tg:
    base: tg_mean
  hot30:
    base: tx_days_above
    parameters:
      thresh: 30 degC
""")
        mod = xclim_tpu.build_indicator_module_from_yaml(yml)
        assert hasattr(mod, "my_tg")
        from xclim_tpu.testing.helpers import generate_atmos

        ds = generate_atmos(nyears=1)
        out = mod.my_tg(ds=ds, freq="YS")
        assert out.shape == (1,)


class TestYamlSchema:
    """Schema validation of YAML modules (xclim:core/indicator.py:1845-1852,
    xclim:data/schema.yml): a malformed module must fail with a field-level
    report, not a confusing downstream error."""

    def _build(self, tmp_path, text, **kw):
        yml = tmp_path / "bad.yml"
        yml.write_text(text)
        return xclim_tpu.build_indicator_module_from_yaml(yml, **kw)

    def test_unknown_indicator_key(self, tmp_path):
        from xclim_tpu.core._exceptions import ValidationError

        with pytest.raises(ValidationError, match=r"indicators\.x\.computee"):
            self._build(tmp_path, """
module: bad1
indicators:
  x:
    computee: tg_mean
""")

    def test_bad_parameter_type(self, tmp_path):
        from xclim_tpu.core._exceptions import ValidationError

        with pytest.raises(ValidationError,
                           match=r"indicators\.x\.parameters\.thresh"):
            self._build(tmp_path, """
module: bad2
indicators:
  x:
    base: tx_days_above
    parameters:
      thresh: [30, 40]
""")

    def test_missing_indicators_section(self, tmp_path):
        from xclim_tpu.core._exceptions import ValidationError

        with pytest.raises(ValidationError, match="missing required section"):
            self._build(tmp_path, "module: bad3\nrealm: atmos\n")

    def test_bad_allowed_periods(self, tmp_path):
        from xclim_tpu.core._exceptions import ValidationError

        with pytest.raises(ValidationError, match="allowed_periods"):
            self._build(tmp_path, """
module: bad4
indicators:
  x:
    base: tg_mean
    allowed_periods: [X]
""")

    def test_multiple_errors_reported_together(self, tmp_path):
        from xclim_tpu.core._exceptions import ValidationError

        with pytest.raises(ValidationError, match="2 errors") as exc:
            self._build(tmp_path, """
module: bad5
indicators:
  x:
    computee: tg_mean
    title: 5
""")
        msg = str(exc.value)
        assert "computee" in msg and "title" in msg

    def test_validate_false_skips(self, tmp_path):
        # opt-out must preserve the old permissive behavior
        mod = self._build(tmp_path, """
module: okskip
indicators:
  my_tg2:
    base: tg_mean
    computee_typo_is_ignored: foo
""", validate=False)
        assert hasattr(mod, "my_tg2")

    def test_bundled_modules_validate(self):
        import yaml
        from pathlib import Path

        from xclim_tpu.core.yaml_schema import validate_module_dict

        data_dir = Path(xclim_tpu.__file__).parent / "data"
        for p in sorted(data_dir.glob("*.yml")):
            errs = validate_module_dict(yaml.safe_load(p.read_text()))
            assert errs == [], f"{p.name}: {errs}"


class TestClixMeta:
    """Ported from xclim:tests/test_modules.py TestClixMeta — the cdd
    fixture is clix-meta upstream data (https://github.com/clix-meta)."""

    cdd = """
indices:
  cdd:
    reference: ETCCDI
    default_period: annual
    output:
      var_name: "cdd"
      standard_name: spell_length_of_days_with_lwe_thickness_of_precipitation_amount_below_threshold
      proposed_standard_name: spell_length_with_lwe_thickness_of_precipitation_amount_below_threshold
      long_name: "Maximum consecutive dry days (Precip < 1mm)"
      units: "day"
      cell_methods:
        - time: sum within days
        - time: sum over days
    input:
      data: pr
    index_function:
      name: spell_length
      parameters:
        threshold:
          kind: quantity
          standard_name: lwe_precipitation_rate
          long_name: "Wet day threshold"
          data: 1
          units: "mm day-1"
        condition:
          kind: operator
          operator: "<"
        reducer:
          kind: reducer
          reducer: max
    ET:
      short_name: "cdd"
      long_name: "Consecutive dry days"
      definition: "Maximum number of consecutive days with P<1mm"
      comment: "maximum consecutive days when daily total precipitation is below 1 mm"
"""

    def test_simple_clix_meta_adaptor(self, tmp_path):
        import yaml

        from xclim_tpu.core.utils import adapt_clix_meta_yaml

        test_yaml = tmp_path / "test.yaml"
        adapt_clix_meta_yaml(self.cdd, test_yaml)

        converted = yaml.safe_load(test_yaml.open())
        assert "cdd" in converted["indicators"]
        ind = converted["indicators"]["cdd"]
        assert ind["compute"] == "spell_length"
        assert ind["parameters"]["op"] == "<"
        assert ind["parameters"]["threshold"] == "1 mm day-1"
        assert ind["parameters"]["freq"]["default"] == "YS"
        # the input-describing first cell_method is dropped
        assert ind["cf_attrs"][0]["cell_methods"] == "time: sum over days"

    def test_adapted_module_builds_and_runs(self, tmp_path, pr_series):
        import numpy as np

        from xclim_tpu.core.indicator import build_indicator_module_from_yaml
        from xclim_tpu.core.utils import adapt_clix_meta_yaml

        test_yaml = tmp_path / "clixdemo.yml"
        adapt_clix_meta_yaml(self.cdd, test_yaml)
        mod = build_indicator_module_from_yaml(test_yaml, name="clixdemo")

        pr = pr_series(np.zeros(365, dtype="float32"), start="2001-01-01")
        out = mod.cdd(pr)
        # a fully dry year: the whole year is one dry spell
        assert float(np.asarray(out.values)[0]) == 365.0
        assert out.attrs["units"] in ("d", "day", "days")
