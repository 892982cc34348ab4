"""Locales / options / formatting oracle battery ported from the reference
suite (xclim:tests/test_locales.py, test_options.py, test_formatting.py) —
same cases and expected values, rewritten on this framework's API (indicator
ids are realm-prefixed in the shipped fr.json; indicators are registry
instances, so ``translate_attrs`` is an instance method)."""

import datetime as dt
import json
import re

import numpy as np
import pytest

import xclim_tpu
from xclim_tpu import __version__
from xclim_tpu.core import formatting as fmt
from xclim_tpu.core import locales as xloc
from xclim_tpu.core.indicator import registry
from xclim_tpu.core.missing import MissingBase
from xclim_tpu.core.options import (
    OPTIONS,
    register_missing_method,
    set_options,
)

esperanto = (
    "eo",
    {
        "attrs_mapping": {"modifiers": ["adj"], "YS-*": ["jara"],
                          "MS": ["monata"]},
        "atmos.TG_MEAN": {
            "long_name": "Meza ciutaga averaga temperaturo",
            "title": "Meza ciutaga averaga temperaturo",
        },
    },
)

russian = (
    "ru",
    {
        "attrs_mapping": {
            "modifiers": ["nn", "nf"],
            "YS-*": ["годовое", "годовая"],
            "MS": ["месячный", "месячная"],
        },
        "atmos.TG_MEAN": {
            "long_name": "Среднее значение среднесуточной температуры",
            "description": "Средне{freq:nf} среднесуточная температура.",
        },
    },
)


class TestLocales:
    """Ported from xclim:tests/test_locales.py."""

    def test_local_dict(self, tmp_path):
        loc, dic = xloc.get_local_dict("fr")
        assert loc == "fr"
        assert (dic["atmos.TG_MEAN"]["long_name"]
                == "Moyenne de la température moyenne quotidienne")

        loc, dic = xloc.get_local_dict(esperanto)
        assert loc == "eo"
        assert (dic["atmos.TG_MEAN"]["long_name"]
                == "Meza ciutaga averaga temperaturo")

        with (tmp_path / "ru.json").open("w", encoding="utf-8") as f:
            json.dump(russian[1], f, ensure_ascii=False)
        loc, dic = xloc.get_local_dict(("ru", tmp_path / "ru.json"))
        assert loc == "ru"
        assert (dic["atmos.TG_MEAN"]["long_name"]
                == "Среднее значение среднесуточной температуры")

        with pytest.raises(xloc.UnavailableLocaleError):
            xloc.get_local_dict("tlh")

        # a (tag, dict) tuple whose tag is registered merges over the
        # registered dict — passed entries win, others survive
        loc, dic = xloc.get_local_dict(
            ("fr", {"atmos.TX_MAX": {"long_name": "Fait chaud."}}))
        assert loc == "fr"
        assert dic["atmos.TX_MAX"]["long_name"] == "Fait chaud."
        assert (dic["atmos.TG_MEAN"]["long_name"]
                == "Moyenne de la température moyenne quotidienne")

    def test_local_attrs_sing(self):
        attrs = xloc.get_local_attrs("atmos.TG_MEAN", esperanto,
                                     append_locale_name=False)
        assert "description" not in attrs
        assert attrs["long_name"] == "Meza ciutaga averaga temperaturo"

        with pytest.raises(ValueError):
            xloc.get_local_attrs("atmos.TG_MEAN", "fr", esperanto,
                                 append_locale_name=False)

    def test_local_attrs_multi(self, tmp_path):
        with (tmp_path / "ru.json").open("w", encoding="utf-8") as f:
            json.dump(russian[1], f, ensure_ascii=False)
        attrs = xloc.get_local_attrs(
            "atmos.TG_MEAN", "fr", esperanto, ("ru", tmp_path / "ru.json"),
            append_locale_name=True)
        for key in ["description_fr", "description_ru"]:
            assert key in attrs
        # esperanto has no description entry
        assert "description_eo" not in attrs

    def test_local_attrs_warns_when_missing(self):
        with pytest.warns(UserWarning, match="none were found"):
            attrs = xloc.get_local_attrs("atmos.NOT_AN_INDICATOR", "fr")
        assert attrs == {}

    def test_local_formatter(self):
        formatter = xloc.get_local_formatter(russian)
        assert formatter.format("{freq:nn}", freq="YS-JUL") == "годовое"
        assert formatter.format("{freq:nf}", freq="YS-DEC") == "годовая"

    def test_indicator_output(self, tas_series):
        tas = tas_series(np.zeros(365) + 273.15, start="2000-01-01")
        with set_options(metadata_locales=["fr"]):
            tgmean = xclim_tpu.atmos.tg_mean(tas, freq="YS")
        assert "long_name_fr" in tgmean.attrs
        # this repo's fr.json phrasing (the reference's reads "température
        # quotidienne"); the point is the {freq:f} -> "annuelle" formatting
        assert (tgmean.attrs["description_fr"]
                == "Moyenne annuelle de la température moyenne quotidienne.")

    def test_indicator_integration(self):
        eo_attrs = xclim_tpu.atmos.tg_mean.translate_attrs(
            esperanto, fill_missing=True)
        assert "title" in eo_attrs
        assert "long_name" in eo_attrs["cf_attrs"][0]

        eo_attrs = xclim_tpu.atmos.tg_mean.translate_attrs(
            esperanto, fill_missing=False)
        assert "description" not in eo_attrs["cf_attrs"][0]

    #: virtual modules shipped with the package; core indicators carry
    #: module=None. Mirrors the reference's `official_indicators` fixture,
    #: which filters the registry the same way so runtime-registered test
    #: modules don't fail the audit
    OFFICIAL_MODULES = {None, "icclim", "anuclim", "cf"}

    def test_fr_translations_complete(self):
        """Every SHIPPED indicator has a complete French entry
        (the reference asserts the same for its official locales)."""
        untranslated, incomplete = [], []
        for name, ind in registry.items():
            if getattr(ind, "module", None) not in self.OFFICIAL_MODULES:
                continue
            trans = ind.translate_attrs("fr", fill_missing=False)
            flat = dict(trans)
            cf = flat.pop("cf_attrs")
            if not flat and not any(cf):
                untranslated.append(name)
                continue
            # fr.json ships title + long_name + description (no abstracts —
            # a documented divergence from the reference's official locale)
            ok = "title" in flat
            for transattrs in cf:
                if "long_name" not in transattrs \
                        or "description" not in transattrs:
                    ok = False
            if not ok:
                incomplete.append(name)
        assert not untranslated, f"untranslated: {untranslated[:10]}"
        assert not incomplete, f"incomplete: {incomplete[:10]}"

    @pytest.mark.parametrize("initeng,expected",
                             [(False, ""),
                              (True, "Mean daily mean temperature")])
    def test_local_dict_generation(self, initeng, expected):
        dic = xloc.generate_local_dict("tlh", init_english=initeng)
        assert "attrs_mapping" in dic
        assert "modifiers" in dic["attrs_mapping"]
        assert dic["atmos.TG_MEAN"]["long_name"] == expected


class TestOptions:
    """Ported from xclim:tests/test_options.py."""

    @pytest.mark.parametrize(
        "option,value",
        [
            ("metadata_locales", ["fr"]),
            ("data_validation", "log"),
            ("data_validation", "raise"),
            ("cf_compliance", "log"),
            ("cf_compliance", "raise"),
            ("check_missing", "wmo"),
            ("check_missing", "any"),
            ("missing_options", {"wmo": {"nm": 10, "nc": 3}}),
            ("missing_options", {"pct": {"subfreq": None, "tolerance": 0.1}}),
            ("missing_options", {"wmo": {"nm": 10, "nc": 3},
                                 "pct": {"subfreq": None, "tolerance": 0.1}}),
        ],
    )
    def test_set_options_valid(self, option, value):
        old = OPTIONS[option]
        with set_options(**{option: value}):
            if option != "missing_options":
                assert OPTIONS[option] == value
            else:
                for k, opts in value.items():
                    assert OPTIONS["missing_options"][k].copy() == opts
        assert OPTIONS[option] == old

    @pytest.mark.parametrize(
        "option,value",
        [
            ("metadata_locales", ["tlh"]),
            ("metadata_locales", [("tlh", "not/a/real/klingo/file.json")]),
            ("data_validation", True),
            ("check_missing", "from_context"),
            ("cf_compliance", False),
            ("missing_options", {"pct": {"nm": 45}}),
            ("missing_options", {"wmo": {"nm": 45, "nc": 3}}),
            ("missing_options", {"wmo": {"nm": 45, "nc": 3},
                                 "notachoice": {"tolerance": 45}}),
            ("missing_options",
             {"wmo": {"nm": 45, "nc": 3, "_validator": lambda x: x < 1}}),
        ],
    )
    def test_set_options_invalid(self, option, value):
        old = OPTIONS[option]
        with pytest.raises(ValueError):
            set_options(**{option: value})
        assert old == OPTIONS[option]

    def test_register_missing_method(self):
        @register_missing_method("test")
        class MissingTest(MissingBase):
            def is_missing(self, valid, count, spec, ax):
                return True

            @staticmethod
            def validate(a_param):
                return a_param < 3

        with pytest.raises(ValueError):
            set_options(missing_options={"test": {"a_param": 5}})

        with set_options(check_missing="test"):
            assert OPTIONS["check_missing"] == "test"


class TestFormatting:
    """Ported from xclim:tests/test_formatting.py."""

    def test_prefix_attrs(self):
        source = {"units": "mm/s", "name": "pr"}
        dest = fmt.prefix_attrs(source, ["units"], "original_")
        assert "original_units" in dest

        out = fmt.unprefix_attrs(dest, ["units"], "original_")
        assert out == source

        # the "naked" units are overwritten by the prefixed original
        dest["units"] = ""
        out = fmt.unprefix_attrs(dest, ["units"], "original_")
        assert out == source

    def test_update_xclim_history(self, tas_series):
        tas = tas_series(np.zeros(365) + 273.15, start="2000-01-01")

        @fmt.update_xclim_history
        def func(da, arg1, arg2=None, arg3=None):  # noqa: F841
            return da

        out = func(tas, 1, arg2=[1, 2], arg3=None)

        matches = re.match(
            r"\[([0-9-:\s]*)]\s(\w*):\s(\w*)\((.*)\)\s-\s"
            r"xclim_tpu\sversion:\s(\d*\.\d*\.\d*)",
            out.attrs["history"],
        ).groups()

        date = dt.datetime.fromisoformat(matches[0])
        assert dt.timedelta(0) <= (dt.datetime.now() - date) \
            < dt.timedelta(seconds=10)
        assert matches[1] == "tas"
        assert matches[2] == "func"
        assert matches[3] == "da=tas, arg1=1, arg2=[1, 2], arg3=None"
        assert matches[4] == __version__
