"""Internationalization of indicator metadata (reference: xclim:src/xclim/core/locales.py).

Locale dictionaries map indicator registry ids to translated attribute
templates; they are merged into output attrs as ``<attr>_<locale>`` when
``set_options(metadata_locales=[...])`` is active.
"""

from __future__ import annotations

import json
from pathlib import Path

from xclim_tpu.core.formatting import AttrFormatter

__all__ = [
    "TRANSLATABLE_ATTRS",
    "get_local_attrs",
    "get_local_formatter",
    "list_locales",
    "load_locale",
    "read_locale_file",
    "UnavailableLocaleError",
]

TRANSLATABLE_ATTRS = ["long_name", "description", "comment", "title", "abstract",
                      "keywords"]

_LOCALES: dict[str, dict] = {}


class UnavailableLocaleError(ValueError):
    """Requested locale is not registered (xclim:core/locales.py)."""


def list_locales() -> list[str]:
    return list(_LOCALES)


def read_locale_file(filename, module: str | None = None) -> dict:
    """Read a locale JSON file; optionally prefix ids with a module name
    (xclim:core/locales.py:250)."""
    with open(filename, encoding="utf-8") as f:
        locdict = json.load(f)
    if module is not None:
        locdict = {(k if k == "attrs_mapping" else f"{module}.{k}"): v
                   for k, v in locdict.items()}
    return locdict


def load_locale(locdict, locale: str) -> None:
    """Register or update a locale dictionary (xclim:core/locales.py:279)."""
    if isinstance(locdict, (str, Path)):
        locdict = read_locale_file(locdict)
    if locale in _LOCALES:
        _LOCALES[locale].update(locdict)
    else:
        _LOCALES[locale] = dict(locdict)


def _get_loc(locale: str) -> dict:
    if locale not in _LOCALES:
        raise UnavailableLocaleError(
            f"Locale {locale!r} unavailable; registered: {list_locales()}")
    return _LOCALES[locale]


def get_local_attrs(indicator_id: str, locale: str, names=None,
                    append_locale_name: bool = True) -> dict:
    """Translated attrs for an indicator id (xclim:core/locales.py:148)."""
    loc = _get_loc(locale)
    entry = loc.get(indicator_id, {})
    out = {}
    for name, val in entry.items():
        if names is not None and name not in names:
            continue
        if name == "attrs_mapping":
            continue
        key = f"{name}_{locale}" if append_locale_name else name
        out[key] = val
    return out


def get_local_formatter(locale: str) -> AttrFormatter:
    """AttrFormatter using the locale's value mappings (xclim:core/locales.py:207)."""
    loc = _get_loc(locale)
    mapping = dict(loc.get("attrs_mapping", {}))
    modifiers = mapping.pop("modifiers", [])
    return AttrFormatter(mapping, modifiers)


def _load_builtin_locales():
    data_dir = Path(__file__).parent.parent / "data"
    for f in sorted(data_dir.glob("??.json")):
        load_locale(read_locale_file(f), f.stem)


_load_builtin_locales()
