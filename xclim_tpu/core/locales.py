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
    "get_local_dict",
    "generate_local_dict",
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
    """Register or update a locale dictionary (xclim:core/locales.py:279).

    Updating an existing locale merges ``attrs_mapping`` key-by-key instead
    of replacing it, so extending a shipped locale with a few custom-indicator
    entries (docs/tutorial_extending.md) does not strip the stock frequency
    adjectives from every other indicator's formatter."""
    if isinstance(locdict, (str, Path)):
        locdict = read_locale_file(locdict)
    if locale in _LOCALES:
        cur = _LOCALES[locale]
        for k, v in locdict.items():
            if k == "attrs_mapping" and isinstance(cur.get(k), dict):
                cur[k] = {**cur[k], **v}
            else:
                cur[k] = v
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


def get_local_dict(locale):
    """(locale_name, full translation dict) for a locale; accepts a tag, a
    (tag, dict) tuple or a (tag, path-to-json) tuple
    (xclim:core/locales.py:104)."""
    if isinstance(locale, (list, tuple)) and len(locale) == 2:
        tag, src = locale
        if isinstance(src, dict):
            return tag, src
        return tag, read_locale_file(src)
    return locale, dict(_get_loc(locale))


def generate_local_dict(locale: str, init_english: bool = False) -> dict:
    """Skeleton translation dict with an entry per registered indicator
    (xclim:core/locales.py:300)."""
    from xclim_tpu.core.indicator import registry

    try:
        _, existing = get_local_dict(locale)
    except UnavailableLocaleError:
        existing = {}
    out = {"attrs_mapping": existing.get("attrs_mapping",
                                         {"modifiers": [""]})}
    for key, ind in registry.items():
        rid = ind._registry_id
        entry = dict(existing.get(rid, {}))
        for attr in TRANSLATABLE_ATTRS:
            if attr not in entry:
                val = ind.cf_attrs[0].get(attr, getattr(ind, attr, None)) \
                    if attr != "title" else ind.title
                entry[attr] = (val or "") if init_english else ""
        out[rid] = entry
    return out
