"""Metadata formatting: attribute templating, history provenance
(reference: xclim:src/xclim/core/formatting.py)."""

from __future__ import annotations

import datetime as _dt
import string
import warnings
from fnmatch import fnmatch
from typing import Any, Sequence

__all__ = [
    "AttrFormatter",
    "default_formatter",
    "gen_call_string",
    "merge_attributes",
    "update_history",
    "unprefix_attrs",
]

DEFAULT_FORMAT_PARAMS = {
    "tasmin_per_thresh": "{tasmin_per_thresh}",
    "tasmin_per_window": "{tasmin_per_window}",
    "tasmin_per_period": "{tasmin_per_period}",
    "tas_per_thresh": "{tas_per_thresh}",
    "tas_per_window": "{tas_per_window}",
    "tas_per_period": "{tas_per_period}",
    "tasmax_per_thresh": "{tasmax_per_thresh}",
    "tasmax_per_window": "{tasmax_per_window}",
    "tasmax_per_period": "{tasmax_per_period}",
    "pr_per_thresh": "{pr_per_thresh}",
    "pr_per_window": "{pr_per_window}",
    "pr_per_period": "{pr_per_period}",
}


class AttrFormatter(string.Formatter):
    """Formatter mapping argument values to natural-language variants with
    grammatical modifiers (xclim:core/formatting.py:42).

    ``mapping`` maps values (glob patterns allowed) to variant lists;
    ``modifiers`` name each variant slot ('r' is reserved for raw).
    """

    def __init__(self, mapping: dict[str, Sequence[str]], modifiers: Sequence[str]):
        super().__init__()
        if "r" in modifiers:
            raise ValueError("Modifier 'r' is reserved for raw formatting.")
        self.modifiers = list(modifiers)
        self.mapping = mapping

    def format(self, format_string: str, /, *args: Any, **kwargs: Any) -> str:
        for k, v in DEFAULT_FORMAT_PARAMS.items():
            kwargs.setdefault(k, v)
        return super().format(format_string, *args, **kwargs)

    def format_field(self, value, format_spec: str) -> str:
        baseval = self._match_value(value)
        if baseval is None:
            if format_spec in self.modifiers + ["r"]:
                warnings.warn(f"Requested formatting `{format_spec}` for unknown string `{value}`.")
                format_spec = ""
            return super().format_field(value, format_spec)
        if not format_spec:
            return self.mapping[baseval][0]
        if format_spec == "r":
            return super().format_field(value, "")
        if format_spec in self.modifiers:
            if len(self.mapping[baseval]) == 1:
                return self.mapping[baseval][0]
            return self.mapping[baseval][self.modifiers.index(format_spec)]
        return super().format_field(self.mapping[baseval][0], format_spec)

    def _match_value(self, value):
        if isinstance(value, str):
            for mapval in self.mapping:
                if fnmatch(value, mapval):
                    return mapval
        return None


default_formatter = AttrFormatter(
    {
        "D": ["daily", "days"],
        "YS": ["annual", "years"],
        "YS-*": ["annual", "years"],
        "MS": ["monthly", "months"],
        "QS-*": ["seasonal", "seasons"],
        "DJF": ["winter"],
        "MAM": ["spring"],
        "JJA": ["summer"],
        "SON": ["fall"],
        "norm": ["Normal"],
        "m1": ["january"], "m2": ["february"], "m3": ["march"], "m4": ["april"],
        "m5": ["may"], "m6": ["june"], "m7": ["july"], "m8": ["august"],
        "m9": ["september"], "m10": ["october"], "m11": ["november"], "m12": ["december"],
        "integral": ["integrated", "integral"],
        "count": ["count"],
        "doymin": ["day of minimum"],
        "doymax": ["day of maximum"],
        "mean": ["average"],
        "max": ["maximal", "maximum"],
        "min": ["minimal", "minimum"],
        "sum": ["total", "sum"],
        "std": ["standard deviation"],
        "var": ["variance"],
        "absamp": ["absolute amplitude"],
        "relamp": ["relative amplitude"],
    },
    ["adj", "noun"],
)


def merge_attributes(attribute: str, *inputs, new_line: str = "\n",
                     missing_str: str | None = None, **named_inputs) -> str:
    """Merge an attribute from several inputs, prefixing by name
    (xclim:core/formatting.py:342)."""
    items = [(getattr(i, "name", None), i) for i in inputs]
    items += list(named_inputs.items())
    parts = []
    for name, obj in items:
        attrs = getattr(obj, "attrs", {})
        val = attrs.get(attribute)
        if val is None and missing_str is not None:
            val = missing_str
        if val is not None:
            parts.append(f"{name}: {val}" if name else str(val))
    return new_line.join(parts)


def update_history(hist_str: str, *inputs, new_name: str | None = None,
                   **named_inputs) -> str:
    """Build a CF ``history`` line: timestamped operation + merged input
    histories (xclim:core/formatting.py:394)."""
    from xclim_tpu import __version__

    merged = merge_attributes("history", *inputs, new_line="\n", missing_str="",
                              **named_inputs)
    if merged:
        merged += "\n"
    now = _dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%S")
    return (f"{merged}[{now}] {new_name or ''}: {hist_str} - xclim_tpu version: "
            f"{__version__}")


def gen_call_string(funcname: str, *args, **kwargs) -> str:
    """'func(a=1, b=2)'-style provenance string (xclim:core/formatting.py:494)."""
    elements = []
    for arg in args:
        elements.append(_format_arg(arg))
    for k, v in kwargs.items():
        elements.append(f"{k}={_format_arg(v)}")
    return f"{funcname}({', '.join(elements)})"


def _format_arg(value) -> str:
    name = getattr(value, "name", None)
    if hasattr(value, "dims"):
        return name or "<array>"
    if isinstance(value, str):
        return f"'{value}'"
    return str(value)


def unprefix_attrs(source: dict, keys: Sequence[str], prefix: str) -> dict:
    """Remove a prefix from the keys of a dict (xclim:core/formatting.py)."""
    out = {}
    n = len(prefix)
    for k, v in source.items():
        if k.startswith(prefix) and (kk := k[n:]) in keys:
            out[kk] = v
        elif k in keys and k not in out:
            out[k] = v
    return out
