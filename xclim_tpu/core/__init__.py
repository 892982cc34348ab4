"""Core services: units, calendar, data model, options, missing values, formatting.

Mirrors the reference's ``xclim.core`` package exports
(xclim:src/xclim/core/__init__.py:5-7 re-exports the exception and type
modules at package level, e.g. ``from xclim.core import ValidationError``).
"""

from xclim_tpu.core._exceptions import (  # noqa: F401
    MissingVariableError,
    ValidationError,
    raise_warn_or_log,
)
