"""Indicator realm modules (reference: xclim:src/xclim/indicators/)."""

from xclim_tpu.indicators import atmos, convert, generic, land, seaIce  # noqa: F401
