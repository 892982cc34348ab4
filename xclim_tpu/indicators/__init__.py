"""Indicator realm modules (reference: xclim:src/xclim/indicators/)."""

from xclim_tpu.indicators import atmos, generic, land, seaIce  # noqa: F401
