"""Physical conversion indices (reference: xclim:src/xclim/indices/converters.py).

Pure elementwise physics — trivially jittable on the VPU. This module starts
with the precipitation-phase approximations needed by the multivariate indices
and grows to cover the full converter inventory.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.dataarray import ClimArray, where
from xclim_tpu.core.units import (
    convert_units_to,
    declare_units,
    str2pint,
    units2pint,
)

__all__ = [
    "rain_approximation",
    "snowfall_approximation",
]


@declare_units(pr="[precipitation]", tas="[temperature]", thresh="[temperature]")
def snowfall_approximation(pr: ClimArray, tas: ClimArray, thresh: str = "0 degC",
                           method: str = "binary") -> ClimArray:
    """Approximate snowfall from total precipitation and temperature
    (xclim:converters.py:1088).

    Methods: 'binary' (all solid below thresh), 'brown' (linear transition over
    ±2°C), 'auer' (empirical rain fraction curve).
    """
    thresh_v = convert_units_to(str2pint(thresh), tas)
    if method == "binary":
        prsn = pr.where(tas <= thresh_v, 0.0)
    elif method == "brown":
        # linear fraction over [thresh-2, thresh+2] degC (Brown et al. 2003)
        t = tas.data - thresh_v
        frac = jnp.clip(0.5 - t / 4.0, 0.0, 1.0)
        prsn = pr.copy(data=pr.data * frac)
    elif method == "auer":
        # Auer (1974) empirical rain fraction vs air temperature in degC
        tdeg = convert_units_to(tas, "degC").data
        ratio = jnp.clip(-0.0202 * tdeg ** 6 + 0.3660 * tdeg ** 5 - 2.0399 * tdeg ** 4
                         + 1.5089 * tdeg ** 3 + 15.038 * tdeg ** 2
                         + 4.6664 * tdeg + 31.017, 0.0, 100.0) / 100.0
        ratio = jnp.where(tdeg >= 6.0, 1.0, ratio)
        ratio = jnp.where(tdeg < 0.0, 0.0, ratio)
        prsn = pr.copy(data=pr.data * (1.0 - ratio))
    else:
        raise ValueError(f"Method {method!r} not supported.")
    prsn.attrs = dict(pr.attrs)
    prsn.attrs["standard_name"] = "snowfall_flux"
    prsn.name = "prsn"
    return prsn


@declare_units(pr="[precipitation]", tas="[temperature]", thresh="[temperature]")
def rain_approximation(pr: ClimArray, tas: ClimArray, thresh: str = "0 degC",
                       method: str = "binary") -> ClimArray:
    """Approximate liquid precipitation: pr - snowfall_approximation
    (xclim:converters.py:1255)."""
    prsn = snowfall_approximation(pr, tas, thresh=thresh, method=method)
    prlp = pr.copy(data=pr.data - prsn.data)
    prlp.attrs = dict(pr.attrs)
    prlp.attrs["standard_name"] = "rainfall_flux"
    prlp.name = "prlp"
    return prlp
