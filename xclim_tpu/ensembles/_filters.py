"""Ensemble pre-filters (reference: xclim:src/xclim/ensembles/_filters.py)."""

from __future__ import annotations

import numpy as np

from xclim_tpu.core.dataarray import ClimArray, concat

__all__ = ["_concat_hist", "_model_in_all_scens", "_single_member"]


def _concat_hist(da: ClimArray, **hist) -> ClimArray:
    """Concatenate historical scenario with the other scenarios along time
    (xclim:ensembles/_filters.py:12). e.g. ``_concat_hist(da, scenario='historical')``."""
    if len(hist) > 1:
        raise ValueError("Too many keyword arguments.")
    (dim, label), = hist.items()
    ax = da.dims.index(dim)
    labels = list(np.asarray(da.coords[dim]))
    ih = labels.index(label)
    h = da.isel(**{dim: ih})
    others = [i for i in range(len(labels)) if i != ih]
    rest = da.isel(**{dim: others})
    # historical values fill the NaN start of each scenario
    import jax.numpy as jnp

    hb = jnp.expand_dims(h.data, ax)
    filled = jnp.where(jnp.isnan(rest.data), jnp.broadcast_to(hb, rest.data.shape),
                       rest.data)
    return rest.copy(data=filled)


def _model_in_all_scens(da: ClimArray, dimensions=None) -> ClimArray:
    """Keep only models with data in all scenarios (xclim:_filters.py:68)."""
    models = np.asarray(da.coords["model"])
    max_ = da.max(dim=[d for d in da.dims if d not in ("model", "scenario")])
    ok = ~np.isnan(np.asarray(max_.transpose("model", "scenario").values)).any(axis=1)
    keep = np.nonzero(ok)[0]
    return da.isel(model=keep)


def _single_member(da: ClimArray) -> ClimArray:
    """Keep a single member per model (xclim:_filters.py:110)."""
    if "member" not in da.dims:
        return da
    return da.isel(member=0)
