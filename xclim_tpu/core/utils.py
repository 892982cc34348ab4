"""Misc core utilities: the public quantile kernels and helper shims
(reference: xclim:src/xclim/core/utils.py, 987 LoC).

The actual NaN-quantile device kernel lives in :mod:`xclim_tpu.ops.quantile`;
this module provides the reference's public entry points around it plus
compatibility helpers. Dask-specific machinery (`uses_dask`, chunk handling)
is replaced by no-op shims — sharding replaces chunking in this stack.
"""

from __future__ import annotations

import functools
import warnings

import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.indicator import InputKind, infer_kind_from_parameter  # noqa: F401
from xclim_tpu.ops.quantile import nan_quantile

__all__ = [
    "InputKind",
    "calc_perc",
    "deprecated",
    "ensure_chunk_size",
    "infer_kind_from_parameter",
    "is_percentile_dataarray",
    "lazy_indexing",
    "load_module",
    "nan_calc_percentiles",
    "split_auxiliary_coordinates",
    "uses_dask",
]


def deprecated(from_version: str | None = None, suggested: str | None = None):
    """Mark a function as deprecated (xclim:core/utils.py:deprecated)."""

    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            msg = f"`{func.__name__}` is deprecated"
            if from_version:
                msg += f" since {from_version}"
            if suggested:
                msg += f"; use `{suggested}` instead"
            warnings.warn(msg, FutureWarning, stacklevel=2)
            return func(*args, **kwargs)

        return wrapper

    return decorator


def load_module(path, name: str | None = None):
    """Load a python module from a path (xclim:core/utils.py:load_module)."""
    import importlib.util
    from pathlib import Path

    path = Path(path)
    spec = importlib.util.spec_from_file_location(name or path.stem, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def uses_dask(*args) -> bool:
    """Always False: there is no dask in this stack (sharding replaces
    chunking; xclim:core/utils.py:177)."""
    return False


def ensure_chunk_size(da, **minchunks):
    """No-op: arrays are dense device arrays, not chunked
    (xclim:core/utils.py)."""
    return da


def lazy_indexing(da, index, dim=None):
    """Gather values of `da` at (possibly array-valued) integer indices
    (xclim:core/utils.py:202)."""
    data = da.data if hasattr(da, "data") else jnp.asarray(da)
    idx = index.data if hasattr(index, "data") else jnp.asarray(index)
    out = jnp.take(data, idx.astype(jnp.int32), axis=0)
    if hasattr(index, "copy"):
        res = index.copy(data=out)
        res.attrs = dict(getattr(da, "attrs", {}))
        return res
    return out


def calc_perc(arr, percentiles=None, alpha: float = 1.0, beta: float = 1.0,
              copy: bool = True):
    """NaN-aware Hyndman-Fan percentiles along the LAST axis, percentile axis
    prepended (the reference's apply_ufunc kernel, xclim:core/utils.py:279)."""
    if percentiles is None:
        percentiles = [50.0]
    q = jnp.asarray(np.asarray(percentiles, dtype=np.float32) / 100.0)
    x = jnp.asarray(arr)
    out = nan_quantile(jnp.moveaxis(x, -1, 0), q, axis=0, alpha=alpha,
                       beta=beta)
    return np.asarray(jnp.moveaxis(out, 0, -1))


def nan_calc_percentiles(arr, percentiles=None, axis=-1, alpha: float = 1.0,
                         beta: float = 1.0, copy: bool = True):
    """NaN-aware percentiles along `axis`, percentile axis appended last
    (xclim:core/utils.py:326)."""
    if percentiles is None:
        percentiles = [50.0]
    q = jnp.asarray(np.asarray(percentiles, dtype=np.float32) / 100.0)
    x = jnp.asarray(arr)
    out = nan_quantile(jnp.moveaxis(x, axis, 0), q, axis=0, alpha=alpha,
                       beta=beta)
    return np.asarray(jnp.moveaxis(out, 0, -1))


def is_percentile_dataarray(da) -> bool:
    """Whether an array carries doy-percentile climatology metadata
    (xclim:core/utils.py)."""
    return (hasattr(da, "attrs")
            and da.attrs.get("climatology_bounds") is not None
            and ("percentiles" in getattr(da, "coords", {})
                 or "percentiles" in da.attrs))


def split_auxiliary_coordinates(obj):
    """Split auxiliary (non-dimension) coordinates off an array
    (xclim:core/utils.py:926). Returns (obj_without_aux, aux_dict)."""
    dims = set(getattr(obj, "dims", ()))
    aux = {}
    keep = {}
    for k, v in getattr(obj, "coords", {}).items():
        if k in dims or k == "time":
            keep[k] = v
        else:
            aux[k] = v
    if not aux:
        return obj, {}
    out = obj.copy()
    out.coords = keep
    return out, aux
