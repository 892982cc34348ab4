"""Zhang-2005 iterated bootstrap for percentile-based indices
(reference: xclim:src/xclim/core/bootstrapping.py).

The reference's per-year Python loop with full ``percentile_doy`` recomputes
(bootstrapping.py:81-212) becomes a batched device computation: the doy-window
samples are gathered once into a (doy, year, window, ...) tensor, and the
"replace in-base year b by year o" step is a one-hot select on the year axis
followed by the batched quantile kernel — no data reshuffling. Per in-base
year, the replacement axis is vmapped (stacked as a ``_bootstrap`` dim, like
the reference) and the index recomputed only on year b's periods.
"""

from __future__ import annotations

import functools
import inspect

import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.calendar import max_doy, parse_offset, percentile_doy_table, resample_segments
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.core.percentiles import _interp_doy_axis
from xclim_tpu.ops.quantile import nan_quantile

__all__ = ["percentile_bootstrap", "bootstrap_func"]

# top-k candidate kernel for tail percentiles (see bench.py header for the
# measured comparison); module-level switch so tests can pin either path
USE_TOPK_KERNEL = True


def percentile_bootstrap(func):
    """Decorator activating bootstrap when ``bootstrap=True`` is passed
    (xclim:core/bootstrapping.py:22)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        ba = inspect.signature(func).bind(*args, **kwargs)
        ba.apply_defaults()
        if ba.arguments.get("bootstrap", False):
            return bootstrap_func(func, **ba.arguments)
        return func(*args, **kwargs)

    return wrapper


def _find_keys(kwargs):
    per_key = None
    da_key = None
    for name, val in kwargs.items():
        if isinstance(val, ClimArray):
            if name.endswith("_per"):
                per_key = name
            elif val.time is not None and da_key is None:
                da_key = name
    if per_key is None or da_key is None:
        raise KeyError("bootstrap requires a percentile array (name ending in _per) "
                       "and a data array argument.")
    return per_key, da_key


def bootstrap_func(compute_index_func, **kwargs) -> ClimArray:
    """Bootstrap the percentile climatology year-by-year and average
    (xclim:core/bootstrapping.py:81)."""
    per_key, da_key = _find_keys(kwargs)
    kwargs.pop("bootstrap", None)
    per = kwargs[per_key]
    da: ClimArray = kwargs[da_key]

    clim_bounds = per.attrs.get("climatology_bounds")
    if clim_bounds is None:
        raise KeyError("The percentile array lacks `climatology_bounds` attrs; "
                       "compute it with percentile_doy.")
    window = int(per.attrs.get("window", 5))
    alpha = float(per.attrs.get("alpha", 1 / 3))
    beta = float(per.attrs.get("beta", 1 / 3))
    percentiles = np.atleast_1d(np.asarray(per.coords.get(
        "percentiles", per.attrs.get("percentiles", [90.0])), dtype=np.float32))
    keep_per_dim = "percentiles" in per.dims

    y0 = int(str(clim_bounds[0])[:4])
    y1 = int(str(clim_bounds[1])[:4])
    years = np.unique(da.time.year)
    in_base_years = years[(years >= y0) & (years <= y1)]
    if len(in_base_years) <= 1:
        raise KeyError("Bootstrap needs at least two in-base years overlapping the data.")

    # plain (non-bootstrapped) result for all periods
    plain = compute_index_func(**kwargs)

    # --- build the in-base sample tensor (doy, year, window, ...) ---
    mask_ib = np.isin(da.time.year, in_base_years)
    sub = da.sel_time(mask=mask_ib)
    cal = da.time.calendar
    mx = max_doy(cal)
    has_366 = int(sub.time.doy.max()) == 366
    if has_366:
        sub = sub.sel_time(mask=sub.time.doy < 366)
    table, doys = percentile_doy_table(sub.time, window=window)
    n_doy = len(doys)
    nyears = len(in_base_years)
    ax = da.time_axis
    xf = jnp.moveaxis(sub.data, ax, 0)
    t = jnp.asarray(table.reshape(n_doy, nyears, window))
    safe = jnp.maximum(t, 0)
    D = xf[safe]  # (n_doy, nyears, window, ...)
    okshape = t.shape + (1,) * (D.ndim - 3)
    D = jnp.where((t >= 0).reshape(okshape), D, jnp.nan)

    q = jnp.asarray(percentiles / 100.0)
    space_dims = tuple(d for d in da.dims if d != "time")
    space_coords = {k: v for k, v in da.coords.items() if k in space_dims}

    # --- choose the per-pair quantile strategy ---
    # For tail percentiles (≤25% or ≥75%, i.e. tx90p/tn10p and kin) the
    # year-replaced quantile is recovered from precomputed year-tagged
    # top-k candidate tables instead of re-sorting the 150-sample set per
    # replacement — measured 3× faster on TPU (see bench.py header).
    qs_np = percentiles / 100.0
    tails = np.minimum(qs_np, 1 - qs_np)
    use_topk = USE_TOPK_KERNEL and bool((tails <= 0.25).all())
    space_shape = D.shape[3:]
    if use_topk:
        from xclim_tpu.ops.bootstrap import (
            topk_capacity,
            topk_rank_tables,
            topk_replaced_year_quantile,
        )

        N = nyears * window
        C = int(np.prod(space_shape)) if space_shape else 1
        flat_ib = D.reshape(n_doy, N, C)
        year_id = np.arange(nyears).repeat(window)
        K = max(topk_capacity(N, window, float(qv)) for qv in qs_np)
        _tabs = topk_rank_tables(flat_ib, year_id, K)
        Dt = D.reshape(n_doy, nyears, window, C).transpose(0, 3, 1, 2)

    def per_for_replacement(b_idx: int):
        """(O, doy, ..., Q) percentiles with year b replaced by each other year."""
        others = [o for o in range(nyears) if o != b_idx]
        if use_topk:
            A_b = Dt[:, :, b_idx]                         # (n_doy, C, w)
            A_o = jnp.moveaxis(Dt[:, :, jnp.asarray(others)], 2, 0)  # (O, n_doy, C, w)
            O = len(others)
            tabs_b = [jnp.broadcast_to(tt, (O,) + tt.shape) for tt in _tabs]
            A_bb = jnp.broadcast_to(A_b, (O,) + A_b.shape)
            ps = [topk_replaced_year_quantile(*tabs_b, A_bb, A_o, b_idx,
                                              float(qv), alpha=alpha, beta=beta)
                  for qv in qs_np]                         # each (O, n_doy, C)
            p = jnp.stack(ps, axis=-1)                     # (O, n_doy, C, Q)
            p = p.reshape((O, n_doy) + space_shape + (len(qs_np),))
        else:
            Do = D[:, jnp.asarray(others)]  # (n_doy, O, window, ...)
            Do = jnp.moveaxis(Do, 1, 0)  # (O, n_doy, window, ...)
            base = jnp.broadcast_to(D[None], (len(others),) + D.shape)
            onehot = (jnp.arange(nyears) == b_idx).reshape(
                (1, 1, nyears, 1) + (1,) * (D.ndim - 3))
            repl = jnp.where(onehot, Do[:, :, None], base)  # (O, n_doy, nyears, window, ...)
            flat = repl.reshape((len(others), n_doy, nyears * window) + D.shape[3:])
            p = nan_quantile(flat, q, axis=2, alpha=alpha, beta=beta)  # (Q, O, n_doy, ...)
            p = jnp.moveaxis(p, 0, -1)  # (O, n_doy, ..., Q)
        if has_366:
            pm = jnp.moveaxis(p, 1, 0)  # (n_doy, O, ..., Q)
            pm = _interp_doy_axis(pm, n_doy, mx)
            p = jnp.moveaxis(pm, 1, 0)
        return p

    out = plain.copy()
    out_time = plain.time
    out_tax = plain.dims.index("time")
    data = out.data

    doy_coord = np.arange(1, (mx if has_366 else int(doys.max())) + 1, dtype=np.int32)

    freq = kwargs.get("freq", "YS")
    # which output periods belong to each calendar year (reference groups the
    # resampled output by year; bootstrapping.py:178-210)
    out_years = out_time.year

    for b_idx, b_year in enumerate(in_base_years):
        p = per_for_replacement(b_idx)
        if keep_per_dim:
            pdims = ("_bootstrap", "dayofyear") + space_dims + ("percentiles",)
            pcoords = {**space_coords, "dayofyear": doy_coord, "percentiles": percentiles}
        else:
            p = p[..., 0]
            pdims = ("_bootstrap", "dayofyear") + space_dims
            pcoords = {**space_coords, "dayofyear": doy_coord}
        per_bo = ClimArray(p, pdims, pcoords, dict(per.attrs), per.name)
        kw = dict(kwargs)
        kw[per_key] = per_bo
        res = compute_index_func(**kw)  # dims include _bootstrap
        res_mean = res.mean(dim="_bootstrap")
        # overwrite periods of year b
        sel = np.nonzero(out_years == b_year)[0]
        if len(sel) == 0:
            continue
        rtax = res_mean.dims.index("time")
        take = jnp.take(res_mean.data, jnp.asarray(sel), axis=rtax)
        # align dims of res_mean to out dims
        perm = [res_mean.dims.index(d) for d in plain.dims]
        take = jnp.transpose(take, perm) if perm != list(range(take.ndim)) else take
        idx = [slice(None)] * data.ndim
        idx[out_tax] = jnp.asarray(sel)
        data = data.at[tuple(idx)].set(take)

    out = out.copy(data=data)
    out.attrs = dict(plain.attrs)
    return out
