"""Ensemble creation & statistics (reference: xclim:src/xclim/ensembles/_base.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.calendar import TimeIndex, common_calendar
from xclim_tpu.core.dataarray import ClimArray, ClimDataset, concat
from xclim_tpu.ops.quantile import nan_quantile

__all__ = ["create_ensemble", "ensemble_mean_std_max_min", "ensemble_percentiles"]


def create_ensemble(datasets, realizations=None, calendar: str | None = None,
                    cal_kwargs=None) -> ClimDataset | ClimArray:
    """Concatenate members along a new 'realization' dimension
    (xclim:ensembles/_base.py:31).

    Members with different calendars are converted to a common calendar
    (dropping impossible dates); time axes are intersected.
    """
    items = list(datasets)
    if isinstance(items[0], ClimArray):
        arrays = items
        aligned = _align(arrays, calendar)
        out = concat(aligned, "realization",
                     coord=np.asarray(realizations if realizations is not None
                                      else np.arange(len(aligned))))
        return out
    # datasets: merge per variable
    keys = set(items[0].keys())
    for d in items[1:]:
        keys &= set(d.keys())
    out = ClimDataset()
    for k in sorted(keys):
        arrays = [d[k] for d in items]
        aligned = _align(arrays, calendar)
        out[k] = concat(aligned, "realization",
                        coord=np.asarray(realizations if realizations is not None
                                         else np.arange(len(aligned))))
    return out


def _align(arrays: list[ClimArray], calendar: str | None):
    tis = [a.time for a in arrays]
    if any(t is None for t in tis):
        return arrays
    cal = calendar or common_calendar([t.calendar for t in tis])
    conv = []
    for a, t in zip(arrays, tis):
        if t.calendar != cal:
            new_t, keep = t.convert_calendar(cal)
            a = a.sel_time(mask=keep)
            a.coords["time"] = new_t
        conv.append(a)
    # intersect time ranges
    encs = [set(a.time.encode().tolist()) for a in conv]
    commont = sorted(set.intersection(*encs))
    out = []
    for a in conv:
        enc = a.time.encode()
        mask = np.isin(enc, commont)
        out.append(a.sel_time(mask=mask))
    return out


def ensemble_mean_std_max_min(ens: ClimDataset | ClimArray,
                              weights=None) -> ClimDataset:
    """Mean/stdev/max/min over realization (xclim:ensembles/_base.py:141)."""
    if isinstance(ens, ClimArray):
        ens = ClimDataset({ens.name or "data": ens})
    out = ClimDataset()
    for k, da in ens.items():
        if "realization" not in da.dims:
            continue
        if weights is None:
            out[f"{k}_mean"] = da.mean(dim="realization", keep_attrs=True)
            out[f"{k}_stdev"] = da.std(dim="realization", keep_attrs=True)
        else:
            w = jnp.asarray(np.asarray(weights, dtype=np.float32))
            ax = da.dims.index("realization")
            shape = [1] * da.ndim
            shape[ax] = len(w)
            wr = w.reshape(shape)
            valid = ~jnp.isnan(da.data)
            wsum = jnp.where(valid, wr, 0).sum(axis=ax)
            mean = jnp.where(valid, da.data * wr, 0).sum(axis=ax) / wsum
            var = jnp.where(valid, wr * (da.data - jnp.expand_dims(mean, ax)) ** 2,
                            0).sum(axis=ax) / wsum
            dims = tuple(d for d in da.dims if d != "realization")
            coords = {c: v for c, v in da.coords.items() if c != "realization"}
            out[f"{k}_mean"] = ClimArray(mean, dims, coords, dict(da.attrs))
            out[f"{k}_stdev"] = ClimArray(jnp.sqrt(var), dims, coords, dict(da.attrs))
        out[f"{k}_max"] = da.max(dim="realization", keep_attrs=True)
        out[f"{k}_min"] = da.min(dim="realization", keep_attrs=True)
        for suffix in ("mean", "stdev", "max", "min"):
            o = out[f"{k}_{suffix}"]
            o.attrs["description"] = (f"{suffix.capitalize()} of the ensemble of "
                                      f"{da.attrs.get('description', k)}")
    return out


def ensemble_percentiles(ens, values=None, keep_chunk_size=None, weights=None,
                         split: bool = True, method: str = "linear"):
    """Ensemble percentiles over realization (xclim:ensembles/_base.py:214).

    Unweighted path lowers to the batched NaN-quantile kernel (the reference's
    ``calc_perc`` apply_ufunc); weighted path uses the weighted-quantile
    estimator on sorted members.
    """
    if values is None:
        values = [10, 50, 90]
    if isinstance(ens, ClimDataset):
        out = ClimDataset()
        for k, da in ens.items():
            res = ensemble_percentiles(da, values, weights=weights, split=split,
                                       method=method)
            if split:
                for p, arr in res.items():
                    out[f"{k}_p{int(p):02d}" if float(p).is_integer() else f"{k}_p{p}"] = arr
            else:
                out[k] = res
        return out

    da = ens
    ax = da.dims.index("realization")
    q = np.asarray(values, dtype=np.float32) / 100.0
    if weights is None:
        # q stays a HOST numpy array: wrapping it in jnp.asarray inside a
        # traced caller (the fused bench/CLI pipelines) makes it a tracer,
        # which silently bars the fast static-q kernels (Pallas
        # axisquantile / the sorting network) and falls to the XLA sort
        res = nan_quantile(da.data, q, axis=ax)  # (Q, ...)
    else:
        res = _weighted_quantile(da.data, jnp.asarray(np.asarray(weights, np.float32)),
                                 jnp.asarray(q), axis=ax)
    dims = ("percentiles",) + tuple(d for d in da.dims if d != "realization")
    coords = {c: v for c, v in da.coords.items() if c != "realization"}
    coords["percentiles"] = np.asarray(values)
    full = ClimArray(res, dims, coords, dict(da.attrs), da.name)
    full.attrs["description"] = (f"Percentiles of the ensemble of "
                                 f"{da.attrs.get('description', da.name or '')}")
    if not split:
        return full
    out = {}
    for i, p in enumerate(np.asarray(values)):
        arr = full.isel(percentiles=i)
        arr.name = f"{da.name or 'data'}_p{int(p):02d}"
        out[float(p)] = arr
    return out


def _weighted_quantile(x, w, q, axis):
    """Weighted quantile via the cumulative-weight inversion on sorted members
    (reference uses xr.weighted(...).quantile)."""
    xm = jnp.moveaxis(x, axis, -1)
    order = jnp.argsort(xm, axis=-1)
    xs = jnp.take_along_axis(xm, order, axis=-1)
    shape = (1,) * (xm.ndim - 1) + (-1,)
    wb = jnp.broadcast_to(w.reshape(shape), xm.shape)
    ws = jnp.take_along_axis(wb, order, axis=-1)
    valid = ~jnp.isnan(xs)
    ws = jnp.where(valid, ws, 0.0)
    cw = jnp.cumsum(ws, axis=-1)
    tot = cw[..., -1:]
    # position of each sorted sample: (cw - w/2) / tot
    pos = (cw - 0.5 * ws) / jnp.where(tot == 0, 1.0, tot)
    outs = []
    for qq in np.asarray(q):
        # linear interp of xs against pos at qq
        below = pos <= qq
        idx_lo = jnp.clip(below.sum(axis=-1) - 1, 0, xs.shape[-1] - 1)
        idx_hi = jnp.clip(idx_lo + 1, 0, xs.shape[-1] - 1)
        x0 = jnp.take_along_axis(xs, idx_lo[..., None], axis=-1)[..., 0]
        x1 = jnp.take_along_axis(xs, idx_hi[..., None], axis=-1)[..., 0]
        p0 = jnp.take_along_axis(pos, idx_lo[..., None], axis=-1)[..., 0]
        p1 = jnp.take_along_axis(pos, idx_hi[..., None], axis=-1)[..., 0]
        denom = p1 - p0
        t = jnp.where(denom > 0, (qq - p0) / jnp.where(denom == 0, 1, denom), 0.0)
        t = jnp.clip(t, 0.0, 1.0)
        outs.append(x0 + t * (x1 - x0))
    res = jnp.stack(outs, axis=0)
    allnan = (~valid).all(axis=-1)
    return jnp.where(allnan[None], jnp.nan, res)
