"""Pre/post-processing utilities for bias adjustment
(reference: the external xsdba package's ``processing`` module, re-exported
through xclim.sdba — xclim:src/xclim/sdba.py).

All randomized operations take an explicit jax PRNG key — deterministic,
reproducible, and jit-friendly (no global RNG state)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.core.units import convert_units_to, str2pint
from xclim_tpu.sdba.grouping import Grouper

__all__ = [
    "adapt_freq",
    "escore",
    "from_additive_space",
    "jitter",
    "jitter_over_thresh",
    "jitter_under_thresh",
    "normalize",
    "reordering",
    "stack_variables",
    "standardize",
    "to_additive_space",
    "unstack_variables",
    "unstandardize",
]


def _thresh(value, like: ClimArray) -> float:
    if isinstance(value, str):
        return convert_units_to(str2pint(value), like)
    return float(value)


def jitter_under_thresh(x: ClimArray, thresh, key=None) -> ClimArray:
    """Replace values under `thresh` by uniform noise in (0, thresh)
    (xsdba processing.jitter_under_thresh). Breaks ties among censored
    values (e.g. zero precipitation) before quantile mapping."""
    return jitter(x, lower=thresh, key=key)


def jitter_over_thresh(x: ClimArray, thresh, upper_bnd, key=None) -> ClimArray:
    """Replace values above `thresh` by uniform noise in (thresh, upper_bnd)
    (xsdba processing.jitter_over_thresh)."""
    return jitter(x, upper=thresh, maximum=upper_bnd, key=key)


def jitter(x: ClimArray, lower=None, upper=None, minimum=None, maximum=None,
           key=None) -> ClimArray:
    """Replace values under `lower` (resp. over `upper`) by uniform noise in
    (minimum|0, lower) (resp. (upper, maximum)) (xsdba processing.jitter)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    data = x.data
    if lower is not None:
        lo = _thresh(lower, x)
        mn = _thresh(minimum, x) if minimum is not None else 0.0
        key, sub = jax.random.split(key)
        noise = jax.random.uniform(sub, data.shape, minval=mn, maxval=lo)
        data = jnp.where(data < lo, noise.astype(data.dtype), data)
    if upper is not None:
        if maximum is None:
            raise ValueError("`maximum` must be given with `upper`.")
        up = _thresh(upper, x)
        mx = _thresh(maximum, x)
        key, sub = jax.random.split(key)
        noise = jax.random.uniform(sub, data.shape, minval=up, maxval=mx)
        data = jnp.where(data > up, noise.astype(data.dtype), data)
    out = x.copy(data=data)
    out.attrs = dict(x.attrs)
    return out


def adapt_freq(ref: ClimArray, sim: ClimArray, *, group="time",
               thresh="0 mm d-1", key=None):
    """Adapt the frequency of values under `thresh` in sim to match ref
    (Themeßl et al. 2012; xsdba processing.adapt_freq).

    Where sim has a larger dry-day fraction P0_sim than ref's P0_ref, the
    excess dry steps (fraction dP0 = (P0_sim − P0_ref)/P0_sim of them) get a
    uniform random value in (thresh, pth], pth being ref's quantile at
    P0_sim — so the wet-day frequency matches without disturbing the wet
    distribution's upper part.

    Returns (sim_ad, pth, dP0); pth/dP0 per group (group axis dropped for
    group='time'), as the reference does.
    """
    from xclim_tpu.sdba.properties import _gather, _wrap

    if key is None:
        key = jax.random.PRNGKey(0)
    gr = group if isinstance(group, Grouper) else Grouper(group)
    sim = convert_units_to(sim, ref)
    th = _thresh(thresh, ref)

    gref = _gather(ref, gr)   # (G, m, ...)
    gsim = _gather(sim, gr)
    P0r = jnp.nanmean(jnp.where(jnp.isnan(gref), jnp.nan,
                                (gref < th).astype(jnp.float32)), axis=1)
    P0s = jnp.nanmean(jnp.where(jnp.isnan(gsim), jnp.nan,
                                (gsim < th).astype(jnp.float32)), axis=1)
    dP0 = jnp.maximum((P0s - P0r) / jnp.where(P0s == 0, jnp.nan, P0s), 0.0)
    # pth: REF's value at SIM's dry-day probability — the wet intensity the
    # reference reaches at that probability level; adapted dry steps land in
    # (thresh, pth]. Per-lane varying-q quantile via sort + fractional index.
    gq = jnp.moveaxis(gref, 1, 0)  # (m, G, ...)
    s = jnp.sort(gq, axis=0)
    nv = jnp.sum(~jnp.isnan(gq), axis=0)
    h = jnp.clip(P0s * (nv - 1), 0, jnp.maximum(nv - 1, 0)).astype(jnp.float32)
    k0 = jnp.floor(h).astype(jnp.int32)
    k1 = jnp.minimum(k0 + 1, jnp.maximum(nv - 1, 0))
    g0 = jnp.take_along_axis(s, k0[None], axis=0)[0]
    g1 = jnp.take_along_axis(s, k1[None], axis=0)[0]
    pth = g0 + (h - k0) * (g1 - g0)

    gid = jnp.asarray(gr.group_of_step(sim.time))
    ax = sim.time_axis
    xf = jnp.moveaxis(sim.data, ax, 0)
    pth_t = jnp.take(pth, gid, axis=0)
    dP0_t = jnp.take(dP0, gid, axis=0)
    key, k1_, k2_ = jax.random.split(key, 3)
    u = jax.random.uniform(k1_, xf.shape)
    # among the dry steps, convert the dP0 fraction with the smallest u
    wet_val = th + jax.random.uniform(k2_, xf.shape) * jnp.maximum(pth_t - th, 0)
    convert = (xf < th) & (u < dP0_t) & (pth_t > th)
    out = jnp.where(convert, wet_val.astype(xf.dtype), xf)
    sim_ad = sim.copy(data=jnp.moveaxis(out, 0, ax))
    sim_ad.attrs = dict(sim.attrs)
    pth_a = _wrap(sim, pth, gr, sim.attrs.get("units", ""), "pth")
    dP0_a = _wrap(sim, dP0, gr, "", "dP0")
    return sim_ad, pth_a, dP0_a


def normalize(data: ClimArray, *, group="time", kind: str = "+"):
    """Subtract (or divide by) the per-group mean
    (xsdba processing.normalize). Returns (normalized, norm)."""
    from xclim_tpu.sdba.adjustment import _grouped_mean
    from xclim_tpu.sdba.properties import _wrap

    gr = group if isinstance(group, Grouper) else Grouper(group)
    norm = _grouped_mean(data, gr)  # (G, ...)
    gid = jnp.asarray(gr.group_of_step(data.time))
    ax = data.time_axis
    xf = jnp.moveaxis(data.data, ax, 0)
    nt = jnp.take(norm, gid, axis=0)
    out = xf - nt if kind == "+" else xf / jnp.where(nt == 0, jnp.nan, nt)
    res = data.copy(data=jnp.moveaxis(out, 0, ax))
    res.attrs = dict(data.attrs)
    if kind == "*":
        res.attrs["units"] = ""
    return res, _wrap(data, norm, gr, data.attrs.get("units", ""), "norm")


def standardize(da: ClimArray, mean=None, std=None, dim: str = "time"):
    """(da − mean)/std along `dim` (xsdba processing.standardize).
    Returns (standardized, mean, std)."""
    mu = da.mean(dim=dim) if mean is None else mean
    sd = da.std(dim=dim) if std is None else std
    out = (da - mu) / sd
    out.attrs["units"] = ""
    return out, mu, sd


def unstandardize(da: ClimArray, mean, std) -> ClimArray:
    """Inverse of :func:`standardize`."""
    out = da * std + mean
    out.attrs["units"] = std.attrs.get("units", "")
    return out


def reordering(ref: ClimArray, sim: ClimArray) -> ClimArray:
    """Reorder sim along time so its rank structure matches ref's (the
    Schaake-shuffle step of multivariate methods; xsdba
    processing.reordering): output[t] holds sim's k-th smallest value where
    k is the rank of ref[t]."""
    ax = ref.time_axis
    r = jnp.moveaxis(ref.data, ax, 0)
    s = jnp.moveaxis(convert_units_to(sim, ref).data, ax, 0)
    order = jnp.argsort(r, axis=0)
    ranks = jnp.argsort(order, axis=0)
    s_sorted = jnp.sort(s, axis=0)
    out = jnp.take_along_axis(s_sorted, ranks, axis=0)
    res = sim.copy(data=jnp.moveaxis(out, 0, ax))
    res.attrs = dict(ref.attrs)
    return res


def to_additive_space(data: ClimArray, lower_bound, upper_bound=None,
                      trans: str = "log") -> ClimArray:
    """Transform a bounded variable to (−∞, ∞) (xsdba
    processing.to_additive_space): ``log(x − lb)`` or
    ``logit((x − lb)/(ub − lb))``."""
    lb = _thresh(lower_bound, data)
    x = data.data - lb
    if trans == "log":
        out = jnp.log(jnp.where(x <= 0, jnp.nan, x))
    elif trans == "logit":
        if upper_bound is None:
            raise ValueError("logit transform needs `upper_bound`.")
        ub = _thresh(upper_bound, data)
        p = x / (ub - lb)
        p = jnp.where((p <= 0) | (p >= 1), jnp.nan, p)
        out = jnp.log(p / (1 - p))
    else:
        raise NotImplementedError(trans)
    res = data.copy(data=out)
    res.attrs = {"units": "",
                 "sdba_transform": trans,
                 "sdba_transform_lower": float(lb)}
    if upper_bound is not None:
        res.attrs["sdba_transform_upper"] = _thresh(upper_bound, data)
    if data.attrs.get("units") is not None:
        res.attrs["sdba_transform_units"] = data.attrs.get("units", "")
    return res


def from_additive_space(data: ClimArray, lower_bound=None, upper_bound=None,
                        trans: str | None = None,
                        units: str | None = None) -> ClimArray:
    """Inverse of :func:`to_additive_space`; parameters default to the attrs
    stamped by the forward transform."""
    trans = trans or data.attrs.get("sdba_transform")
    lb = data.attrs.get("sdba_transform_lower", 0.0) if lower_bound is None \
        else _thresh(lower_bound, data)
    units = units or data.attrs.get("sdba_transform_units", "")
    if trans == "log":
        out = jnp.exp(data.data) + lb
    elif trans == "logit":
        ub = data.attrs.get("sdba_transform_upper") if upper_bound is None \
            else _thresh(upper_bound, data)
        p = 1 / (1 + jnp.exp(-data.data))
        out = p * (ub - lb) + lb
    else:
        raise NotImplementedError(str(trans))
    res = data.copy(data=out)
    res.attrs = {"units": units}
    return res


def stack_variables(ds_or_dict, dim: str = "multivar") -> ClimArray:
    """Stack the variables of a dataset/dict on a new leading dim
    (xsdba processing.stack_variables). Units are recorded per variable in
    attrs; data is NOT unit-harmonized (match the reference's behaviour of
    stacking raw magnitudes)."""
    items = list(ds_or_dict.items()) if isinstance(ds_or_dict, dict) \
        else [(k, ds_or_dict[k]) for k in ds_or_dict.data_vars]
    names = [k for k, _ in items]
    first = items[0][1]
    data = jnp.stack([v.data for _, v in items], axis=0)
    coords = dict(first.coords)
    coords[dim] = np.array(names)
    attrs = {"units": "",
             "_units": {k: v.attrs.get("units", "") for k, v in items}}
    return ClimArray(data, (dim,) + first.dims, coords, attrs, dim)


def unstack_variables(da: ClimArray, dim: str = "multivar"):
    """Inverse of :func:`stack_variables` → ClimDataset."""
    from xclim_tpu.core.dataarray import ClimDataset

    names = list(np.asarray(da.coords[dim]))
    units = da.attrs.get("_units", {})
    pax = da.dims.index(dim)
    out = ClimDataset()
    sub_dims = tuple(d for d in da.dims if d != dim)
    coords = {k: v for k, v in da.coords.items() if k != dim}
    for i, name in enumerate(names):
        v = jnp.take(da.data, i, axis=pax)
        out[str(name)] = ClimArray(v, sub_dims, dict(coords),
                                   {"units": units.get(name, "")}, str(name))
    return out


def escore(tgt: ClimArray, sim: ClimArray, N: int = 0,
           scale: bool = False) -> float:
    """Energy score between two multivariate samples (Székely & Rizzo;
    xsdba processing.escore). Arrays are (multivar, time); lower = more
    similar. `N` subsamples each series (0 = use all)."""
    x = jnp.asarray(tgt.data, dtype=jnp.float32)
    y = jnp.asarray(sim.data, dtype=jnp.float32)
    if x.ndim == 1:
        x = x[None]
        y = y[None]
    if N:
        x = x[:, :N]
        y = y[:, :N]
    if scale:
        mu = jnp.nanmean(jnp.concatenate([x, y], axis=1), axis=1, keepdims=True)
        sd = jnp.nanstd(jnp.concatenate([x, y], axis=1), axis=1, keepdims=True)
        x = (x - mu) / sd
        y = (y - mu) / sd
    n, m = x.shape[1], y.shape[1]

    def _mean_dist(a, b):
        d = a[:, :, None] - b[:, None, :]
        return jnp.nanmean(jnp.sqrt(jnp.sum(d * d, axis=0)))

    exy = _mean_dist(x, y)
    exx = _mean_dist(x, x)
    eyy = _mean_dist(y, y)
    # Székely-Rizzo e-statistic, scaled as the reference does (×n·m/(n+m)/2)
    e = 2 * exy - exx - eyy
    return float(e * n * m / (n + m) / 2)
