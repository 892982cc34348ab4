"""Spatial analogs (reference: xclim:src/xclim/analog.py, 628 LoC).

Dissimilarity metrics between the multivariate distribution of a target site
and every candidate grid cell. The pairwise-distance metrics (seuclidean,
nearest_neighbor, zech_aslan, szekely_rizzo, mahalanobis, kldiv) are batched
on device over candidate cells; friedman_rafsky (minimum spanning tree) runs
host-side per cell.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.dataarray import ClimArray

__all__ = ["spatial_analogs", "metrics"]


def _std_dims(target, candidates):
    """Standardize both samples by the joint per-variable mean/std
    (xclim:analog.py standardization)."""
    mu = jnp.nanmean(jnp.concatenate([target, candidates.reshape(-1, target.shape[1])],
                                     axis=0), axis=0)
    sd = jnp.nanstd(jnp.concatenate([target, candidates.reshape(-1, target.shape[1])],
                                    axis=0), axis=0)
    sd = jnp.where(sd == 0, 1.0, sd)
    return (target - mu) / sd, (candidates - mu) / sd


def _pairwise_dists(x, y):
    """Euclidean distances: x (n, d), y (m, d) → (n, m)."""
    d2 = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    return jnp.sqrt(jnp.maximum(d2, 0))


def seuclidean(x, y):
    """Standardized-Euclidean distance between sample means, scaled by the
    REFERENCE sample's ddof=1 variance (xclim:analog.py:182,
    ``spatial.distance.seuclidean(mx, my, x.var(axis=0, ddof=1))``)."""
    mx = jnp.nanmean(x, axis=0)
    my = jnp.nanmean(y, axis=0)
    n = jnp.sum(~jnp.isnan(x), axis=0)
    v = jnp.nanvar(x, axis=0) * n / jnp.maximum(n - 1, 1)
    return jnp.sqrt((((mx - my) ** 2) / jnp.where(v == 0, 1, v)).sum())


def nearest_neighbor(x, y):
    """Mean proportion of same-sample nearest neighbours (xclim:analog.py:217)."""
    pooled = jnp.concatenate([x, y], axis=0)
    labels = jnp.concatenate([jnp.zeros(x.shape[0]), jnp.ones(y.shape[0])])
    d = _pairwise_dists(pooled, pooled)
    n = pooled.shape[0]
    d = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d)
    nn = jnp.argmin(d, axis=1)
    same = labels == labels[nn]
    return jnp.mean(same.astype(jnp.float32))


def _sed_scale(x, y):
    """Per-dimension 1/sqrt(σx·σy) scaling of the standardized Euclidean
    distance used by zech_aslan / szekely_rizzo (xclim:analog.py:277,346;
    V = x.std(ddof=1) * y.std(ddof=1))."""
    nx = jnp.sum(~jnp.isnan(x), axis=0)
    ny = jnp.sum(~jnp.isnan(y), axis=0)
    sx = jnp.sqrt(jnp.nanvar(x, axis=0) * nx / jnp.maximum(nx - 1, 1))
    sy = jnp.sqrt(jnp.nanvar(y, axis=0) * ny / jnp.maximum(ny - 1, 1))
    v = sx * sy
    return 1.0 / jnp.sqrt(jnp.where(v == 0, 1.0, v))


def zech_aslan(x, y, dmin: float = 1e-12):
    """Zech-Aslan energy statistic on the standardized Euclidean distance
    with the log weight function (xclim:analog.py:255-321)."""
    nx, ny = x.shape[0], y.shape[0]
    s = _sed_scale(x, y)
    xs, ys = x * s, y * s
    dxx = _pairwise_dists(xs, xs)
    dyy = _pairwise_dists(ys, ys)
    dxy = _pairwise_dists(xs, ys)

    def phi(dist):
        return -jnp.log(jnp.maximum(dist, dmin))

    iu = jnp.triu_indices(nx, k=1)
    phi_xx = phi(dxx[iu]).sum() / (nx * (nx - 1))
    iv = jnp.triu_indices(ny, k=1)
    phi_yy = phi(dyy[iv]).sum() / (ny * (ny - 1))
    phi_xy = phi(dxy).sum() / (nx * ny)
    return phi_xx + phi_yy - phi_xy


def szekely_rizzo(x, y, standardize: bool = True):
    """Székely-Rizzo energy distance (xclim:analog.py:323-388).

    ``standardize=True`` (the reference default) measures distances in the
    standardized Euclidean metric with V = σx·σy; ``False`` reproduces the
    R ``energy::edist`` two-sample statistic."""
    nx, ny = x.shape[0], y.shape[0]
    if standardize:
        s = _sed_scale(x, y)
        x, y = x * s, y * s
    dxy = _pairwise_dists(x, y).mean()
    dxx = _pairwise_dists(x, x).mean()
    dyy = _pairwise_dists(y, y).mean()
    return (nx * ny) / (nx + ny) * (2 * dxy - dxx - dyy)


def mahalanobis(x, y):
    """Mahalanobis distance between sample means (xclim:analog.py:591)."""
    mx = jnp.nanmean(x, axis=0)
    my = jnp.nanmean(y, axis=0)
    pooled = jnp.concatenate([x - mx, y - my], axis=0)
    cov = pooled.T @ pooled / (pooled.shape[0] - 1)
    cov = cov + 1e-8 * jnp.eye(cov.shape[0])
    diff = mx - my
    return jnp.sqrt(diff @ jnp.linalg.solve(cov, diff))


def kolmogorov_smirnov(x, y):
    """Fasano-Franceschini multivariate KS statistic (xclim:analog.py:434):
    quadrant-count differences over 2^d orthants around each pivot point,
    maximized over both pivot samples."""
    d = x.shape[1]
    mf = 2 ** jnp.arange(d)
    M = 2 ** d

    def pivot(a, b):
        na, nb = a.shape[0], b.shape[0]

        def codes(p):
            # code[i, j] = orthant of a[j] relative to pivot p[i]
            c = a.T[None, :, :] <= p[:, :, None]  # (np, d, na)
            return (c * mf[None, :, None]).sum(axis=1)  # (np, na)

        ix = codes(a)  # (na, na)
        iy = codes(b)  # (nb, na)
        q = jnp.arange(M)[None, :, None]
        cx = (ix[:, None, :] == q).mean(axis=0)  # (M, na)
        cy = (iy[:, None, :] == q).mean(axis=0)
        return jnp.max(jnp.abs(cx - cy))

    return jnp.maximum(pivot(x, y), pivot(y, x))


def kldiv(x, y, k: int = 1):
    """Kullback-Leibler divergence via k-NN estimator (Perez-Cruz 2008;
    xclim:analog.py:499)."""
    n, d = x.shape
    m = y.shape[0]
    dxx = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, _pairwise_dists(x, x))
    dxy = _pairwise_dists(x, y)
    r = jnp.sort(dxx, axis=1)[:, k - 1]
    s = jnp.sort(dxy, axis=1)[:, k - 1]
    eps = 1e-10
    return (d * jnp.mean(jnp.log(jnp.maximum(s, eps) / jnp.maximum(r, eps)))
            + jnp.log(m / (n - 1.0)))


def _friedman_rafsky_host(x, y):
    """Friedman-Rafsky runs test via MST (host, scipy; xclim:analog.py:389)."""
    from scipy.sparse.csgraph import minimum_spanning_tree
    from scipy.spatial.distance import cdist

    pooled = np.concatenate([x, y], axis=0)
    labels = np.concatenate([np.zeros(len(x)), np.ones(len(y))])
    d = cdist(pooled, pooled)
    mst = minimum_spanning_tree(d)
    rows, cols = mst.nonzero()
    cross = (labels[rows] != labels[cols]).sum()
    n = len(pooled)
    # the reference's runs statistic: 1 − (1 + #cross-sample edges)/n
    # (xclim:analog.py:421), range [0, (n−1)/n]
    return 1.0 - (1.0 + cross) / n


metrics = {
    "seuclidean": seuclidean,
    "nearest_neighbor": nearest_neighbor,
    "zech_aslan": zech_aslan,
    "szekely_rizzo": szekely_rizzo,
    "mahalanobis": mahalanobis,
    "kolmogorov_smirnov": kolmogorov_smirnov,
    "kldiv": kldiv,
    "friedman_rafsky": _friedman_rafsky_host,
}


def spatial_analogs(target: ClimArray, candidates: ClimArray,
                    dist_dim: str = "time", method: str = "kldiv",
                    **kwargs) -> ClimArray:
    """Dissimilarity of every candidate cell to the target distribution
    (xclim:analog.py:21).

    target: dims (time, variables) [or (time,)]; candidates: same plus spatial
    dims. Returns the metric over the spatial dims.
    """
    tdims = target.dims
    if "variables" not in tdims:
        target = target.expand_dims("variables", size=1, axis=target.ndim)
        candidates = candidates.expand_dims("variables", size=1, axis=candidates.ndim)
    # reorder: target (time, variables); candidates (time, variables, space...)
    t = target.transpose(dist_dim, "variables")
    space_dims = tuple(d for d in candidates.dims if d not in (dist_dim, "variables"))
    c = candidates.transpose(dist_dim, "variables", *space_dims)
    tx = jnp.asarray(t.data)
    cx = jnp.asarray(c.data).reshape(c.shape[0], c.shape[1], -1)  # (n, d, S)
    S = cx.shape[-1]

    fn = metrics[method] if not callable(method) else method
    if method == "friedman_rafsky":
        tn = np.asarray(tx)
        outs = np.array([
            _friedman_rafsky_host(tn, np.asarray(cx[:, :, s])) for s in range(S)
        ], dtype=np.float32)
        data = jnp.asarray(outs)
    else:
        def per_cell(cc):
            return fn(tx, cc, **kwargs) if kwargs else fn(tx, cc)

        data = jax.vmap(per_cell, in_axes=2)(cx).astype(jnp.float32)

    shape = tuple(c.shape[2 + i] for i in range(len(space_dims)))
    data = data.reshape(shape) if shape else data.reshape(())
    coords = {k: v for k, v in candidates.coords.items() if k in space_dims}
    out = ClimArray(data, space_dims, coords,
                    {"units": "", "indices": method,
                     "long_name": f"Dissimilarity of the distribution with the "
                                  f"target, as measured by the {method} metric."},
                    method)
    return out


def standardize(x, y):
    """Standardize x and y jointly by their pooled mean/std
    (xclim:analog.py)."""
    both = jnp.concatenate([x, y], axis=0)
    mu = jnp.nanmean(both, axis=0)
    sd = jnp.nanstd(both, axis=0)
    sd = jnp.where(sd == 0, jnp.nan, sd)
    return (x - mu) / sd, (y - mu) / sd


def metric(func):
    """Register a function as a spatial-analog dissimilarity metric
    (xclim:analog.py:metric decorator)."""
    metrics[func.__name__] = func
    return func


def friedman_rafsky(x, y):
    """Friedman-Rafsky multivariate runs test dissimilarity (host MST;
    xclim:analog.py:389)."""
    import numpy as _np

    return _friedman_rafsky_host(_np.asarray(x), _np.asarray(y))
