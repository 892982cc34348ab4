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
    """Standardized-Euclidean distance between sample means (xclim:analog.py:182)."""
    mx = jnp.nanmean(x, axis=0)
    my = jnp.nanmean(y, axis=0)
    v = (jnp.nanvar(x, axis=0) + jnp.nanvar(y, axis=0)) / 2
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


def zech_aslan(x, y):
    """Zech-Aslan energy statistic (xclim:analog.py:255)."""
    nx, ny = x.shape[0], y.shape[0]
    d = x.shape[1]
    dxx = _pairwise_dists(x, x)
    dyy = _pairwise_dists(y, y)
    dxy = _pairwise_dists(x, y)
    eps = 1e-10

    def phi(dist):
        return -jnp.log(jnp.maximum(dist, eps))

    iu = jnp.triu_indices(nx, k=1)
    phi_xx = phi(dxx[iu]).sum() / (nx * (nx - 1))
    iv = jnp.triu_indices(ny, k=1)
    phi_yy = phi(dyy[iv]).sum() / (ny * (ny - 1))
    phi_xy = phi(dxy).sum() / (nx * ny)
    return phi_xx + phi_yy - phi_xy


def szekely_rizzo(x, y):
    """Székely-Rizzo energy distance (xclim:analog.py:323)."""
    nx, ny = x.shape[0], y.shape[0]
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
    """Max over variables of the 1-D two-sample KS statistic
    (xclim:analog.py:434)."""
    def ks_1d(a, b):
        allv = jnp.sort(jnp.concatenate([a, b]))
        fa = (a[None, :] <= allv[:, None]).mean(axis=1)
        fb = (b[None, :] <= allv[:, None]).mean(axis=1)
        return jnp.max(jnp.abs(fa - fb))

    stats = jax.vmap(ks_1d, in_axes=(1, 1))(x, y)
    return jnp.max(stats)


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
    # normalized count of same-label edges (higher = more dissimilar)
    return 1.0 - cross / (n - 1)


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
