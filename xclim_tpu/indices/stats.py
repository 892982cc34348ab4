"""Statistical distribution fitting & frequency analysis
(reference: xclim:src/xclim/indices/stats.py, 1197 LoC).

TPU-first design: moment / L-moment / approximate-ML estimators and
cdf/ppf/pdf evaluation run on device as closed forms (gamma incomplete
functions from jax.scipy.special; gamma ppf via Wilson-Hilferty + Newton).
Exact scipy MLE remains available as a host fallback (method='ML_scipy').
The reference's default "ML" maps to the device estimator of each
distribution (matching its "APP" approximate path for gamma/fisk).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.calendar import resample_segments
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.core.units import declare_units

__all__ = [
    "DIST_PARAMS",
    "dist_method",
    "fa",
    "fit",
    "frequency_analysis",
    "get_dist",
    "parametric_cdf",
    "parametric_pdf",
    "parametric_quantile",
    "preprocess_standardized_index",
    "standardized_index",
    "standardized_index_fit_params",
]

_EULER = 0.5772156649015329

DIST_PARAMS = {
    "norm": ["loc", "scale"],
    "expon": ["loc", "scale"],
    "gamma": ["a", "loc", "scale"],
    "lognorm": ["s", "loc", "scale"],
    "gumbel_r": ["loc", "scale"],
    "genextreme": ["c", "loc", "scale"],
    "fisk": ["c", "loc", "scale"],
    "weibull_min": ["c", "loc", "scale"],
}


def get_dist(dist: str):
    """scipy distribution object by name (xclim:indices/stats.py:551)."""
    import scipy.stats as spstats

    if isinstance(dist, str):
        return getattr(spstats, dist)
    return dist


# ---------------------------------------------------------------------------
# L-moments (sample, unbiased) — the PWM workhorse
# ---------------------------------------------------------------------------


def _lmoments(x, axis=-1):
    """First three sample L-moments along axis (NaN-aware)."""
    xs = jnp.sort(x, axis=axis)
    xs = jnp.moveaxis(xs, axis, -1)
    n_tot = xs.shape[-1]
    valid = ~jnp.isnan(xs)
    n = valid.sum(axis=-1, keepdims=True).astype(jnp.float32)
    i = jnp.arange(n_tot, dtype=jnp.float32)
    i = jnp.broadcast_to(i, xs.shape)
    x0 = jnp.where(valid, xs, 0.0)
    nn = n[..., 0]
    b0 = x0.sum(-1) / jnp.maximum(nn, 1)
    w1 = i / jnp.maximum(n[..., 0:1] - 1, 1)
    b1 = (x0 * w1).sum(-1) / jnp.maximum(nn, 1)
    w2 = i * (i - 1) / jnp.maximum((n[..., 0:1] - 1) * (n[..., 0:1] - 2), 1)
    b2 = (x0 * w2).sum(-1) / jnp.maximum(nn, 1)
    l1 = b0
    l2 = 2 * b1 - b0
    l3 = 6 * b2 - 6 * b1 + b0
    return l1, l2, l3, nn


def _gammaf(x):
    return jnp.exp(jax.scipy.special.gammaln(x))


# ---------------------------------------------------------------------------
# per-distribution device estimators and cdf/ppf/pdf
# ---------------------------------------------------------------------------


def _fit_norm(x, axis, method):
    mu = jnp.nanmean(x, axis=axis)
    sd = jnp.nanstd(x, axis=axis)
    return (mu, sd)


def _fit_expon(x, axis, method):
    mn = jnp.nanmin(x, axis=axis)
    return (mn, jnp.nanmean(x, axis=axis) - mn)


def _fit_gamma(x, axis, method):
    """Gamma(a, loc=0, scale): Thom/Greenwood-Durand approximate ML
    (the reference's SPI "APP" path) or PWM."""
    if method == "PWM":
        l1, l2, _, _ = _lmoments(x, axis)
        t = l2 / jnp.where(l1 == 0, jnp.nan, l1)
        z1 = jnp.pi * t ** 2
        a_lo = (1 - 0.3080 * z1) / (z1 - 0.05812 * z1 ** 2 + 0.01765 * z1 ** 3)
        z2 = 1 - t
        a_hi = (0.7213 * z2 - 0.5947 * z2 ** 2) / (1 - 2.1817 * z2 + 1.2113 * z2 ** 2)
        a = jnp.where(t < 0.5, a_lo, a_hi)
    else:  # approximate ML (Thom 1958)
        xm = jnp.where(x > 0, x, jnp.nan)
        mean = jnp.nanmean(xm, axis=axis)
        logmean = jnp.nanmean(jnp.log(xm), axis=axis)
        A = jnp.log(mean) - logmean
        a = (1 + jnp.sqrt(1 + 4 * A / 3)) / (4 * A)
        l1 = mean
    mean = jnp.nanmean(jnp.where(x > 0, x, jnp.nan), axis=axis) if method != "PWM" else None
    m = jnp.nanmean(x, axis=axis)
    scale = (m if method == "PWM" else mean) / a
    loc = jnp.zeros_like(a)
    return (a, loc, scale)


def _fit_lognorm(x, axis, method):
    lx = jnp.log(jnp.where(x > 0, x, jnp.nan))
    mu = jnp.nanmean(lx, axis=axis)
    sd = jnp.nanstd(lx, axis=axis)
    return (sd, jnp.zeros_like(mu), jnp.exp(mu))


def _fit_gumbel(x, axis, method):
    if method == "PWM":
        l1, l2, _, _ = _lmoments(x, axis)
        scale = l2 / jnp.log(2.0)
        loc = l1 - _EULER * scale
    else:
        sd = jnp.nanstd(x, axis=axis)
        scale = sd * jnp.sqrt(6.0) / jnp.pi
        loc = jnp.nanmean(x, axis=axis) - _EULER * scale
    return (loc, scale)


def _fit_genextreme(x, axis, method):
    """GEV by L-moments (Hosking et al. 1985); scipy's c = Hosking's k."""
    l1, l2, l3, _ = _lmoments(x, axis)
    t3 = l3 / jnp.where(l2 == 0, jnp.nan, l2)
    z = 2.0 / (3.0 + t3) - jnp.log(2.0) / jnp.log(3.0)
    c = 7.8590 * z + 2.9554 * z ** 2
    g1 = _gammaf(1 + c)
    scale = l2 * c / ((1 - 2.0 ** (-c)) * g1)
    loc = l1 - scale * (1 - g1) / c
    return (c, loc, scale)


def _fit_fisk(x, axis, method):
    """3-param log-logistic by PWM (Singh-Maddala; the SPEI standard)."""
    xs = jnp.sort(x, axis=axis)
    xs = jnp.moveaxis(xs, axis, -1)
    n_tot = xs.shape[-1]
    valid = ~jnp.isnan(xs)
    nn = valid.sum(-1).astype(jnp.float32)
    i = jnp.broadcast_to(jnp.arange(n_tot, dtype=jnp.float32), xs.shape)
    x0 = jnp.where(valid, xs, 0.0)
    n1 = jnp.maximum(nn[..., None] - 1, 1)
    w0 = x0.sum(-1) / jnp.maximum(nn, 1)
    w1 = (x0 * (n1 - i) / n1).sum(-1) / jnp.maximum(nn, 1) / 1.0
    w2 = (x0 * (n1 - i) * (n1 - i - 1) /
          (n1 * jnp.maximum(n1 - 1, 1))).sum(-1) / jnp.maximum(nn, 1)
    # Vicente-Serrano et al. (2010) PWM estimators
    beta = (2 * w1 - w0) / (6 * w1 - w0 - 6 * w2)
    g1g2 = _gammaf(1 + 1 / beta) * _gammaf(1 - 1 / beta)
    alpha = (w0 - 2 * w1) * beta / g1g2
    gamma = w0 - alpha * g1g2
    return (beta, gamma, alpha)  # (c, loc, scale)


def _fit_weibull(x, axis, method):
    """Weibull-min via moment matching on log (simple, loc=min-ish)."""
    mn = jnp.nanmin(x, axis=axis)
    shifted = x - jnp.expand_dims(mn, axis) + 1e-9
    lx = jnp.log(shifted)
    sd = jnp.nanstd(lx, axis=axis)
    c = jnp.pi / (sd * jnp.sqrt(6.0))
    scale = jnp.exp(jnp.nanmean(lx, axis=axis) + _EULER / c)
    return (c, mn, scale)


def _gev_nll(theta, x, valid):
    """Negative log-likelihood of GEV in scipy's parameterization
    (c, loc, log_scale); invalid support → large penalty."""
    c, loc, lsc = theta
    scale = jnp.exp(lsc)
    z = (x - loc) / scale
    # scipy genextreme: support 1 - c z > 0
    t = 1.0 - c * z
    ok = valid & (t > 1e-10)
    ts = jnp.where(ok, t, 1.0)
    # log pdf = -log scale + (1/c - 1) log t - t^(1/c)
    logpdf = -lsc + (1.0 / c - 1.0) * jnp.log(ts) - ts ** (1.0 / c)
    # Gumbel limit c→0 handled by the caller's c0 never being ~0 here
    pen = jnp.where(valid & ~(t > 1e-10), 1e6, 0.0)
    return -(jnp.where(ok, logpdf, 0.0) - pen).sum()


def _weibull_nll(theta, x, valid):
    """NLL of weibull_min (log_c, loc, log_scale); x > loc required."""
    lc, loc, lsc = theta
    c = jnp.exp(lc)
    scale = jnp.exp(lsc)
    z = (x - loc) / scale
    ok = valid & (z > 1e-10)
    zs = jnp.where(ok, z, 1.0)
    logpdf = lc - lsc + (c - 1.0) * jnp.log(zs) - zs ** c
    pen = jnp.where(valid & ~(z > 1e-10), 1e6, 0.0)
    return -(jnp.where(ok, logpdf, 0.0) - pen).sum()


def _ml_refine(nll, theta0, x, valid, iters: int = 60):
    """Refine a parameter start by BFGS on the per-cell NLL (the analogue of
    the reference's scipy MLE seeded by ``_fit_start``,
    xclim:indices/stats.py:576-684). Falls back to the start where the
    refinement diverges or does not improve the likelihood."""
    from jax.scipy.optimize import minimize

    def one(t0, xr, vr):
        res = minimize(lambda t: nll(t, xr, vr), t0, method="BFGS",
                       options={"maxiter": iters})
        better = (res.fun < nll(t0, xr, vr)) & jnp.all(jnp.isfinite(res.x))
        return jnp.where(better, res.x, t0)

    return jax.vmap(one)(theta0, x, valid)


def _fit_genextreme_ml(x, axis, method):
    """GEV: L-moment start + per-cell BFGS maximum likelihood."""
    c0, loc0, sc0 = _fit_genextreme(x, axis, method)
    xf = jnp.moveaxis(x, axis, -1)
    sh = xf.shape[:-1]
    rows = xf.reshape(-1, xf.shape[-1])
    valid = ~jnp.isnan(rows)
    rows0 = jnp.where(valid, rows, 0.0)
    theta0 = jnp.stack([c0.reshape(-1), loc0.reshape(-1),
                        jnp.log(jnp.maximum(sc0.reshape(-1), 1e-10))],
                       axis=-1)
    th = _ml_refine(_gev_nll, theta0, rows0, valid)
    return (th[:, 0].reshape(sh), th[:, 1].reshape(sh),
            jnp.exp(th[:, 2]).reshape(sh))


def _fit_weibull_ml(x, axis, method):
    """weibull_min: Cooke-1979-style start + per-cell BFGS ML
    (the reference's _fit_start recipe, xclim:indices/stats.py:633-638)."""
    xf = jnp.moveaxis(x, axis, -1)
    sh = xf.shape[:-1]
    rows = jnp.where(jnp.isnan(xf), jnp.nan, xf).reshape(-1, xf.shape[-1])
    valid = ~jnp.isnan(rows)
    sd = jnp.sqrt(jnp.nanvar(rows, axis=-1))
    loc0 = jnp.nanmin(rows, axis=-1) - 0.01 * sd
    sl = jnp.log(jnp.where(valid, rows - loc0[:, None], 1.0))
    nn = jnp.maximum(valid.sum(-1), 1)
    mu_l = jnp.where(valid, sl, 0.0).sum(-1) / nn
    var_l = (jnp.where(valid, (sl - mu_l[:, None]) ** 2, 0.0).sum(-1)
             / jnp.maximum(nn - 1, 1))
    c0 = jnp.pi / jnp.sqrt(6.0) / jnp.sqrt(jnp.maximum(var_l, 1e-12))
    pw = jnp.where(valid, (rows - loc0[:, None]) ** c0[:, None], 0.0)
    sc0 = (pw.sum(-1) / nn) ** (1.0 / c0)
    theta0 = jnp.stack([jnp.log(jnp.maximum(c0, 1e-6)), loc0,
                        jnp.log(jnp.maximum(sc0, 1e-10))], axis=-1)
    rows0 = jnp.where(valid, rows, 0.0)
    th = _ml_refine(_weibull_nll, theta0, rows0, valid)
    return (jnp.exp(th[:, 0]).reshape(sh), th[:, 1].reshape(sh),
            jnp.exp(th[:, 2]).reshape(sh))


_FITTERS = {
    "norm": _fit_norm,
    "expon": _fit_expon,
    "gamma": _fit_gamma,
    "lognorm": _fit_lognorm,
    "gumbel_r": _fit_gumbel,
    "genextreme": _fit_genextreme,
    "fisk": _fit_fisk,
    "weibull_min": _fit_weibull,
}

# true maximum-likelihood variants seeded by the closed-form estimates
# (used when method='ML'; 'PWM'/'APP' keep the closed forms)
_ML_FITTERS = {
    "genextreme": _fit_genextreme_ml,
    "weibull_min": _fit_weibull_ml,
}


def _gamma_ppf(p, a):
    """Inverse regularized lower incomplete gamma via Wilson-Hilferty start +
    Newton (unit scale)."""
    z = jax.scipy.special.ndtri(jnp.clip(p, 1e-7, 1 - 1e-7))
    x = a * (1 - 1 / (9 * a) + z / (3 * jnp.sqrt(a))) ** 3
    x = jnp.maximum(x, 1e-8)
    for _ in range(6):
        f = jax.scipy.special.gammainc(a, x) - p
        pdf = jnp.exp((a - 1) * jnp.log(x) - x - jax.scipy.special.gammaln(a))
        x = jnp.maximum(x - f / jnp.maximum(pdf, 1e-30), 1e-10)
    return x


def _cdf(dist, params, x):
    if dist == "norm":
        loc, scale = params
        return jax.scipy.special.ndtr((x - loc) / scale)
    if dist == "expon":
        loc, scale = params
        return 1 - jnp.exp(-jnp.maximum(x - loc, 0) / scale)
    if dist == "gamma":
        a, loc, scale = params
        return jax.scipy.special.gammainc(a, jnp.maximum(x - loc, 0) / scale)
    if dist == "lognorm":
        s, loc, scale = params
        z = jnp.log(jnp.maximum(x - loc, 1e-30) / scale) / s
        return jnp.where(x > loc, jax.scipy.special.ndtr(z), 0.0)
    if dist == "gumbel_r":
        loc, scale = params
        return jnp.exp(-jnp.exp(-(x - loc) / scale))
    if dist == "genextreme":
        c, loc, scale = params
        t = (x - loc) / scale
        arg = 1 - c * t
        inner = jnp.where(arg > 0, arg ** (1.0 / c), 0.0)
        out = jnp.exp(-inner)
        # support handling: for c>0 x<loc+scale/c, etc.
        out = jnp.where(arg <= 0, jnp.where(c > 0, 1.0, 0.0), out)
        return out
    if dist == "fisk":
        c, loc, scale = params
        t = jnp.maximum(x - loc, 1e-30) / scale
        return jnp.where(x > loc, 1 / (1 + t ** (-c)), 0.0)
    if dist == "weibull_min":
        c, loc, scale = params
        t = jnp.maximum(x - loc, 0) / scale
        return 1 - jnp.exp(-(t ** c))
    raise NotImplementedError(dist)


def _ppf(dist, params, q):
    if dist == "norm":
        loc, scale = params
        return loc + scale * jax.scipy.special.ndtri(q)
    if dist == "expon":
        loc, scale = params
        return loc - scale * jnp.log1p(-q)
    if dist == "gamma":
        a, loc, scale = params
        return loc + scale * _gamma_ppf(q, a)
    if dist == "lognorm":
        s, loc, scale = params
        return loc + scale * jnp.exp(s * jax.scipy.special.ndtri(q))
    if dist == "gumbel_r":
        loc, scale = params
        return loc - scale * jnp.log(-jnp.log(q))
    if dist == "genextreme":
        c, loc, scale = params
        return loc + scale * (1 - (-jnp.log(q)) ** c) / c
    if dist == "fisk":
        c, loc, scale = params
        return loc + scale * (q / (1 - q)) ** (1 / c)
    if dist == "weibull_min":
        c, loc, scale = params
        return loc + scale * (-jnp.log1p(-q)) ** (1 / c)
    raise NotImplementedError(dist)


def _pdf(dist, params, x):
    eps = 1e-6
    return (_cdf(dist, params, x + eps) - _cdf(dist, params, x - eps)) / (2 * eps)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def fit(da: ClimArray, dist: str = "norm", method: str = "ML",
        dim: str = "time", **fitkwargs) -> ClimArray:
    """Fit distribution parameters along `dim` (xclim:indices/stats.py:115).

    method 'ML'/'APP' → device estimator; 'PWM' → L-moments; 'MM' → moments;
    'ML_scipy' → exact scipy MLE on host (slow; vectorized loop).
    """
    ax = da.dims.index(dim)
    names = DIST_PARAMS[dist] if dist in DIST_PARAMS else None
    if method == "ML_scipy" or dist not in _FITTERS:
        sp = get_dist(dist)
        vals = np.moveaxis(np.asarray(da.values, dtype=np.float64), ax, -1)
        flat = vals.reshape(-1, vals.shape[-1])
        outs = []
        for row in flat:
            r = row[~np.isnan(row)]
            if len(r) < 2:
                outs.append([np.nan] * sp.numargs + [np.nan, np.nan])
            else:
                outs.append(list(sp.fit(r, **fitkwargs)))
        arr = np.asarray(outs, dtype=np.float32)
        nparams = arr.shape[1]
        params = jnp.asarray(arr.T.reshape((nparams,) + vals.shape[:-1]))
        if names is None:
            names = ([chr(ord("a") + i) for i in range(nparams - 2)] + ["loc", "scale"])
    else:
        fitter = _ML_FITTERS.get(dist) if method in ("ML", "MLE") else None
        ptuple = (fitter or _FITTERS[dist])(da.data, ax, method)
        params = jnp.stack(list(ptuple), axis=0)
    out_dims = ("dparams",) + tuple(d for d in da.dims if d != dim)
    coords = {c: v for c, v in da.coords.items() if c != dim}
    coords["dparams"] = np.asarray(names)
    # human-readable estimator name (xclim:indices/stats.py:156-164,208)
    method_name = {
        "ML": "maximum likelihood", "MLE": "maximum likelihood",
        "MM": "method of moments",
        "MSE": "maximum product of spacings",
        "MPS": "maximum product of spacings",
        "PWM": "probability weighted moments",
        "APP": "approximative method",
    }
    out = ClimArray(params, out_dims, coords,
                    {"units": "", "scipy_dist": dist,
                     "method": method,
                     "estimator": method_name.get(
                         method.upper(), method).capitalize(),
                     "original_units": da.attrs.get("units", "")}, "params")
    return out


def parametric_quantile(p: ClimArray, q, dist: str | None = None) -> ClimArray:
    """Quantiles from fitted parameters (xclim:indices/stats.py:221)."""
    dist = dist or p.attrs["scipy_dist"]
    qa = np.atleast_1d(np.asarray(q, dtype=np.float32))
    dax = p.dims.index("dparams")
    params = tuple(jnp.take(p.data, i, axis=dax) for i in range(p.shape[dax]))
    outs = [_ppf(dist, params, float(qq)) for qq in qa]
    data = jnp.stack(outs, axis=0)
    out_dims = ("quantile",) + tuple(d for d in p.dims if d != "dparams")
    coords = {c: v for c, v in p.coords.items() if c != "dparams"}
    coords["quantile"] = qa
    return ClimArray(data, out_dims, coords,
                     {"units": p.attrs.get("original_units", "")}, "quantile")


def parametric_cdf(p: ClimArray, v) -> ClimArray:
    """CDF at values v from fitted parameters (xclim:indices/stats.py:297)."""
    dist = p.attrs["scipy_dist"]
    dax = p.dims.index("dparams")
    params = tuple(jnp.take(p.data, i, axis=dax) for i in range(p.shape[dax]))
    va = np.atleast_1d(np.asarray(v, dtype=np.float32))
    outs = [_cdf(dist, params, float(vv)) for vv in va]
    data = jnp.stack(outs, axis=0)
    out_dims = ("cdf",) + tuple(d for d in p.dims if d != "dparams")
    coords = {c: vv for c, vv in p.coords.items() if c != "dparams"}
    coords["cdf"] = va
    return ClimArray(data, out_dims, coords, {"units": ""}, "cdf")


def parametric_pdf(p: ClimArray, v) -> ClimArray:
    """PDF at values v from fitted parameters (xclim:indices/stats.py:363)."""
    dist = p.attrs["scipy_dist"]
    dax = p.dims.index("dparams")
    params = tuple(jnp.take(p.data, i, axis=dax) for i in range(p.shape[dax]))
    va = np.atleast_1d(np.asarray(v, dtype=np.float32))
    outs = [_pdf(dist, params, float(vv)) for vv in va]
    data = jnp.stack(outs, axis=0)
    out_dims = ("pdf",) + tuple(d for d in p.dims if d != "dparams")
    coords = {c: vv for c, vv in p.coords.items() if c != "dparams"}
    coords["pdf"] = va
    return ClimArray(data, out_dims, coords, {"units": ""}, "pdf")


def fa(da: ClimArray, t, dist: str = "genextreme", mode: str = "max",
       method: str = "PWM") -> ClimArray:
    """Return levels for return periods t (xclim:indices/stats.py:429)."""
    ta = np.atleast_1d(np.asarray(t, dtype=np.float32))
    q = 1.0 - 1.0 / ta if mode in ("max", "high") else 1.0 / ta
    p = fit(da, dist=dist, method=method)
    out = parametric_quantile(p, q, dist)
    out.coords["return_period"] = ta
    out.dims = ("return_period",) + out.dims[1:]
    out.coords.pop("quantile", None)
    out.attrs["units"] = da.attrs.get("units", "")
    return out


def frequency_analysis(da: ClimArray, mode: str, t, dist: str, window: int = 1,
                       freq: str | None = "YS", method: str = "PWM",
                       **indexer) -> ClimArray:
    """Block-extreme frequency analysis (xclim:indices/stats.py:485)."""
    from xclim_tpu.ops.segments import rolling_reduce

    sel = da.select_time(**indexer)
    x = sel
    if window > 1:
        x = sel.copy(data=rolling_reduce(sel.data, window, "mean", axis=sel.time_axis))
    block = getattr(x.resample(freq or "YS"), "max" if mode in ("max", "high") else "min")()
    block.attrs["units"] = da.attrs.get("units", "")
    return fa(block, t, dist=dist, mode=mode, method=method)


def dist_method(function: str, fit_params: ClimArray, arg=None, **kwargs):
    """Call a distribution method with fitted params (xclim:indices/stats.py:713)."""
    if function == "cdf":
        return parametric_cdf(fit_params, arg)
    if function == "ppf":
        return parametric_quantile(fit_params, arg)
    if function == "pdf":
        return parametric_pdf(fit_params, arg)
    raise NotImplementedError(function)


# ---------------------------------------------------------------------------
# standardized indices (SPI / SPEI / SSI / SGI machinery)
# (xclim:indices/stats.py:770-1197)
# ---------------------------------------------------------------------------


def preprocess_standardized_index(da: ClimArray, freq: str | None = "MS",
                                  window: int = 1) -> tuple[ClimArray, str]:
    """Resample to target freq and apply a rolling accumulation window
    (xclim:indices/stats.py:770)."""
    from xclim_tpu.ops.segments import rolling_reduce

    group = "time.dayofyear" if freq in (None, "D") else "time.month"
    if freq is not None:
        da = da.resample(freq).mean()
        da.attrs["units"] = da.attrs.get("units", "")
    if window > 1:
        da = da.copy(data=rolling_reduce(da.data, window, "mean", axis=da.time_axis))
    return da, group


def standardized_index_fit_params(ref: ClimArray, freq: str | None, window: int,
                                  dist: str, method: str = "APP",
                                  zero_inflated: bool = True, **indexer) -> ClimArray:
    """Fit per-group distribution params for a standardized index
    (xclim:indices/stats.py:839)."""
    from xclim_tpu.sdba.grouping import Grouper

    ref, group = preprocess_standardized_index(ref, freq, window)
    grouper = Grouper(group)
    table = grouper.train_table(ref.time)
    ax = ref.time_axis
    xf = jnp.moveaxis(ref.data, ax, 0)
    t = jnp.asarray(table)
    g = xf[jnp.maximum(t, 0)]
    okshape = t.shape + (1,) * (g.ndim - 2)
    g = jnp.where((t >= 0).reshape(okshape), g, jnp.nan)  # (G, ms, ...)
    # probability of zero (zero-inflated distributions, e.g. precipitation)
    nvalid = jnp.sum(~jnp.isnan(g), axis=1)
    if zero_inflated:
        nzero = jnp.sum(g == 0, axis=1)
        p_zero = nzero / jnp.maximum(nvalid, 1)
        gpos = jnp.where(g > 0, g, jnp.nan)
    else:
        p_zero = jnp.zeros_like(nvalid, dtype=jnp.float32)
        gpos = g
    meth = {"ML": "ML", "APP": "ML", "PWM": "PWM", "MM": "MM"}.get(method, method)
    ptuple = _FITTERS[dist](gpos, 1, meth)
    params = jnp.stack(list(ptuple), axis=0)  # (P, G, ...)
    names = DIST_PARAMS[dist]
    out_dims = ("dparams", grouper.prop) + tuple(d for d in ref.dims if d != "time")
    coords = {c: v for c, v in ref.coords.items() if c != "time"}
    coords["dparams"] = np.asarray(names + ["p_zero"])
    coords[grouper.prop] = np.arange(params.shape[1])
    full = jnp.concatenate([params, p_zero[None].astype(params.dtype)], axis=0)
    out = ClimArray(full, out_dims, coords,
                    {"units": "", "scipy_dist": dist, "group": group,
                     "freq": freq or "", "window": window,
                     "zero_inflated": int(zero_inflated),
                     "estimator": method,
                     "original_units": ref.attrs.get("units", "")}, "params")
    return out


def standardized_index(da: ClimArray, params: ClimArray | None = None,
                       freq: str | None = "MS", window: int = 1,
                       dist: str = "gamma", method: str = "APP",
                       zero_inflated: bool = True, cal_start=None, cal_end=None,
                       **indexer) -> ClimArray:
    """Standardized index (SPI-style): probability-transform each value
    through its group's fitted CDF, then the standard normal PPF
    (xclim:indices/stats.py:971)."""
    from xclim_tpu.sdba.grouping import Grouper

    if params is None:
        ref = da
        if cal_start is not None or cal_end is not None:
            years = da.time.year
            mask = np.ones(len(years), dtype=bool)
            if cal_start is not None:
                mask &= years >= int(str(cal_start)[:4])
            if cal_end is not None:
                mask &= years <= int(str(cal_end)[:4])
            ref = da.sel_time(mask=mask)
        params = standardized_index_fit_params(ref, freq, window, dist,
                                               method=method,
                                               zero_inflated=zero_inflated)
    dist = params.attrs["scipy_dist"]
    freq = params.attrs.get("freq") or None
    window = int(params.attrs.get("window", 1))
    zero_inflated = bool(params.attrs.get("zero_inflated", 1))
    da, group = preprocess_standardized_index(da, freq, window)
    grouper = Grouper(params.attrs.get("group", group))
    gid = grouper.group_of_step(da.time)
    dax = params.dims.index("dparams")
    gax = params.dims.index(grouper.prop)
    # per-step params: gather group axis
    ngroups = params.shape[gax]
    gid_clip = np.minimum(gid, ngroups - 1)
    psel = jnp.take(params.data, jnp.asarray(gid_clip), axis=gax)  # dparams × T × ...
    psel = jnp.moveaxis(psel, dax if dax < gax else dax, 0)
    nparams = len(DIST_PARAMS[dist])
    ptuple = tuple(psel[i] for i in range(nparams))
    p_zero = psel[nparams]
    ax = da.time_axis
    x = jnp.moveaxis(da.data, ax, 0)
    cdf = _cdf(dist, ptuple, x)
    if zero_inflated:
        prob = jnp.where(x > 0, p_zero + (1 - p_zero) * cdf, p_zero / 2)
    else:
        prob = cdf
    prob = jnp.clip(prob, 5e-4, 1 - 5e-4)  # clamp like the reference (8.21 sigma)
    si = jax.scipy.special.ndtri(prob)
    si = jnp.where(jnp.isnan(x), jnp.nan, si)
    out = da.copy(data=jnp.moveaxis(si, 0, ax))
    out.attrs = {"units": "", "calibration_period": [
        params.attrs.get("cal_start", ""), params.attrs.get("cal_end", "")]}
    return out
