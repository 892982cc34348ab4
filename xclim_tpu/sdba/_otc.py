"""Optimal-transport bias correction: OTC and dOTC
(reference: xsdba's OTC/dOTC, Robin et al. 2019, re-exported through
xclim.sdba — xclim:src/xclim/sdba.py).

TPU-first design: instead of the reference's binned histogram + exact EMD
(a host-side linear program), the transport plan is computed between
(sub)samples with entropy-regularized Sinkhorn iterations — log-domain
softmin updates that are pure matrix ops on the MXU, jit-compiled with a
fixed iteration count. The mapping is the barycentric projection of the
plan; `reg → 0` recovers the exact-OT map in the limit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.dataarray import ClimArray

__all__ = ["OTC", "dOTC", "optimal_transport_plan"]


def _cost(X, Y):
    """Squared euclidean cost matrix: X (n, d), Y (m, d) → (n, m)."""
    x2 = jnp.sum(X * X, axis=1)[:, None]
    y2 = jnp.sum(Y * Y, axis=1)[None, :]
    return x2 + y2 - 2.0 * X @ Y.T


def optimal_transport_plan(X, Y, reg: float = 0.05, n_iter: int = 200,
                           wx=None, wy=None):
    """Entropy-regularized OT plan between samples X (n, d) and Y (m, d)
    via log-domain Sinkhorn (fixed `n_iter` iterations, jit-friendly).

    Returns the (n, m) plan with marginals wx/wy (uniform by default).
    `reg` scales the median cost, so it is shape- and unit-free.
    """
    n, m = X.shape[0], Y.shape[0]
    a = jnp.full((n,), 1.0 / n) if wx is None else wx
    b = jnp.full((m,), 1.0 / m) if wy is None else wy
    C = _cost(X, Y)
    eps = reg * jnp.median(C)
    K = -C / eps
    log_a = jnp.log(a)
    log_b = jnp.log(b)

    # log-domain Sinkhorn: u/v potentials
    def step2(carry, _):
        u, v = carry
        u = log_a - jax.scipy.special.logsumexp(K + v[None, :], axis=1)
        v = log_b - jax.scipy.special.logsumexp(K + u[:, None], axis=0)
        return (u, v), None

    (u, v), _ = jax.lax.scan(step2, (jnp.zeros(n), jnp.zeros(m)), None,
                             length=n_iter)
    return jnp.exp(K + u[:, None] + v[None, :])


def _barycentric_map(P, Y):
    """T(x_i) = Σ_j P_ij y_j / Σ_j P_ij."""
    w = P.sum(axis=1, keepdims=True)
    return (P @ Y) / jnp.where(w == 0, 1.0, w)


def _to_points(da: ClimArray, max_points: int, key):
    """(T, d) sample matrix from a ('multivar', 'time') stacked array,
    subsampled to at most `max_points` (deterministic PRNG)."""
    X = jnp.moveaxis(da.data, 0, -1) if da.dims[0] == "multivar" else da.data
    if X.ndim == 1:
        X = X[:, None]
    T = X.shape[0]
    if T > max_points:
        idx = jax.random.choice(key, T, (max_points,), replace=False)
        return X[idx], idx
    return X, jnp.arange(T)


def _standardizer(X):
    mu = jnp.nanmean(X, axis=0)
    sd = jnp.nanstd(X, axis=0)
    sd = jnp.where(sd == 0, 1.0, sd)
    return mu, sd


class OTC:
    """Optimal Transport Correction: map hist onto ref's multivariate
    distribution (xsdba.OTC; Robin et al. 2019).

    ``OTC.adjust(ref, hist)`` with ('multivar', 'time') stacked inputs (see
    :func:`xclim_tpu.sdba.processing.stack_variables`); 1-D series also work.
    """

    @classmethod
    def adjust(cls, ref: ClimArray, hist: ClimArray, *, reg: float = 0.05,
               n_iter: int = 200, max_points: int = 2048, key=None) -> ClimArray:
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        Xr, _ = _to_points(ref, max_points, k1)
        Xh_full = jnp.moveaxis(hist.data, 0, -1) if hist.dims[0] == "multivar" \
            else (hist.data[:, None] if hist.data.ndim == 1 else hist.data)
        Xh, _ = _to_points(hist, max_points, k2)
        mu, sd = _standardizer(jnp.concatenate([Xr, Xh], axis=0))
        P = optimal_transport_plan((Xh - mu) / sd, (Xr - mu) / sd,
                                   reg=reg, n_iter=n_iter)
        mapped_sub = _barycentric_map(P, (Xr - mu) / sd) * sd + mu  # (n_sub, d)
        # map every hist step through its nearest subsampled hist point
        d2 = _cost(Xh_full, Xh)
        nn = jnp.argmin(d2, axis=1)
        out_pts = mapped_sub[nn]  # (T, d)
        out = jnp.moveaxis(out_pts, -1, 0) if hist.dims[0] == "multivar" \
            else out_pts[:, 0]
        res = hist.copy(data=out.reshape(hist.shape))
        res.attrs = dict(hist.attrs)
        res.attrs["history"] = (hist.attrs.get("history", "") +
                                "\nAdjusted with OTC (Sinkhorn optimal "
                                f"transport, reg={reg}).")
        return res


class dOTC:
    """Dynamical OTC: transfer the hist→sim evolution onto ref
    (xsdba.dOTC; Robin, Vrac & Naveau 2019, HESS 23:773-786).

    The published three-plan construction:
      1. plan(hist → sim) gives each hist sample's evolution
         ``v_i = T₀₁(x0_i) − x0_i`` (ratio for ``kind='*'``);
      2. plan(ref → hist) carries those evolutions onto ref,
         ``Y1 = Y0 ∘ v`` — the reference evolved by the model's change;
      3. OTC maps sim onto the evolved reference Y1.
    The scen therefore has ref's (evolved) multivariate distribution while
    preserving the model's hist→sim change signal.
    """

    @classmethod
    def adjust(cls, ref: ClimArray, hist: ClimArray, sim: ClimArray, *,
               reg: float = 0.05, n_iter: int = 200, max_points: int = 2048,
               kind: str = "+", key=None) -> ClimArray:
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        Xr, _ = _to_points(ref, max_points, k1)
        Xh, _ = _to_points(hist, max_points, k2)
        Xs, _ = _to_points(sim, max_points, k3)
        Xs_full = jnp.moveaxis(sim.data, 0, -1) if sim.dims[0] == "multivar" \
            else (sim.data[:, None] if sim.data.ndim == 1 else sim.data)
        mu, sd = _standardizer(jnp.concatenate([Xr, Xh], axis=0))
        std = lambda X: (X - mu) / sd

        # 1. model evolution per hist sample: T01(x0_i) − x0_i
        P01 = optimal_transport_plan(std(Xh), std(Xs), reg=reg, n_iter=n_iter)
        mapped01 = _barycentric_map(P01, std(Xs)) * sd + mu
        if kind == "*":
            v = mapped01 / jnp.where(Xh == 0, jnp.nan, Xh)
        else:
            v = mapped01 - Xh

        # 2. carry the evolution onto ref through plan(ref → hist)
        Pr0 = optimal_transport_plan(std(Xr), std(Xh), reg=reg, n_iter=n_iter)
        v_ref = _barycentric_map(Pr0, v)
        Y1 = Xr * v_ref if kind == "*" else Xr + v_ref

        # 3. OTC: map sim onto the evolved reference
        mu1, sd1 = _standardizer(jnp.concatenate([Y1, Xs], axis=0))
        P1 = optimal_transport_plan((Xs - mu1) / sd1, (Y1 - mu1) / sd1,
                                    reg=reg, n_iter=n_iter)
        mapped_sub = _barycentric_map(P1, (Y1 - mu1) / sd1) * sd1 + mu1
        d2 = _cost(Xs_full, Xs)
        nn = jnp.argmin(d2, axis=1)
        out_pts = mapped_sub[nn]
        out = jnp.moveaxis(out_pts, -1, 0) if sim.dims[0] == "multivar" \
            else out_pts[:, 0]
        res = sim.copy(data=out.reshape(sim.shape))
        res.attrs = dict(sim.attrs)
        res.attrs["history"] = (sim.attrs.get("history", "") +
                                "\nAdjusted with dOTC (Sinkhorn optimal "
                                f"transport, reg={reg}, kind={kind}).")
        return res
