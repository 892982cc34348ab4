"""sdba numerical utilities: grouped quantiles and quantile-axis interpolation
(reference: xsdba.utils — xclim.sdba shim, xclim:src/xclim/sdba.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.ops.bootstrap import _count_le_sorted
from xclim_tpu.ops.quantile import nan_quantile
from xclim_tpu.sdba.grouping import Grouper

__all__ = ["equally_spaced_nodes", "grouped_quantile", "interp_on_quantiles",
           "grouped_rank"]


def equally_spaced_nodes(n: int, eps: float | None = 1e-4) -> np.ndarray:
    """n quantile nodes, offset from 0/1 (xsdba.utils.equally_spaced_nodes)."""
    dq = 1.0 / n / 2.0
    q = np.linspace(dq, 1 - dq, n)
    if eps is None:
        return q
    return np.insert(np.append(q, 1 - eps), 0, eps)


def grouped_quantile(da: ClimArray, grouper: Grouper, q: np.ndarray,
                     alpha: float = 1.0, beta: float = 1.0):
    """Per-group quantiles: (n_groups, nq, ...space) device array.

    One static gather + the batched NaN-quantile kernel.
    """
    table = grouper.train_table(da.time)
    ax = da.time_axis
    xf = jnp.moveaxis(da.data, ax, 0)
    t = jnp.asarray(table)
    g = xf[jnp.maximum(t, 0)]
    okshape = t.shape + (1,) * (g.ndim - 2)
    g = jnp.where((t >= 0).reshape(okshape), g, jnp.nan)  # (G, ms, ...)
    out = nan_quantile(g, jnp.asarray(q, dtype=jnp.float32), axis=1,
                       alpha=alpha, beta=beta)  # (nq, G, ...)
    return jnp.moveaxis(out, 0, 1)  # (G, nq, ...)


def interp_on_quantiles(x, xq, yq, method: str = "linear",
                        extrapolation: str = "constant"):
    """y(x) by piecewise-linear interp of (xq → yq) along the quantile axis.

    x: (..., C); xq, yq: (..., nq, C) sorted along -2. Constant extrapolation
    clamps to the edge values (xsdba default ``extrapolation='constant'``).
    """
    nq = xq.shape[-2]
    cnt = _count_le_sorted(xq, x)  # (..., ms, C): #(xq <= x) per sample
    hi = jnp.clip(cnt, 1, nq - 1)
    lo = hi - 1
    x0 = jnp.take_along_axis(xq, lo, axis=-2)
    x1 = jnp.take_along_axis(xq, hi, axis=-2)
    y0 = jnp.take_along_axis(yq, lo, axis=-2)
    y1 = jnp.take_along_axis(yq, hi, axis=-2)
    denom = x1 - x0
    w = jnp.where(denom != 0, (x - x0) / jnp.where(denom == 0, 1.0, denom), 0.0)
    if extrapolation == "constant":
        w = jnp.clip(w, 0.0, 1.0)
    y = y0 + w * (y1 - y0)
    return jnp.where(jnp.isnan(x), jnp.nan, y)


def grouped_rank(sim_g, nvalid):
    """Empirical pct rank of each sample within its group (xsdba.utils.rank).

    sim_g: (G, ms, C) group-gathered values (NaN padded). Returns same-shape
    ranks in (0, 1]: rank = #(group ≤ v) / n_valid (max rank 1.0).

    Gather-free formulation (per-lane gathers are ~100x slower than sorts on
    the TPU tunnel backend): one variadic sort yields the permutation; the
    tie-run upper bound comes from a flipped cummax; a second variadic sort
    keyed on the permutation un-sorts the counts.
    """
    import jax

    ms = sim_g.shape[-2]
    iota = jnp.broadcast_to(
        jnp.arange(ms, dtype=jnp.int32)[:, None], sim_g.shape[-2:])
    iota = jnp.broadcast_to(iota, sim_g.shape)
    # NaNs sort last and never equal anything → their u values are inert
    S, perm = jax.lax.sort((sim_g, iota), dimension=sim_g.ndim - 2,
                           num_keys=1)
    # #(group ≤ S[j]) = upper bound of j's tie run + 1: positions where the
    # next value differs hold j+1; backward-fill along the run via a flipped
    # cummax (u is nondecreasing in j)
    nxt_same = jnp.concatenate(
        [S[..., 1:, :] == S[..., :-1, :],
         jnp.zeros_like(S[..., :1, :], dtype=bool)], axis=-2)
    # nearest run-end at or after j = reverse cummin over the (increasing)
    # run-end markers, with non-ends masked to +inf
    base = jnp.where(nxt_same, jnp.iinfo(jnp.int32).max,
                     jnp.arange(1, ms + 1, dtype=jnp.int32)[:, None])
    u = jnp.flip(jax.lax.cummin(jnp.flip(base, axis=-2), axis=sim_g.ndim - 2),
                 axis=-2)
    # un-sort: sort (perm, u) by perm restores original sample order
    _, cnt = jax.lax.sort((perm, u), dimension=sim_g.ndim - 2, num_keys=1)
    n = jnp.maximum(nvalid[..., None, :], 1)
    return cnt.astype(jnp.float32) / n.astype(jnp.float32)


def interp_uniform_nodes(tau, q, yq):
    """y(tau) for piecewise-linear interpolation on the UNIFORM quantile grid
    ``q`` (equally spaced nodes) — a single hat-basis contraction with no
    rank search and no gathers:  y = Σ_k max(0, 1 − |tau − q_k|/dq) · yq[k].

    tau: (G, ms, C) in [0, 1]; q: (nq,) uniform; yq: (G, nq, C).
    Constant extrapolation (clamp into [q₀, q_{nq−1}]).
    """
    q = jnp.asarray(q, dtype=jnp.float32)
    nq = q.shape[0]
    dq = (q[-1] - q[0]) / (nq - 1)
    tc = jnp.clip(tau, q[0], q[-1])
    qb = q.reshape((1,) * (tau.ndim - 1) + (nq, 1))
    w = jnp.maximum(0.0, 1.0 - jnp.abs(tc[..., None, :] - qb) / dq)
    # (G, ms, nq, C) weight producer fused into the contraction
    out = jnp.einsum("gqc,gmqc->gmc", yq, w)
    return jnp.where(jnp.isnan(tau), jnp.nan, out)
