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
    """
    S = jnp.sort(sim_g, axis=-2)
    cnt = _count_le_sorted(S, sim_g)
    n = jnp.maximum(nvalid[..., None, :], 1)
    return cnt.astype(jnp.float32) / n.astype(jnp.float32)
