"""NaN-aware Hyndman-Fan quantile kernel (sort-based, vmappable, jit-friendly).

Replicates the semantics of xclim's percentile kernel
(``_nan_quantile``, xclim:src/xclim/core/utils.py:494-558):

* interpolation parameterized by (alpha, beta): alpha=beta=1 is H&F type 7
  (numpy linear), alpha=beta=1/3 is type 8 (median-unbiased, used by
  ``percentile_doy``);
* slices with 0 valid values yield NaN; slices with exactly 1 valid value yield
  that value for every quantile (xclim:core/utils.py:524-530);
* virtual indexes above the valid range clip to the slice maximum.

On TPU the sort lowers to XLA's bitonic sort over the lanes; everything after
is elementwise + gather, which XLA fuses.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["nan_quantile", "nan_percentile"]


def nan_quantile(x, q, axis: int = -1, alpha: float = 1.0, beta: float = 1.0):
    """Compute quantiles along `axis`, skipping NaNs.

    Parameters
    ----------
    x : array
    q : 1-D array of quantiles in [0, 1]
    axis : reduction axis
    alpha, beta : Hyndman-Fan interpolation parameters.

    Returns
    -------
    array with shape q.shape + x.shape-without-axis (quantile axis first,
    matching xclim ``_nan_quantile``).
    """
    q = jnp.asarray(q, dtype=jnp.float32).reshape(-1)
    xm = jnp.moveaxis(x, axis, -1)
    n_total = xm.shape[-1]
    xs = jnp.sort(xm, axis=-1)  # NaNs sort to the end
    nvalid = jnp.sum(~jnp.isnan(xm), axis=-1)  # (...,)

    n = nvalid[..., None].astype(jnp.float32)  # (..., 1)
    # virtual index: h = n*q + (q*(1-alpha-beta) + alpha) - 1
    h = n * q + (q * (1 - alpha - beta) + alpha) - 1.0  # (..., Q)
    upper = jnp.maximum(n - 1.0, 0.0)
    h = jnp.clip(h, 0.0, upper)
    prev = jnp.floor(h)
    gamma = h - prev
    nxt = jnp.minimum(prev + 1.0, upper)
    prev_i = prev.astype(jnp.int32)
    nxt_i = nxt.astype(jnp.int32)
    left = jnp.take_along_axis(xs, prev_i, axis=-1)
    right = jnp.take_along_axis(xs, nxt_i, axis=-1)
    out = left + gamma * (right - left)

    single = xs[..., 0:1]  # the lone valid value when nvalid == 1
    out = jnp.where(nvalid[..., None] == 1, single, out)
    out = jnp.where(nvalid[..., None] == 0, jnp.nan, out)
    # move quantile axis to front (xclim convention)
    return jnp.moveaxis(out, -1, 0)


def nan_percentile(x, percentiles, axis: int = -1, alpha: float = 1.0, beta: float = 1.0):
    """Percentile variant (0-100), quantile axis moved to the END
    (xclim ``calc_perc`` convention, core/utils.py:279)."""
    out = nan_quantile(x, jnp.asarray(percentiles, dtype=jnp.float32) / 100.0,
                       axis=axis, alpha=alpha, beta=beta)
    return jnp.moveaxis(out, 0, -1)
