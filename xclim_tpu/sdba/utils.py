"""sdba numerical utilities: grouped quantiles and quantile-axis interpolation
(reference: xsdba.utils — xclim.sdba shim, xclim:src/xclim/sdba.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.ops.quantile import nan_quantile
from xclim_tpu.sdba.grouping import Grouper

__all__ = ["equally_spaced_nodes", "grouped_quantile", "interp_on_quantiles",
           "grouped_rank", "interp_hat_nodes", "gather_groups",
           "gather_doy_slices", "windowed_doy_quantile", "windowed_doy_mean"]


def equally_spaced_nodes(n: int, eps: float | None = 1e-4) -> np.ndarray:
    """n quantile nodes, offset from 0/1 (xsdba.utils.equally_spaced_nodes)."""
    dq = 1.0 / n / 2.0
    q = np.linspace(dq, 1 - dq, n)
    if eps is None:
        return q
    return np.insert(np.append(q, 1 - eps), 0, eps)


def grouped_quantile(da: ClimArray, grouper: Grouper, q: np.ndarray,
                     alpha: float = 1.0, beta: float = 1.0):
    """Per-group quantiles: (n_groups, nq, ...space) device array."""
    if grouper.group == "time.dayofyear":
        xf = jnp.moveaxis(da.data, da.time_axis, 0)
        return windowed_doy_quantile(xf, grouper.device_doy_table(da.time),
                                     grouper.window, q, alpha=alpha,
                                     beta=beta)
    table = grouper.device_train_table(da.time)
    ax = da.time_axis
    xf = jnp.moveaxis(da.data, ax, 0)
    g = gather_groups(xf, table)  # (G, ms, ...)
    out = nan_quantile(g, jnp.asarray(q, dtype=jnp.float32), axis=1,
                       alpha=alpha, beta=beta)  # (nq, G, ...)
    return jnp.moveaxis(out, 0, 1)  # (G, nq, ...)


def _winquantile_mode() -> bool:
    """Whether the Pallas windowed-quantile kernel serves this process."""
    from xclim_tpu.ops.pallas.capability import winquantile_supported

    return winquantile_supported()


def wq_attempt() -> bool:
    """Whether sdba train should TRY the Pallas winquantile kernel:
    probe-verified, or probe failure was transient ("attempt" — the caller
    must wrap the jitted call and retry with ``use_pallas=False`` on
    failure; see adjustment._run_train_core)."""
    from xclim_tpu.ops.pallas.capability import winquantile_state

    return winquantile_state() in ("yes", "attempt")


def gather_doy_slices(xf, doy_table):
    """(T, ...) time-first array -> (n_doy, occ, ...) doy slices, NaN padded."""
    t = jnp.asarray(doy_table)
    g = xf[jnp.maximum(t, 0)]
    okshape = t.shape + (1,) * (g.ndim - 2)
    return jnp.where((t >= 0).reshape(okshape), g, jnp.nan)


def windowed_doy_quantile(xf, doy_table, window: int, q, alpha: float = 1.0,
                          beta: float = 1.0, use_pallas: bool | None = None):
    """Quantiles of every ±half-doy window: (n_doy, nq, ...space).

    Dispatches to the Pallas merge kernel (ops/pallas/winquantile.py) when
    the backend compiles it, else the windowed gather+sort XLA path. Both
    share Hyndman-Fan semantics with :func:`nan_quantile` (outputs may differ
    by ~1 ulp of the interpolation weight between engines).
    """
    from xclim_tpu.ops.pallas.capability import wq_dispatch_counts
    from xclim_tpu.ops.pallas.winquantile import (
        doy_window_quantiles, doy_window_quantiles_xla)

    xd = gather_doy_slices(xf, doy_table)         # (n_doy, occ, ...space)
    sshape = xd.shape[2:]
    xd2 = xd.reshape(xd.shape[:2] + (-1,)) if xd.ndim != 3 else xd
    if use_pallas is None:
        use_pallas = _winquantile_mode()
    if use_pallas:
        wq_dispatch_counts["pallas"] += 1
        out = doy_window_quantiles(xd2, q, window, alpha=alpha, beta=beta)
    else:
        wq_dispatch_counts["xla"] += 1
        out = doy_window_quantiles_xla(xd2, q, window, alpha=alpha, beta=beta)
    return out.reshape(out.shape[:2] + sshape)


def windowed_doy_mean(xf, doy_table, window: int):
    """NaN-mean of every ±half-doy window: (n_doy, ...space).

    Per-doy sums/counts then a circular window-sum over the doy axis — one
    pass over the data instead of the window-times-redundant gather."""
    xd = gather_doy_slices(xf, doy_table)
    ok = ~jnp.isnan(xd)
    s = jnp.where(ok, xd, 0.0).sum(axis=1)        # (n_doy, ...)
    c = ok.sum(axis=1).astype(jnp.float32)
    n_doy = s.shape[0]
    half = window // 2
    rows = (np.arange(n_doy)[:, None]
            + np.arange(-half, half + 1)[None, :]) % n_doy
    sw = s[rows.reshape(-1)].reshape((n_doy, window) + s.shape[1:]).sum(axis=1)
    cw = c[rows.reshape(-1)].reshape((n_doy, window) + c.shape[1:]).sum(axis=1)
    return jnp.where(cw > 0, sw / jnp.maximum(cw, 1.0), jnp.nan)


def interp_on_quantiles(x, xq, yq, method: str = "linear",
                        extrapolation: str = "constant"):
    """y(x) by piecewise-linear interp of (xq → yq) along the quantile axis.

    x: (..., ms, C); xq, yq: (..., nq, C) sorted along -2. Constant
    extrapolation clamps to the edge values (xsdba default
    ``extrapolation='constant'``).

    Gather-free: the bracketing index comes from a direct comparison count
    (nq is small) and the bracketing values from one-hot selection sums —
    per-lane ``take_along_axis`` gathers cost ~70x the equivalent fused
    compare-select reductions on the TPU tunnel backend.
    """
    nq = xq.shape[-2]
    # #(xq <= x): (..., nq, ms, C) compare reduced over nq; NaN nodes
    # compare False, i.e. count as greater (they sort last)
    cnt = jnp.sum((xq[..., :, None, :] <= x[..., None, :, :]),
                  axis=-3).astype(jnp.int32)
    hi = jnp.clip(cnt, 1, nq - 1)
    lo = hi - 1
    k = jnp.arange(nq, dtype=jnp.int32).reshape(
        (1,) * (x.ndim - 2) + (nq, 1, 1))
    sel_lo = k == lo[..., None, :, :]
    sel_hi = k == hi[..., None, :, :]
    xqe = xq[..., :, None, :]
    yqe = yq[..., :, None, :]
    x0 = jnp.sum(jnp.where(sel_lo, xqe, 0.0), axis=-3)
    x1 = jnp.sum(jnp.where(sel_hi, xqe, 0.0), axis=-3)
    y0 = jnp.sum(jnp.where(sel_lo, yqe, 0.0), axis=-3)
    y1 = jnp.sum(jnp.where(sel_hi, yqe, 0.0), axis=-3)
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

    Two formulations sharing the same tie semantics (upper count):

    * small groups (ms <= 128, the windowless adjust tables): a brute
      compare-count — #(group <= v) as one fused O(ms^2) reduction; beats
      two full sorts by ~25x on-chip at (365, 30, cells);
    * large groups: one variadic sort yields the permutation; the tie-run
      upper bound comes from a flipped cummax; a second variadic sort keyed
      on the permutation un-sorts the counts (gather-free — per-lane gathers
      are ~100x slower than sorts on the TPU tunnel backend).
    """
    import jax

    ms = sim_g.shape[-2]
    if ms <= 128:
        cnt = jnp.sum(sim_g[..., :, None, :] <= sim_g[..., None, :, :],
                      axis=-3)
        n = jnp.maximum(nvalid[..., None, :], 1)
        return cnt.astype(jnp.float32) / n.astype(jnp.float32)
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


def gather_groups(xf, table):
    """Group-gather a time-first array with an int32 table, NaN-padding the
    -1 slots. xf: (T, ...); table: (G, ms) → (G, ms, ...). Traceable."""
    t = jnp.asarray(table)
    g = xf[jnp.maximum(t, 0)]
    okshape = t.shape + (1,) * (g.ndim - 2)
    return jnp.where((t >= 0).reshape(okshape), g, jnp.nan)


def interp_hat_nodes(tau, q, yq):
    """y(tau) by piecewise-linear interpolation on the SHARED sorted 1-D node
    vector ``q`` (not necessarily uniform) — a single hat-basis contraction,
    no rank search and no per-lane gathers (measured 71x the searchsorted+
    gather path on the tunnel backend):

        y = Σ_k φ_k(tau) · yq[k],   φ_k the hat on [q_{k-1}, q_k, q_{k+1}]

    tau: (G, ms, C); q: (nq,) strictly increasing; yq: (G, nq, C).
    Constant extrapolation (clamp into [q₀, q_{nq−1}]). Matches the default
    equally_spaced_nodes grid, whose eps end nodes make it non-uniform.
    """
    q = jnp.asarray(q, dtype=jnp.float32)
    nq = q.shape[0]
    tc = jnp.clip(tau, q[0], q[-1])
    # Bracketing node from a fused compare-count: the hat-basis einsum this
    # replaces contracts a (G, ms, nq, C) weight tensor on the MXU — ~10x
    # the arithmetic of counting the 1-D bracket and one-hot-selecting the
    # two bracketing nodes (the approach interp_on_quantiles already uses).
    qb = q.reshape((1,) * (tau.ndim - 1) + (nq, 1))       # (1, 1, nq, 1)
    cnt = jnp.sum(qb <= tc[..., None, :], axis=-2).astype(jnp.int32)
    hi = jnp.clip(cnt, 1, nq - 1)
    lo = hi - 1
    k = jnp.arange(nq, dtype=jnp.int32).reshape((1,) * (tau.ndim - 1) + (nq, 1))
    sel_lo = k == lo[..., None, :]                        # (G, ms, nq, C)
    sel_hi = k == hi[..., None, :]
    x0 = jnp.sum(jnp.where(sel_lo, qb, 0.0), axis=-2)
    x1 = jnp.sum(jnp.where(sel_hi, qb, 0.0), axis=-2)
    yqe = yq[..., None, :, :]                             # (G, 1, nq, C)
    y0 = jnp.sum(jnp.where(sel_lo, yqe, 0.0), axis=-2)
    y1 = jnp.sum(jnp.where(sel_hi, yqe, 0.0), axis=-2)
    denom = x1 - x0
    w = (tc - x0) / jnp.where(denom == 0, 1.0, denom)
    w = jnp.clip(w, 0.0, 1.0)
    out = y0 + w * (y1 - y0)
    return jnp.where(jnp.isnan(tau), jnp.nan, out)
