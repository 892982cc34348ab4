"""Fused QDM adjust — per-doy rank + adjustment-factor interpolation.

QDM's adjust step (reference: xsdba.QuantileDeltaMapping.adjust, Cannon et
al. 2015; xclim re-exports xsdba as xclim.sdba — xclim:src/xclim/sdba.py)
ranks every simulated value within its (windowless) day-of-year group and
interpolates the trained adjustment factors at that empirical rank. The XLA
formulation (sdba/adjustment.py _qdm_adjust_core) materializes a
(G, ms, nq, C) one-hot bracket select — ~44 ms for 30 y x 4096 cells.

This kernel streams (db, Ypad, BC) doy blocks through VMEM once:

* rank = compare-count over Y rolls (upper-tie semantics, bit-identical to
  sdba.utils.grouped_rank's count path);
* fully-valid lanes: rank takes only Y discrete values, so the whole
  node interpolation collapses to ONE static (Y, nq) hat-weight matrix
  applied OUTSIDE the kernel on the MXU (af_at_rank = W @ af) and a Y-term
  one-hot select in-kernel;
* lanes with missing samples take an in-kernel general path (static-node
  bracket count + one-hot node selects) under a per-block lax.cond, so
  mask-type NaN grids (all-valid or all-NaN lanes) never pay for it;
* NaNs ride the BIG sentinel (no NaN literals in-kernel, see spells.py).

Layouts are lane-blocked like ops/pallas/winquantile.py: every DMA is
contiguous.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["qdm_adjust_doy", "rank_weight_matrix"]

BIG = 3.0e38

_LANES = 128


def _pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def rank_weight_matrix(Y: int, q: np.ndarray) -> np.ndarray:
    """(Y, nq) hat weights: row r interpolates the nodes at
    tau = (r+1)/Y with constant extrapolation — the same f32 op sequence as
    sdba.utils.interp_hat_nodes (clip into [q0, qlast], bracket by count,
    linear weight clipped to [0, 1])."""
    q = np.asarray(q, dtype=np.float32)
    nq = len(q)
    W = np.zeros((Y, nq), dtype=np.float32)
    for r in range(Y):
        tau = np.float32(np.float32(r + 1) / np.float32(Y))
        tc = np.float32(min(max(tau, q[0]), q[-1]))
        cnt = int(np.sum(q <= tc))
        hi = min(max(cnt, 1), nq - 1)
        lo = hi - 1
        denom = np.float32(q[hi] - q[lo])
        w = np.float32(tc - q[lo]) / (denom if denom != 0 else np.float32(1))
        w = np.float32(min(max(float(w), 0.0), 1.0))
        W[r, lo] = np.float32(1.0) - w
        W[r, hi] += w
    return W


def _kernel(x_ref, afr_ref, afq_ref, out_ref, *, Y, Ypad, nq, BC, qvals,
            kind):
    x = x_ref[0, 0]                                    # (Ypad, BC)
    valid = x < BIG * 0.5
    vf = valid.astype(jnp.float32)
    nv = jnp.sum(vf, axis=0)                           # (BC,)

    # upper-tie compare-count rank: cnt_i = #(x_j <= x_i, j valid)
    from jax.experimental.pallas import tpu as pltpu

    cnt = vf                                           # j == i term
    # all Ypad-1 circular offsets: with Ypad > Y, j capped at Y-1 would skip
    # real partners for early rows (pad rows are inert via the valid mask)
    for j in range(1, Ypad):
        xr = pltpu.roll(x, j, 0)
        cnt = cnt + ((xr <= x) & (xr < BIG * 0.5)).astype(jnp.float32)

    def fast(_):
        # every lane fully valid (or fully missing): af at rank r comes from
        # the precomputed MXU product af_at_rank[r] = W[r] @ af
        acc = jnp.zeros((Ypad, BC), jnp.float32)
        for r in range(Y):
            sel = (cnt == jnp.float32(r + 1)).astype(jnp.float32)
            acc = acc + afr_ref[0, 0, r][None, :] * sel
        return acc

    def general(_):
        # lane-wise valid counts: tau = cnt / nv, bracket the static nodes
        tau = cnt / jnp.maximum(nv, 1.0)[None, :]
        tc = jnp.clip(tau, qvals[0], qvals[-1])
        bq = jnp.zeros((Ypad, BC), jnp.float32)
        for k in range(nq):
            bq = bq + (qvals[k] <= tc).astype(jnp.float32)
        hi = jnp.clip(bq, 1.0, jnp.float32(nq - 1))
        lo = hi - 1.0
        x0 = jnp.zeros((Ypad, BC), jnp.float32)
        x1 = jnp.zeros((Ypad, BC), jnp.float32)
        y0 = jnp.zeros((Ypad, BC), jnp.float32)
        y1 = jnp.zeros((Ypad, BC), jnp.float32)
        for k in range(nq):
            mlo = (lo == jnp.float32(k)).astype(jnp.float32)
            mhi = (hi == jnp.float32(k)).astype(jnp.float32)
            afk = afq_ref[0, 0, k][None, :]
            x0 = x0 + qvals[k] * mlo
            x1 = x1 + qvals[k] * mhi
            y0 = y0 + afk * mlo
            y1 = y1 + afk * mhi
        denom = x1 - x0
        w = (tc - x0) / jnp.where(denom == 0, 1.0, denom)
        w = jnp.clip(w, 0.0, 1.0)
        return y0 + w * (y1 - y0)

    uniform = jnp.all((nv == jnp.float32(Y)) | (nv == 0.0))
    af_v = jax.lax.cond(uniform, fast, general, None)
    adj = x + af_v if kind == "+" else x * af_v
    out_ref[0, 0] = jnp.where(valid, adj, BIG)


@functools.partial(jax.jit, static_argnames=("q_tuple", "kind", "interpret"))
def _call(xd, af, W, *, q_tuple, kind, interpret=False):
    n_doy, Y, C = xd.shape
    nq = af.shape[1]
    Ypad = max(8, -(-Y // 8) * 8)
    nqp = max(8, -(-nq // 8) * 8)
    Cp = -(-C // _LANES) * _LANES
    nc = Cp // _LANES

    x = jnp.where(xd == xd, xd, BIG)
    afz = jnp.where(af == af, af, 0.0)
    # af at each full-valid rank: one MXU contraction outside the kernel
    # (HIGHEST precision: the default bf16 matmul costs ~3 decimal digits,
    # measured 2e-2 abs on K-scale factors)
    af_rank = jnp.einsum("rk,gkc->grc", W, afz,
                         precision=jax.lax.Precision.HIGHEST)  # (n_doy, Y, C)

    def block(a, rows):
        pad_r = rows - a.shape[1]
        if pad_r or Cp > C:
            a = jnp.pad(a, ((0, 0), (0, pad_r), (0, Cp - C)),
                        constant_values=BIG)
        return jnp.moveaxis(a.reshape(n_doy, rows, nc, _LANES), 2, 0)

    xb = block(x, Ypad)
    afr_b = block(af_rank, Ypad)
    afq_b = block(afz, nqp)

    qvals = tuple(float(np.float32(v)) for v in q_tuple)
    kernel = functools.partial(_kernel, Y=Y, Ypad=Ypad, nq=nq, BC=_LANES,
                               qvals=qvals, kind=kind)
    out = pl.pallas_call(
        kernel,
        grid=(nc, n_doy),
        in_specs=[pl.BlockSpec((1, 1, Ypad, _LANES),
                               lambda ci, gi: (ci, gi, 0, 0)),
                  pl.BlockSpec((1, 1, Ypad, _LANES),
                               lambda ci, gi: (ci, gi, 0, 0)),
                  pl.BlockSpec((1, 1, nqp, _LANES),
                               lambda ci, gi: (ci, gi, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, Ypad, _LANES),
                               lambda ci, gi: (ci, gi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nc, n_doy, Ypad, _LANES),
                                       jnp.float32),
        interpret=interpret,
    )(xb, afr_b, afq_b)
    out = jnp.moveaxis(out, 0, 2).reshape(n_doy, Ypad, Cp)[:, :Y, :C]
    return jnp.where(out >= BIG * 0.5, jnp.nan, out)


def qdm_adjust_doy(xd, af, q, kind: str = "+", interpret: bool = False):
    """Adjusted values for doy-sliced sim data.

    xd: (n_doy, Y, C) — sim gathered to per-doy year slots (NaN padded);
    af: (n_doy, nq, C) trained adjustment factors; q: (nq,) nodes.
    Returns (n_doy, Y, C) with af interpolated at each value's empirical
    within-group rank, matching _qdm_adjust_core's interp_hat_nodes path
    (linear interp, constant extrapolation).
    """
    q = np.asarray(q, dtype=np.float32).reshape(-1)
    Y = xd.shape[1]
    if Y > 64:
        raise ValueError(f"too many year slots for the adjust kernel: {Y}")
    W = jnp.asarray(rank_weight_matrix(Y, q))
    return _call(jnp.asarray(xd, jnp.float32), jnp.asarray(af, jnp.float32),
                 W, q_tuple=tuple(float(v) for v in q), kind=kind,
                 interpret=interpret)
