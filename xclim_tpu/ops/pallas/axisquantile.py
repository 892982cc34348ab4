"""Small-axis Hyndman-Fan quantiles — the ensemble/realization kernel.

``nan_quantile`` reduces over an axis with XLA's variadic sort; for SHORT
axes (ensemble realizations ~30, per-doy year samples ~30) that sort runs at
~0.4 G elem/s on the tunnel backend (probe in tools/probe_roofline.py —
lane-starved: the comparator network re-reads HBM per stage).  The whole
statistic is tiny per lane, so this kernel streams (Mp, BC) lane blocks
through VMEM once and does everything on registers:

* full bitonic sort of the padded power-of-two axis (Mp <= 64: at most
  21 compare-exchange substages);
* per-lane valid counts and Hyndman-Fan interpolation, with the SAME f32 op
  sequencing as :func:`xclim_tpu.ops.quantile.nan_quantile` (h = n*q +
  (q*(1-a-b)+a), then -1, clip, floor, one-hot select, v0*(1-g)+v1*g);
* NaNs map to a large finite sentinel host-side (they sort to the end and
  drop out of the counts — ``jnp.isnan`` does not lower on the axon Mosaic
  backend, see ops/pallas/spells.py).

Reference behavior being replaced: the realization-axis percentile loop of
``ensemble_percentiles`` (xclim:src/xclim/ensembles/_base.py:214-376) and
``calc_perc`` (xclim:src/xclim/core/utils.py:279).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["axis_quantile_small", "MAX_AXIS"]

#: sentinel for missing values: finite (inf arithmetic poisons selection)
BIG = 3.0e38

#: largest reduce-axis length this kernel serves (one padded VMEM block)
MAX_AXIS = 64

_LANES = 512


def _ce(x, k, asc_mask):
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    down = pltpu.roll(x, n - k, 0)
    up = pltpu.roll(x, k, 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    low = (ii & k) == 0
    partner = jnp.where(low, down, up)
    want_small = low == asc_mask
    return jnp.where(want_small, jnp.minimum(x, partner),
                     jnp.maximum(x, partner))


def _kernel(x_ref, *out_refs, M, Mp, nq, BC, qvals, coffs):
    x = x_ref[...]                                   # (Mp, BC)
    # NaN -> BIG and row masking happen HERE: mapping them host-side cost
    # two full HBM copies (a jnp.where producer plus the sublane jnp.pad —
    # ~25 ms at the 1.4 GB ensembles shape, since XLA cannot fuse
    # producers into a pallas_call operand)
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    ok = (rows < M) & ((x >= 0.0) | (x < 0.0))       # False for NaN/pad
    x = jnp.where(ok, x, BIG)
    nv = jnp.sum(ok.astype(jnp.float32), axis=0)     # (BC,)

    # full bitonic sort ascending along the sublane axis
    ii = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    p = 1
    while p <= Mp // 2:
        asc = (ii & (2 * p)) == 0
        k = p
        while k >= 1:
            x = _ce(x, k, asc)
            k //= 2
        p *= 2

    nvm1 = jnp.maximum(nv - 1.0, 0.0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (Mp, BC), 0)
    for j in range(nq):
        h = jnp.clip((nv * qvals[j] + coffs[j]) - 1.0, 0.0, nvm1)
        k0 = jnp.floor(h).astype(jnp.int32)
        gam = h - k0.astype(jnp.float32)
        k1 = jnp.minimum(k0 + 1, nvm1.astype(jnp.int32))
        sel0 = (iota == k0[None, :]).astype(x.dtype)
        sel1 = (iota == k1[None, :]).astype(x.dtype)
        v0 = jnp.sum(x * sel0, axis=0)
        v1 = jnp.sum(x * sel1, axis=0)
        out_refs[j][0, :] = v0 * (1.0 - gam) + v1 * gam


@functools.partial(jax.jit, static_argnames=("q_tuple", "alpha", "beta",
                                             "interpret"))
def _call(x2, *, q_tuple, alpha, beta, interpret=False):
    M, C = x2.shape
    Mp = max(8, 1 << (M - 1).bit_length())
    Cp = -(-C // _LANES) * _LANES
    x = x2
    if Cp > C:
        # lane padding still copies; sublane (row) padding and the NaN
        # sentinel mapping are handled by the in-kernel row mask instead
        x = jnp.pad(x, ((0, 0), (0, Cp - C)), constant_values=BIG)
    qvals = tuple(float(np.float32(v)) for v in q_tuple)
    coffs = tuple(float(np.float32(np.float32(v)
                                   * np.float32(1 - alpha - beta))
                        + np.float32(alpha)) for v in qvals)
    nq = len(qvals)
    kernel = functools.partial(_kernel, M=M, Mp=Mp, nq=nq, BC=_LANES,
                               qvals=qvals, coffs=coffs)
    outs = pl.pallas_call(
        kernel,
        grid=(Cp // _LANES,),
        in_specs=[pl.BlockSpec((Mp, _LANES), lambda i: (0, i))],
        out_specs=[pl.BlockSpec((1, _LANES), lambda i: (0, i))] * nq,
        out_shape=[jax.ShapeDtypeStruct((1, Cp), jnp.float32)] * nq,
        interpret=interpret,
    )(x)
    out = jnp.concatenate(outs, axis=0)[:, :C]       # (nq, C)
    return jnp.where(out >= BIG * 0.5, jnp.nan, out)


def axis_quantile_small(x2, q, alpha: float = 1.0, beta: float = 1.0,
                        interpret: bool = False):
    """Quantiles over the leading axis of a (M, C) float32 array, M <= 64.

    Same semantics as :func:`xclim_tpu.ops.quantile.nan_quantile` with the
    reduce axis first: (nq, C) output, all-NaN lanes -> NaN, single-valid ->
    that value, H-F (alpha, beta) interpolation.
    """
    qs = np.asarray(q, dtype=np.float64).reshape(-1)
    if x2.shape[0] > MAX_AXIS:
        raise ValueError(f"axis too long for the small-axis kernel: "
                         f"{x2.shape[0]} > {MAX_AXIS}")
    return _call(jnp.asarray(x2, jnp.float32), q_tuple=tuple(qs),
                 alpha=float(alpha), beta=float(beta), interpret=interpret)


# ---------------------------------------------------------------------------
# layout-preserving 3-D variant: (M, R, L) with the array's own minor dim
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _batcher_pairs(n: int) -> tuple:
    """Batcher odd-even mergesort comparators (any n)."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return tuple(pairs)


def _kernel3(x_ref, *out_refs, M, nq, qvals, coffs):
    """(M, RB, L) block: static Batcher network over the leading axis.

    Unlike the 2-D kernel's bitonic rolls, the members are addressed by
    STATIC leading-dim indexing (x_ref[i]) — each value is an (RB, L) VMEM
    tile and every comparator is a plain min/max, so the whole sort runs on
    natural (…, L)-minor layout. This avoids the (M, C) flatten of the 2-D
    path, whose physical relayout costs ~5x the kernel itself when the minor
    dim is not 128-aligned (measured 205 ms for (30, 365, 192, 448) f32 on
    v5e vs 41 ms for the lane-aligned case).
    """
    vals = []
    nv = None
    for i in range(M):
        v = x_ref[i]
        ok = (v >= 0.0) | (v < 0.0)          # False for NaN
        okf = ok.astype(jnp.float32)
        nv = okf if nv is None else nv + okf
        vals.append(jnp.where(ok, v, BIG))
    for a, b in _batcher_pairs(M):
        lo = jnp.minimum(vals[a], vals[b])
        hi = jnp.maximum(vals[a], vals[b])
        vals[a], vals[b] = lo, hi
    nvm1 = jnp.maximum(nv - 1.0, 0.0)
    for j in range(nq):
        h = jnp.clip((nv * qvals[j] + coffs[j]) - 1.0, 0.0, nvm1)
        acc = jnp.zeros_like(vals[0])
        for k in range(M):
            w = jnp.clip(1.0 - jnp.abs(h - k), 0.0, 1.0)
            # w == 0 zeroes the BIG padding; no inf arithmetic (BIG finite)
            acc = acc + jnp.where(w > 0.0, vals[k], 0.0) * w
        out_refs[j][0] = jnp.where(nv > 0.0, acc, BIG)


@functools.partial(jax.jit, static_argnames=("q_tuple", "alpha", "beta",
                                             "interpret"))
def _call3(x3, *, q_tuple, alpha, beta, interpret=False):
    M, R, L = x3.shape
    qvals = tuple(float(np.float32(v)) for v in q_tuple)
    coffs = tuple(float(np.float32(np.float32(v)
                                   * np.float32(1 - alpha - beta))
                        + np.float32(alpha)) for v in qvals)
    nq = len(qvals)
    # ~2 MB VMEM per in-flight input block (double-buffered by the pipeline)
    Lp = -(-L // 128) * 128
    RB = max(8, min(256, (2 * 1024 * 1024 // (M * Lp * 4) // 8) * 8))
    Rp = -(-R // RB) * RB
    kernel = functools.partial(_kernel3, M=M, nq=nq, qvals=qvals,
                               coffs=coffs)
    outs = pl.pallas_call(
        kernel,
        grid=(Rp // RB,),
        in_specs=[pl.BlockSpec((M, RB, L), lambda i: (0, i, 0))],
        out_specs=[pl.BlockSpec((1, RB, L), lambda i: (0, i, 0))] * nq,
        out_shape=[jax.ShapeDtypeStruct((1, Rp, L), jnp.float32)] * nq,
        interpret=interpret,
    )(x3)
    out = jnp.concatenate(outs, axis=0)[:, :R, :]    # (nq, R, L)
    return jnp.where(out >= BIG * 0.5, jnp.nan, out)


def axis_quantile_small_nd(x, q, alpha: float = 1.0, beta: float = 1.0,
                           interpret: bool = False):
    """Quantiles over the leading axis of an (M, ..., L) array, keeping the
    minor dim physical: the middle dims collapse for free. M <= MAX_AXIS."""
    if x.shape[0] > MAX_AXIS:
        raise ValueError(f"axis too long for the small-axis kernel: "
                         f"{x.shape[0]} > {MAX_AXIS}")
    qs = np.asarray(q, dtype=np.float64).reshape(-1)
    M = x.shape[0]
    L = x.shape[-1]
    mid = x.shape[1:-1]
    x3 = jnp.asarray(x, jnp.float32).reshape(M, -1, L)
    out = _call3(x3, q_tuple=tuple(qs), alpha=float(alpha),
                 beta=float(beta), interpret=interpret)
    return out.reshape((out.shape[0],) + mid + (L,))
