"""Segment-reduction engine: resample(time=freq).op as static gathers + dense reductions.

TPU-first replacement for xarray's ``resample`` / dask groupby (reference:
``resample_map`` xclim:src/xclim/indices/helpers.py:898-976 and the universal
``da.resample(time=freq).mean()`` pattern). The host builds a static
``(nseg, maxlen)`` gather table of time indices from a
:class:`~xclim_tpu.core.calendar.SegmentSpec`; the device does one gather along
the time axis and a dense masked reduction — fully static shapes, XLA fuses the
mask+reduce, no scatter.

Convention: the time axis may be any axis; kernels move it to the front
internally. All reductions are NaN-skipping by default (xarray ``skipna=True``
semantics) unless stated otherwise.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.calendar import SegmentSpec

__all__ = [
    "build_gather_table",
    "segment_reduce",
    "segment_argminmax",
    "segment_first_last",
    "rolling_reduce",
]


@functools.lru_cache(maxsize=512)
def _cached_table(key):
    raise RuntimeError  # placeholder; tables built in build_gather_table


def build_gather_table(spec: SegmentSpec) -> np.ndarray:
    """(nseg, maxlen) int32 table of time indices per segment, -1 padded.

    Cached on the SegmentSpec object itself (host-side, cheap).
    """
    tbl = getattr(spec, "_gather_table", None)
    if tbl is not None:
        return tbl
    nseg = spec.nseg
    maxlen = int(spec.counts.max()) if nseg else 0
    tbl = np.full((nseg, maxlen), -1, dtype=np.int32)
    order = np.arange(len(spec.seg_id), dtype=np.int32)
    # seg_id is sorted; position within segment:
    within = order - spec.starts[spec.seg_id]
    tbl[spec.seg_id, within] = order
    object.__setattr__(spec, "_gather_table", tbl)
    return tbl


def _moveaxis_front(x, axis):
    return jnp.moveaxis(x, axis, 0)


_IDENTITY = {
    "sum": 0.0,
    "mean": 0.0,
    "max": -jnp.inf,
    "min": jnp.inf,
    "any": False,
    "all": True,
    "count": 0,
    "prod": 1.0,
}


def _gather_segments(x, table, axis):
    """Gather x (time on `axis`) into (..., nseg, maxlen, ...) plus validity mask."""
    xf = _moveaxis_front(x, axis)  # (T, ...)
    t = jnp.asarray(table)  # (nseg, maxlen)
    safe = jnp.maximum(t, 0)
    g = xf[safe]  # (nseg, maxlen, ...)
    pad_ok = (t >= 0)
    extra = (1,) * (g.ndim - 2)
    pad_ok = pad_ok.reshape(t.shape + extra)
    return g, pad_ok


def _segments_contiguous(spec: SegmentSpec) -> bool:
    """Whether segments tile the time axis contiguously in order (true for
    every resample_segments spec; required by the one-pass Pallas kernel)."""
    flag = getattr(spec, "_contiguous", None)
    if flag is None:
        starts = np.asarray(spec.starts, dtype=np.int64)
        counts = np.asarray(spec.counts, dtype=np.int64)
        flag = bool(
            len(starts)
            and starts[0] == 0
            and np.all(starts[1:] == starts[:-1] + counts[:-1])
            and starts[-1] + counts[-1] == len(spec.seg_id))
        object.__setattr__(spec, "_contiguous", flag)
    return flag


#: one-pass kernel limits: VMEM block budget (time-rows x 512 lanes x 4 B,
#: double-buffered by the Pallas pipeline) and the static-unroll bound
_SEGRED_MAX_T = 12288
_SEGRED_MAX_NSEG = 512


def _pallas_segment_reduce(x, spec, op, axis):
    """One-pass Pallas path; None → caller falls through to the XLA gather."""
    from xclim_tpu.ops.pallas.segred import SUPPORTED_OPS

    if op not in SUPPORTED_OPS:
        return None
    if os.environ.get("XCLIM_TPU_SEGRED", "") != "all":
        # A/B on v5e at (3650, 512x512) monthly mean, round 4: the static
        # slice-unroll XLA path runs the kernel in ~4.5 ms (one fused HBM
        # pass, ~855 GB/s effective) vs ~24 ms for the MXU segred kernel and
        # ~21 ms for the gather path — the whole Pallas stat family stays
        # opt-in until a kernel beats the slice unroll (VERDICT r2 #5 /
        # r3 #2: default to the measured winner)
        return None
    if not jnp.issubdtype(jnp.result_type(x), jnp.floating):
        return None
    T = x.shape[axis]
    if T != len(spec.seg_id) or T > _SEGRED_MAX_T:
        return None
    if spec.nseg > _SEGRED_MAX_NSEG or not _segments_contiguous(spec):
        return None
    from xclim_tpu.ops.pallas.capability import segred_supported

    if not segred_supported():
        return None
    from xclim_tpu.ops.pallas.segred import segment_reduce_onepass

    xf = _moveaxis_front(x, axis)
    shape = xf.shape
    try:
        out = segment_reduce_onepass(xf.reshape(T, -1), spec, op)
    except Exception:
        from xclim_tpu.ops.pallas.capability import set_pallas_mode

        set_pallas_mode("off")
        return None
    out = out.reshape((spec.nseg,) + shape[1:])
    return jnp.moveaxis(out, 0, axis)


#: slice-unroll compile-size guard: each segment adds a handful of HLO ops,
#: so very long specs (sub-daily resamples over decades) fall back to the
#: gather formulation rather than emit a huge program
_SLICE_MAX_NSEG = 2048

#: ops the slice path serves (median needs a ragged per-segment sort — the
#: masked fixed-width gather is the right shape for it)
_SLICE_OPS = frozenset(
    {"sum", "mean", "max", "min", "count", "any", "all", "prod", "std", "var"})


def _slice_segment_reduce(x, spec: SegmentSpec, op: str, axis: int,
                          skipna: bool):
    """Contiguous segments as static lax slices + per-segment dense reduce.

    XLA fuses the whole unrolled loop into one HBM traversal of the input:
    measured at (3650, 512x512) f32 monthly nanmean on v5e, ~4.5 ms of
    kernel time (~855 GB/s effective) vs ~21 ms for the gather+reduce and
    ~24 ms for the Pallas MXU segred kernel — and it embeds NO gather-table
    constant in the program (helps the tunnel backend's program-size limit).
    Returns None when the spec/op is out of scope (caller falls through).
    """
    if op not in _SLICE_OPS or spec.nseg == 0 or spec.nseg > _SLICE_MAX_NSEG:
        return None
    if x.shape[axis] != len(spec.seg_id) or not _segments_contiguous(spec):
        return None
    starts = np.asarray(spec.starts)
    counts = np.asarray(spec.counts)
    xf = _moveaxis_front(x, axis)
    isfloat = jnp.issubdtype(xf.dtype, jnp.floating)
    masked = isfloat and skipna
    outs = []
    for s in range(spec.nseg):
        a = int(starts[s])
        n = int(counts[s])
        seg = jax.lax.slice_in_dim(xf, a, a + n, axis=0)
        if masked:
            valid = ~jnp.isnan(seg)
            cnt = valid.sum(axis=0)
        else:
            valid = None
            cnt = None

        def _m(fill):
            return jnp.where(valid, seg, fill) if masked else seg

        if op == "count":
            o = cnt if masked else jnp.full(seg.shape[1:], n,
                                            dtype=jnp.int32)
        elif op in ("sum", "mean"):
            sm = _m(0).sum(axis=0)
            o = sm if op == "sum" else (sm / jnp.maximum(cnt, 1) if masked
                                        else sm / n)
            if masked:
                o = jnp.where(cnt > 0, o, jnp.nan)
        elif op == "prod":
            o = _m(1).prod(axis=0)
        elif op == "max":
            o = _m(-jnp.inf).max(axis=0)
            if masked:
                o = jnp.where(cnt > 0, o, jnp.nan)
        elif op == "min":
            o = _m(jnp.inf).min(axis=0)
            if masked:
                o = jnp.where(cnt > 0, o, jnp.nan)
        elif op == "any":
            o = (_m(False) if masked else seg).any(axis=0)
        elif op == "all":
            o = (_m(True) if masked else seg).all(axis=0)
        else:  # std / var, ddof=0 (xarray default)
            sm = _m(0).sum(axis=0)
            if masked:
                mu = sm / jnp.maximum(cnt, 1)
                d2 = jnp.where(valid, (seg - mu[None]) ** 2, 0).sum(axis=0)
                var = d2 / jnp.maximum(cnt, 1)
                o = jnp.where(cnt > 0,
                              var if op == "var" else jnp.sqrt(var), jnp.nan)
            else:
                mu = sm / n
                var = ((seg - mu[None]) ** 2).sum(axis=0) / n
                o = var if op == "var" else jnp.sqrt(var)
        outs.append(o)
    out = jnp.stack(outs)
    return jnp.moveaxis(out, 0, axis)


def segment_reduce(x, spec: SegmentSpec, op: str, axis: int = 0, skipna: bool = True,
                   _no_pallas: bool = False):
    """resample(time=freq).op(...) over the given axis.

    Parameters
    ----------
    x : array with time on `axis`
    spec : SegmentSpec from resample_segments
    op : one of sum/mean/max/min/count/any/all/std/var/median/prod
    skipna : NaN-skipping reduction (xarray default)

    Returns array with time axis replaced by segment axis (length nseg).

    Dispatch (round-4 A/B on v5e, fastest first — see _slice_segment_reduce):
    contiguous specs unroll into static lax slices with dense per-segment
    reductions (one fused HBM pass, no gather-table constant); the Pallas
    one-pass kernel is opt-in via XCLIM_TPU_SEGRED=all (it lost its A/B to
    the slice unroll); non-contiguous specs (doy groups) and median take the
    masked gather+reduce below.

    Note: a one-hot-matmul formulation (MXU dot with a (nseg, T) selection
    matrix) beats the gather+reduce 2.2x as a STANDALONE kernel (40 ms vs
    88 ms at monthly (3650, 262144) f32 on v5e), but loses end-to-end in the
    indicator pipeline (67 ms vs 49 ms for tg_mean): matmul operands must be
    materialized in HBM, while XLA fuses the gather path's compare/where/
    convert producers and the missing-value count into ONE traversal of the
    input. The slice unroll keeps that fusion AND drops the gathered copy.
    """
    if skipna and not _no_pallas and \
            os.environ.get("XCLIM_TPU_SEGRED", "") == "all":
        out = _pallas_segment_reduce(x, spec, op, axis)
        if out is not None:
            return out
    out = _slice_segment_reduce(x, spec, op, axis, skipna)
    if out is not None:
        return out
    table = build_gather_table(spec)
    g, pad_ok = _gather_segments(x, table, axis)
    isfloat = jnp.issubdtype(g.dtype, jnp.floating)
    if isfloat and skipna:
        valid = pad_ok & ~jnp.isnan(g)
    else:
        valid = jnp.broadcast_to(pad_ok, g.shape)

    if op == "count":
        out = valid.sum(axis=1)
    elif op in ("sum", "mean"):
        s = jnp.where(valid, g, 0).sum(axis=1)
        if op == "sum":
            out = s
        else:
            n = valid.sum(axis=1)
            out = s / jnp.maximum(n, 1)
        if isfloat:
            n = valid.sum(axis=1)
            out = jnp.where(n > 0, out, jnp.nan)
    elif op == "prod":
        out = jnp.where(valid, g, 1).prod(axis=1)
    elif op == "max":
        out = jnp.where(valid, g, -jnp.inf).max(axis=1)
        if isfloat:
            out = jnp.where(valid.any(axis=1), out, jnp.nan)
    elif op == "min":
        out = jnp.where(valid, g, jnp.inf).min(axis=1)
        if isfloat:
            out = jnp.where(valid.any(axis=1), out, jnp.nan)
    elif op == "any":
        out = jnp.where(valid, g, False).any(axis=1)
    elif op == "all":
        out = jnp.where(valid, g, True).all(axis=1)
    elif op in ("std", "var"):
        n = valid.sum(axis=1)
        s = jnp.where(valid, g, 0).sum(axis=1)
        mu = s / jnp.maximum(n, 1)
        d2 = jnp.where(valid, (g - jnp.expand_dims(mu, 1)) ** 2, 0).sum(axis=1)
        var = d2 / jnp.maximum(n, 1)  # ddof=0 (xarray default)
        out = jnp.where(n > 0, var if op == "var" else jnp.sqrt(var), jnp.nan)
    elif op == "median":
        from xclim_tpu.ops.quantile import nan_quantile

        gm = jnp.where(valid, g, jnp.nan)
        out = nan_quantile(gm, jnp.array([0.5]), axis=1)[0]
    else:
        raise ValueError(f"Unknown segment op {op!r}")
    return jnp.moveaxis(out, 0, axis)


def segment_argminmax(x, spec: SegmentSpec, op: str = "max", axis: int = 0):
    """Absolute time index of per-segment extreme (NaN-skipping).

    Returns (idx, has_valid): idx int32 array (segments on `axis`), index into
    the original time axis; where no valid value, idx = -1.
    """
    table = build_gather_table(spec)
    g, pad_ok = _gather_segments(x, table, axis)
    valid = pad_ok & ~jnp.isnan(g)
    fill = -jnp.inf if op == "max" else jnp.inf
    gm = jnp.where(valid, g, fill)
    rel = (jnp.argmax(gm, axis=1) if op == "max" else jnp.argmin(gm, axis=1)).astype(jnp.int32)
    tbl = jnp.asarray(table)
    absidx = jnp.take_along_axis(
        tbl.reshape(tbl.shape + (1,) * (g.ndim - 2)).astype(jnp.int32),
        rel[:, None], axis=1)[:, 0]
    has = valid.any(axis=1)
    absidx = jnp.where(has, absidx, -1)
    return jnp.moveaxis(absidx, 0, axis), jnp.moveaxis(has, 0, axis)


def segment_first_last(x, spec: SegmentSpec, which: str = "first", axis: int = 0):
    """First/last non-NaN value per segment."""
    table = build_gather_table(spec)
    g, pad_ok = _gather_segments(x, table, axis)
    valid = pad_ok & ~jnp.isnan(g) if jnp.issubdtype(g.dtype, jnp.floating) else jnp.broadcast_to(pad_ok, g.shape)
    maxlen = g.shape[1]
    pos = jnp.arange(maxlen).reshape((1, maxlen) + (1,) * (g.ndim - 2))
    if which == "first":
        rel = jnp.where(valid, pos, maxlen).min(axis=1)
        rel = jnp.minimum(rel, maxlen - 1)
    else:
        rel = jnp.where(valid, pos, -1).max(axis=1)
        rel = jnp.maximum(rel, 0)
    out = jnp.take_along_axis(g, rel[:, None], axis=1)[:, 0]
    has = valid.any(axis=1)
    if jnp.issubdtype(g.dtype, jnp.floating):
        out = jnp.where(has, out, jnp.nan)
    return jnp.moveaxis(out, 0, axis)


def rolling_reduce(x, window: int, op: str, axis: int = 0, min_periods: int | None = None,
                   center: bool = False):
    """Rolling-window reduction along `axis` via lax.reduce_window (TPU-native,
    no cumsum error accumulation). Matches xarray rolling semantics: output
    aligned to window end (or center), positions with fewer than `min_periods`
    valid values are NaN.
    """
    if min_periods is None:
        min_periods = window
    xf = jnp.moveaxis(x, axis, -1)
    isfloat = jnp.issubdtype(xf.dtype, jnp.floating)
    nan = jnp.isnan(xf) if isfloat else jnp.zeros_like(xf, dtype=bool)
    valid = ~nan

    if center:
        lo = (window - 1) // 2
        hi = window - 1 - lo
        padding = [(0, 0)] * (xf.ndim - 1) + [(lo, hi)]
    else:
        padding = [(0, 0)] * (xf.ndim - 1) + [(window - 1, 0)]
    dims = (1,) * (xf.ndim - 1) + (window,)
    strides = (1,) * xf.ndim

    def rw(arr, init, fn):
        return jax.lax.reduce_window(arr, init, fn, dims, strides, padding)

    cnt = rw(valid.astype(jnp.float32), 0.0, jax.lax.add)
    if op in ("sum", "mean"):
        s = rw(jnp.where(valid, xf, 0).astype(jnp.float32) if isfloat else xf.astype(jnp.float32),
               0.0, jax.lax.add)
        out = s if op == "sum" else s / jnp.maximum(cnt, 1)
    elif op == "max":
        out = rw(jnp.where(valid, xf, -jnp.inf), -jnp.inf, jax.lax.max)
    elif op == "min":
        out = rw(jnp.where(valid, xf, jnp.inf), jnp.inf, jax.lax.min)
    elif op == "std" or op == "var":
        s = rw(jnp.where(valid, xf, 0).astype(jnp.float32), 0.0, jax.lax.add)
        mu = s / jnp.maximum(cnt, 1)
        s2 = rw(jnp.where(valid, xf * xf, 0).astype(jnp.float32), 0.0, jax.lax.add)
        var = jnp.maximum(s2 / jnp.maximum(cnt, 1) - mu * mu, 0.0)
        out = var if op == "var" else jnp.sqrt(var)
    else:
        raise ValueError(f"Unknown rolling op {op!r}")
    out = jnp.where(cnt >= min_periods, out, jnp.nan)
    return jnp.moveaxis(out, -1, axis)
