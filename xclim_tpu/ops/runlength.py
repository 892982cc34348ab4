"""Run-length scan engine: spell statistics over the time axis.

TPU-native replacement for xclim's dual numba/xarray run-length machinery
(xclim:src/xclim/indices/run_length.py). The reference picks between a numba
1-D ufunc and an xarray cumsum-reset path by array size (``use_ufunc``,
run_length.py:33-79); here there is a single implementation: a one-HBM-pass
``lax.scan`` along time computing cumulative run lengths, composed with the
static segment-reduction engine for ``freq`` grouping.

Semantics notes (all verified against the reference):

* ``rle(index='first')`` (run_length.py:223) puts each run's total length on
  its FIRST element, NaN on other run elements, 0 on False positions.
* Resampling run statistics attributes a boundary-crossing run entirely to the
  period holding the marked element (reference resamples *after* computing the
  rle array).
* NaN inputs are treated as False (run_length.py:199-204).

Convention: `axis` is the time axis; arrays may have any rank.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from xclim_tpu.core.calendar import SegmentSpec
from xclim_tpu.ops.segments import build_gather_table, segment_reduce

__all__ = [
    "cumsum_reset",
    "rle",
    "rle_statistics",
    "longest_run",
    "windowed_run_count",
    "windowed_run_events",
    "windowed_max_run_sum",
    "first_run",
    "last_run",
    "suspicious_run",
]


def _flip(x, axis):
    return jnp.flip(x, axis=axis)


def segment_boundaries(spec: SegmentSpec, index: str = "last") -> jnp.ndarray:
    """(T,) bool mask of positions where a scan must reset so runs don't cross
    resample periods (the reference's resample-*before*-run-length semantics,
    xclim run_length.py:87-133). For backward scans (index='first') the mask
    marks segment ends instead of starts."""
    import numpy as np

    n = len(spec.seg_id)
    m = np.zeros(n, dtype=bool)
    if index == "last":
        m[spec.starts] = True
    else:
        ends = np.concatenate([spec.starts[1:] - 1, [n - 1]])
        m[ends] = True
    return jnp.asarray(m)


def cumsum_reset(x, axis: int = 0, index: str = "last", reset_on_zero: bool = True,
                 reset_at=None):
    """Cumulative sum along `axis`, resetting at zeros (or at NaNs).

    ``100110111 -> 100120123`` (xclim run_length.py:143-172). ``index='first'``
    runs the scan backward so the largest value sits on the run's first element.
    NaNs count as 0 (and reset) when ``reset_on_zero``; otherwise only NaNs
    reset and values accumulate across zeros. ``reset_at`` is an optional (T,)
    bool mask of positions where the carry is dropped (segment boundaries).
    """
    xf = jnp.moveaxis(x, axis, 0)
    if index == "first":
        xf = jnp.flip(xf, 0)
    isfloat = jnp.issubdtype(xf.dtype, jnp.floating)
    if xf.dtype == jnp.bool_:
        vals = xf.astype(jnp.float32)
        reset = ~xf
    elif reset_on_zero:
        vals = jnp.nan_to_num(xf.astype(jnp.float32)) if isfloat else xf.astype(jnp.float32)
        reset = vals == 0
    else:
        nan = jnp.isnan(xf)
        vals = jnp.where(nan, 0.0, xf).astype(jnp.float32)
        reset = nan

    if reset_at is not None:
        ra = reset_at
        if index == "first":
            ra = jnp.flip(ra, 0)
        ra = ra.reshape((xf.shape[0],) + (1,) * (xf.ndim - 1))
        reset = reset | jnp.broadcast_to(ra, xf.shape)

    def step(carry, inp):
        v, r = inp
        out = jnp.where(r, v, carry + v)
        return out, out

    init = jnp.zeros(xf.shape[1:], dtype=jnp.float32)
    _, out = jax.lax.scan(step, init, (vals, reset))
    if index == "first":
        out = jnp.flip(out, 0)
    return jnp.moveaxis(out, 0, axis)


def rle(x, axis: int = 0, index: str = "first", reset_spec: SegmentSpec | None = None):
    """Run lengths marked on the boundary element of each run (xclim :223).

    Returns float array: 0 where input falsy, NaN inside runs, run length on
    the first (or last) element of each run. With ``reset_spec``, runs are
    split at resample-period boundaries (resample-before-rl semantics) and the
    marker sits on the within-period boundary element.
    """
    b = _as_bool(x)
    reset_at = None if reset_spec is None else segment_boundaries(reset_spec, index)
    cs = cumsum_reset(b, axis=axis, index=index, reset_at=reset_at)
    bf = jnp.moveaxis(b, axis, 0)
    csf = jnp.moveaxis(cs, axis, 0)
    if index == "first":
        # marker = first element of run: previous element is False (or period start)
        prev = jnp.concatenate([jnp.zeros_like(bf[:1]), bf[:-1]], axis=0)
        boundary = bf & ~prev
        if reset_spec is not None:
            starts = segment_boundaries(reset_spec, "last")  # period starts
            boundary = boundary | (bf & starts.reshape((-1,) + (1,) * (bf.ndim - 1)))
    else:
        nxt = jnp.concatenate([bf[1:], jnp.zeros_like(bf[:1])], axis=0)
        boundary = bf & ~nxt
        if reset_spec is not None:
            ends = segment_boundaries(reset_spec, "first")  # period ends
            boundary = boundary | (bf & ends.reshape((-1,) + (1,) * (bf.ndim - 1)))
    out = jnp.where(boundary, csf, jnp.where(bf, jnp.nan, 0.0))
    return jnp.moveaxis(out, 0, axis)


def _as_bool(x):
    if x.dtype == jnp.bool_:
        return x
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.nan_to_num(x) > 0
    return x > 0


def _seg_or_full(d, spec, axis, op, skipna=True):
    if spec is None:
        if op == "sum":
            return jnp.nansum(d, axis=axis)
        if op == "max":
            allnan = jnp.all(jnp.isnan(d), axis=axis)
            m = jnp.where(allnan, jnp.nan, jnp.nanmax(jnp.nan_to_num(d, nan=-jnp.inf), axis=axis))
            return m
        raise ValueError(op)
    return segment_reduce(d, spec, op, axis=axis, skipna=skipna)


def rle_statistics(x, reducer: str, window: int, axis: int = 0,
                   spec: SegmentSpec | None = None, index: str = "first",
                   resample_before_rl: bool = True):
    """Statistic (max/min/mean/sum/median) of run lengths ≥ window (xclim :275).

    Returns 0 where no qualifying run exists.
    """
    d = rle(x, axis=axis, index=index,
            reset_spec=spec if resample_before_rl else None)
    dw = jnp.where(d >= window, d, jnp.nan)
    # quantile reducers ("q90" → 0.9 of the run lengths, np.nanquantile
    # linear interpolation — xclim run_length.py:316-321)
    qv = (float(reducer[1:]) / 100.0
          if reducer[:1] == "q" and reducer[1:].isdigit() else None)
    if spec is None:
        red = {"max": lambda a: jnp.nanmax(a, axis=axis, initial=-jnp.inf),
               "min": lambda a: jnp.nanmin(a, axis=axis, initial=jnp.inf),
               "sum": lambda a: jnp.nansum(a, axis=axis),
               "mean": lambda a: jnp.nanmean(a, axis=axis),
               "std": lambda a: jnp.nanstd(a, axis=axis),
               "median": lambda a: jnp.nanmedian(a, axis=axis)}.get(reducer)
        if red is None and qv is not None:
            red = lambda a: jnp.nanquantile(a, qv, axis=axis)  # noqa: E731
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            stat = red(dw)
        nohit = ~jnp.any(jnp.nan_to_num(d, nan=0.0) >= window, axis=axis)
        return jnp.where(nohit, 0.0, stat)
    if qv is not None:
        # gather each segment's run lengths and take the NaN-aware quantile
        table = build_gather_table(spec)
        tb = jnp.asarray(table)
        df = jnp.moveaxis(dw, axis, 0)
        g = df[jnp.maximum(tb, 0)]  # (nseg, maxlen, ...)
        okpad = (tb >= 0).reshape(tb.shape + (1,) * (g.ndim - 2))
        g = jnp.where(okpad, g, jnp.nan)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            stat = jnp.nanquantile(g, qv, axis=1)
        stat = jnp.moveaxis(stat, 0, axis)
    else:
        stat = segment_reduce(dw, spec, reducer, axis=axis)
    hits = segment_reduce(jnp.nan_to_num(d, nan=0.0) >= window, spec, "any", axis=axis)
    return jnp.where(hits, stat, 0.0)


def _pallas_spell(x, window, axis, spec, resample_before_rl, what):
    """Route a spell statistic through the fused Pallas kernel when the
    backend can compile Mosaic (capability probe); return None to fall back
    to the XLA path. The kernel implements resample-before-rl semantics on a
    contiguous segmentation — exactly the `spec is not None,
    resample_before_rl=True` case of the callers."""
    if spec is None or not resample_before_rl:
        return None
    from xclim_tpu.ops.pallas.capability import (
        dispatch_counts,
        pallas_mode,
        spell_engine,
    )

    if spell_engine() != "pallas":
        # the XLA path (slice-unroll segment engine) won the round-4 A/B —
        # see capability.spell_engine
        dispatch_counts["xla"] += 1
        return None
    mode = pallas_mode()
    if mode == "off":
        dispatch_counts["xla"] += 1
        return None
    from xclim_tpu.ops.pallas.spells import fused_spell_stats

    b = _as_bool(x).astype(jnp.float32)
    bf = jnp.moveaxis(b, axis, 0)
    T = bf.shape[0]
    shape_sp = bf.shape[1:]
    flat = bf.reshape(T, -1)
    try:
        cnt, wrc, wre, lng = fused_spell_stats(
            flat, spec, thresh=0.5, window=window, op=">",
            interpret=(mode == "interpret"))
    except Exception:
        # transient remote-compile failure: disable Pallas for this
        # process and take the XLA path
        from xclim_tpu.ops.pallas.capability import set_pallas_mode

        set_pallas_mode("off")
        dispatch_counts["xla"] += 1
        return None
    out = {"cnt": cnt, "wrc": wrc, "wre": wre, "lng": lng}[what]
    dispatch_counts["pallas"] += 1
    return jnp.moveaxis(out.reshape((spec.nseg,) + shape_sp), 0, axis)


def longest_run(x, axis: int = 0, spec: SegmentSpec | None = None, index: str = "first",
                resample_before_rl: bool = True):
    """Length of the longest run of True values (xclim :338)."""
    out = _pallas_spell(x, 1, axis, spec, resample_before_rl, "lng")
    if out is not None:
        return out
    return rle_statistics(x, "max", 1, axis=axis, spec=spec, index=index,
                          resample_before_rl=resample_before_rl)


def windowed_run_count(x, window: int, axis: int = 0, spec: SegmentSpec | None = None,
                       index: str = "first", resample_before_rl: bool = True):
    """Total days inside runs of at least `window` (xclim :437)."""
    if window == 1 and spec is None:
        return _as_bool(x).sum(axis=axis)
    out = _pallas_spell(x, window, axis, spec, resample_before_rl, "wrc")
    if out is not None:
        return out
    d = rle(x, axis=axis, index=index,
            reset_spec=spec if resample_before_rl else None)
    d = jnp.where(jnp.nan_to_num(d, nan=0.0) >= window, d, 0.0)
    return _seg_or_full(jnp.nan_to_num(d, nan=0.0), spec, axis, "sum")


def windowed_run_events(x, window: int, axis: int = 0, spec: SegmentSpec | None = None,
                        index: str = "first", resample_before_rl: bool = True):
    """Number of distinct runs of at least `window` (xclim :381)."""
    out = _pallas_spell(x, window, axis, spec, resample_before_rl, "wre")
    if out is not None:
        return out
    b = _as_bool(x)
    if window == 1:
        bf = jnp.moveaxis(b, axis, 0)
        prev = jnp.concatenate([jnp.zeros_like(bf[:1]), bf[:-1]], axis=0)
        starts = bf & ~prev
        if spec is not None and resample_before_rl:
            # a run crossing a period boundary restarts in the new period
            seg_starts = segment_boundaries(spec, "last")
            starts = starts | (bf & seg_starts.reshape((-1,) + (1,) * (bf.ndim - 1)))
        d = jnp.moveaxis(starts.astype(jnp.float32), 0, axis)
    else:
        r = rle(b, axis=axis, index=index,
                reset_spec=spec if resample_before_rl else None)
        d = (jnp.nan_to_num(r, nan=0.0) >= window).astype(jnp.float32)
    return _seg_or_full(d, spec, axis, "sum")


def windowed_max_run_sum(x, window: int, axis: int = 0, spec: SegmentSpec | None = None,
                         index: str = "first", resample_before_rl: bool = True):
    """Maximum run-sum among runs of at least `window` (xclim :491).

    Input is float (e.g. clipped exceedance); run = consecutive nonzero values.
    """
    reset_spec = spec if resample_before_rl else None
    reset_at = None if reset_spec is None else segment_boundaries(reset_spec, index)
    rse = cumsum_reset(x, axis=axis, index=index, reset_at=reset_at)
    rl = rle(_as_bool(x), axis=axis, index=index, reset_spec=reset_spec)
    d = jnp.where(jnp.nan_to_num(rl, nan=0.0) >= window, rse, 0.0)
    out = _seg_or_full(d, spec, axis, "max")
    return jnp.nan_to_num(out, nan=0.0) if spec is None else out


def _boundary_run(x, window, axis, spec, position, resample_before_rl=True):
    """Absolute time index (float; NaN when none) of first/last item of the
    first/last run of at least `window` (xclim :594-741)."""
    b = _as_bool(x)
    reset_at = None if (spec is None or not resample_before_rl) else \
        segment_boundaries(spec, position)
    d = cumsum_reset(b, axis=axis, index=position, reset_at=reset_at)
    hit = d >= window
    hf = jnp.moveaxis(hit, axis, 0)  # (T, ...)
    T = hf.shape[0]
    pos = jnp.arange(T, dtype=jnp.float32).reshape((T,) + (1,) * (hf.ndim - 1))
    if spec is None:
        if position == "first":
            idx = jnp.where(hf, pos, jnp.inf).min(axis=0)
        else:
            idx = jnp.where(hf, pos, -jnp.inf).max(axis=0)
        has = hf.any(axis=0)
        return jnp.where(has, idx, jnp.nan)
    # per-segment
    table = build_gather_table(spec)
    tb = jnp.asarray(table)
    safe = jnp.maximum(tb, 0)
    g = hf[safe]  # (nseg, maxlen, ...)
    okpad = (tb >= 0).reshape(tb.shape + (1,) * (g.ndim - 2))
    g = g & okpad
    abspos = tb.astype(jnp.float32).reshape(tb.shape + (1,) * (g.ndim - 2))
    if position == "first":
        idx = jnp.where(g, abspos, jnp.inf).min(axis=1)
    else:
        idx = jnp.where(g, abspos, -jnp.inf).max(axis=1)
    has = g.any(axis=1)
    out = jnp.where(has, idx, jnp.nan)
    return jnp.moveaxis(out, 0, axis)


def first_run(x, window: int, axis: int = 0, spec: SegmentSpec | None = None,
              resample_before_rl: bool = True):
    """Index of the first item of the first run of at least `window` (xclim :643)."""
    return _boundary_run(x, window, axis, spec, "first", resample_before_rl)


def last_run(x, window: int, axis: int = 0, spec: SegmentSpec | None = None,
             resample_before_rl: bool = True):
    """Index of the last item of the last run of at least `window` (xclim :693)."""
    return _boundary_run(x, window, axis, spec, "last", resample_before_rl)


def suspicious_run(x, axis: int = 0, window: int = 10, op: str = ">",
                   thresh=None):
    """Boolean mask flagging values inside runs of IDENTICAL consecutive
    values of length >= window (xclim run_length.py:1693-1714, used by
    dataflags).

    When ``thresh`` is given, only runs whose (constant) value satisfies
    ``value op thresh`` are flagged — the reference filters the detected
    identical runs by their value, it never relaxes the identity
    requirement. NaN follows numpy equality: NaN != NaN, so NaN stretches
    are runs of length 1 and are never flagged.
    """
    import operator

    xf = jnp.moveaxis(x, axis, 0)
    prev = jnp.concatenate([jnp.full_like(xf[:1], jnp.nan), xf[:-1]], axis=0)
    same = xf == prev
    # run length of consecutive "same" — a run of k sames = k+1 equal values
    cs = cumsum_reset(same, axis=0, index="last")
    # mark whole run: backward max of (cs >= window-1) within the equality run
    hit = cs >= (window - 1)
    if thresh is not None:
        ops = {">": operator.gt, ">=": operator.ge, "<": operator.lt,
               "<=": operator.le, "==": operator.eq, "!=": operator.ne}
        # the run's value is constant, so an elementwise filter at the hit
        # position reflects the whole run
        hit = hit & ops[op](xf, thresh)

    # propagate hit backwards across the run of sames (and one before)
    def stepb(carry, inp):
        h, s = inp
        out = h | (carry & s)
        return out, out

    init = jnp.zeros(xf.shape[1:], dtype=bool)
    _, back = jax.lax.scan(stepb, init, (jnp.flip(hit, 0), jnp.flip(same, 0)))
    back = jnp.flip(back, 0)
    # also flag the first element of the run (predecessor of first 'same')
    nxt = jnp.concatenate([back[1:] & same[1:], jnp.zeros_like(back[:1])], axis=0)
    out = back | nxt
    return jnp.moveaxis(out, 0, axis)
