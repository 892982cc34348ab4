"""Public run-length API on ClimArrays (reference: xclim:src/xclim/indices/run_length.py).

Thin host-side layer over :mod:`xclim_tpu.ops.runlength`: builds static segment
specs / date masks from the time coordinate and wraps device results with the
right labels. Where the reference dispatches between numba 1-D ufuncs and
vectorized xarray (run_length.py:33-79), a single scan kernel serves all sizes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.calendar import SegmentSpec, TimeIndex, resample_segments
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.ops import runlength as _rl
from xclim_tpu.ops.segments import build_gather_table

__all__ = [
    "cumsum_reset",
    "rle",
    "rle_statistics",
    "statistics_run",
    "longest_run",
    "windowed_run_count",
    "windowed_run_events",
    "windowed_max_run_sum",
    "first_run",
    "last_run",
    "first_run_after_date",
    "first_run_before_date",
    "last_run_before_date",
    "run_end_after_date",
    "season_start",
    "season_end",
    "season_length",
    "season",
    "runs_with_holes",
    "keep_longest_run",
    "run_bounds",
    "suspicious_run",
    "find_events",
]


def _spec(da: ClimArray, freq: str | None) -> SegmentSpec | None:
    return None if freq is None else resample_segments(da.time, freq)


def _wrap_seg(da: ClimArray, data, spec: SegmentSpec | None, units: str = ""):
    if spec is None:
        out_dims = tuple(d for d in da.dims if d != "time")
        coords = {k: v for k, v in da.coords.items() if k != "time"}
        return ClimArray(data, out_dims, coords, {"units": units}, da.name)
    coords = dict(da.coords)
    coords["time"] = spec.labels
    return ClimArray(data, da.dims, coords, {"units": units}, da.name)


def _index_to_doy(da: ClimArray, idx, coord):
    """Map absolute time indices (float, NaN-able) to doy (or keep indexes)."""
    if not coord:
        return idx
    doys = np.concatenate([da.time.doy.astype(np.float32), [np.nan]])
    safe = jnp.where(jnp.isnan(idx), len(da.time), idx).astype(jnp.int32)
    vals = jnp.asarray(doys)[safe]
    return jnp.where(jnp.isnan(idx), jnp.nan, vals)


def cumsum_reset(da: ClimArray, index: str = "last", reset_on_zero: bool = True) -> ClimArray:
    out = _rl.cumsum_reset(da.data, axis=da.time_axis, index=index, reset_on_zero=reset_on_zero)
    return da.copy(data=out)


def rle(da: ClimArray, index: str = "first") -> ClimArray:
    return da.copy(data=_rl.rle(da.data, axis=da.time_axis, index=index))


def rle_statistics(da: ClimArray, reducer: str, window: int, freq: str | None = None,
                   index: str = "first", resample_before_rl: bool = True) -> ClimArray:
    spec = _spec(da, freq)
    out = _rl.rle_statistics(da.data, reducer, window, axis=da.time_axis, spec=spec,
                             index=index, resample_before_rl=resample_before_rl)
    return _wrap_seg(da, out, spec)


statistics_run = rle_statistics


def longest_run(da: ClimArray, freq: str | None = None, index: str = "first",
                resample_before_rl: bool = True) -> ClimArray:
    return rle_statistics(da, "max", 1, freq=freq, index=index,
                          resample_before_rl=resample_before_rl)


def windowed_run_count(da: ClimArray, window: int, freq: str | None = None,
                       resample_before_rl: bool = True,
                       index: str = "first") -> ClimArray:
    # `index` picks which end of the run carries the rle value — the totals
    # are identical either way (the reference parameterizes both to prove it)
    spec = _spec(da, freq)
    out = _rl.windowed_run_count(da.data, window, axis=da.time_axis, spec=spec,
                                 resample_before_rl=resample_before_rl)
    return _wrap_seg(da, out, spec)


def windowed_run_events(da: ClimArray, window: int, freq: str | None = None,
                        resample_before_rl: bool = True,
                        index: str = "first") -> ClimArray:
    spec = _spec(da, freq)
    out = _rl.windowed_run_events(da.data, window, axis=da.time_axis, spec=spec,
                                  resample_before_rl=resample_before_rl)
    return _wrap_seg(da, out, spec)


def windowed_max_run_sum(da: ClimArray, window: int, freq: str | None = None,
                         resample_before_rl: bool = True,
                         index: str = "first") -> ClimArray:
    spec = _spec(da, freq)
    out = _rl.windowed_max_run_sum(da.data, window, axis=da.time_axis, spec=spec,
                                   resample_before_rl=resample_before_rl)
    return _wrap_seg(da, out, spec)


def _rel_to_period(da: ClimArray, idx, spec):
    """Resampled raw indices are period-relative in the reference (each group
    is mapped separately, xclim run_length.py:87-133 + :643), while the
    kernel returns absolute time indices — shift by the segment starts."""
    starts = jnp.asarray(spec.starts, dtype=jnp.float32)
    shape = [1] * idx.ndim
    shape[da.time_axis] = len(spec.starts)
    return idx - starts.reshape(shape)


def first_run(da: ClimArray, window: int, freq: str | None = None, coord=False,
              resample_before_rl: bool = True) -> ClimArray:
    spec = _spec(da, freq)
    idx = _rl.first_run(da.data, window, axis=da.time_axis, spec=spec,
                        resample_before_rl=resample_before_rl)
    if spec is not None and not coord:
        idx = _rel_to_period(da, idx, spec)
    return _wrap_seg(da, _index_to_doy(da, idx, coord), spec)


def last_run(da: ClimArray, window: int, freq: str | None = None, coord=False,
             resample_before_rl: bool = True) -> ClimArray:
    spec = _spec(da, freq)
    idx = _rl.last_run(da.data, window, axis=da.time_axis, spec=spec,
                       resample_before_rl=resample_before_rl)
    if spec is not None and not coord:
        idx = _rel_to_period(da, idx, spec)
    return _wrap_seg(da, _index_to_doy(da, idx, coord), spec)


# ---------------------------------------------------------------------------
# date-constrained runs (xclim run_length.py:1148-1333)
# ---------------------------------------------------------------------------


def _mid_date_index(time: TimeIndex, spec: SegmentSpec, date: str):
    """Per-segment absolute index of the first step matching 'MM-DD'.

    Returns (mid_idx (nseg,), has_date (nseg,)) as numpy arrays.
    """
    mm, dd = (int(x) for x in date.split("-"))
    match = (time.month == mm) & (time.day == dd)
    pos = np.where(match, np.arange(len(time)), len(time) + 1)
    nseg = spec.nseg
    ends = np.concatenate([spec.starts[1:], [len(time)]])
    mid = np.minimum.reduceat(pos, spec.starts)
    has = mid <= len(time)
    # reduceat quirk: empty segments impossible here (starts from searchsorted)
    return np.where(has, mid, 0), has


def _mask_after(da: ClimArray, spec: SegmentSpec, mid_idx, has, offset: int = 0,
                strict: bool = False):
    """(T,) bool: step index >= (mid_idx of its segment) + offset (per segment)."""
    n = len(da.time)
    thresh = np.where(has, mid_idx + offset, n + 1)
    step_thresh = thresh[spec.seg_id]
    pos = np.arange(n)
    return (pos > step_thresh) if strict else (pos >= step_thresh)


def _apply_date_masked_run(da, freq, window, date, which, mask_builder, coord):
    spec = _spec(da, freq)
    if spec is None:
        raise ValueError("Date-constrained run functions need a freq.")
    mid_idx, has = _mid_date_index(da.time, spec, date)
    mask = mask_builder(spec, mid_idx, has)
    ax = da.time_axis
    shape = [1] * da.ndim
    shape[ax] = len(mask)
    x = jnp.logical_and(jnp.asarray(da.data).astype(bool) if da.dtype == jnp.bool_
                        else _rl._as_bool(da.data),
                        jnp.asarray(mask).reshape(shape))
    fn = _rl.first_run if which == "first" else _rl.last_run
    idx = fn(x, window, axis=ax, spec=spec)
    # segments without the date → NaN
    hasv = jnp.asarray(has)
    sh = [1] * da.ndim
    sh[ax] = spec.nseg
    idx = jnp.where(hasv.reshape(sh), idx, jnp.nan)
    return _wrap_seg(da, _index_to_doy(da, idx, coord), spec)


def first_run_after_date(da: ClimArray, window: int, date: str = "07-01",
                         freq: str = "YS", coord="dayofyear") -> ClimArray:
    """First run of `window` Trues starting at/after `date` in each period
    (xclim :1205)."""
    return _apply_date_masked_run(
        da, freq, window, date, "first",
        lambda spec, mid, has: _mask_after(da, spec, mid, has), coord)


def last_run_before_date(da: ClimArray, window: int, date: str = "07-01",
                         freq: str = "YS", coord="dayofyear") -> ClimArray:
    """Last run ending at/before `date` in each period (xclim :1248)."""
    return _apply_date_masked_run(
        da, freq, window, date, "last",
        lambda spec, mid, has: ~_mask_after(da, spec, mid, has, strict=True), coord)


def first_run_before_date(da: ClimArray, window: int, date: str | None = "07-01",
                          freq: str = "YS", coord="dayofyear") -> ClimArray:
    """First run beginning before `date` (mask after date+window-1; xclim :1288)."""
    if date is None:
        return first_run(da, window, freq=freq, coord=coord)
    return _apply_date_masked_run(
        da, freq, window, date, "first",
        lambda spec, mid, has: ~_mask_after(da, spec, mid, has, offset=window - 1), coord)


def run_end_after_date(da: ClimArray, window: int, date: str = "07-01",
                       freq: str = "YS", coord="dayofyear") -> ClimArray:
    """Index of first item after the end of a run that began before `date` and
    is still going at `date`-ish (xclim :1148)."""
    spec = _spec(da, freq)
    mid_idx, has = _mid_date_index(da.time, spec, date)
    ax = da.time_axis
    n = len(da.time)
    after = _mask_after(da, spec, mid_idx, has)
    before = ~after
    b = _rl._as_bool(da.data)
    shape = [1] * da.ndim
    shape[ax] = n
    end_x = jnp.logical_and(~b, jnp.asarray(after).reshape(shape))
    beg_x = jnp.logical_and(b, jnp.asarray(before).reshape(shape))
    end = _rl.first_run(end_x, window, axis=ax, spec=spec)
    beg = _rl.first_run(beg_x, window, axis=ax, spec=spec)
    # where no end found but beg exists → last index of segment
    table = build_gather_table(spec)
    last_idx = np.asarray(spec.starts, dtype=np.float32) + np.asarray(spec.counts, dtype=np.float32) - 1
    sh = [1] * da.ndim
    sh[ax] = spec.nseg
    last = jnp.asarray(last_idx).reshape(sh)
    end = jnp.where(jnp.isnan(end) & ~jnp.isnan(beg), last, end)
    end = jnp.where(jnp.isnan(beg), jnp.nan, end)
    hasv = jnp.asarray(has).reshape(sh)
    end = jnp.where(hasv, end, jnp.nan)
    return _wrap_seg(da, _index_to_doy(da, end, coord), spec)


# ---------------------------------------------------------------------------
# seasons (xclim run_length.py:891-1146)
# ---------------------------------------------------------------------------


def _season_parts(da: ClimArray, window: int, mid_date: str | None, freq: str):
    if freq is None:
        # whole-axis season (the reference's default, xclim :998): no
        # resampling, outputs collapse the time dim
        return _season_parts_whole(da, window, mid_date)
    spec = _spec(da, freq)
    ax = da.time_axis
    n = len(da.time)
    b = _rl._as_bool(da.data)
    if mid_date is not None:
        mid_idx, has = _mid_date_index(da.time, spec, mid_date)
    else:
        mid_idx, has = None, None

    # --- start: first run of `window` Trues (beginning before mid_date) ---
    if mid_date is not None:
        before_mask = ~_mask_after(da, spec, mid_idx, has, offset=window - 1)
        shape = [1] * da.ndim
        shape[ax] = n
        beg_x = jnp.logical_and(b, jnp.asarray(before_mask).reshape(shape))
    else:
        beg_x = b
    beg = _rl.first_run(beg_x, window, axis=ax, spec=spec)

    # --- end: first run of `window` Falses after beg (and after mid_date) ---
    pos = np.arange(n, dtype=np.float32)
    shape = [1] * da.ndim
    shape[ax] = n
    posj = jnp.asarray(pos).reshape(shape)
    beg_per_step = jnp.take(jnp.nan_to_num(beg, nan=jnp.inf), jnp.asarray(spec.seg_id), axis=ax)
    not_da = jnp.logical_and(~b, posj >= beg_per_step)
    if mid_date is not None:
        after_mask = _mask_after(da, spec, mid_idx, has)
        not_da = jnp.logical_and(not_da, jnp.asarray(after_mask).reshape(shape))
    end = _rl.first_run(not_da, window, axis=ax, spec=spec)

    if mid_date is not None:
        sh = [1] * da.ndim
        sh[ax] = spec.nseg
        hasv = jnp.asarray(has).reshape(sh)
        beg = jnp.where(hasv, beg, jnp.nan)
        end = jnp.where(hasv, end, jnp.nan)
    return spec, beg, end


def _season_parts_whole(da: ClimArray, window: int, mid_date: str | None = None):
    """Season bounds over the whole axis (freq=None): outputs have no time
    dim, matching the reference's unresampled rl.season. The start run must
    begin before `mid_date`, the closing non-run at/after it (xclim :891)."""
    ax = da.time_axis
    n = len(da.time)
    b = _rl._as_bool(da.data)
    pos = np.arange(n, dtype=np.float32)
    shape = [1] * da.ndim
    shape[ax] = n
    posj = jnp.asarray(pos).reshape(shape)

    has_date = True
    if mid_date is not None:
        mm, dd = (int(x) for x in mid_date.split("-"))
        match = np.where((da.time.month == mm) & (da.time.day == dd))[0]
        if len(match) > 1:
            raise ValueError(f"More than 1 instance of date {mid_date} "
                             "in the time axis; pass a freq.")
        has_date = len(match) == 1
        mid = int(match[0]) if has_date else n + 1
        beg_x = jnp.logical_and(b, posj < mid + window - 1)
    else:
        beg_x = b
    beg = _rl.first_run(beg_x, window, axis=ax, spec=None)  # (space,) abs idx
    beg_per_step = jnp.expand_dims(jnp.nan_to_num(beg, nan=jnp.inf), ax)
    not_da = jnp.logical_and(~b, posj >= beg_per_step)
    if mid_date is not None:
        not_da = jnp.logical_and(not_da, posj >= mid)
    end = _rl.first_run(not_da, window, axis=ax, spec=None)
    if not has_date:
        beg = jnp.full_like(beg, jnp.nan)
        end = jnp.full_like(end, jnp.nan)
    return None, beg, end


def season_start(da: ClimArray, window: int, mid_date: str | None = None,
                 freq: str | None = None, coord=False) -> ClimArray:
    """First day of the first `window`-day run (before mid_date) — xclim :891."""
    spec, beg, _ = _season_parts(da, window, mid_date, freq)
    return _wrap_seg(da, _index_to_doy(da, beg, coord), spec)


def season_end(da: ClimArray, window: int, mid_date: str | None = None,
               freq: str | None = None, coord=False) -> ClimArray:
    """First day of the first `window`-day non-run after the season start
    (xclim :931). NaN if no start; last index if started but never ended."""
    spec, beg, end = _season_parts(da, window, mid_date, freq)
    ax = da.time_axis
    if spec is None:
        last = jnp.float32(len(da.time) - 1)
    else:
        sh = [1] * da.ndim
        sh[ax] = spec.nseg
        last_idx = np.asarray(spec.starts, dtype=np.float32) + np.asarray(spec.counts, dtype=np.float32) - 1
        last = jnp.asarray(last_idx).reshape(sh)
    end = jnp.where(jnp.isnan(end) & ~jnp.isnan(beg), last, end)
    end = jnp.where(jnp.isnan(beg), jnp.nan, end)
    return _wrap_seg(da, _index_to_doy(da, end, coord), spec)


def season_length(da: ClimArray, window: int, mid_date: str | None = None,
                  freq: str | None = None) -> ClimArray:
    """end - start; if started but never ended: distance to last step + 1;
    0 if no season (xclim :1031)."""
    spec, beg, end = _season_parts(da, window, mid_date, freq)
    ax = da.time_axis
    if spec is None:
        bound = jnp.float32(len(da.time))
    else:
        sh = [1] * da.ndim
        sh[ax] = spec.nseg
        seg_end = np.asarray(spec.starts, dtype=np.float32) + np.asarray(spec.counts, dtype=np.float32)
        bound = jnp.asarray(seg_end).reshape(sh)
    length = jnp.where(jnp.isnan(end), bound - beg, end - beg)
    length = jnp.where(jnp.isnan(beg), 0.0, length)
    return _wrap_seg(da, length, spec)


def season(da: ClimArray, window: int, mid_date: str | None = None,
           freq: str | None = None, coord=False) -> dict:
    """start/end/length of the season as a dict of ClimArrays (xclim :998)."""
    return {
        "start": season_start(da, window, mid_date, freq, coord),
        "end": season_end(da, window, mid_date, freq, coord),
        "length": season_length(da, window, mid_date, freq),
    }


# ---------------------------------------------------------------------------
# holes / longest / suspicious
# ---------------------------------------------------------------------------


def runs_with_holes(da_start: ClimArray, window_start: int, da_stop: ClimArray,
                    window_stop: int) -> ClimArray:
    """1 inside an event that starts with `window_start` Trues in da_start and
    ends with `window_stop` Trues in da_stop (xclim :844)."""
    ax = da_start.time_axis
    start_runs = _rl.cumsum_reset(da_start.data, axis=ax, index="first")
    stop_runs = _rl.cumsum_reset(da_stop.data, axis=ax, index="first")
    # +1 at start positions, 0 at stop positions, ffill (stop wins at ties —
    # combine_first gives stop priority in the reference)
    start_pos = start_runs >= window_start
    stop_pos = stop_runs >= window_stop
    xf = jnp.moveaxis(start_pos, ax, 0)
    sf = jnp.moveaxis(stop_pos, ax, 0)

    def step(carry, inp):
        st, sp = inp
        out = jnp.where(sp, False, jnp.where(st, True, carry))
        return out, out

    import jax

    init = jnp.zeros(xf.shape[1:], dtype=bool)
    _, out = jax.lax.scan(step, init, (xf, sf))
    out = jnp.moveaxis(out, 0, ax)
    return da_start.copy(data=out.astype(jnp.float32))


def keep_longest_run(da: ClimArray, freq: str | None = None) -> ClimArray:
    """Boolean mask keeping only the longest run (per period) — xclim :805."""
    spec = _spec(da, freq)
    ax = da.time_axis
    b = _rl._as_bool(da.data)
    d = _rl.rle(b, axis=ax, index="first", reset_spec=spec)
    mx = _rl.rle_statistics(b, "max", 1, axis=ax, spec=spec)
    if spec is not None:
        mxs = jnp.take(mx, jnp.asarray(spec.seg_id), axis=ax)
    else:
        mxs = jnp.expand_dims(mx, ax)
    is_start_of_longest = jnp.nan_to_num(d, nan=0.0) == jnp.where(mxs > 0, mxs, -1)
    # ties: the reference's argmax keeps only the FIRST longest run
    # (xclim :805-833) — drop any candidate with a candidate before it in
    # the same period (exclusive prefix count of candidates)
    cf = jnp.moveaxis(is_start_of_longest, ax, 0)
    pre = jnp.cumsum(cf, axis=0) - cf  # candidates strictly before each step
    if spec is not None:
        off = jnp.take(pre, jnp.asarray(spec.starts), axis=0)
        pre = pre - jnp.take(off, jnp.asarray(spec.seg_id), axis=0)
    is_start_of_longest = jnp.moveaxis(cf & (pre == 0), 0, ax)
    # propagate marker forward across the run
    xf = jnp.moveaxis(is_start_of_longest, ax, 0)
    bf = jnp.moveaxis(b, ax, 0)

    import jax

    def step(carry, inp):
        mark, bb = inp
        out = mark | (carry & bb)
        return out, out

    init = jnp.zeros(xf.shape[1:], dtype=bool)
    _, out = jax.lax.scan(step, init, (xf, bf))
    out = jnp.moveaxis(out, 0, ax)
    return da.copy(data=out)


_OP_WORDS = {"gt": ">", "ge": ">=", "lt": "<", "le": "<=", "eq": "==",
             "ne": "!="}


def suspicious_run(da: ClimArray, window: int = 10, op: str = ">",
                   thresh=None) -> ClimArray:
    """Flag runs of >= window identical values, optionally filtered to runs
    whose value satisfies ``value op thresh`` (xclim run_length.py:1717)."""
    out = _rl.suspicious_run(da.data, axis=da.time_axis, window=window,
                             op=_OP_WORDS.get(op, op), thresh=thresh)
    return da.copy(data=out)


def find_events(condition: ClimArray, window: int,
                condition_stop: ClimArray | None = None, window_stop: int = 1,
                data: ClimArray | None = None, freq: str | None = None,
                max_events: int | None = None) -> dict:
    """Extract individual events along an 'event' dimension
    (xclim run_length.py:1846).

    An event starts with `window` consecutive True in `condition` and stops
    with `window_stop` consecutive True in `condition_stop` (default: the
    negation of `condition`). Ragged events are padded to a fixed capacity
    (``max_events``, default T//(window+window_stop)+1) — the TPU-static
    representation of the reference's variable-length event dimension.

    Returns a dict with 'event_length', 'event_effective_length',
    'event_start' (doy) and, if `data` given, 'event_sum'.
    """
    import jax

    if condition_stop is None:
        condition_stop = ~condition
    mask = runs_with_holes(condition, window, condition_stop, window_stop)
    ax = mask.time_axis
    spec = _spec(mask, freq)
    reset = None if spec is None else segment_boundaries_arr(spec)
    mf = jnp.moveaxis(mask.data > 0, ax, 0)  # (T, ...)
    T = mf.shape[0]
    if reset is not None:
        # split events at period boundaries
        rs = reset.reshape((T,) + (1,) * (mf.ndim - 1))
    prev = jnp.concatenate([jnp.zeros_like(mf[:1]), mf[:-1]], axis=0)
    starts = mf & ~prev
    if spec is not None:
        starts = starts | (mf & rs)
    E = max_events or (T // (window + window_stop) + 1)
    # per-cell event index at each step (0-based; valid only inside events)
    eid = jnp.cumsum(starts.astype(jnp.int32), axis=0) - 1
    cshape = mf.shape[1:]
    C = int(np.prod(cshape)) if cshape else 1
    cell = jnp.arange(C, dtype=jnp.int32).reshape((1,) + cshape)
    flat_ids = jnp.where(mf, eid, -1) * 1
    ids = jnp.where(mf & (eid < E), cell * E + jnp.clip(eid, 0, E - 1), C * E)
    ids_flat = ids.reshape(T, C).reshape(-1)
    condf = jnp.moveaxis(_rl._as_bool(condition.data), ax, 0).reshape(T, C).reshape(-1)

    def seg_sum(vals):
        return jax.ops.segment_sum(vals, ids_flat, num_segments=C * E + 1)[:-1]

    length = seg_sum(jnp.ones_like(ids_flat, dtype=jnp.float32)).reshape(C, E)
    eff = seg_sum(condf.astype(jnp.float32)).reshape(C, E)
    posj = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.float32).reshape(T, 1), (T, C)).reshape(-1)
    start_idx = jax.ops.segment_min(
        jnp.where(jnp.moveaxis(starts, 0, 0).reshape(T, C).reshape(-1), posj, jnp.inf),
        ids_flat, num_segments=C * E + 1)[:-1].reshape(C, E)

    def unflat(x):
        x = x.reshape(cshape + (E,)) if cshape else x.reshape(E)
        valid = length.reshape(cshape + (E,)) if cshape else length.reshape(E)
        return jnp.where(valid > 0, x, jnp.nan)

    out_dims = tuple(d for d in mask.dims if d != "time") + ("event",)
    coords = {k: v for k, v in mask.coords.items() if k != "time"}
    coords["event"] = np.arange(1, E + 1)

    def wrap(xdata, name, units="d"):
        return ClimArray(xdata, out_dims, dict(coords), {"units": units}, name)

    doys = np.concatenate([mask.time.doy.astype(np.float32), [np.nan]])
    sidx = unflat(start_idx)
    safe = jnp.where(jnp.isnan(sidx), len(mask.time), sidx).astype(jnp.int32)
    start_doy = jnp.where(jnp.isnan(sidx), jnp.nan, jnp.asarray(doys)[safe])
    out = {
        "event_length": wrap(unflat(length), "event_length"),
        "event_effective_length": wrap(unflat(eff), "event_effective_length"),
        "event_start": wrap(start_doy, "event_start", units=""),
    }
    if data is not None:
        dataf = jnp.moveaxis(jnp.nan_to_num(data.data), ax, 0).reshape(T, C).reshape(-1)
        dsum = seg_sum(dataf).reshape(C, E)
        out["event_sum"] = wrap(unflat(dsum), "event_sum",
                                units=data.attrs.get("units", ""))
    return out


def run_bounds(mask: ClimArray, coord: bool | str = True,
               max_events: int | None = None) -> ClimArray:
    """Start and end positions of boolean runs, on new ('bounds', 'events')
    dims (xclim run_length.py:745).

    The reference sizes the events dim dynamically; here it is the static
    capacity ``max_events`` (default T//2+1, the worst case), NaN padded —
    fixed shapes keep the whole thing inside one compiled program.

    coord=False → indices; coord=True → time encoded as seconds since epoch;
    coord='dayofyear' → day-of-year values.
    """
    ax = mask.time_axis
    mf = jnp.moveaxis(_rl._as_bool(mask.data), ax, 0)
    T = mf.shape[0]
    E = max_events or (T // 2 + 1)
    prev = jnp.concatenate([jnp.zeros_like(mf[:1]), mf[:-1]], axis=0)
    nxt = jnp.concatenate([mf[1:], jnp.zeros_like(mf[:1])], axis=0)
    starts = mf & ~prev
    # reference's end = first False index after the run (diff == -1 position)
    ends = mf & ~nxt
    pos = jnp.arange(T, dtype=jnp.float32).reshape((T,) + (1,) * (mf.ndim - 1))

    def first_e(flags, off=0.0):
        # stable sort brings flagged positions forward in order
        key = jnp.where(flags, pos + off, jnp.inf)
        srt = jnp.sort(key, axis=0)[:E]
        return jnp.where(jnp.isinf(srt), jnp.nan, srt)

    s_idx = first_e(starts)
    e_idx = first_e(ends, off=1.0)  # exclusive end index, as the reference's diff
    out = jnp.stack([s_idx, e_idx], axis=0)  # (bounds=2, E, ...)
    if coord:
        if coord == "dayofyear":
            vals = mask.time.doy.astype(np.float64)
        else:
            vals = mask.time.encode().astype(np.float64)
        vj = jnp.asarray(np.concatenate([vals, [np.nan]]))
        safe = jnp.where(jnp.isnan(out), T,
                         jnp.clip(out, 0, T - 1)).astype(jnp.int32)
        out = jnp.where(jnp.isnan(out), jnp.nan, vj[safe])
    out = jnp.moveaxis(out, (0, 1), (0, 1))  # (bounds, events, ...)
    out_dims = ("bounds", "events") + tuple(d for d in mask.dims if d != "time")
    coords = {k: v for k, v in mask.coords.items() if k != "time"}
    coords["events"] = np.arange(E)
    return ClimArray(out, out_dims, coords, {}, "run_bounds")


def segment_boundaries_arr(spec):
    import numpy as _np

    n = len(spec.seg_id)
    m = _np.zeros(n, dtype=bool)
    m[spec.starts] = True
    return jnp.asarray(m)
