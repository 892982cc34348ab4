"""Fused spell-statistics Pallas kernel.

One pass over HBM computes, per resample period and grid cell, ALL of:

* threshold exceedance count         (reference: threshold_count → tx_days_above…)
* days inside runs ≥ window          (windowed_run_count → heat_wave_index…)
* number of runs ≥ window            (windowed_run_events → hot_spell_frequency…)
* longest run                        (longest_run → hot_spell_max_length…)

The pure-XLA path (ops/runlength.py) materializes the comparison mask, the
scan output and the gathered segments — ≥4 HBM round-trips of the full (T, C)
series. This kernel reads each input element once: the time loop runs in VMEM
with a per-lane run-length carry, and per-segment accumulators are flushed to
the output rows exactly at segment boundaries (segments are contiguous in
time, so only the *current* segment's accumulators live in registers).

Run semantics are resample-before-rl (runs reset at period boundaries), the
default of the threshold indices. NaN inputs count as False.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.calendar import SegmentSpec

__all__ = ["spell_stats", "fused_spell_stats"]

# Block width (grid cells per Pallas program instance). 512 lanes = 4
# sublane-tiles per vector op: wide enough to amortize the sequential
# time-loop (128 lanes ran 33x slower on v5e), small enough that the
# (T, BC) block stays well inside VMEM for multi-decade daily series and
# inside the axon remote-compile helper's limits (>=1024 fails there).
_LANES = 512


def _kernel(seg_ref, x_ref, cnt_ref, wrc_ref, wre_ref, lng_ref, *, T, nseg,
            thresh, window, op_ge, greater):
    """seg_ref: (T,) int32 segment id per step (SMEM); x_ref: (T, BC) VMEM.

    Outputs (nseg, BC): exceedance count, windowed run count, windowed run
    events, longest run.
    """
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    BC = x_ref.shape[1]
    zero = jnp.zeros((BC,), dtype=jnp.float32)

    cnt_ref[...] = jnp.zeros_like(cnt_ref)
    wrc_ref[...] = jnp.zeros_like(wrc_ref)
    wre_ref[...] = jnp.zeros_like(wre_ref)
    lng_ref[...] = jnp.zeros_like(lng_ref)

    def body(t, carry):
        run, cnt, wrc, wre, lng, cur_seg = carry
        x = x_ref[t, :]
        # IEEE comparisons are False for NaN, so NaN inputs count as False
        # without an explicit isnan (which the axon backend's Mosaic AOT
        # compiler cannot lower — verified by bisection on-chip).
        if greater:
            b = (x >= thresh) if op_ge else (x > thresh)
        else:
            b = (x <= thresh) if op_ge else (x < thresh)
        seg = seg_ref[t]
        is_new = seg != cur_seg

        # flush the finished segment's accumulators
        @pl.when(is_new)
        def _():
            cnt_ref[cur_seg, :] = cnt
            wrc_ref[cur_seg, :] = wrc
            wre_ref[cur_seg, :] = wre
            lng_ref[cur_seg, :] = lng

        cnt = jnp.where(is_new, zero, cnt)
        wrc = jnp.where(is_new, zero, wrc)
        wre = jnp.where(is_new, zero, wre)
        lng = jnp.where(is_new, zero, lng)
        run = jnp.where(is_new, zero, run)

        bf = b.astype(jnp.float32)
        run = jnp.where(b, run + 1.0, 0.0)
        cnt = cnt + bf
        # run reaches `window`: credit the whole window; beyond: one per day
        at_w = run == float(window)
        over_w = run > float(window)
        wrc = wrc + jnp.where(at_w, float(window), jnp.where(over_w, 1.0, 0.0))
        wre = wre + jnp.where(at_w, 1.0, 0.0)
        lng = jnp.maximum(lng, run)
        return run, cnt, wrc, wre, lng, seg

    init = (zero, zero, zero, zero, zero, jnp.int32(0))
    run, cnt, wrc, wre, lng, cur_seg = jax.lax.fori_loop(0, T, body, init)
    # final flush
    cnt_ref[cur_seg, :] = cnt
    wrc_ref[cur_seg, :] = wrc
    wre_ref[cur_seg, :] = wre
    lng_ref[cur_seg, :] = lng


@functools.partial(jax.jit, static_argnames=("nseg", "thresh", "window", "op",
                                             "interpret"))
def _call(x, seg_id, *, nseg, thresh, window, op, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, C = x.shape
    BC = _LANES
    nblocks = (C + BC - 1) // BC
    pad = nblocks * BC - C
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)), constant_values=jnp.nan)

    greater = op in (">", ">=", "gt", "ge")
    op_ge = op in (">=", "<=", "ge", "le")

    kernel = functools.partial(_kernel, T=T, nseg=nseg, thresh=float(thresh),
                               window=int(window), op_ge=op_ge, greater=greater)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((T, BC), lambda i, seg: (0, i))],
        out_specs=[pl.BlockSpec((nseg, BC), lambda i, seg: (0, i))] * 4,
    )
    out_shape = [jax.ShapeDtypeStruct((nseg, nblocks * BC), jnp.float32)] * 4
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(seg_id, x)
    if pad:
        outs = tuple(o[:, :C] for o in outs)
    return outs


def fused_spell_stats(x, spec: SegmentSpec, thresh: float, window: int,
                      op: str = ">", interpret: bool = False):
    """Run the fused kernel on (T, C) data.

    Returns (count, windowed_run_count, windowed_run_events, longest_run),
    each (nseg, C) float32.
    """
    seg_id = jnp.asarray(spec.seg_id.astype(np.int32))
    return _call(jnp.asarray(x, dtype=jnp.float32), seg_id, nseg=spec.nseg,
                 thresh=float(thresh), window=int(window), op=op,
                 interpret=interpret)


def spell_stats(da, spec: SegmentSpec, thresh: float, window: int, op: str = ">",
                interpret: bool = False):
    """ClimArray wrapper: time must be axis 0; extra dims flattened to cells."""
    x = da.data if hasattr(da, "data") else da
    shape = x.shape
    T = shape[0]
    C = int(np.prod(shape[1:])) if len(shape) > 1 else 1
    outs = fused_spell_stats(x.reshape(T, C), spec, thresh, window, op,
                             interpret=interpret)
    return tuple(o.reshape((spec.nseg,) + shape[1:]) for o in outs)
