"""One-pass Pallas segment-reduction kernel — the resample(freq).op engine.

The pure-XLA path (ops/segments.py segment_reduce) gathers the time axis into
a (nseg, maxlen, C) tensor and reduces it; on the tunnel backend XLA
materializes the gathered copy, so every resample costs ~3 HBM traversals of
the full series (measured 69-87 GB/s effective vs a ~400 GB/s saxpy roofline —
docs/performance.md). This kernel reads each input element exactly once:

* the (T, BC) lane-block streams through VMEM (Pallas double-buffers blocks
  across the grid);
* segments are contiguous in time and their bounds are STATIC (host-side
  calendar tables, core/calendar.py resample_segments), so the kernel body is
  a fully unrolled Python loop of static, 8-aligned sublane slices — no scan,
  no scatter, maximum-width VPU reductions;
* rows pulled in by the 8-alignment of a slice are masked off with an iota
  range check; NaNs are detected with a self-comparison (``(v >= 0) | (v < 0)``
  is False only for NaN — the axon backend's Mosaic AOT compiler cannot lower
  ``jnp.isnan``, see ops/pallas/spells.py).

Three static stat sets cover the reduction family:

* ``"sum"``    → (count, sum)            serves sum / mean / count
* ``"minmax"`` → (count, min, max)       serves min / max
* ``"m2"``     → (count, sum, sum((x-mu)^2))  serves std / var (two VMEM
  passes, still one HBM pass — the naive E[x^2]-E[x]^2 loses ~5e-3 absolute
  on Kelvin-scale inputs)

NaN rules (all-NaN segment → NaN, xarray skipna=True semantics) are applied
by the host wrapper from the count output.

Reference behavior being replaced: ``da.resample(time=freq).mean()`` et al.
(xclim:src/xclim/indices/generic.py:83 select_resample_op,
xclim:src/xclim/indices/helpers.py:898-976 resample_map).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["segment_reduce_onepass", "SUPPORTED_OPS"]

_LANES = 512
#: sentinel for min/max identity — finite so no inf arithmetic in-kernel
BIG = 3.0e38

#: segment_reduce ops this kernel can serve, mapped to the kernel stat set
SUPPORTED_OPS = {
    "sum": "sum", "mean": "sum", "count": "sum",
    "min": "minmax", "max": "minmax",
    "std": "m2", "var": "m2",
}


def _mxu_kernel(s_ref, x_ref, cnt_ref, sum_ref, *, TC, T):
    """sum/mean/count as a tiled (nseg, T) x (T, C) matmul on the MXU.

    Grid is (lane blocks, time chunks) with time innermost: each x block is
    (Tc, BC) — rows of BC*4 contiguous bytes — and the matching selection
    block S[:, t0:t0+Tc] streams alongside.  The NaN mask and the validity
    count fuse into the block's single HBM read; partial products accumulate
    into the revisited output block across the time chunks.

    Two cost lessons measured at (3650, 512x512) on v5e:

    * the input is NOT host-padded to the time-chunk multiple — a full
      `jnp.pad` copy cost ~20 ms (read+write of the whole series).  Instead
      the grid over-runs the ragged tail and a global row-index mask zeroes
      whatever the edge block DMAs in (NaN/Inf garbage would otherwise
      poison the 0-weighted products).
    * double-HIGHEST precision (12 bf16 passes) cost ~25 ms of MXU time.
      The selection matrix and the validity mask are {0,1} — exact in
      bf16 — so the count runs one bf16 pass, and the values use a manual
      3-way bf16 split (hi/mid/lo) with f32 accumulation: 4 passes total,
      max error ~1e-4 on Kelvin-scale monthly means.

    Together: 79 ms -> 32 ms end-to-end tg_mean (118 GB/s effective vs the
    127 GB/s plain axis-0 sum roofline of this backend).
    """
    t = pl.program_id(1)
    x = x_ref[...]
    ii = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + t * TC
    ok = ((x >= 0.0) | (x < 0.0)) & (ii < T)   # NaN-proof + ragged-tail mask
    okf = ok.astype(jnp.bfloat16)
    xz = jnp.where(ok, x, 0.0)
    s = s_ref[...]
    dn = (((1,), (0,)), ((), ()))
    c = jax.lax.dot_general(s, okf, dn, preferred_element_type=jnp.float32)
    hi = xz.astype(jnp.bfloat16)
    r1 = xz - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    v = (jax.lax.dot_general(s, hi, dn, preferred_element_type=jnp.float32)
         + jax.lax.dot_general(s, mid, dn, preferred_element_type=jnp.float32)
         + jax.lax.dot_general(s, lo, dn, preferred_element_type=jnp.float32))

    @pl.when(t == 0)
    def _init():
        cnt_ref[...] = c
        sum_ref[...] = v

    @pl.when(t > 0)
    def _acc():
        cnt_ref[...] += c
        sum_ref[...] += v


def _kernel(x_ref, *out_refs, bounds, stats, BC):
    """x_ref: (Tp, BC) VMEM block. bounds: static ((a, b), ...) per segment.

    out_refs (each (nsegp, BC)): cnt, then sum / (mn, mx) / (sum, m2)
    depending on ``stats``.
    """
    for s, (a, b) in enumerate(bounds):
        a8 = a & ~7
        b8 = min(-(-b // 8) * 8, x_ref.shape[0])
        seg = x_ref[a8:b8, :]
        rows = b8 - a8
        ii = jax.lax.broadcasted_iota(jnp.int32, (rows, BC), 0) + a8
        in_seg = (ii >= a) & (ii < b)
        # NaN-proof validity: IEEE comparisons are False for NaN
        ok = in_seg & ((seg >= 0.0) | (seg < 0.0))
        okf = ok.astype(jnp.float32)
        cnt = jnp.sum(okf, axis=0)
        out_refs[0][s, :] = cnt
        if stats == "sum":
            out_refs[1][s, :] = jnp.sum(jnp.where(ok, seg, 0.0), axis=0)
        elif stats == "minmax":
            out_refs[1][s, :] = jnp.min(jnp.where(ok, seg, BIG), axis=0)
            out_refs[2][s, :] = jnp.max(jnp.where(ok, seg, -BIG), axis=0)
        else:  # m2
            sm = jnp.sum(jnp.where(ok, seg, 0.0), axis=0)
            mu = sm / jnp.maximum(cnt, 1.0)
            d = seg - mu[None, :]
            out_refs[1][s, :] = sm
            out_refs[2][s, :] = jnp.sum(jnp.where(ok, d * d, 0.0), axis=0)


def _block_lanes(Tp: int) -> int:
    """Lane-block width: two in-flight input blocks (the Pallas pipeline
    double-buffers across grid steps) must fit well under VMEM, or the DMA
    and compute serialize (measured: (3650, 512) blocks ran at 55 GB/s vs
    75 for the XLA gather; (3650, 256) restores the overlap)."""
    budget = 4 * 1024 * 1024  # bytes per in-flight input block
    bc = budget // (Tp * 4)
    bc = 1 << max(int(bc).bit_length() - 1, 0)
    return int(min(512, max(128, bc)))


@functools.partial(jax.jit, static_argnames=("bounds", "stats", "interpret"))
def _call(x2, *, bounds, stats, interpret=False):
    T, C = x2.shape
    nseg = len(bounds)
    nsegp = -(-nseg // 8) * 8

    if stats == "sum":
        TC = min(256, -(-T // 8) * 8)
        BCm = 2048 if C >= 2048 else max(128, 1 << (C - 1).bit_length())
        nt = -(-T // TC)
        Tg = nt * TC
        Cpm = -(-C // BCm) * BCm
        xm = x2
        if Cpm > C:
            # lane padding still copies; time-tail padding is handled by the
            # in-kernel mask instead (a full jnp.pad of the series cost
            # ~20 ms at (3650, 512x512))
            xm = jnp.pad(x2, ((0, 0), (0, Cpm - C)))
        sel = np.zeros((nsegp, Tg), dtype=np.float32)
        for s, (a, b) in enumerate(bounds):
            sel[s, a:b] = 1.0
        kern = functools.partial(_mxu_kernel, TC=TC, T=T)
        outs = pl.pallas_call(
            kern,
            grid=(Cpm // BCm, nt),
            in_specs=[pl.BlockSpec((nsegp, TC), lambda i, t: (0, t)),
                      pl.BlockSpec((TC, BCm), lambda i, t: (t, i))],
            out_specs=[pl.BlockSpec((nsegp, BCm), lambda i, t: (0, i))] * 2,
            out_shape=[jax.ShapeDtypeStruct((nsegp, Cpm), jnp.float32)] * 2,
            interpret=interpret,
        )(jnp.asarray(sel, jnp.bfloat16), xm)
        return tuple(o[:nseg, :C] for o in outs)

    Tp = -(-T // 8) * 8
    BC = _block_lanes(Tp)
    Cp = -(-C // BC) * BC
    if Tp > T or Cp > C:
        x2 = jnp.pad(x2, ((0, Tp - T), (0, Cp - C)))
    nblocks = Cp // BC
    nouts = {"minmax": 3, "m2": 3}[stats]
    kernel = functools.partial(_kernel, bounds=bounds, stats=stats, BC=BC)
    outs = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((Tp, BC), lambda i: (0, i))],
        out_specs=[pl.BlockSpec((nsegp, BC), lambda i: (0, i))] * nouts,
        out_shape=[jax.ShapeDtypeStruct((nsegp, Cp), jnp.float32)] * nouts,
        interpret=interpret,
    )(x2)
    return tuple(o[:nseg, :C] for o in outs)


def segment_reduce_onepass(x2, spec, op: str, interpret: bool = False):
    """resample(freq).op on a time-first (T, C) float32 array, one HBM pass.

    Returns the (nseg, C) result with the same NaN semantics as
    ops/segments.py segment_reduce (skipna=True). ``count`` returns int32.
    """
    stats = SUPPORTED_OPS[op]
    starts = np.asarray(spec.starts, dtype=np.int64)
    counts = np.asarray(spec.counts, dtype=np.int64)
    bounds = tuple((int(a), int(a + c)) for a, c in zip(starts, counts))
    outs = _call(jnp.asarray(x2, jnp.float32), bounds=bounds, stats=stats,
                 interpret=interpret)
    cnt = outs[0]
    if op == "count":
        return cnt.astype(jnp.int32)
    if op == "sum":
        return jnp.where(cnt > 0, outs[1], jnp.nan)
    if op == "mean":
        return jnp.where(cnt > 0, outs[1] / jnp.maximum(cnt, 1.0), jnp.nan)
    if op == "min":
        return jnp.where(cnt > 0, outs[1], jnp.nan)
    if op == "max":
        return jnp.where(cnt > 0, outs[2], jnp.nan)
    # std / var, ddof=0 (xarray default; ops/segments.py parity)
    var = outs[2] / jnp.maximum(cnt, 1.0)
    res = var if op == "var" else jnp.sqrt(var)
    return jnp.where(cnt > 0, res, jnp.nan)
