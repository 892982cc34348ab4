"""Windowed day-of-year group quantiles — the sdba training kernel.

The quantile-mapping trainers (EQM/DQM/QDM, reference: the external xsdba
package re-exported as xclim.sdba — xclim:src/xclim/sdba.py:1-28) need, for
every day-of-year group g, the quantiles of ALL samples whose doy falls in a
±half window around g (window=31 in the north-star config). The windowed
gather holds each time step ``window`` times, so sorting the gathered
(n_doy, window*years, C) tensor — the round-2 implementation — re-sorts every
sample 31 times (~155 ms per sort on-chip for 30 y x 1024 cells; the whole
train+adjust was 0.62x the baseline bar).

This kernel never sorts the windowed gather. Each doy slice (years-many
values) is bitonic-sorted ONCE in VMEM; a group's 31x32 window of pre-sorted
runs is then merged with only the tail phases of the bitonic network
(sorted-32 runs -> sorted-1024 needs 40 of the 55 compare stages), and the
exact Hyndman-Fan order statistics are extracted with a one-hot contraction
restricted to a narrow rank window (full-width fallback when missing-value
counts spread the per-lane ranks). Everything between the one HBM read of
the slices and the (n_doy, nq, C) quantile write stays in VMEM.

NaNs are mapped to a large finite sentinel host-side (they sort to the end
and are excluded from valid counts); ``jnp.isnan`` is never used in-kernel —
the axon backend's Mosaic AOT compiler cannot lower it (see
ops/pallas/spells.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["doy_window_quantiles", "doy_window_quantiles_xla"]

#: finite NaN sentinel: sorts after every real value, and ``x * 0 == 0``
#: still holds (jnp.inf would poison the selection contraction with NaNs).
BIG = 3.0e38

_LANES = int(__import__("os").environ.get("XCLIM_TPU_WQ_LANES", "128"))
_WSEL = 64  # rank-window width of the fast selection path


def _pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def _roll(x, shift, axis):
    """pltpu.roll, indirected so pure-jnp tests can patch in jnp.roll."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(x, shift, axis)


def _ce(x, k, asc, axis):
    """Bitonic compare-exchange (i <-> i^k) along ``axis`` of x.

    asc: bool array of x's shape, True where index i's 2p-block sorts
    ascending. Circular-roll formulation for every k: the partner i^k never
    actually wraps for power-of-two lengths, and Mosaic lowers sublane rolls
    at ~1.9x the throughput of the tile-preserving reshape alternative
    (measured 1032 vs 556 G elem-ops/s on (1024, 128) f32 merge phases).
    """
    n = x.shape[axis]
    down = _roll(x, n - k, axis)  # value at i becomes x[i + k]
    up = _roll(x, k, axis)        # value at i becomes x[i - k]
    ii = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    low_of_pair = (ii & k) == 0
    partner = jnp.where(low_of_pair, down, up)
    want_small = low_of_pair == asc
    return jnp.where(want_small,
                     jnp.minimum(x, partner), jnp.maximum(x, partner))


def _bitonic_phases(x, p_start, p_end, axis=0, flip=None):
    """Bitonic phases p = p_start..p_end (inclusive, powers of 2) along
    ``axis``. After phase p, runs of 2p are sorted, direction alternating by
    bit 2p of the index (the final phase of a full array sorts ascending).
    ``flip``: optional bool of x's shape flipping every direction (used to
    presort alternate slices descending)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    p = p_start
    while p <= p_end:
        asc = (ii & (2 * p)) == 0
        if flip is not None:
            asc = asc != flip
        k = p
        while k >= 1:
            x = _ce(x, k, asc, axis)
            k //= 2
        p *= 2
    return x


def _kernel_dyadic(x_hbm, out_ref, slab, cnt_ref, l8, l16, arr_ref, sem, *,
                   S, DB, W, Ypad, P2, nq, BC, qvals, coffs, alpha, beta):
    """W=31 fast path: cached dyadic runs instead of a full per-group merge.

    The full bitonic merge re-sorts every group's 31x Ypad window from
    Ypad-runs: 40 compare-exchange stages over P2 rows per group, and the VPU
    is issue-bound on exactly those stages (tools/prof_winquantile.py: slice/
    fused/unrolled variants all within 5%). This path cuts the row-stages
    ~0.6x by precomputing, once per slab:

      l8[t]  = slices [8t, 8t+8)  merged DESC   (oct runs)
      l16[m] = slices [16m, 16m+16) merged DESC (16-runs)

    and covering every window [g, g+31) as {7 singles} + {one aligned oct}
    + {one aligned 16-run} by scalar arithmetic alone:

      A16 = 16*ceil(g/16); L = A16 - g; h = L & 7
      single_i at slice g + i + (0 if i < h else 24),  i = 0..6
      oct at A16-8 (head, L>=8) else A16+16 (tail)
      mid16 at A16

    The merges then need only the tail phases: singles -> 8Ypad (asc), +oct
    -> 16Ypad, +mid16 -> 32Ypad. DESC-stored runs make each concat bitonic
    with no reversal (Mosaic cannot lower `rev`); direction costs nothing —
    it is just the final-phase mask at build time. Output equals the full
    merge exactly (same sorted array, same selection)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ci = pl.program_id(0)
    gi = pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[ci, pl.ds(gi * DB, S)], slab, sem)
    cp.start()
    cp.wait()

    raw = slab[...]
    cnt_ref[...] = jnp.sum((raw < BIG * 0.5).astype(jnp.float32), axis=1,
                           keepdims=True)
    srow = jax.lax.broadcasted_iota(jnp.int32, (S, Ypad, BC), 0)
    slab[...] = _bitonic_phases(raw, 1, Ypad // 2, axis=1,
                                flip=(srow & 1) == 1)

    NOCT = S // 8
    N16 = S // 16
    allflip8 = jnp.ones((NOCT, 8 * Ypad, BC), bool)
    l8[...] = _bitonic_phases(
        slab[0:NOCT * 8].reshape(NOCT, 8 * Ypad, BC), Ypad, 4 * Ypad,
        axis=1, flip=allflip8)
    allflip16 = jnp.ones((N16, 16 * Ypad, BC), bool)
    l16[...] = _bitonic_phases(
        slab[0:N16 * 16].reshape(N16, 16 * Ypad, BC), Ypad, 8 * Ypad,
        axis=1, flip=allflip16)

    iota_r = jax.lax.broadcasted_iota(jnp.int32, (P2, BC), 0)

    def g_body(g, carry):
        nv = jnp.sum(cnt_ref[pl.ds(g, W)], axis=(0, 1))   # (BC,)
        A16 = ((g + 15) // 16) * 16
        L = A16 - g
        h = L & 7
        parts = []
        for i in range(7):
            s_i = g + i + jnp.where(i < h, 0, 24)
            parts.append(slab[pl.ds(s_i, 1)].reshape(Ypad, BC))
        parts.append(jnp.full((Ypad, BC), BIG, dtype=jnp.float32))
        A = _bitonic_phases(jnp.concatenate(parts, axis=0), Ypad, 4 * Ypad)
        osl = jnp.where(L >= 8, A16 - 8, A16 + 16)
        oct_run = l8[pl.ds(osl // 8, 1)].reshape(8 * Ypad, BC)
        B = _bitonic_phases(jnp.concatenate([A, oct_run], axis=0),
                            8 * Ypad, 8 * Ypad)
        m16 = l16[pl.ds(A16 // 16, 1)].reshape(16 * Ypad, BC)
        arr = _bitonic_phases(jnp.concatenate([B, m16], axis=0),
                              16 * Ypad, 16 * Ypad)
        arr_ref[...] = arr
        out_ref[0, g] = _select_nodes(arr, arr_ref, iota_r, nv, P2, nq, BC,
                                      qvals, coffs)
        return carry

    jax.lax.fori_loop(0, DB, g_body, 0)


def _select_nodes(arr, arr_ref, iota_r, nv, P2, nq, BC, qvals, coffs):
    """Hyndman-Fan node selection from the sorted window (shared by both
    merge paths): uniform / windowed-fast / full, picked by valid-count
    spread."""
    from jax.experimental import pallas as pl

    nvm1 = jnp.maximum(nv - 1.0, 0.0)

    def node_ranks(j):
        h = jnp.clip((nv * qvals[j] + coffs[j]) - 1.0, 0.0, nvm1)
        k0 = jnp.floor(h).astype(jnp.int32)
        gam = h - k0.astype(jnp.float32)
        k1 = jnp.minimum(k0 + 1, nvm1.astype(jnp.int32))
        return k0, k1, gam

    def select(seg, seg_iota, j):
        k0, k1, gam = node_ranks(j)
        sel0 = (seg_iota == k0[None, :]).astype(seg.dtype)
        sel1 = (seg_iota == k1[None, :]).astype(seg.dtype)
        v0 = jnp.sum(seg * sel0, axis=0)
        v1 = jnp.sum(seg * sel1, axis=0)
        return v0 * (1.0 - gam) + v1 * gam

    nmin = jnp.min(nv)
    nmax = jnp.max(nv)
    wsel = min(_WSEL, P2)

    def uniform(_):
        nvb = jnp.broadcast_to(nmin.reshape(1, 1), (1, BC))
        nvm1b = jnp.maximum(nvb - 1.0, 0.0)
        rows = []
        for j in range(nq):
            h = jnp.clip((nvb * qvals[j] + coffs[j]) - 1.0, 0.0, nvm1b)
            k0 = jnp.floor(h).astype(jnp.int32)
            gam = h - k0.astype(jnp.float32)
            k1 = jnp.minimum(k0 + 1, nvm1b.astype(jnp.int32))
            base = jnp.clip(k0[0, 0] & ~7, 0, P2 - 16)
            base = pl.multiple_of(base, 8)
            seg = arr_ref[pl.ds(base, 16)]
            ii = (jax.lax.broadcasted_iota(jnp.int32, (16, BC), 0) + base)
            sel0 = (ii == k0).astype(seg.dtype)
            sel1 = (ii == k1).astype(seg.dtype)
            v0 = jnp.sum(seg * sel0, axis=0)
            v1 = jnp.sum(seg * sel1, axis=0)
            rows.append(v0 * (1.0 - gam[0]) + v1 * gam[0])
        return jnp.stack(rows, axis=0)

    def fast(_):
        rows = []
        for j in range(nq):
            start = (jnp.floor((nmin * qvals[j] + coffs[j]) - 1.0)
                     .astype(jnp.int32) - 8)
            start = pl.multiple_of(jnp.clip(start, 0, P2 - wsel) & ~7, 8)
            seg = arr_ref[pl.ds(start, wsel)]
            seg_iota = (jax.lax.broadcasted_iota(jnp.int32, (wsel, BC), 0)
                        + start)
            rows.append(select(seg, seg_iota, j))
        return jnp.stack(rows, axis=0)

    def full(_):
        rows = [select(arr, iota_r, j) for j in range(nq)]
        return jnp.stack(rows, axis=0)

    if wsel - 24 <= 0:
        return full(None)
    return jax.lax.cond(
        nmax == nmin, uniform,
        lambda _: jax.lax.cond(
            nmax - nmin <= jnp.float32(wsel - 24), fast, full, None),
        None)


def _kernel(x_hbm, out_ref, slab, cnt_ref, arr_ref, sem, *, S, DB, W, Ypad,
            P2, nq, BC, qvals, coffs, alpha, beta):
    """x_hbm: (ngDB+2h, Ypad, C) in HBM; out block (DB, nq, BC).

    slab: VMEM scratch (S=DB+W-1, Ypad, BC); cnt_ref (S, BC) per-slice valid
    counts; arr_ref (P2, BC) the merged sorted window (scratch refs exist so
    dynamic-start slices go through Ref indexing — Mosaic does not lower
    ``lax.dynamic_slice`` on values). qvals/coffs: static python tuples —
    per-node quantile and the f32-rounded Hyndman-Fan offset q*(1-a-b)+a.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ci = pl.program_id(0)
    gi = pl.program_id(1)
    # x_hbm is lane-blocked host-side to (nc, G2, Ypad, BC): the slab copy is
    # one CONTIGUOUS ~1.5 MB transfer. The round-2 unblocked layout sliced
    # (S, Ypad, BC) out of (G2, Ypad, C) — 512 B strided chunks that ran the
    # whole kernel at ~14 GB/s effective (tools/prof_winquantile.py dma_only).
    cp = pltpu.make_async_copy(x_hbm.at[ci, pl.ds(gi * DB, S)], slab, sem)
    cp.start()
    cp.wait()

    # valid counts per slice, then presort each slice along Ypad —
    # ascending for even slab rows, descending for odd (the alternation the
    # bitonic merge phases need; the direction itself is irrelevant).
    raw = slab[...]
    # (S, 1, BC): keep the sliced dim leading/untiled — Mosaic requires
    # sublane-dim slice starts to be provably 8-aligned
    cnt_ref[...] = jnp.sum((raw < BIG * 0.5).astype(jnp.float32), axis=1,
                           keepdims=True)
    if W > 1:
        # alternate sort directions by slice parity: the window's runs then
        # alternate asc/desc, which is what the merge phases need
        srow = jax.lax.broadcasted_iota(jnp.int32, (S, Ypad, BC), 0)
        flip = (srow & 1) == 1
    else:
        flip = None  # no merge phases run; slices must end up ascending
    slab[...] = _bitonic_phases(raw, 1, Ypad // 2, axis=1, flip=flip)

    npad = P2 - W * Ypad
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (P2, BC), 0)

    def g_body(g, carry):
        win = slab[pl.ds(g, W)]                      # (W, Ypad, BC)
        nv = jnp.sum(cnt_ref[pl.ds(g, W)], axis=(0, 1))   # (BC,)
        arr = win.reshape(W * Ypad, BC)
        if npad:
            arr = jnp.concatenate(
                [arr, jnp.full((npad, BC), BIG, dtype=arr.dtype)], axis=0)
        arr = _bitonic_phases(arr, Ypad, P2 // 2)     # merge 32-runs -> P2
        arr_ref[...] = arr
        # all-missing lanes select the BIG sentinel; the host wrapper maps
        # >= BIG/2 back to NaN (no NaN literals in-kernel)
        out_ref[0, g] = _select_nodes(arr, arr_ref, iota_r, nv, P2, nq, BC,
                                      qvals, coffs)
        return carry

    jax.lax.fori_loop(0, DB, g_body, 0)


@functools.partial(jax.jit, static_argnames=(
    "q_tuple", "window", "nq", "alpha", "beta", "db", "interpret"))
def _call(xgp, *, q_tuple, window, nq, alpha, beta, db, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ngDB_2h, Ypad, Cp = xgp.shape
    half = window // 2
    S = db + 2 * half
    ngrid = (ngDB_2h - 2 * half) // db
    nc = Cp // _LANES
    P2 = _pow2(window * Ypad)
    # round at f32 exactly where nan_quantile's op sequence does
    qvals = tuple(float(np.float32(v)) for v in q_tuple)
    coffs = tuple(float(np.float32(np.float32(v) * np.float32(1 - alpha - beta))
                        + np.float32(alpha)) for v in qvals)

    # lane-blocked layouts on both sides: (nc, G2, Ypad, BC) in,
    # (nc, ngrid*db, nq, BC) out — every kernel DMA/write is contiguous
    xb = jnp.moveaxis(
        xgp.reshape(ngDB_2h, Ypad, nc, _LANES), 2, 0)
    scratch = [pltpu.VMEM((S, Ypad, _LANES), jnp.float32),
               pltpu.VMEM((S, 1, _LANES), jnp.float32)]
    if window == 31:
        kern_fn = _kernel_dyadic
        scratch += [pltpu.VMEM((S // 8, 8 * Ypad, _LANES), jnp.float32),
                    pltpu.VMEM((S // 16, 16 * Ypad, _LANES), jnp.float32)]
    else:
        kern_fn = _kernel
    scratch += [pltpu.VMEM((P2, _LANES), jnp.float32),
                pltpu.SemaphoreType.DMA]
    kernel = functools.partial(
        kern_fn, S=S, DB=db, W=window, Ypad=Ypad, P2=P2, nq=nq, BC=_LANES,
        qvals=qvals, coffs=coffs, alpha=alpha, beta=beta)
    out = pl.pallas_call(
        kernel,
        grid=(nc, ngrid),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, db, nq, _LANES),
                               lambda ci, gi: (ci, gi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nc, ngrid * db, nq, _LANES),
                                       jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(xb)
    return jnp.moveaxis(out, 0, 2).reshape(ngrid * db, nq, Cp)


def doy_window_quantiles(xg, q, window: int, alpha: float = 1.0,
                         beta: float = 1.0, db: int = 64,
                         interpret: bool = False):
    """Quantiles of each wrapped ±(window//2)-doy group of slices.

    xg: (n_doy, Y, C) float32 — doy-sliced samples, NaN where missing
    (slot y of doy d = d-th doy of the y-th year, or NaN).
    q: (nq,) quantile nodes in [0, 1].
    Returns (n_doy, nq, C) with the same Hyndman-Fan alpha/beta semantics as
    :func:`xclim_tpu.ops.quantile.nan_quantile` (no valid samples -> NaN).
    """
    xg = jnp.asarray(xg, jnp.float32)
    n_doy, Y, C = xg.shape
    half = window // 2
    if window % 2 != 1:
        raise ValueError("window must be odd")
    qs = np.asarray(q, dtype=np.float64).reshape(-1)
    nq = len(qs)
    Ypad = max(8, _pow2(Y))
    if window == 31 and db > 48:
        db = 48  # dyadic path carries l8/l16 scratch: db=64 tops 16M VMEM
    db = min(db, _pow2(n_doy))
    ngrid = -(-n_doy // db)
    Cp = -(-C // _LANES) * _LANES

    x = jnp.where(xg == xg, xg, BIG)
    if Ypad > Y:
        x = jnp.pad(x, ((0, 0), (0, Ypad - Y), (0, 0)), constant_values=BIG)
    if Cp > C:
        # edge-replicate pad lanes: BIG lanes would zero the block-min valid
        # count and disable the windowed fast selection for the whole block
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Cp - C)), mode="edge")
    # circular doy pad + tail pad up to the grid size
    head = x[n_doy - half:] if half else x[:0]
    tail = x[:half]
    parts = [head, x, tail]
    extra = ngrid * db - n_doy
    if extra:
        parts.append(jnp.full((extra, Ypad, Cp), BIG, dtype=jnp.float32))
    xgp = jnp.concatenate(parts, axis=0)

    out = _call(xgp, q_tuple=tuple(qs), window=window, nq=nq, alpha=float(alpha),
                beta=float(beta), db=db, interpret=interpret)
    out = out[:n_doy, :, :C]
    return jnp.where(out >= BIG * 0.5, jnp.nan, out)


def doy_window_quantiles_xla(xg, q, window: int, alpha: float = 1.0,
                             beta: float = 1.0,
                             max_bytes: int = 1 << 29):
    """Pure-XLA reference/fallback: windowed gather + batched sort quantile
    (the round-2 algorithm, restated on the (n_doy, Y, C) slice layout).

    The windowed gather holds every sample ``window`` times; at ERA5-scale
    cell counts the materialized (n_doy, window*Y, C) tensor exceeds HBM
    (23.7 GB at 30 y x 16k cells), so cells are streamed through
    ``lax.map`` in slabs sized to ``max_bytes`` of gathered data — one
    compiled slab program, sequential slab dispatches, peak memory bounded.
    ``max_bytes`` counts only the gather; the sort underneath allocates
    ~3x that in working copies, and a QDM *train* runs two of these maps in
    one program with both inputs resident — 512 MB slabs keep the whole
    16k-cell train under ~6 GB where the 2 GB-slab version RESOURCE_EXHAUSTED
    a 16 GB v5e (round-4 driver sweep, BENCH_DETAIL.json "QDM 16k").
    """
    from xclim_tpu.ops.quantile import nan_quantile

    xg = jnp.asarray(xg, jnp.float32)
    n_doy, Y, C = xg.shape
    half = window // 2
    offs = np.arange(-half, half + 1)
    rows = (np.arange(n_doy)[:, None] + offs[None, :]) % n_doy  # (n_doy, W)
    qj = jnp.asarray(np.asarray(q), jnp.float32)

    def one(g2):
        g = g2[rows.reshape(-1)].reshape(n_doy, window * Y, -1)
        out = nan_quantile(g, qj, axis=1, alpha=alpha, beta=beta)
        return jnp.moveaxis(out, 0, 1)                  # (n_doy, nq, slab)

    per_cell = n_doy * window * Y * 4
    slab = max(128, min(C, int(max_bytes // per_cell)))
    if slab >= C:
        return one(xg)
    nslab = -(-C // slab)
    Cp = nslab * slab
    xp = jnp.pad(xg, ((0, 0), (0, 0), (0, Cp - C))) if Cp > C else xg
    # (nslab, n_doy, Y, slab): lax.map materializes one slab's gather at a
    # time instead of the full windowed tensor
    xs = jnp.moveaxis(xp.reshape(n_doy, Y, nslab, slab), 2, 0)
    out = jax.lax.map(one, xs)                          # (nslab, n_doy, nq, slab)
    nq = out.shape[2]
    out = jnp.moveaxis(out, 0, 2).reshape(n_doy, nq, Cp)
    return out[..., :C]
