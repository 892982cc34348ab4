"""Decompose the winquantile Pallas kernel's cost: DMA+presort vs per-doy
merge vs selection (round-3 perf work; variants of ops/pallas/winquantile)."""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from xclim_tpu.ops.pallas.winquantile import (
    BIG, _LANES, _WSEL, _bitonic_phases, _pow2)


def _ce_asc(x, k):
    """All-ascending compare-exchange (sign-negation domain)."""
    n = x.shape[0]
    y = pltpu.roll(x, n - k, 0)
    mn = jnp.minimum(x, y)
    mx = jnp.maximum(x, y)
    hi = pltpu.roll(mx, k, 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where((ii & k) == 0, mn, hi)


def _merge_neg(x, p_start, p_end):
    """Bitonic merge phases with direction encoded by block negation."""
    ii = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    p = p_start
    x = jnp.where((ii & (2 * p)) == 0, x, -x)
    while p <= p_end:
        k = p
        while k >= 1:
            x = _ce_asc(x, k)
            k //= 2
        p2 = 2 * p
        if p2 <= p_end:
            flip = ((ii & (2 * p)) == 0) != ((ii & (2 * p2)) == 0)
            x = jnp.where(flip, -x, x)
        p = p2
    return x


def _kernel(x_hbm, out_ref, slab, cnt_ref, arr_ref, sem, *, S, DB, W, Ypad,
            P2, nq, BC, qvals, coffs, mode):
    ci = pl.program_id(0)
    gi = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(gi * DB, S), :, pl.ds(ci * BC, BC)], slab, sem)
    cp.start()
    cp.wait()
    raw = slab[...]
    cnt_ref[...] = jnp.sum((raw < BIG * 0.5).astype(jnp.float32), axis=1,
                           keepdims=True)
    srow = jax.lax.broadcasted_iota(jnp.int32, (S, Ypad, BC), 0)
    flip = (srow & 1) == 1
    if mode != "dma_only":
        slab[...] = _bitonic_phases(raw, 1, Ypad // 2, axis=1, flip=flip)

    npad = P2 - W * Ypad
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (P2, BC), 0)

    def g_body(g, carry):
        win = slab[pl.ds(g, W)]
        nv = jnp.sum(cnt_ref[pl.ds(g, W)], axis=(0, 1))
        arr = win.reshape(W * Ypad, BC)
        if npad:
            arr = jnp.concatenate(
                [arr, jnp.full((npad, BC), BIG, dtype=arr.dtype)], axis=0)
        if mode in ("full", "no_select"):
            arr = _bitonic_phases(arr, Ypad, P2 // 2)
        elif mode in ("golf", "golf_full"):
            arr = _merge_neg(arr, Ypad, P2 // 2)
        arr_ref[...] = arr
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
        wsel = min(_WSEL, P2)
        if mode in ("full", "no_merge", "golf_full"):
            rows = []
            for j in range(nq):
                start = (jnp.floor((nmin * qvals[j] + coffs[j]) - 1.0)
                         .astype(jnp.int32) - 8)
                start = pl.multiple_of(jnp.clip(start, 0, P2 - wsel) & ~7, 8)
                seg = arr_ref[pl.ds(start, wsel)]
                seg_iota = (jax.lax.broadcasted_iota(jnp.int32, (wsel, BC), 0)
                            + start)
                rows.append(select(seg, seg_iota, j))
            res = jnp.stack(rows, axis=0)
        else:
            res = jnp.broadcast_to(arr[0:nq], (nq, BC))
        out_ref[g] = res
        return carry

    if mode == "dma_only":
        out_ref[...] = jnp.zeros((DB, nq, BC), jnp.float32)
    else:
        jax.lax.fori_loop(0, DB, g_body, 0)


@functools.partial(jax.jit, static_argnames=("q_tuple", "window", "nq", "db",
                                             "mode"))
def _call(xgp, *, q_tuple, window, nq, db, mode):
    ngDB_2h, Ypad, Cp = xgp.shape
    half = window // 2
    S = db + 2 * half
    ngrid = (ngDB_2h - 2 * half) // db
    nc = Cp // _LANES
    P2 = _pow2(window * Ypad)
    qvals = tuple(float(np.float32(v)) for v in q_tuple)
    coffs = tuple(float(np.float32(np.float32(v) * np.float32(-1.0))
                        + np.float32(1.0)) for v in qvals)
    kernel = functools.partial(
        _kernel, S=S, DB=db, W=window, Ypad=Ypad, P2=P2, nq=nq, BC=_LANES,
        qvals=qvals, coffs=coffs, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=(nc, ngrid),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((db, nq, _LANES), lambda ci, gi: (gi, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((ngrid * db, nq, Cp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, Ypad, _LANES), jnp.float32),
                        pltpu.VMEM((S, 1, _LANES), jnp.float32),
                        pltpu.VMEM((P2, _LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(xgp)


def main():
    C = 4096
    n_doy, Y, W = 365, 30, 31
    Ypad, db = 32, 64
    half = W // 2
    ngrid = -(-n_doy // db)
    rng = np.random.default_rng(0)
    xg = (rng.normal(285, 5, (n_doy, Ypad, C))).astype(np.float32)
    head, tail = xg[n_doy - half:], xg[:half]
    extra = ngrid * db - n_doy
    parts = [head, xg, tail,
             np.full((extra, Ypad, C), BIG, np.float32)]
    xgp = jnp.asarray(np.concatenate(parts, axis=0))
    q = tuple(np.linspace(0.01, 0.99, 50))

    def med(mode, reps=5):
        f = lambda: _call(xgp, q_tuple=q, window=W, nq=50, db=db, mode=mode)
        r = f(); float(jnp.ravel(r)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); r = f(); float(jnp.ravel(r)[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    for mode in ("no_select", "golf", "full", "golf_full"):
        try:
            t = med(mode)
            print(f"{mode:10s}: {t*1e3:8.1f} ms")
        except Exception as e:
            print(f"{mode:10s}: ERROR {str(e)[:120]}")


if __name__ == "__main__":
    main()
