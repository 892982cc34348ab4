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


def _ce_slice(x, k, p):
    """Compare-exchange stage k of phase p via STATIC slices (no rolls).

    Pairs (o, o+k) live in disjoint k-row blocks; the sort direction of each
    2k pair-block is static ((offset & 2p) == 0), so desc blocks just write
    max/min in swapped order. Only valid for k >= 8 (tile-aligned slices)."""
    nb = x.shape[0] // (2 * k)
    pieces = []
    for b in range(nb):
        o = b * 2 * k
        a = jax.lax.slice_in_dim(x, o, o + k, axis=0)
        c = jax.lax.slice_in_dim(x, o + k, o + 2 * k, axis=0)
        mn = jnp.minimum(a, c)
        mx = jnp.maximum(a, c)
        pieces += [mn, mx] if (o & (2 * p)) == 0 else [mx, mn]
    return jnp.concatenate(pieces, axis=0)


def _phases_hybrid(x, p_start, p_end, kmin):
    """Merge phases: slice-CE for k >= kmin, roll-CE below."""
    from xclim_tpu.ops.pallas.winquantile import _ce

    ii = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    p = p_start
    while p <= p_end:
        asc = (ii & (2 * p)) == 0
        k = p
        while k >= 1:
            if k >= kmin:
                x = _ce_slice(x, k, p)
            else:
                x = _ce(x, k, asc, 0)
            k //= 2
        p *= 2
    return x


def _super_stage(x, ks, p, k3):
    """Fused butterfly stages ks (descending, all >= k3, multiples of k3) of
    phase p, one VMEM pass: block values stay in registers between stages."""
    nb = x.shape[0] // k3
    blocks = [jax.lax.slice_in_dim(x, b * k3, (b + 1) * k3, axis=0)
              for b in range(nb)]
    for k in ks:
        m = k // k3
        nxt = []
        for b in range(nb):
            o = b * k3
            asc = (o & (2 * p)) == 0
            low = (b & m) == 0
            take_min = (low == asc)
            nxt.append((jnp.minimum if take_min else jnp.maximum)(
                blocks[b], blocks[b ^ m]))
        blocks = nxt
    return jnp.concatenate(blocks, axis=0)


def _phases_fused(x, p_start, p_end, k3=8, fuse=3):
    """Merge phases with k>=k3 stages grouped `fuse` per pass; k<k3 via
    roll-CE (nested, left to the compiler)."""
    from xclim_tpu.ops.pallas.winquantile import _ce

    ii = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    p = p_start
    while p <= p_end:
        ks = []
        k = p
        while k >= k3:
            ks.append(k)
            k //= 2
        for i in range(0, len(ks), fuse):
            x = _super_stage(x, ks[i:i + fuse], p, k3)
        asc = (ii & (2 * p)) == 0
        while k >= 1:
            x = _ce(x, k, asc, 0)
            k //= 2
        p *= 2
    return x


def _kernel(x_hbm, out_ref, slab, cnt_ref, arr_ref, sem, *, S, DB, W, Ypad,
            P2, nq, BC, qvals, coffs, mode):
    ci = pl.program_id(0)
    gi = pl.program_id(1)
    cp = pltpu.make_async_copy(x_hbm.at[ci, pl.ds(gi * DB, S)], slab, sem)
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
        elif mode.startswith("slice"):
            arr = _phases_hybrid(arr, Ypad, P2 // 2, kmin=int(mode[5:]))
        elif mode.startswith("fuse"):
            k3, fuse = (int(v) for v in mode[4:].split("_"))
            arr = _phases_fused(arr, Ypad, P2 // 2, k3=k3, fuse=fuse)
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
        out_ref[0, g] = res
        return carry

    if mode == "dma_only":
        out_ref[...] = jnp.zeros((1, DB, nq, BC), jnp.float32)
    elif mode.startswith("unroll"):
        U = int(mode[6:])

        def g_multi(gu, carry):
            arrs = []
            nvs = []
            for u in range(U):
                g = gu * U + u
                win = slab[pl.ds(g, W)]
                nvs.append(jnp.sum(cnt_ref[pl.ds(g, W)], axis=(0, 1)))
                arr = win.reshape(W * Ypad, BC)
                if npad:
                    arr = jnp.concatenate(
                        [arr, jnp.full((npad, BC), BIG, dtype=arr.dtype)],
                        axis=0)
                arrs.append(arr)
            # interleave the merge stages of U independent groups
            ii = jax.lax.broadcasted_iota(jnp.int32, arrs[0].shape, 0)
            from xclim_tpu.ops.pallas.winquantile import _ce
            p = Ypad
            while p <= P2 // 2:
                asc = (ii & (2 * p)) == 0
                k = p
                while k >= 1:
                    arrs = [_ce(a, k, asc, 0) for a in arrs]
                    k //= 2
                p *= 2
            for u in range(U):
                out_ref[0, gu * U + u] = jnp.broadcast_to(
                    arrs[u][0:nq] + nvs[u][None, :] * 0.0, (nq, BC))
            return carry

        jax.lax.fori_loop(0, DB // U, g_multi, 0)
    else:
        jax.lax.fori_loop(0, DB, g_body, 0)


@functools.partial(jax.jit, static_argnames=("q_tuple", "window", "nq", "db",
                                             "bc", "mode"))
def _call(xb, *, q_tuple, window, nq, db, bc, mode):
    nc, G2, Ypad, BC = xb.shape
    half = window // 2
    S = db + 2 * half
    ngrid = (G2 - 2 * half) // db
    P2 = _pow2(window * Ypad)
    qvals = tuple(float(np.float32(v)) for v in q_tuple)
    coffs = tuple(float(np.float32(np.float32(v) * np.float32(-1.0))
                        + np.float32(1.0)) for v in qvals)
    kernel = functools.partial(
        _kernel, S=S, DB=db, W=window, Ypad=Ypad, P2=P2, nq=nq, BC=bc,
        qvals=qvals, coffs=coffs, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=(nc, ngrid),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, db, nq, bc), lambda ci, gi: (ci, gi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nc, ngrid * db, nq, bc), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, Ypad, bc), jnp.float32),
                        pltpu.VMEM((S, 1, bc), jnp.float32),
                        pltpu.VMEM((P2, bc), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(xb)


def main():
    C = 4096
    n_doy, Y, W = 365, 30, 31
    Ypad = 32
    half = W // 2
    rng = np.random.default_rng(0)
    xg = (rng.normal(285, 5, (n_doy, Ypad, C))).astype(np.float32)
    q = tuple(np.linspace(0.01, 0.99, 50))

    def med(mode, db, bc, reps=5):
        ngrid = -(-n_doy // db)
        G2 = ngrid * db + 2 * half
        nc = C // bc
        head, tail = xg[n_doy - half:], xg[:half]
        parts = [head, xg, tail,
                 np.full((ngrid * db - n_doy, Ypad, C), BIG, np.float32)]
        xgp = np.concatenate(parts, axis=0)
        xb = jnp.asarray(np.moveaxis(
            xgp.reshape(G2, Ypad, nc, bc), 2, 0).copy())
        f = lambda: _call(xb, q_tuple=q, window=W, nq=50, db=db, bc=bc,
                          mode=mode)
        r = f(); float(jnp.ravel(r)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter(); r = f(); float(jnp.ravel(r)[0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    import itertools
    cases = [("no_select", 64, 128), ("unroll2", 64, 128),
             ("unroll4", 64, 128), ("unroll8", 64, 128)]
    for mode, db, bc in cases:
        try:
            t = med(mode, db, bc)
            print(f"{mode:10s} db={db:3d} bc={bc:3d}: {t*1e3:8.1f} ms")
        except Exception as e:
            print(f"{mode:10s} db={db:3d} bc={bc:3d}: ERROR {str(e)[:100]}")


if __name__ == "__main__":
    main()
