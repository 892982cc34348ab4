"""Rank-update bootstrap quantile kernel.

The Zhang-2005 bootstrap recomputes a doy-window quantile with one in-base
year's samples replaced by another's, for every ordered year pair — the
reference re-sorts the full sample set per pair (via percentile_doy,
xclim:core/bootstrapping.py:195-201). Here the samples are sorted ONCE; each
pair's quantile is recovered from order-statistic rank arithmetic:

    #(M ≤ v) = #(S ≤ v) − #(A_b ≤ v) + #(A_o ≤ v)

where M is the modified multiset, A_b the removed year's window samples and
A_o the added year's. The k-th order statistic of M is always within ±w ranks
of k in S or an element of A_o, so a 12-candidate window + the w added values
suffice. Cost per pair drops from O(N log²N) bitonic sort to O(w log N)
counting — the main single-chip speedup over the reference's algorithm.

NaNs (missing samples at series edges / absent leap days) sort to the end and
never satisfy ≤ comparisons, so they are excluded from all counts naturally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sorted_rank_tables", "replaced_year_quantile",
           "topk_rank_tables", "topk_replaced_year_quantile", "topk_capacity"]


def _count_le_sorted(S, v):
    """#(S ≤ v) per lane via branchless binary search.

    S: (..., N, C) sorted along axis -2 (NaNs last). v: (..., K, C).
    Returns int32 (..., K, C).
    """
    import math

    N = S.shape[-2]
    lo = jnp.zeros(v.shape, dtype=jnp.int32)
    hi = jnp.full(v.shape, N, dtype=jnp.int32)
    steps = int(math.ceil(math.log2(N + 1)))
    for _ in range(steps):
        mid = (lo + hi) // 2
        Sv = jnp.take_along_axis(S, jnp.clip(mid, 0, N - 1), axis=-2)
        go_right = Sv <= v  # NaN comparisons are False → NaNs count as greater
        lo = jnp.where(go_right, jnp.minimum(mid + 1, N), lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def sorted_rank_tables(flat):
    """Sort the sample axis once and precompute tie-aware ranks.

    flat: (..., N, C) raw samples (NaN = missing).
    Returns (S, R, nvalid): sorted values, R[j] = #(S ≤ S[j]) (int32, handles
    ties), and per-lane valid counts (..., C).
    """
    S = jnp.sort(flat, axis=-2)
    nvalid = jnp.sum(~jnp.isnan(flat), axis=-2).astype(jnp.int32)
    R = _count_le_sorted(S, S)
    return S, R, nvalid


def _count_le_small(A, v):
    """#(A ≤ v): A (..., w, C), v (..., K, C) → (..., K, C)."""
    return (A[..., None, :, :] <= v[..., :, None, :]).sum(axis=-2).astype(jnp.int32)


def replaced_year_quantile(S, R, nvalid, A_b, A_o, q: float,
                           alpha: float = 1 / 3, beta: float = 1 / 3):
    """Quantile of the multiset S ∖ A_b ∪ A_o without re-sorting.

    S, R: (..., N, C) from sorted_rank_tables; nvalid: (..., C);
    A_b, A_o: (..., w, C) removed/added samples (must be drawn from /
    consistent with S's multiset for A_b).

    Returns (..., C) with the same Hyndman-Fan semantics as
    :func:`xclim_tpu.ops.quantile.nan_quantile` (single-valid → value,
    none-valid → NaN, above-range → max).
    """
    N = S.shape[-2]
    w = A_b.shape[-2]
    vb = jnp.sum(~jnp.isnan(A_b), axis=-2).astype(jnp.int32)
    vo = jnp.sum(~jnp.isnan(A_o), axis=-2).astype(jnp.int32)
    nmod = nvalid - vb + vo  # (..., C)

    n = nmod.astype(jnp.float32)
    h = n * q + (q * (1 - alpha - beta) + alpha) - 1.0
    upper = jnp.maximum(n - 1.0, 0.0)
    h = jnp.clip(h, 0.0, upper)
    k0 = jnp.floor(h).astype(jnp.int32)
    gamma = h - k0.astype(jnp.float32)
    k1 = jnp.minimum(k0 + 1, jnp.maximum(nmod - 1, 0))

    # --- candidates: ranks k0-w .. k0+w+1 of S, plus the added samples ---
    offs = jnp.arange(-w, w + 2, dtype=jnp.int32)  # 2w+2 window
    idx = jnp.clip(k0[..., None, :] + offs[..., :, None], 0, N - 1)  # (...,2w+2,C)
    Sv = jnp.take_along_axis(S, idx, axis=-2)
    Rv = jnp.take_along_axis(R, idx, axis=-2)
    cnt_S_cand = Rv
    # counts for added-sample candidates (exact binary search)
    cnt_S_added = _count_le_sorted(S, A_o)

    cand_vals = jnp.concatenate([Sv, A_o], axis=-2)  # (..., K, C)
    cnt_S = jnp.concatenate([cnt_S_cand, cnt_S_added], axis=-2)
    cnt_M = cnt_S - _count_le_small(A_b, cand_vals) + _count_le_small(A_o, cand_vals)

    def order_stat(k):
        ok = cnt_M >= (k[..., None, :] + 1)
        vals = jnp.where(ok & ~jnp.isnan(cand_vals), cand_vals, jnp.inf)
        return vals.min(axis=-2)

    v0 = order_stat(k0)
    v1 = order_stat(k1)
    out = v0 + gamma * (v1 - v0)
    out = jnp.where(nmod <= 0, jnp.nan, out)
    out = jnp.where(jnp.isinf(out), jnp.nan, out)
    return out


def topk_rank_tables(flat, year_id, k: int):
    """Precompute top-k/bottom-k candidate tables for the year-replacement
    bootstrap (lanes-last layout).

    flat: (..., N, C) samples with NaN = missing; year_id: (N,) int year of
    each sample. Returns (topv, topyear, botv, botyear, nvalid) where
    topv/botv are the k largest/smallest values per lane in descending/
    ascending order, shaped (..., C, k), and topyear/botyear the year tag of
    each. NaNs are excluded (they count in neither side).
    """
    neg = jnp.moveaxis(jnp.where(jnp.isnan(flat), -jnp.inf, flat), -2, -1)
    topv, topi = jax.lax.top_k(neg, k)
    pos = jnp.moveaxis(jnp.where(jnp.isnan(flat), jnp.inf, flat), -2, -1)
    botv, boti = jax.lax.top_k(-pos, k)
    botv = -botv
    yid = jnp.asarray(year_id)
    nvalid = jnp.sum(~jnp.isnan(flat), axis=-2).astype(jnp.int32)
    return topv, yid[topi], botv, yid[boti], nvalid


def topk_replaced_year_quantile(topv, topyear, botv, botyear, nvalid,
                                A_b, A_o, b, q: float,
                                alpha: float = 1 / 3, beta: float = 1 / 3):
    """Quantile of the year-b-replaced multiset from top-k candidate tables.

    The needed order statistics of the modified multiset sit within
    ``(1-q)·n + 2`` ranks of the extreme for q ≥ 0.5 (resp. ``q·n + 2`` for
    q < 0.5); since replacing one year removes at most `w` samples, the
    modified top-J is always contained in (base top-k minus year b) ∪ A_o
    when ``k ≥ J + w``. This turns the reference's per-pair full re-sort
    (xclim:core/bootstrapping.py:195-201) into one k-of-(k+w) top_k —
    top_k is a fused, TPU-friendly primitive, unlike rank gathers.

    topv/topyear/botv/botyear/nvalid from :func:`topk_rank_tables`;
    A_b, A_o: (..., C, w) removed/added samples (lanes-last); b: removed
    year index (traced scalar ok). Hyndman-Fan alpha/beta semantics matching
    :func:`xclim_tpu.ops.quantile.nan_quantile`.
    """
    k = topv.shape[-1]
    w = A_o.shape[-1]
    jtop = k - w
    vb = jnp.sum(~jnp.isnan(A_b), axis=-1).astype(jnp.int32)
    vo = jnp.sum(~jnp.isnan(A_o), axis=-1).astype(jnp.int32)
    nmod_i = nvalid - vb + vo
    nmod = nmod_i.astype(jnp.float32)

    h = nmod * q + (q * (1 - alpha - beta) + alpha) - 1.0
    h = jnp.clip(h, 0.0, jnp.maximum(nmod - 1.0, 0.0))
    k0 = jnp.floor(h).astype(jnp.int32)
    gam = h - k0.astype(jnp.float32)
    k1 = jnp.minimum(k0 + 1, jnp.maximum(nmod_i - 1, 0))

    if q >= 0.5:
        cand = jnp.where(topyear == b, -jnp.inf, topv)
        ao = jnp.where(jnp.isnan(A_o), -jnp.inf, A_o)
        tops = jax.lax.top_k(jnp.concatenate([cand, ao], axis=-1), jtop)[0]
        j0 = jnp.clip(nmod_i - 1 - k0, 0, jtop - 1)
        j1 = jnp.clip(nmod_i - 1 - k1, 0, jtop - 1)
    else:
        cand = jnp.where(botyear == b, jnp.inf, botv)
        ao = jnp.where(jnp.isnan(A_o), jnp.inf, A_o)
        tops = -jax.lax.top_k(-jnp.concatenate([cand, ao], axis=-1), jtop)[0]
        j0 = jnp.clip(k0, 0, jtop - 1)
        j1 = jnp.clip(k1, 0, jtop - 1)
    v0 = jnp.take_along_axis(tops, j0[..., None], axis=-1)[..., 0]
    v1 = jnp.take_along_axis(tops, j1[..., None], axis=-1)[..., 0]
    out = v0 + gam * (v1 - v0)
    out = jnp.where(nmod_i <= 0, jnp.nan, out)
    return jnp.where(jnp.isinf(out), jnp.nan, out)


def merge_rank_replaced_year_quantile(topv, topyear, botv, botyear, nvalid,
                                      A_b, A_o, b, q: float,
                                      alpha: float = 1 / 3, beta: float = 1 / 3):
    """Quantile of the year-b-replaced multiset by rank merging — no per-pair
    sort at all (the fast path behind :func:`topk_replaced_year_quantile`).

    The base candidate table ``topv`` is already sorted (descending). The
    j-th largest of (base ∖ year b) ∪ A_o is found by rank arithmetic:
      * a kept table entry i has merged rank
        ``i − #(year-b entries before i) + #(A_o > v_i)``;
      * an added sample t (sorted descending) has merged rank
        ``t + #(kept table entries > a_t)``.
    Both counts come from one small (k × w) comparison matrix — pure VPU
    elementwise work instead of the O(k log²k) bitonic sort `top_k` lowers
    to on TPU (reference equivalent: the full re-sort per pair in
    xclim:core/bootstrapping.py:195-201).
    """
    k = topv.shape[-1]
    w = A_o.shape[-1]
    jtop = k - w
    vb = jnp.sum(~jnp.isnan(A_b), axis=-1).astype(jnp.int32)
    vo = jnp.sum(~jnp.isnan(A_o), axis=-1).astype(jnp.int32)
    nmod_i = nvalid - vb + vo
    nmod = nmod_i.astype(jnp.float32)

    h = nmod * q + (q * (1 - alpha - beta) + alpha) - 1.0
    h = jnp.clip(h, 0.0, jnp.maximum(nmod - 1.0, 0.0))
    k0 = jnp.floor(h).astype(jnp.int32)
    gam = h - k0.astype(jnp.float32)
    k1 = jnp.minimum(k0 + 1, jnp.maximum(nmod_i - 1, 0))

    if q >= 0.5:
        S, Sy = topv, topyear
        a = jnp.where(jnp.isnan(A_o), -jnp.inf, A_o)
        j0 = nmod_i - 1 - k0
        j1 = nmod_i - 1 - k1
        big = -jnp.inf
        gt = lambda x, y: x > y
    else:
        S, Sy = botv, botyear
        a = jnp.where(jnp.isnan(A_o), jnp.inf, A_o)
        j0, j1 = k0, k1
        big = jnp.inf
        gt = lambda x, y: x < y  # "greater" = closer to the selected extreme

    isb = (Sy == b)
    # exclusive prefix count of removed entries before each table slot
    cumb = jnp.cumsum(isb.astype(jnp.int32), axis=-1) - isb.astype(jnp.int32)
    # sort the w added samples toward the extreme with a tiny sorting network
    def cswap(x, i, jj):
        xi, xj = x[..., i], x[..., jj]
        lo_ = jnp.where(gt(xi, xj), xi, xj)
        hi_ = jnp.where(gt(xi, xj), xj, xi)
        return x.at[..., i].set(lo_).at[..., jj].set(hi_)

    net5 = [(0, 1), (3, 4), (2, 4), (2, 3), (0, 3), (0, 2), (1, 4), (1, 3),
            (1, 2)]
    if w == 5:
        for i, jj in net5:
            a = cswap(a, i, jj)
    else:  # generic small-w fallback: full sort
        a = jnp.sort(a, axis=-1)
        if q >= 0.5:
            a = a[..., ::-1]

    # one (k, w) comparison matrix serves both rank corrections; ties order
    # kept-table entries before added samples (a strict total order, so every
    # merged rank is hit exactly once)
    SgeA = gt(S[..., :, None], a[..., None, :]) | (S[..., :, None] == a[..., None, :])
    cntA_gt_S = gt(a[..., None, :], S[..., :, None]).sum(axis=-1)  # #(A > S_i)
    cntS_ge_A = (SgeA & ~isb[..., :, None]
                 & ~jnp.isinf(S)[..., :, None]).sum(axis=-2)       # kept ≥ a_t

    rank_S = jnp.arange(k, dtype=jnp.int32) - cumb + cntA_gt_S
    rank_S = jnp.where(isb | jnp.isinf(S), jnp.iinfo(jnp.int32).max, rank_S)
    rank_A = jnp.arange(w, dtype=jnp.int32) + cntS_ge_A
    rank_A = jnp.where(jnp.isinf(a), jnp.iinfo(jnp.int32).max, rank_A)

    def select(j):
        jj = j[..., None]
        v = jnp.where(rank_S == jj, jnp.where(jnp.isinf(S), 0.0, S), 0.0
                      ).sum(axis=-1)
        hitS = (rank_S == jj).any(axis=-1)
        va = jnp.where(rank_A == jj, jnp.where(jnp.isinf(a), 0.0, a), 0.0
                       ).sum(axis=-1)
        hitA = (rank_A == jj).any(axis=-1)
        return jnp.where(hitS, v, va), hitS | hitA

    v0, ok0 = select(jnp.clip(j0, 0, None))
    v1, ok1 = select(jnp.clip(j1, 0, None))
    out = v0 + gam * (v1 - v0)
    out = jnp.where(nmod_i <= 0, jnp.nan, out)
    return jnp.where(ok0 & ok1, out, jnp.nan)


def topk_capacity(nmax: int, w: int, q: float) -> int:
    """Candidate-table size k guaranteeing exactness of
    :func:`topk_replaced_year_quantile` for samples of at most `nmax` valid
    values, `w`-sample replacements and quantile `q`."""
    import math

    tail = (1 - q) if q >= 0.5 else q
    j = int(math.ceil(tail * nmax)) + 2
    return j + w
