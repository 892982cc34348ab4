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

__all__ = ["sorted_rank_tables", "replaced_year_quantile"]


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
