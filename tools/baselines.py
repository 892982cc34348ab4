"""Single-core numpy baselines for the five BASELINE.md configs.

Each function implements the REFERENCE algorithm semantics (xclim's xarray
formulation, not ours) in vectorized single-core numpy with a fixed seed, and
returns (cell_days_per_second, raw_seconds, fraction_of_problem_measured).
The estimated "64-core dask node" figure used for ``vs_baseline`` is
``cd_s * 64 * 0.7`` (parallel efficiency 0.7 — generous to the reference,
since dask adds scheduler overhead these pure-numpy kernels don't have).

Some baselines time a deterministic sample of the full problem (the fraction
is returned and recorded in BENCH_DETAIL.json) because a full single-core run
of e.g. the 30-year bootstrap takes minutes.
"""

from __future__ import annotations

import time

import numpy as np


def _median_time(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _hf_quantile(a, q, axis=0, alpha=1 / 3, beta=1 / 3):
    """The reference's sort-based NaN-aware Hyndman-Fan quantile
    (xclim:core/utils.py:494 _nan_quantile) in plain numpy — what xclim's
    calc_perc actually executes (np.nanquantile itself is pathologically
    slow and would inflate our ratio)."""
    a = np.moveaxis(a, axis, 0)
    n = a.shape[0]
    s = np.sort(a, axis=0)  # NaNs go last
    valid = (~np.isnan(a)).sum(axis=0)
    q = np.atleast_1d(q)
    out = np.empty((len(q),) + a.shape[1:], dtype=a.dtype)
    for i, qq in enumerate(q):
        virt = valid * qq + (alpha + qq * (1 - alpha - beta)) - 1
        virt = np.clip(virt, 0, np.maximum(valid - 1, 0))
        lo = np.floor(virt).astype(np.int64)
        hi = np.minimum(lo + 1, np.maximum(valid - 1, 0))
        g = (virt - lo).astype(a.dtype)
        vlo = np.take_along_axis(s, lo[None], axis=0)[0]
        vhi = np.take_along_axis(s, hi[None], axis=0)[0]
        res = vlo + g * (vhi - vlo)
        out[i] = np.where(valid > 0, res, np.nan)
    return out


def _noleap_monthday_bounds(nyears):
    """Flat step index of each month start over `nyears` noleap years."""
    mlen = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])
    starts = np.concatenate([[0], np.cumsum(np.tile(mlen, nyears))[:-1]])
    return starts


def _runlengths(b):
    """Current run length at each step of (Y, D, C) bool, resetting at
    year boundaries (the reference's resample-before-rl default) — the
    vectorized cumsum-reset of xclim run_length.py:154."""
    cs = np.cumsum(b, axis=1, dtype=np.int32)
    last_false = np.where(~b, cs, 0).astype(np.int32)
    np.maximum.accumulate(last_false, axis=1, out=last_false)
    return np.where(b, cs - last_false, 0)


def baseline_tg_mean(nyears=10, ny=64, nx=64, reps=3):
    rng = np.random.default_rng(0)
    T = 365 * nyears
    x = rng.normal(285, 5, (T, ny * nx)).astype(np.float32)
    starts = _noleap_monthday_bounds(nyears)

    def run():
        return np.add.reduceat(x, starts, axis=0) / np.diff(
            np.concatenate([starts, [T]]))[:, None]

    sec = _median_time(run, reps)
    return T * ny * nx / sec, sec, 1.0


def baseline_spells(nyears=10, ny=100, nx=100, reps=3):
    """tx_days_above + heat_wave_frequency (reference: threshold_count
    generic.py:329; windowed_run_events run_length.py:381)."""
    rng = np.random.default_rng(1)
    T = 365 * nyears
    C = ny * nx
    tx = rng.normal(290, 8, (T, C)).astype(np.float32)
    tn = rng.normal(280, 8, (T, C)).astype(np.float32)

    def run():
        # tx_days_above: comparison + annual sum
        over = tx > 298.15  # 25 degC
        np.add.reduceat(over, np.arange(0, T, 365), axis=0)
        # heat_wave_frequency: joint condition, runs >= 3 per year
        b = ((tn > 295.15) & (tx > 303.15)).reshape(nyears, 365, C)
        run_len = _runlengths(b)
        (run_len == 3).sum(axis=1)

    sec = _median_time(run, reps)
    return 2 * T * C / sec, sec, 1.0


def baseline_tx90p_bootstrap(nyears=30, cells=256, sample_years=2, reps=3,
                             sample_pairs=None):
    """Full Zhang-2005 bootstrap: per (in-base year b, other year o) pair,
    replace year b's doy-window samples by year o's and recompute the doy
    90th percentile (xclim:core/bootstrapping.py:81-212). Times
    `sample_years` of the outer loop (and optionally only the first
    `sample_pairs` replacements per year — for cheap matched-size live
    drift probes at ERA5-scale cell counts); fraction returned."""
    window = 5
    rng = np.random.default_rng(2)
    n_doy = 365
    T = n_doy * nyears
    x = rng.normal(295, 5, (T, cells)).astype(np.float32)
    doy_idx = np.tile(np.arange(n_doy), nyears)
    year_of_step = np.repeat(np.arange(nyears), n_doy)
    # (doy, year, window) gather table of the +-2 day window
    offs = np.arange(window) - window // 2
    tbl = (np.arange(n_doy)[:, None, None] + offs[None, None, :]) % n_doy \
        + (np.arange(nyears)[None, :, None]) * n_doy
    D = x[tbl]  # (n_doy, Y, w, C)

    def run():
        out = np.zeros((sample_years, cells), np.float32)
        for b in range(sample_years):
            done = 0
            for o in range(nyears):
                if o == b:
                    continue
                if sample_pairs is not None and done >= sample_pairs:
                    break
                done += 1
                Dmod = D.copy()
                Dmod[:, b] = D[:, o]
                flat = Dmod.reshape(n_doy, nyears * window, cells)
                per = _hf_quantile(flat, 0.9, axis=1)[0]
                thresh = per[doy_idx]
                over = (x > thresh) & (year_of_step == b)[:, None]
                out[b] += over.sum(axis=0)
        return out

    sec = _median_time(run, reps)
    pairs_per_year = (nyears - 1 if sample_pairs is None
                      else min(sample_pairs, nyears - 1))
    frac = sample_years * pairs_per_year / (nyears * (nyears - 1))
    return (T * cells * frac) / sec, sec, frac


def baseline_qdm(nyears=30, ny=32, nx=32, nq=50, window=31, sample_doys=36,
                 reps=3):
    """QDM train+adjust, dayofyear grouping with a 31-day window
    (xsdba.QuantileDeltaMapping): per group, ref & hist quantiles → af;
    adjust = af at sim's empirical rank. Times `sample_doys` of the 365
    groups; fraction returned."""
    rng = np.random.default_rng(3)
    n_doy = 365
    T = n_doy * nyears
    C = ny * nx
    ref = rng.normal(285, 5, (T, C)).astype(np.float32)
    hist = rng.normal(287, 6, (T, C)).astype(np.float32)
    q = (np.arange(nq) + 0.5) / nq
    offs = np.arange(window) - window // 2
    doys = np.linspace(0, n_doy - 1, sample_doys).astype(int)
    # gather table: for doy d, all steps within +-15 days across years
    step_of = (np.arange(n_doy)[:, None] + np.arange(nyears)[None, :] * n_doy)

    def run():
        for d in doys:
            sel = ((d + offs) % n_doy)[:, None] + \
                np.arange(nyears)[None, :] * n_doy  # (w, Y)
            g_ref = ref[sel.ravel()]                # (w*Y, C)
            g_hist = hist[sel.ravel()]
            rq = _hf_quantile(g_ref, q, axis=0)     # (nq, C)
            hq = _hf_quantile(g_hist, q, axis=0)
            af = rq - hq
            # adjust the group's own days at their empirical rank
            days = step_of[d]                       # (Y,)
            sim = hist[days]                        # (Y, C)
            rank = np.argsort(np.argsort(sim, axis=0), axis=0) / (len(days) - 1)
            afv = np.empty_like(sim)
            for c in range(C):                      # per-cell 1-D interp
                afv[:, c] = np.interp(rank[:, c], q, af[:, c])
            sim + afv
        return None

    sec = _median_time(run, reps)
    frac = sample_doys / n_doy
    return (T * C * frac) / sec, sec, frac


def baseline_ensembles(nmembers=30, ny=64, nx=64, T=365, reps=3):
    """ensemble_percentiles (nan-quantile over realization,
    xclim:ensembles/_base.py:214) + robustness ttest fractions
    (_robustness.py:519)."""
    rng = np.random.default_rng(4)
    ens = rng.normal(285, 5, (nmembers, T, ny * nx)).astype(np.float32)

    def run():
        _hf_quantile(ens, [0.1, 0.5, 0.9], axis=0)
        fut = ens[:, 183:, :]
        hist = ens[:, :182, :]
        # one-sample ttest of (fut mean - hist mean) per member/cell
        d = fut.mean(axis=1) - hist.mean(axis=1)
        se = fut.std(axis=1, ddof=1) / np.sqrt(fut.shape[1])
        t = d / se
        (np.abs(t) > 1.97).mean(axis=0)

    sec = _median_time(run, reps)
    return nmembers * T * ny * nx / sec, sec, 1.0


def baseline_chain(nyears=10, ny=100, nx=100, reps=3):
    """A realistic 10-indicator CLI chain on one (tas, tasmax, tasmin, pr)
    dataset — the workload the --fused CLI path compiles into ONE program.
    numpy implements each indicator exactly as the reference computes it
    (threshold counts generic.py:329, degree-days generic.py:936, spells
    run_length.py:381, reduceat resampling)."""
    rng = np.random.default_rng(4)
    T = 365 * nyears
    C = ny * nx
    tas = rng.normal(285, 6, (T, C)).astype(np.float32)
    tx = tas + rng.uniform(2, 8, (T, C)).astype(np.float32)
    tn = tas - rng.uniform(2, 8, (T, C)).astype(np.float32)
    pr = (rng.gamma(0.6, 4.0, (T, C)) / 86400.0).astype(np.float32)
    ystarts = np.arange(0, T, 365)
    mstarts = _noleap_monthday_bounds(nyears)
    mlens = np.diff(np.concatenate([mstarts, [T]]))[:, None]

    def run():
        np.add.reduceat(tas, mstarts, axis=0) / mlens          # tg_mean MS
        np.add.reduceat(tx > 298.15, ystarts, axis=0)          # tx_days_above
        np.add.reduceat(tn < 273.15, ystarts, axis=0)          # frost_days
        np.add.reduceat(tx < 273.15, ystarts, axis=0)          # ice_days
        np.add.reduceat(np.clip(tas - 277.15, 0, None), ystarts, axis=0)  # gdd
        np.add.reduceat(np.clip(290.15 - tas, 0, None), ystarts, axis=0)  # hdd
        np.add.reduceat(np.clip(tas - 291.15, 0, None), ystarts, axis=0)  # cdd
        b = (tx > 298.15).reshape(nyears, 365, C)              # heat_wave_index
        rl = _runlengths(b)
        np.where(rl >= 5, 1, 0).sum(axis=1)
        dry = (pr * 86400 < 1.0).reshape(nyears, 365, C)       # max consec dry
        _runlengths(dry).max(axis=1)
        np.add.reduceat(pr, ystarts, axis=0) * 86400           # prcptot

    sec = _median_time(run, reps)
    return 10 * T * C / sec, sec, 1.0


ALL = {
    "tg_mean": baseline_tg_mean,
    "spells": baseline_spells,
    "tx90p_bootstrap": baseline_tx90p_bootstrap,
    "qdm": baseline_qdm,
    "ensembles": baseline_ensembles,
    "chain": baseline_chain,
}


if __name__ == "__main__":
    for name, fn in ALL.items():
        cd, sec, frac = fn()
        print(f"{name}: {cd:,.0f} cell-days/s 1-core "
              f"({sec:.2f}s, {frac:.0%} of problem) "
              f"-> est 64-core: {cd * 64 * 0.7:,.0f}")
