"""Benchmark: north-star metric from BASELINE.json — grid-cell-days/sec/chip on
tx90p with the full Zhang-2005 iterated bootstrap (config #3; QDM train/adjust
joins the composite once sdba lands).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Algorithm (TPU-native, exact to reference semantics within float32):
  * doy-window samples gathered once into a (doy, year, window, cell) tensor
  * samples sorted ONCE; each of the Y×(Y-1) year-replacement quantiles is
    recovered by order-statistic rank arithmetic (ops/bootstrap.py) instead of
    the reference's per-pair full percentile recompute
  * per pair, exceedances are counted only over the replaced year's days

vs_baseline: ratio to an estimated reference throughput. The reference (xclim
on CPU/dask) cannot run in this image (no xarray); the baseline is estimated by
timing a faithful single-core numpy implementation of the reference algorithm
(full per-pair nanquantile recompute, as xclim does) and scaling by 64 cores at
70% parallel efficiency — a generous stand-in for "dask on a 64-core node"
(BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _tables(nyears: int):
    from xclim_tpu.core.calendar import date_range, percentile_doy_table

    time_idx = date_range("1981-01-01", end=f"{1980 + nyears}-12-31", freq="D",
                          calendar="noleap")
    table, doys = percentile_doy_table(time_idx, window=5)
    year_of_step = (time_idx.year - time_idx.year[0]).astype(np.int32)
    doy_idx = (time_idx.doy - 1).astype(np.int32)
    return time_idx, table, year_of_step, doy_idx


def make_tpu_bench(nyears=30, cells=(64, 64), window=5):
    import jax
    import jax.numpy as jnp

    from xclim_tpu.ops.bootstrap import replaced_year_quantile, sorted_rank_tables

    time_idx, table, year_of_step, doy_idx = _tables(nyears)
    T = len(time_idx)
    n_doy = table.shape[0]  # 365 for noleap
    C = cells[0] * cells[1]

    # day_table[y, d] = time index of day d of year y (noleap → dense)
    day_table = np.full((nyears, n_doy), -1, dtype=np.int32)
    day_table[year_of_step, doy_idx] = np.arange(T, dtype=np.int32)
    assert (day_table >= 0).all()

    tbl = jnp.asarray(table.reshape(n_doy, nyears, window))
    dayt = jnp.asarray(day_table)
    others = np.array([[o for o in range(nyears) if o != b] for b in range(nyears)],
                      dtype=np.int32)  # (Y, Y-1)
    binfo = jnp.concatenate([np.arange(nyears, dtype=np.int32)[:, None], others], axis=1)

    @jax.jit
    def prepare(xx):
        """Gather the sample tensor and sort/rank tables once."""
        D = xx[jnp.maximum(tbl, 0)]
        D = jnp.where((tbl >= 0)[..., None], D, jnp.nan)  # (n_doy, Y, w, C)
        flat = D.reshape(n_doy, nyears * window, xx.shape[1])
        S, R, nv = sorted_rank_tables(flat)
        Xy = xx[dayt]  # (Y, n_doy, C)
        return D, S, R, nv, Xy

    @jax.jit
    def year_fn(D, S, R, nv, Xy, brow):
        """Bootstrapped count for one replaced year (vmapped over the Y-1
        replacement candidates). Kept as a small program — one compile,
        Y dispatches — to stay friendly to the experimental TPU backend."""
        b = brow[0]
        os_ = brow[1:]
        A_b = jnp.take(D, b, axis=1)
        xb = jnp.take(Xy, b, axis=0)  # (n_doy, C)

        def one_o(o):
            A_o = jnp.take(D, o, axis=1)
            per = replaced_year_quantile(S, R, nv, A_b, A_o, 0.9)
            return (xb > per).astype(jnp.float32).sum(axis=0)  # (C,)

        return jax.vmap(one_o)(os_).mean(axis=0)

    def run(x):
        D, S, R, nv, Xy = prepare(x)
        outs = [year_fn(D, S, R, nv, Xy, binfo[b]) for b in range(nyears)]
        return jnp.stack(outs, axis=0)

    @jax.jit
    def gen(key):
        return jax.random.normal(key, (T, C)) * 5.0 + 295.0

    return run, gen, T * C


def numpy_reference(nyears=30, cells=(2, 2), window=5, sample_years=2):
    """Single-core numpy implementation of the reference algorithm (full
    per-pair percentile recompute, xclim:core/bootstrapping.py:81-212) at the
    real 30-year configuration, sampling `sample_years` of the outer loop and
    scaling the throughput accordingly."""
    time_idx, table, year_of_step, doy_idx = _tables(nyears)
    T = len(time_idx)
    n_doy = table.shape[0]
    C = cells[0] * cells[1]
    rng = np.random.default_rng(0)
    x = rng.normal(295.0, 5.0, (T, C)).astype(np.float32)

    tbl = table.reshape(n_doy, nyears, window)
    D = np.where((tbl >= 0)[..., None], x[np.maximum(tbl, 0)], np.nan)

    t0 = time.perf_counter()
    out = np.zeros((nyears, C), np.float32)
    for b in range(sample_years):
        for o in range(nyears):
            if o == b:
                continue
            Dmod = D.copy()
            Dmod[:, b] = D[:, o]
            flat = Dmod.reshape(n_doy, nyears * window, C)
            per = np.nanquantile(flat, 0.9, axis=1, method="median_unbiased")
            thresh = per[doy_idx]
            over = (x > thresh) & (year_of_step == b)[:, None]
            out[b] += over.sum(axis=0)
    dt = time.perf_counter() - t0
    # `sample_years`/`nyears` of the full job was done
    return (T * C * sample_years / nyears) / dt


def _measure(cells):
    import jax

    jitted, gen, cell_days = make_tpu_bench(cells=cells)
    key = jax.random.PRNGKey(0)
    x = gen(key)
    x.block_until_ready()
    out = jitted(x)
    out.block_until_ready()  # compile + first run
    times = []
    for _ in range(3):
        key, sub = jax.random.split(key)
        x = gen(sub)
        x.block_until_ready()
        t0 = time.perf_counter()
        r = jitted(x)
        float(np.asarray(r[0, 0]))  # force completion with a real fetch
        times.append(time.perf_counter() - t0)
    return cell_days / min(times)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    value = None
    used = None
    for cells in [(64, 64), (32, 32), (16, 16)]:
        try:
            value = _measure(cells)
            used = cells
            break
        except Exception:
            continue
    if value is None:
        print(json.dumps({"metric": "tx90p full 30yr bootstrap",
                          "value": 0.0, "unit": "cell-days/s",
                          "vs_baseline": 0.0, "error": "device unavailable"}))
        return

    ref_single = numpy_reference()
    baseline = ref_single * 64 * 0.7  # estimated 64-core dask node
    print(json.dumps({
        "metric": f"grid-cell-days/sec/chip, tx90p full 30yr bootstrap "
                  f"({used[0] * used[1]} cells)",
        "value": round(value, 1),
        "unit": "cell-days/s",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()
