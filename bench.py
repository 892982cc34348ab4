"""Benchmark: north-star metric from BASELINE.json — grid-cell-days/sec/chip on
tx90p with the full Zhang-2005 iterated bootstrap (config #3).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Algorithm (TPU-native, exact to reference semantics within float32):
  * doy-window samples gathered once into a (doy, year, window, cell) tensor
  * merge-rank candidate kernel (ops/bootstrap.py
    merge_rank_replaced_year_quantile): the base sample set's top-22 values
    are extracted ONCE per cell with year tags; each of the Y×(Y-1) year
    replacements recovers the exact Hyndman-Fan order statistics by rank
    arithmetic over (table ∖ removed year) ∪ added window — one small
    comparison matrix, no per-pair sort at all. The reference re-sorts the
    150-sample set per pair through percentile_doy
    (xclim:core/bootstrapping.py:195-201); 'topk' (per-pair top_k) and
    'sort' (full re-sort) remain as fallbacks, 13× and ~40× slower on chip.
  * per pair, exceedances are counted only over the replaced year's days
  * pairs run in fixed-size lax.scan chunks (one compiled program, few
    dispatches) to stay inside the experimental TPU backend's program-size
    limits

Methodology (pinned in round 2 per VERDICT #3):
  * device timings are the MEDIAN OF 5 runs, synced with a device-side
    scalar fetch (never np.asarray — the tunnel transfer would dominate)
  * every config gets a `baseline` block: a fixed-seed single-core numpy
    implementation of the reference algorithm (tools/baselines.py, using the
    reference's own sort-based Hyndman-Fan quantile, xclim:core/utils.py:494),
    with raw seconds and the measured problem fraction recorded;
    `vs_baseline` = device / (1-core × 64 × 0.7) — an estimated 64-core dask
    node, generous to the reference since dask adds scheduler overhead the
    pure-numpy kernels don't have
  * the JSON records which spell engine ran (pallas_mode + dispatch counts)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent))

EFFICIENCY = 64 * 0.7  # estimated 64-core dask node vs 1 numpy core


def _tables(nyears: int):
    from xclim_tpu.core.calendar import date_range, percentile_doy_table

    time_idx = date_range("1981-01-01", end=f"{1980 + nyears}-12-31", freq="D",
                          calendar="noleap")
    table, doys = percentile_doy_table(time_idx, window=5)
    year_of_step = (time_idx.year - time_idx.year[0]).astype(np.int32)
    doy_idx = (time_idx.doy - 1).astype(np.int32)
    return time_idx, table, year_of_step, doy_idx


def make_tpu_bench(nyears=30, cells=(64, 64), window=5, chunk_pairs=58,
                   kernel="topk"):
    """Batched bootstrap; `kernel` picks the per-pair quantile strategy:
    'topk' (candidate tables, fastest) or 'sort' (full re-sort, fallback)."""
    import jax
    import jax.numpy as jnp

    from xclim_tpu.ops.bootstrap import (
        merge_rank_replaced_year_quantile,
        topk_capacity,
        topk_rank_tables,
        topk_replaced_year_quantile,
    )
    from xclim_tpu.ops.quantile import nan_quantile

    time_idx, table, year_of_step, doy_idx = _tables(nyears)
    T = len(time_idx)
    n_doy = table.shape[0]  # 365 for noleap
    C = cells[0] * cells[1]
    N = nyears * window

    # day_table[y, d] = time index of day d of year y (noleap → dense)
    day_table = np.full((nyears, n_doy), -1, dtype=np.int32)
    day_table[year_of_step, doy_idx] = np.arange(T, dtype=np.int32)
    assert (day_table >= 0).all()

    tbl = jnp.asarray(table.reshape(n_doy, nyears, window))
    dayt = jnp.asarray(day_table)
    year_id = np.arange(nyears).repeat(window)
    pairs = np.array([(b, o) for b in range(nyears) for o in range(nyears) if o != b],
                     dtype=np.int32)
    npairs = len(pairs)
    nchunks = (npairs + chunk_pairs - 1) // chunk_pairs
    pad = nchunks * chunk_pairs - npairs
    if pad:
        pairs = np.concatenate([pairs, np.tile(pairs[-1:], (pad, 1))])
    chunks = jnp.asarray(pairs.reshape(nchunks, chunk_pairs, 2))
    K = topk_capacity(N, window, 0.9)

    if kernel in ("topk", "merge"):
        qkern = (topk_replaced_year_quantile if kernel == "topk"
                 else merge_rank_replaced_year_quantile)

        @jax.jit
        def prepare(xx):
            D = jnp.where((tbl >= 0)[..., None], xx[jnp.maximum(tbl, 0)],
                          jnp.nan)               # (n_doy, Y, w, C)
            Xy = xx[dayt]                        # (Y, n_doy, C)
            tabs = topk_rank_tables(D.reshape(n_doy, N, C), year_id, K)
            Dt = D.transpose(0, 3, 1, 2)         # (n_doy, C, Y, w)
            return (Dt, Xy) + tabs

        @jax.jit
        def chunk_fn(Dt, Xy, topv, topyear, botv, botyear, nvalid, pair_chunk):
            def pair_step(acc, bo):
                b, o = bo[0], bo[1]
                per = qkern(
                    topv, topyear, botv, botyear, nvalid,
                    jnp.take(Dt, b, axis=2), jnp.take(Dt, o, axis=2), b, 0.9)
                xb = jnp.take(Xy, b, axis=0)     # (n_doy, C)
                cnt = (xb > per).astype(jnp.float32).sum(axis=0)
                return acc.at[b].add(cnt), None

            acc0 = jnp.zeros((nyears, C), dtype=jnp.float32)
            acc, _ = jax.lax.scan(pair_step, acc0, pair_chunk)
            return acc

    else:

        @jax.jit
        def prepare(xx):
            D = jnp.where((tbl >= 0)[..., None], xx[jnp.maximum(tbl, 0)],
                          jnp.nan)               # (n_doy, Y, w, C)
            Xy = xx[dayt]
            return D, Xy

        @jax.jit
        def chunk_fn(D, Xy, pair_chunk):
            def pair_step(acc, bo):
                b, o = bo[0], bo[1]
                Dyo = jnp.take(D, o, axis=1)     # (n_doy, w, C)
                onehot = (jnp.arange(nyears) == b).reshape(1, nyears, 1, 1)
                Dmod = jnp.where(onehot, Dyo[:, None], D)
                per = nan_quantile(Dmod.reshape(n_doy, N, C), jnp.array([0.9]),
                                   axis=1, alpha=1 / 3, beta=1 / 3)[0]
                xb = jnp.take(Xy, b, axis=0)
                cnt = (xb > per).astype(jnp.float32).sum(axis=0)
                return acc.at[b].add(cnt), None

            acc0 = jnp.zeros((nyears, C), dtype=jnp.float32)
            acc, _ = jax.lax.scan(pair_step, acc0, pair_chunk)
            return acc

    def run(x):
        state = prepare(x)
        acc = None
        for k in range(nchunks):
            res = chunk_fn(*state, chunks[k])
            acc = res if acc is None else acc + res
        # padded duplicate pairs are harmless for throughput measurement
        return acc / (nyears - 1)

    @jax.jit
    def gen(key):
        return jax.random.normal(key, (T, C)) * 5.0 + 295.0

    return run, gen, T * C


# ---------------------------------------------------------------------------
# timing helpers
# ---------------------------------------------------------------------------


def _sync_scalar(o):
    """Force completion with a device-side slice + scalar fetch (a full
    np.asarray would drag the whole output through the tunnel and time the
    transfer, not the compute)."""
    import jax.numpy as jnp

    d = o.data if hasattr(o, "data") else o
    return float(jnp.ravel(d)[0])


def _median5(call, sync=None, reps=5):
    """Warm (compile) + median-of-`reps` timed calls."""
    sync = sync or (lambda r: [_sync_scalar(o) for o in
                               (r if isinstance(r, (tuple, list)) else [r])])
    r = call()
    sync(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = call()
        sync(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ts


def _load_pinned():
    """BASELINE_MEASURED.json: full-fraction quiet-machine numpy baselines
    pinned by tools/pin_baselines.py (VERDICT r2 #3 — the vs_baseline
    denominator is a committed constant, not re-rolled under load)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            return json.load(f)
    except OSError:
        return {}


_PINNED = None


def _baseline_block(name, pin=None, live=True, **kw):
    """Baseline constants for one config.

    Prefers the pinned full-fraction measurement (key ``pin`` or ``name``);
    a quick live re-measurement is recorded alongside for drift audit but
    never used as the ratio denominator when a pin exists. Set
    ``BENCH_LIVE_BASELINE=0`` to skip the live re-measurement entirely
    (e.g. on a loaded host where the numbers would only record noise).
    """
    global _PINNED
    if _PINNED is None:
        _PINNED = _load_pinned()
    pinned = _PINNED.get(pin or name)
    if os.environ.get("BENCH_LIVE_BASELINE", "1") == "0" and pinned is not None:
        live = False
    block = {}
    if live or pinned is None:
        import baselines

        cd_s, sec, frac = baselines.ALL[name](**kw)
        block = {"numpy_1core_cd_s": round(cd_s, 1),
                 "numpy_seconds": round(sec, 3),
                 "fraction_measured": frac,
                 "est_64core_cd_s": round(cd_s * EFFICIENCY, 1)}
    if pinned is not None:
        live_block = block
        block = dict(pinned)
        block["pinned"] = True
        if live_block:
            block["live"] = {k: live_block[k]
                             for k in ("numpy_1core_cd_s", "numpy_seconds",
                                       "fraction_measured")}
    return block


def _setup_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    return jax


# ---------------------------------------------------------------------------
# default driver invocation: the tx90p bootstrap north star, one JSON line
# ---------------------------------------------------------------------------


def _measure_bootstrap(cells, kernel, reps=5, chunk_pairs=58, n_chunks=1):
    """Time the bootstrap kernel; ``n_chunks > 1`` streams that many
    independent spatial chunks through ONE compiled program per rep (the
    production strategy for grids whose single-program compile the tunnel
    helper rejects) — throughput is total cell-days over the chain time."""
    import jax

    jitted, gen, cell_days = make_tpu_bench(cells=cells, kernel=kernel,
                                            chunk_pairs=chunk_pairs)
    xs = [gen(jax.random.PRNGKey(i)) for i in range(n_chunks)]
    for x in xs:
        x.block_until_ready()

    def run():
        outs = [jitted(x) for x in xs]
        return outs[-1]

    med, ts = _median5(run, sync=lambda r: _sync_scalar(r), reps=reps)
    return cell_days * n_chunks / med, ts


def main():
    _setup_jax()

    value = None
    used = None
    for cells, kernel in [((64, 64), "merge"), ((64, 64), "topk"),
                          ((64, 64), "sort"), ((32, 32), "sort"),
                          ((16, 16), "sort")]:
        try:
            value, _ = _measure_bootstrap(cells, kernel)
            used = cells
            break
        except Exception:
            continue
    if value is None:
        print(json.dumps({"metric": "tx90p full 30yr bootstrap",
                          "value": 0.0, "unit": "cell-days/s",
                          "vs_baseline": 0.0, "error": "device unavailable"}))
        return

    base = _baseline_block("tx90p_bootstrap", pin="tx90p_bootstrap_4096",
                           cells=used[0] * used[1], sample_years=1,
                           sample_pairs=4, reps=2)
    print(json.dumps({
        "metric": f"grid-cell-days/sec/chip, tx90p full 30yr bootstrap "
                  f"({used[0] * used[1]} cells)",
        "value": round(value, 1),
        "unit": "cell-days/s",
        "vs_baseline": round(value / base["est_64core_cd_s"], 2),
        "baseline": base,
    }))


# ---------------------------------------------------------------------------
# Full BASELINE.md config sweep: `python bench.py --all`
# (the driver's default invocation still prints exactly one JSON line above)
# ---------------------------------------------------------------------------

#: stable row keys, in sweep order — must match the configs list in
#: bench_all (asserted there). The --all driver runs one subprocess per key.
CONFIG_KEYS = ("tg_mean 64", "tg_mean 512", "spells", "spells 448",
               "spells A/B", "fused chain", "fused chain 320",
               "tx90p bootstrap", "tx90p bootstrap 16k", "QDM 1k",
               "QDM 16k", "ensembles", "ensembles 192x448", "roofline")


def bench_all_isolated():
    """Run every config in its OWN subprocess (`--config <key>` each), so a
    config that exhausts HBM cannot poison the rest of the sweep.

    The first full in-process `--all` run of round 4 proved the need: QDM 16k
    hit RESOURCE_EXHAUSTED and every subsequent config (ensembles, roofline)
    failed with the backend stuck in that state despite jax.clear_caches().
    Each subprocess merges its rows into BENCH_DETAIL.json by `key`; a
    subprocess that dies outright gets an error row written by this parent.
    """
    import subprocess

    here = os.path.abspath(__file__)
    path = os.path.join(os.path.dirname(here), "BENCH_DETAIL.json")
    for key in CONFIG_KEYS:
        print(f"--- {key} ---", flush=True)
        r = subprocess.run([sys.executable, here, "--all-inproc",
                            "--config", key], timeout=3600)
        if r.returncode != 0:
            row = {"config": key, "key": key,
                   "error": f"bench subprocess exited {r.returncode}"}
            try:
                with open(path) as f:
                    rows = json.load(f)
            except Exception:
                rows = []
            rows = [x for x in rows if x.get("key", x.get("config")) != key]
            rows.append(row)
            with open(path, "w") as f:
                json.dump(rows, f, indent=2)
    with open(path) as f:
        for r in json.load(f):
            print(json.dumps(r))


def bench_all():
    jax = _setup_jax()
    import jax.numpy as jnp

    from xclim_tpu import climjit, indices
    from xclim_tpu.core.calendar import date_range
    from xclim_tpu.core.dataarray import ClimArray
    from xclim_tpu.ops.pallas.capability import dispatch_counts, pallas_mode

    results = []

    def mk(key, shape, mean, std, units, name, t):
        v = jax.random.normal(jax.random.PRNGKey(key), shape) * std + mean
        dims = ("time", "lat", "lon")[: len(shape)]
        coords = {"time": t}
        if len(shape) > 1:
            coords["lat"] = np.arange(shape[1])
        if len(shape) > 2:
            coords["lon"] = np.arange(shape[2])
        return ClimArray(v, dims, coords, {"units": units}, name)

    # 0. tunnel dispatch floor: a trivial jitted program round-trip
    try:
        g = jax.jit(lambda a: a + 1)
        x0 = jnp.zeros((8, 128))
        floor_med, _ = _median5(lambda: g(x0), sync=_sync_scalar)
        results.append({"config": "trivial dispatch floor",
                        "key": "dispatch floor",
                        "value": round(floor_med * 1e3, 2), "unit": "ms"})
    except Exception as e:
        results.append({"config": "dispatch floor", "key": "dispatch floor",
                        "error": str(e)[:120]})

    # each config runs inside its own function so device buffers are freed
    # when it returns — earlier rounds OOMed the chip by keeping every
    # config's arrays alive in shared function locals

    def cfg_tg_mean(size):
        # live drift probe runs the SAME size as the pin (r4 verdict #6a:
        # the default-kwargs probe measured a 64x64 problem against a
        # 512x512 pin and audited nothing)
        base1 = _baseline_block(
            "tg_mean", pin="tg_mean_512" if size == 512 else "tg_mean",
            ny=size, nx=size, reps=3 if size <= 64 else 1)
        t = date_range("2000-01-01", periods=3650, freq="D",
                       calendar="noleap")
        tas = mk(0, (3650, size, size), 285.0, 5.0, "K", "tas", t)
        _sync_scalar(tas.data)
        f = climjit(indices.tg_mean)
        med, ts = _median5(lambda: f(tas, freq="MS"))
        cd = 3650 * size * size
        return {
            "config": f"tg_mean monthly {size}x{size} 10y",
            "value": round(cd / med, 1),
            "unit": "cell-days/s",
            "vs_baseline": round(cd / med / base1["est_64core_cd_s"], 2),
            "baseline": base1,
            "runs_ms": [round(x * 1e3, 1) for x in ts],
            "note": ("64x64 sits at the tunnel's per-dispatch floor "
                     "(see 'trivial dispatch floor'); the saturated size "
                     "shows kernel throughput" if size == 64 else
                     "saturated grid"),
        }

    def cfg_spells(size=100):
        base2 = _baseline_block(
            "spells", pin="spells_448" if size == 448 else "spells",
            ny=size, nx=size, reps=3 if size <= 100 else 1)
        t = date_range("2000-01-01", periods=3650, freq="D", calendar="noleap")
        tx = mk(1, (3650, size, size), 290.0, 8.0, "K", "tasmax", t)
        tn = mk(2, (3650, size, size), 280.0, 8.0, "K", "tasmin", t)
        f1 = climjit(indices.tx_days_above)
        f2 = climjit(indices.heat_wave_frequency)
        med1, _ = _median5(lambda: f1(tx, thresh="25 degC", freq="YS"))
        med2, _ = _median5(lambda: f2(tn, tx, thresh_tasmin="22 degC",
                                      thresh_tasmax="30 degC", freq="YS"))
        cells = 3650 * size * size
        val = (cells / med1 + cells / med2) / 2
        return {"config": f"tx_days_above + heat_wave_frequency {size}x{size} 10y",
                "value": round(val, 1),
                "unit": "cell-days/s (mean of both)",
                "vs_baseline": round(val / base2["est_64core_cd_s"], 2),
                "baseline": base2,
                "note": ("100x100 is a single ~35 ms dispatch — the tunnel "
                         "floor, not kernel speed; the saturated size shows "
                         "kernel throughput" if size == 100 else
                         "saturated grid")}

    def cfg_bootstrap(side=64):
        cells = side * side
        # matched-size pins (r4 verdict #6b: the old pin timed 256 numpy
        # cells against a 4096-cell device run)
        pin = {64: "tx90p_bootstrap_4096", 128: "tx90p_bootstrap_16k"}.get(
            side, "tx90p_bootstrap")
        base3 = _baseline_block("tx90p_bootstrap", pin=pin, cells=cells,
                                sample_years=1, sample_pairs=4, reps=1)
        # retry ladder: at 16k cells the remote compile helper crashes
        # (HTTP 500) on every single-program variant (merge/topk, any scan
        # chunking — measured 2026-08-20); the final rung is the production
        # strategy for such grids: stream 4096-cell spatial chunks through
        # ONE compiled program, timing the full chain
        rungs = [("merge", 58, side * side // 4096 if side > 64 else 1)]
        if side > 64:
            rungs = [("merge", 58, 1), ("topk", 29, 1),
                     ("merge", 58, side * side // 4096)]
        last = None
        for kernel, chunk_pairs, n_chunks in rungs:
            try:
                val, ts = _measure_bootstrap(
                    (64, 64) if n_chunks > 1 else (side, side), kernel,
                    chunk_pairs=chunk_pairs, n_chunks=n_chunks)
                break
            except Exception as e:  # noqa: BLE001 — try the next rung
                last = e
                import jax

                jax.clear_caches()
        else:
            raise last
        note = "" if side == 64 else "ERA5-scale cell count (BASELINE.md target)"
        if n_chunks > 1:
            note += ("; streamed as %d x 4096-cell chunks through one "
                     "compiled program (the tunnel compile helper rejects "
                     "any single 16k-cell bootstrap program with HTTP 500)"
                     % n_chunks)
        elif (kernel, chunk_pairs) != ("merge", 58):
            note = (note + "; " if note else "") + \
                f"served by {kernel}/chunk_pairs={chunk_pairs} after " \
                "compile failures on larger programs"
        return {"config": f"tx90p full 30y bootstrap {cells} cells",
                "value": round(val, 1),
                "unit": "cell-days/s",
                "vs_baseline": round(val / base3["est_64core_cd_s"], 2),
                "baseline": base3,
                "runs_ms": [round(x * 1e3, 1) for x in ts],
                "note": note}

    def cfg_qdm(size=32):
        pin = {32: "qdm", 128: "qdm_16k"}[size]
        base4 = _baseline_block("qdm", pin=pin, ny=size, nx=size,
                                sample_doys=12, reps=2)
        from xclim_tpu.sdba import Grouper, QuantileDeltaMapping

        t30 = date_range("1981-01-01", periods=30 * 365, freq="D",
                         calendar="noleap")
        ref = mk(3, (30 * 365, size, size), 285.0, 5.0, "K", "ref", t30)
        hist = mk(4, (30 * 365, size, size), 287.0, 6.0, "K", "hist", t30)

        def qdm_once():
            adj = QuantileDeltaMapping.train(
                ref, hist, group=Grouper("time.dayofyear", 31),
                nquantiles=50, kind="+")
            return adj.adjust(hist)

        med, ts = _median5(qdm_once)
        cd = 30 * 365 * size * size
        from xclim_tpu.ops.pallas.capability import winquantile_state

        return {"config": f"QDM train+adjust doy w31 nq50 "
                          f"{size * size} cells 30y",
                "value": round(cd / med, 1),
                "unit": "cell-days/s",
                "vs_baseline": round(cd / med / base4["est_64core_cd_s"], 2),
                "baseline": base4,
                "runs_ms": [round(x * 1e3, 1) for x in ts],
                "train_engine": f"winquantile:{winquantile_state()}",
                "note": ("r4's 0.92x at 1024 cells was the XLA fallback "
                         "serving the whole process after ONE transient "
                         "probe failure (train 565 ms vs 70 ms Pallas, "
                         "tools/prof_qdm_core.py); dispatch is now "
                         "tri-state with runtime fallback and the engine "
                         "that actually served is recorded here"
                         if size == 32
                         else "ERA5-scale cell count (BASELINE.md target)")}

    def cfg_fused_chain(size=100):
        """VERDICT r2 #4 / r4 #4: the 10-indicator chain compiled into ONE
        program (the CLI --fused path), vs the same chain in sequential
        numpy (tools/baselines.py baseline_chain). size=100 is the
        dispatch-floor row (marginal-cost headline); the saturated row
        proves chain throughput where the floor doesn't dominate."""
        # saturated size is 320x320: the four 10-y input variables are
        # 5.98 GB there — 384x384 (8.6 GB) OOMs a 16 GB v5e once the spell
        # indicators' scan temporaries land on top (measured RESOURCE_EXHAUSTED)
        base = _baseline_block("chain",
                               pin="chain_320" if size == 320 else "chain",
                               ny=size, nx=size,
                               reps=2 if size <= 100 else 1)
        from xclim_tpu.core.indicator import registry

        t = date_range("2000-01-01", periods=3650, freq="D",
                       calendar="noleap")
        tas = mk(20, (3650, size, size), 285.0, 6.0, "K", "tas", t)
        tx = mk(21, (3650, size, size), 291.0, 6.0, "K", "tasmax", t)
        tn = mk(22, (3650, size, size), 279.0, 6.0, "K", "tasmin", t)
        pr = mk(23, (3650, size, size), 3e-5, 2e-5, "kg m-2 s-1", "pr", t)
        pr = pr.copy(data=jnp.abs(pr.data))
        pr.attrs["units"] = "kg m-2 s-1"
        names = [("TG_MEAN", "tas", {"freq": "MS"}),
                 ("TX_DAYS_ABOVE", "tasmax", {"thresh": "25 degC",
                                              "freq": "YS"}),
                 ("FROST_DAYS", "tasmin", {"freq": "YS"}),
                 ("ICE_DAYS", "tasmax", {"freq": "YS"}),
                 ("GROWING_DEGREE_DAYS", "tas", {"thresh": "4 degC",
                                                 "freq": "YS"}),
                 ("HEATING_DEGREE_DAYS", "tas", {"thresh": "17 degC",
                                                 "freq": "YS"}),
                 ("COOLING_DEGREE_DAYS", "tas", {"thresh": "18 degC",
                                                 "freq": "YS"}),
                 ("HEAT_WAVE_INDEX", "tasmax", {"freq": "YS"}),
                 ("CDD", "pr", {"freq": "YS"}),
                 ("PRCPTOT", "pr", {"freq": "YS"})]
        vars_ = {"tas": tas, "tasmax": tx, "tasmin": tn, "pr": pr}

        from xclim_tpu import climjit_chain

        def make_step(ind_name, var, kw):
            def step(tasd, txd, tnd, prd):
                d = {"tas": tas.copy(data=tasd), "tasmax": tx.copy(data=txd),
                     "tasmin": tn.copy(data=tnd), "pr": pr.copy(data=prd)}
                for k in d.values():
                    k.attrs = dict(vars_[k.name].attrs)
                return registry[ind_name](d[var], **kw)
            return step

        # climjit_chain compiles the 10 indicators as ONE program and
        # bisects automatically if the backend rejects the program size
        fused = climjit_chain([make_step(*n) for n in names])

        def once():
            return fused(tas.data, tx.data, tn.data, pr.data)

        def sync(r):
            # outputs complete in stream order: fetching ONE scalar of the
            # last output bounds the whole chain (each extra fetch is its
            # own ~20 ms tunnel round-trip and would swamp the compute)
            _sync_scalar(r[-1])

        med, ts = _median5(once, sync=sync)
        # marginal cost: one indicator alone at the same size
        single = climjit(lambda d: registry["TG_MEAN"](tas.copy(data=d),
                                                       freq="MS"))
        med1, _ = _median5(lambda: single(tas.data))
        cd = 10 * 3650 * size * size
        nprog = len(fused.partition)
        return {"config": f"fused 10-indicator chain {size}x{size} 10y",
                "value": round(cd / med, 1),
                "unit": "indicator-cell-days/s",
                "vs_baseline": round(cd / med / base["est_64core_cd_s"], 2),
                "baseline": base,
                "runs_ms": [round(x * 1e3, 1) for x in ts],
                "single_indicator_ms": round(med1 * 1e3, 1),
                "marginal_ms_per_indicator": round((med - med1) / 9 * 1e3, 2),
                "programs": nprog,
                "note": ("one XLA program for the whole chain (CLI --fused)"
                         if nprog == 1 else
                         f"chain auto-split into {nprog} programs by "
                         "climjit_chain (backend program-size limit)")}

    def cfg_spells_ab(size=448):
        """VERDICT r2 #5 / r3 #5: same size, same run, both spell engines.
        The default dispatch (capability.spell_engine) routes to the winner."""
        from xclim_tpu.ops.pallas.capability import (
            set_spell_engine,
            spell_engine,
        )

        t = date_range("2000-01-01", periods=3650, freq="D", calendar="noleap")
        tx = mk(1, (3650, size, size), 290.0, 8.0, "K", "tasmax", t)
        out = {"config": f"spells engine A/B {size}x{size}"}
        try:
            for mode in ("pallas", "xla"):
                set_spell_engine(mode)
                f1 = climjit(indices.tx_days_above)
                med, _ = _median5(lambda: f1(tx, thresh="25 degC", freq="YS"))
                out[f"{mode}_ms"] = round(med * 1e3, 1)
                jax.clear_caches()
        finally:
            set_spell_engine(None)
        out["winner"] = "pallas" if out.get("pallas_ms", 1e9) <= \
            out.get("xla_ms", 1e9) else "xla"
        out["default_engine"] = spell_engine()
        out["dispatch_honors_ab"] = out["winner"] == out["default_engine"]
        return out

    def cfg_roofline():
        """VERDICT r2 #2 / r4 #5: measure the backend's HBM bandwidth
        ceiling so the memory-bound configs are judged against a real
        roofline.

        The copy kernel (y = x * c) touches HBM twice (read + write) over
        the same 3.8 GB float32 array as the tg_mean 512x512 config; the
        reduce kernel (monthly segment mean) reads it once with a tiny
        write. Effective bandwidth = bytes touched / median wall time.

        Methodology (round-5, replaces the per-dispatch timing that charged
        the ~33 ms tunnel round-trip to every rep and made the ratio
        measure the dispatch floor, not the kernel): every kernel is timed
        as K=8 back-to-back async dispatches with ONE scalar sync — the
        device pipelines launches (a trivial-kernel chain runs ~5.8 ms per
        dispatch, fully hidden under any real kernel), so chain-time/K is
        kernel wall time. A lax.scan formulation was rejected: XLA either
        dead-code-eliminates unconsumed segments (948 GB/s > HBM spec) or
        materializes the carry-injected operand (extra full pass).

        The NaN-aware mean runs ~14 ms vs the 8.8 ms skipna=False floor —
        masking arithmetic (fused sum+count reductions), not memory: five
        masked formulations land within 4% (tools/prof_segred2.py), and the
        unmasked mean proves the memory path at ~0.94 of copy. Both ratios
        are reported. First-principles check that the masked gap is a VPU
        roofline of its own, not a fixable formulation: masking adds ~4
        VPU ops/element over the raw mean's single add (isnan compare, two
        selects, count accumulate); 0.96 G elements x 4 ops over the
        measured ~5 ms gap implies ~0.8 Tops/s of f32 VPU throughput —
        consistent with the v5e VPU — so a masked reduction CANNOT approach
        the copy bandwidth on this chip regardless of kernel language
        (a Pallas kernel runs the same per-element arithmetic on the same
        VPU; moving the adds to the MXU still leaves compare+select+convert
        ~3 ops/elem ~ 3-4 ms over the floor). The honest claim is split:
        memory path 0.94 of copy (raw ratio), masked mean at its own
        arithmetic roofline.
        """
        shape = (3650, 512, 512)
        K = 8
        x = jax.random.normal(jax.random.PRNGKey(9), shape)
        _sync_scalar(x)

        def chain(f, arg):
            def run():
                rs = [f(arg) for _ in range(K)]
                return rs[-1]
            return run

        tiny = jnp.zeros((8, 128), jnp.float32)
        triv = jax.jit(lambda a: a * jnp.float32(1.000001))
        med_tk, _ = _median5(chain(triv, tiny), reps=3)

        copy = jax.jit(lambda a: a * jnp.float32(1.0000001))
        copy_d = jax.jit(lambda a: a * jnp.float32(1.0000001),
                         donate_argnums=0)

        def copy_k():
            # donate intermediates: K async in-flight copies would
            # otherwise pin K x 3.8 GB and exhaust the 16 GB chip
            r = copy(x)
            for _ in range(K - 1):
                r = copy_d(r)
            return r

        med_c1, _ = _median5(lambda: copy(x), reps=3)
        med_ck, _ = _median5(copy_k, reps=3)
        copy_gbs = 2 * x.size * 4 * K / med_ck / 1e9

        from xclim_tpu.core.calendar import resample_segments
        from xclim_tpu.ops.segments import segment_reduce
        t = date_range("2000-01-01", periods=3650, freq="D",
                       calendar="noleap")
        spec = resample_segments(t, "MS")
        red = jax.jit(lambda a: segment_reduce(a, spec, "mean", axis=0))
        red_raw = jax.jit(lambda a: segment_reduce(a, spec, "mean", axis=0,
                                                   skipna=False))

        med_r1, _ = _median5(lambda: red(x), reps=3)
        med_rk, _ = _median5(chain(red, x), reps=3)
        med_rrk, _ = _median5(chain(red_raw, x), reps=3)
        red_gbs = x.size * 4 * K / med_rk / 1e9
        red_raw_gbs = x.size * 4 * K / med_rrk / 1e9
        return {"config": "HBM roofline (3.8 GB fp32)",
                "copy_kernel_GBps": round(copy_gbs, 1),
                "segment_mean_GBps": round(red_gbs, 1),
                "segment_vs_roofline": round(red_gbs / copy_gbs, 2),
                "segment_mean_raw_GBps": round(red_raw_gbs, 1),
                "segment_raw_vs_roofline": round(red_raw_gbs / copy_gbs, 2),
                "chain_launch_ms": round(med_tk / K * 1e3, 1),
                "copy_GBps_1shot": round(2 * x.size * 4 / med_c1 / 1e9, 1),
                "segment_GBps_1shot": round(x.size * 4 / med_r1 / 1e9, 1),
                "segment_bound": "vpu-arith (masked); memory path proven "
                                 "by raw ratio",
                "note": "copy touches HBM 2x (r+w); segment mean reads 1x "
                        "with a negligible write; K=8 dispatch chains, one "
                        "sync (launches pipeline under the kernel). The "
                        "NaN-aware mean is masking-arithmetic-bound — all "
                        "masked formulations within 4% (tools/"
                        "prof_segred2.py), and the ~5 ms gap over the raw "
                        "floor matches 4 VPU ops/elem at the chip's ~0.8 "
                        "Tops/s f32 VPU, i.e. the masked mean sits at its "
                        "own VPU roofline; skipna=False shows the memory "
                        "path itself at ~0.94 of copy"}

    def cfg_ensembles(ny=128, nx=256):
        pin = "ensembles" if (ny, nx) == (128, 256) else f"ensembles_{ny}x{nx}"
        base5 = _baseline_block("ensembles", pin=pin, ny=ny, nx=nx)
        from xclim_tpu.core.dataarray import concat
        from xclim_tpu.ensembles import ensemble_percentiles, robustness_fractions

        t1 = date_range("2000-01-01", periods=365, freq="D", calendar="noleap")
        ens = concat([mk(10 + i, (365, ny, nx), 285.0, 5.0, "K", "tas", t1)
                      for i in range(30)], dim="realization")
        _sync_scalar(ens.data)

        # percentiles + robustness as ONE XLA program (climjit — the
        # intended usage pattern, same as the fused CLI chain): eager calls
        # paid 2-4 tunnel dispatch floors per iteration. The fut/hist split
        # happens INSIDE the program (XLA slices fuse into their consumers)
        # — materializing the halves as separate device arrays doubled
        # resident HBM and OOMed the 192x448 saturated config (3.8 GB input)
        def fused(e):
            p = ensemble_percentiles(e, values=[10, 50, 90])
            fut = e.isel(time=slice(183, 365))
            hist_ = e.isel(time=slice(0, 182))
            rf = robustness_fractions(fut, hist_, test="ttest")
            return (p[10.0], p[50.0], p[90.0], rf["changed"])

        g = climjit(fused)

        def ens_once():
            return g(ens)

        def sync(r):
            # one program: any output completing bounds the whole program
            _sync_scalar(r[0].data)

        med, ts = _median5(ens_once, sync=sync)
        cd = 30 * 365 * ny * nx
        return {"config": f"ensemble percentiles+robustness 30 members {ny}x{nx}",
                "value": round(cd / med, 1),
                "unit": "member-cell-days/s",
                "vs_baseline": round(cd / med / base5["est_64core_cd_s"], 2),
                "baseline": base5,
                "runs_ms": [round(x * 1e3, 1) for x in ts],
                "note": ("128x256 pays the tunnel dispatch floor; the "
                         "saturated size shows kernel throughput"
                         if (ny, nx) == (128, 256) else "saturated grid")}

    configs = [("tg_mean 64", lambda: cfg_tg_mean(64)),
               ("tg_mean 512", lambda: cfg_tg_mean(512)),
               ("spells", lambda: cfg_spells(100)),
               ("spells 448", lambda: cfg_spells(448)),
               ("spells A/B", cfg_spells_ab),
               ("fused chain", cfg_fused_chain),
               ("fused chain 320", lambda: cfg_fused_chain(320)),
               ("tx90p bootstrap", cfg_bootstrap),
               ("tx90p bootstrap 16k", lambda: cfg_bootstrap(128)),
               ("QDM 1k", lambda: cfg_qdm(32)),
               ("QDM 16k", lambda: cfg_qdm(128)),
               ("ensembles", lambda: cfg_ensembles(128, 256)),
               ("ensembles 192x448", lambda: cfg_ensembles(192, 448)),
               ("roofline", cfg_roofline)]
    assert [n for n, _ in configs] == list(CONFIG_KEYS)
    import gc

    # `--config <key-or-substring>` runs a subset (results merge into the
    # existing BENCH_DETAIL.json instead of replacing it); an exact key
    # match wins over substring so "ensembles" does not also select
    # "ensembles 192x448"
    only = None
    if "--config" in sys.argv:
        only = sys.argv[sys.argv.index("--config") + 1].lower()
        exact = [(n, f) for n, f in configs if only == n.lower()]
        configs = exact or [(n, f) for n, f in configs if only in n.lower()]

    for name, fn in configs:
        # every row carries a stable `key` (the configs-list name) so subset
        # --config reruns replace a prior error row for the same config
        # instead of leaving both (r3 artifact had orphaned error rows keyed
        # by the short name next to success rows keyed by the long one)
        try:
            r = fn()
            r["key"] = name
            results.append(r)
        except Exception as e:
            results.append({"config": name, "key": name,
                            "error": str(e)[:160]})
        # drop every cached executable + its embedded constants between
        # configs — the round-3 kernel set made the 448x448 configs leave
        # multi-GB constant buffers alive through climjit caches, OOMing
        # the later configs (r3 sweep: RESOURCE_EXHAUSTED on bootstrap/QDM)
        jax.clear_caches()
        gc.collect()

    if sum(dispatch_counts.values()):
        # only report engine routing from invocations that actually ran
        # spell traffic — a subset run with none would overwrite the real
        # counts with 0/0 (the r3 artifact's misleading "spell engine" row)
        from xclim_tpu.ops.pallas.capability import spell_engine

        results.append({"config": "spell engine", "key": "spell engine",
                        "pallas_mode": pallas_mode(),
                        "default_engine": spell_engine(),
                        "dispatch_counts": dict(dispatch_counts),
                        "note": "dispatch counts cover the configs of the "
                                "invocation that ran spell traffic"})
    from xclim_tpu.ops.quantile import quantile_dispatch_counts
    if sum(quantile_dispatch_counts.values()):
        results.append({"config": "quantile engine", "key": "quantile engine",
                        "dispatch_counts": dict(quantile_dispatch_counts),
                        "note": "quantile kernel routing for the configs of "
                                "the invocation that ran quantile traffic"})
    from xclim_tpu.ops.pallas.capability import wq_dispatch_counts
    if sum(wq_dispatch_counts.values()):
        results.append({"config": "winquantile engine",
                        "key": "winquantile engine",
                        "dispatch_counts": dict(wq_dispatch_counts),
                        "note": "sdba train (windowed doy quantile) routing "
                                "for the configs of this invocation"})

    for r in results:
        print(json.dumps(r))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_DETAIL.json")
    if only is not None and os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)

        def _k(r):
            return r.get("key", r["config"])

        new_keys = {_k(r) for r in results}
        # keep original ordering: replace in place where possible
        out = []
        for r in prior:
            if _k(r) in new_keys:
                out.append(next(x for x in results if _k(x) == _k(r)))
                new_keys.discard(_k(r))
            else:
                out.append(r)
        out.extend(r for r in results if _k(r) in new_keys)
        results = out
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    if "--all-inproc" in sys.argv:
        bench_all()
    elif "--all" in sys.argv:
        bench_all_isolated()
    else:
        main()
