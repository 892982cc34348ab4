"""Decompose QDM.train wall time at 1024 cells (round-5: the winquantile
kernel alone is ~20 ms at this size, but the train was measured at ~430 ms —
find the other ~400)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.sdba import Grouper, QuantileDeltaMapping


def sync(r):
    d = r.data if hasattr(r, "data") else r
    if isinstance(d, dict):
        d = next(iter(d.values()))
    return float(jnp.ravel(jnp.asarray(d))[0])


def med(call, syncer=sync, reps=5):
    r = call(); syncer(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); r = call(); syncer(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), r


t30 = date_range("1981-01-01", periods=30 * 365, freq="D", calendar="noleap")
rng = np.random.default_rng(0)
refv = jnp.asarray(rng.normal(285, 5, (30 * 365, 32, 32)).astype(np.float32))
histv = jnp.asarray(rng.normal(287, 6, (30 * 365, 32, 32)).astype(np.float32))
coords = {"time": t30, "lat": np.arange(32), "lon": np.arange(32)}
mk = lambda d, n: ClimArray(d, ("time", "lat", "lon"), dict(coords),
                            {"units": "K"}, n)
ref, hist = mk(refv, "ref"), mk(histv, "hist")
g = Grouper("time.dayofyear", 31)

tm, adj = med(lambda: QuantileDeltaMapping.train(
    ref, hist, group=g, nquantiles=50, kind="+"),
    syncer=lambda a: sync(a.ds["af"]))
print(f"train total: {tm*1e3:.1f} ms")

# --- pieces ---
from xclim_tpu.sdba.adjustment import _qm_train_core_doy

q = np.linspace(0, 1, 50)
tbl_r = g.device_doy_table(ref.time)
tbl_h = g.device_doy_table(hist.time)

t_tbl, _ = med(lambda: g.device_doy_table(ref.time), syncer=lambda r: None)
print(f"device_doy_table (cached): {t_tbl*1e3:.2f} ms")

xr_ = jnp.moveaxis(ref.data, 0, 0)
xh_ = jnp.moveaxis(hist.data, 0, 0)
t_core, out = med(lambda: _qm_train_core_doy(
    xr_, xh_, tbl_r, tbl_h, q_tuple=tuple(float(v) for v in q), kind="+",
    window=31), syncer=lambda r: sync(r[0]))
print(f"_qm_train_core_doy: {t_core*1e3:.1f} ms  af={out[0].shape}")

# inside the core: two winquantile calls
from xclim_tpu.ops.pallas.winquantile import doy_window_quantiles
xg = jnp.moveaxis(refv.reshape(30 * 365, -1).reshape(30, 365, -1), 0, 1)
f = jax.jit(lambda a: doy_window_quantiles(a, q, 31))
t_wq, _ = med(lambda: f(xg), syncer=sync)
print(f"doy_window_quantiles alone: {t_wq*1e3:.1f} ms")

# train wrapper overhead = total - core
print(f"wrapper overhead (total - core): {(tm - t_core)*1e3:.1f} ms")
