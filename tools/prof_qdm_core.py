"""Find the ~480 ms gap: _qm_train_core_doy (565 ms) vs two standalone
winquantile kernels (2 x 20 ms) at 1024 cells."""
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
from xclim_tpu.sdba import Grouper
from xclim_tpu.sdba.utils import gather_doy_slices, windowed_doy_quantile
from xclim_tpu.ops.pallas.winquantile import doy_window_quantiles


def sync(r):
    while isinstance(r, (tuple, list)):
        r = r[0]
    return float(jnp.ravel(r)[0])


def med(call, reps=5):
    sync(call())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); r = call(); sync(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


t30 = date_range("1981-01-01", periods=30 * 365, freq="D", calendar="noleap")
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(285, 5, (30 * 365, 1024)).astype(np.float32))
y = jnp.asarray(rng.normal(287, 6, (30 * 365, 1024)).astype(np.float32))
g = Grouper("time.dayofyear", 31)
ref = ClimArray(x, ("time", "cell"),
                {"time": t30, "cell": np.arange(1024)}, {"units": "K"}, "r")
tbl = g.device_doy_table(ref.time)
q = np.linspace(0, 1, 50)
qt = tuple(float(v) for v in q)

f_gather = jax.jit(lambda a: gather_doy_slices(a, tbl))
print(f"gather_doy_slices: {med(lambda: f_gather(x))*1e3:6.1f} ms", flush=True)

xg = f_gather(x)
f_wq = jax.jit(lambda a: doy_window_quantiles(a, q, 31))
print(f"winquantile (pre-gathered): {med(lambda: f_wq(xg))*1e3:6.1f} ms",
      flush=True)

f_chain = jax.jit(lambda a: doy_window_quantiles(gather_doy_slices(a, tbl),
                                                 q, 31))
print(f"gather+winquantile one program: {med(lambda: f_chain(x))*1e3:6.1f} ms",
      flush=True)

f_two = jax.jit(lambda a, b: (
    doy_window_quantiles(gather_doy_slices(a, tbl), q, 31),
    doy_window_quantiles(gather_doy_slices(b, tbl), q, 31)))
print(f"two chains one program: {med(lambda: f_two(x, y))*1e3:6.1f} ms",
      flush=True)

f_wdq = jax.jit(lambda a, b: (windowed_doy_quantile(a, tbl, 31, q),
                              windowed_doy_quantile(b, tbl, 31, q)))
print(f"two windowed_doy_quantile: {med(lambda: f_wdq(x, y))*1e3:6.1f} ms",
      flush=True)

from xclim_tpu.sdba.adjustment import _qm_train_core_doy
f_core = lambda: _qm_train_core_doy(x, y, tbl, tbl, q_tuple=qt, kind="+",
                                    window=31)
print(f"_qm_train_core_doy: {med(f_core)*1e3:6.1f} ms", flush=True)
