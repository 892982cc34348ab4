"""Decompose QDM train vs adjust cost on-chip (round-3 perf work)."""
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


def med(call, sync, reps=5):
    r = call(); sync(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); r = call(); sync(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), r


def s1(r):
    d = r.data if hasattr(r, "data") else r
    if isinstance(d, dict):
        d = next(iter(d.values()))
    return float(jnp.ravel(d)[0])


def mk(key, shape, mean, std, units, name, t):
    v = jax.random.normal(jax.random.PRNGKey(key), shape) * std + mean
    dims = ("time", "lat", "lon")[: len(shape)]
    coords = {"time": t}
    if len(shape) > 1:
        coords["lat"] = np.arange(shape[1])
    if len(shape) > 2:
        coords["lon"] = np.arange(shape[2])
    return ClimArray(v, dims, coords, {"units": units}, name)


t30 = date_range("1981-01-01", periods=30 * 365, freq="D", calendar="noleap")
ref = mk(3, (30 * 365, 32, 32), 285.0, 5.0, "K", "ref", t30)
hist = mk(4, (30 * 365, 32, 32), 287.0, 6.0, "K", "hist", t30)
g = Grouper("time.dayofyear", 31)

tm, adj = med(lambda: QuantileDeltaMapping.train(
    ref, hist, group=g, nquantiles=50, kind="+"),
    sync=lambda a: s1(a.ds["af"]))
print(f"train: {tm*1e3:.1f} ms")

ta, out = med(lambda: adj.adjust(hist), sync=s1)
print(f"adjust: {ta*1e3:.1f} ms")

cd = 30 * 365 * 32 * 32
print(f"train+adjust: {(tm+ta)*1e3:.1f} ms -> {cd/(tm+ta)/1e6:.1f}M cd/s")

# decompose adjust internals
from xclim_tpu.sdba.utils import gather_groups, grouped_rank, interp_hat_nodes

table, gid, flat_pos = g.device_adjust_table(hist.time)
xf = jnp.moveaxis(hist.data, hist.time_axis, 0)
q = jnp.asarray(np.asarray(adj.ds["quantiles"], dtype=np.float32))
af = adj.ds["af"]


@jax.jit
def step1(xf):
    gg = gather_groups(xf, table)
    return gg


@jax.jit
def step2(gg):
    g2 = gg.reshape(gg.shape[:2] + (-1,))
    nvalid = jnp.sum(~jnp.isnan(g2), axis=1).astype(jnp.int32)
    return grouped_rank(g2, nvalid)


@jax.jit
def step3(tau, af):
    af2 = af.reshape(af.shape[:2] + (-1,))
    return interp_hat_nodes(tau, q, af2)


gg = step1(xf)
t1, _ = med(lambda: step1(xf), s1)
print(f"  gather_groups: {t1*1e3:.1f} ms  shape={gg.shape}")
tau = step2(gg)
t2, _ = med(lambda: step2(gg), s1)
print(f"  grouped_rank: {t2*1e3:.1f} ms  shape={tau.shape}")
v = step3(tau, af)
t3, _ = med(lambda: step3(tau, af), s1)
print(f"  interp_hat_nodes: {t3*1e3:.1f} ms  shape={v.shape}")
