import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from xclim_tpu import climjit, indices
from xclim_tpu.core.calendar import date_range
from xclim_tpu.core.dataarray import ClimArray

t = date_range("2000-01-01", periods=3650, freq="D", calendar="noleap")
def mk(shape):
    v = jax.random.normal(jax.random.PRNGKey(0), shape) * 5 + 285.0
    coords = {"time": t, "lat": np.arange(shape[1]), "lon": np.arange(shape[2])}
    return ClimArray(v, ("time","lat","lon"), coords, {"units":"K"}, "tas")

def sync(o):
    d = o.data if hasattr(o, "data") else o
    return float(jnp.ravel(d)[0])

def timeit(f, *a, n=5, **k):
    r = f(*a, **k); sync(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); r = f(*a, **k); sync(r)
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts)//2]

for size in (64, 256):
    tas = mk((3650, size, size))
    sync(tas)
    f = climjit(indices.tg_mean)
    mn, med = timeit(f, tas, freq="MS")
    print(f"tg_mean {size}x{size}: min {mn*1e3:.1f} ms median {med*1e3:.1f} ms -> {3650*size*size/med/1e6:.1f}M cd/s")

# floor: what does a trivial jitted op cost round-trip?
x = jnp.zeros((8,128))
g = jax.jit(lambda a: a + 1)
mn, med = timeit(g, x)
print(f"trivial dispatch floor: min {mn*1e3:.1f} ms median {med*1e3:.1f} ms")

# pure segment-reduce (the underlying kernel) on same data
from xclim_tpu.core.calendar import resample_segments
from xclim_tpu.ops.segments import segment_reduce
spec = resample_segments(t, "MS")
tas = mk((3650, 64, 64))
@jax.jit
def raw(x):
    return segment_reduce(x, spec, "mean", axis=0)
mn, med = timeit(raw, tas.data)
print(f"raw segment mean 64x64: min {mn*1e3:.1f} ms median {med*1e3:.1f} ms -> {3650*64*64/med/1e6:.1f}M cd/s")
