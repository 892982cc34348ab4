"""Where does the segment-mean bandwidth go? Chain-dispatch timing with
per-launch overhead measured and subtracted; skipna on/off to isolate the
NaN-masking VPU cost (round-5, VERDICT r4 #5)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from xclim_tpu.core.calendar import date_range, resample_segments
from xclim_tpu.ops.segments import segment_reduce


def sync(r):
    return float(jnp.ravel(r)[0])


def med(call, reps=3):
    sync(call())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); r = call(); sync(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


K = 8
shape = (3650, 512, 512)
N = int(np.prod(shape)) * 4
x = jax.random.normal(jax.random.PRNGKey(9), shape)
sync(x)
t = date_range("2000-01-01", periods=3650, freq="D", calendar="noleap")
spec = resample_segments(t, "MS")

tiny = jnp.zeros((8, 128), jnp.float32)
triv = jax.jit(lambda a: a * jnp.float32(1.000001))
t1 = med(lambda: triv(tiny))


def chain(f, arg):
    def run():
        rs = [f(arg) for _ in range(K)]
        return rs[-1]
    return run


tk = med(chain(triv, tiny))
launch = max((tk - t1) / 1.0 / K, 0.0)  # per-dispatch incl. amortized floor
print(f"trivial: 1-shot {t1*1e3:.1f} ms, chain/K {tk/K*1e3:.1f} ms")

copy = jax.jit(lambda a: a * jnp.float32(1.0000001))
copy_d = jax.jit(lambda a: a * jnp.float32(1.0000001), donate_argnums=0)


def copy_k():
    r = copy(x)
    for _ in range(K - 1):
        r = copy_d(r)
    return r


ck = med(copy_k) / K
print(f"copy: chain/K {ck*1e3:.1f} ms -> raw {2*N/ck/1e9:.0f} GB/s, "
      f"minus launch {2*N/max(ck - tk/K, 1e-9)/1e9:.0f} GB/s")

for skipna in (True, False):
    red = jax.jit(lambda a, s=skipna: segment_reduce(a, spec, "mean",
                                                     axis=0, skipna=s))
    rk = med(chain(red, x)) / K
    print(f"segment mean skipna={skipna}: chain/K {rk*1e3:.1f} ms -> raw "
          f"{N/rk/1e9:.0f} GB/s, minus launch "
          f"{N/max(rk - tk/K, 1e-9)/1e9:.0f} GB/s")

# sum instead of mean (no divide) and max (single op) for op-cost ladder
for op in ("sum", "max"):
    red = jax.jit(lambda a, o=op: segment_reduce(a, spec, o, axis=0))
    rk = med(chain(red, x)) / K
    print(f"segment {op} skipna=True: chain/K {rk*1e3:.1f} ms -> "
          f"minus launch {N/max(rk - tk/K, 1e-9)/1e9:.0f} GB/s")
