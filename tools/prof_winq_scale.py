"""How does the winquantile train kernel scale with cell count?

Round-4 verdict #3: QDM at 1024 cells is 0.92x while 16k is 13.1x — a
~0.4 s cell-count-independent fixed cost. This probe times
doy_window_quantiles alone (the train kernel) across C, amortizing the
tunnel dispatch floor (K back-to-back dispatches, one sync).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from xclim_tpu.ops.pallas.winquantile import (doy_window_quantiles,
                                              doy_window_quantiles_xla)

Y = 30
NDOY = 365
Q = np.linspace(0, 1, 50)


def sync(r):
    # scalar FETCH: block_until_ready alone does not round-trip on the
    # tunnel backend (bench.py _sync_scalar)
    return float(jnp.ravel(r)[0])


def med_k(call, k=4, reps=3):
    sync(call())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rs = [call() for _ in range(k)]
        sync(rs[-1])
        ts.append((time.perf_counter() - t0) / k)
    return float(np.median(ts))


for C in (128, 512, 1024, 4096, 16384):
    x = jax.random.normal(jax.random.PRNGKey(0), (NDOY, Y, C), jnp.float32)
    x.block_until_ready()
    f = jax.jit(lambda a: doy_window_quantiles(a, Q, 31))
    t = med_k(lambda: f(x))
    fx = jax.jit(lambda a: doy_window_quantiles_xla(a, Q, 31))
    try:
        tx = med_k(lambda: fx(x), k=2, reps=2)
    except Exception as e:
        tx = float("nan")
    cd = NDOY * Y * C
    print(f"C={C:6d}: pallas {t*1e3:8.1f} ms ({cd/t/1e6:7.1f}M cd/s)   "
          f"xla {tx*1e3:8.1f} ms ({cd/tx/1e6:7.1f}M cd/s)", flush=True)
