"""Probe the chip: device kind, memcpy roofline, sort throughput by layout.

Answers VERDICT round-2 item #2: "Without a memcpy-roofline number, 4.65x is
unjudgeable." Run: python tools/probe_roofline.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def med(call, sync, reps=5):
    r = call(); sync(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); r = call(); sync(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def s1(r):
    return float(jnp.ravel(r if not isinstance(r, tuple) else r[0])[0])


def main():
    d = jax.devices()[0]
    out = {"device_kind": d.device_kind, "platform": d.platform}
    try:
        out["memory_stats"] = {k: v for k, v in (d.memory_stats() or {}).items()
                               if "bytes_limit" in k or "largest" in k}
    except Exception:
        pass
    print(json.dumps(out))

    # --- memcpy roofline: y = x + 1 (read N + write N) at several sizes ---
    for shape in [(3650, 512, 512), (8192, 8192), (30, 365, 1024),
                  (365, 930, 1024)]:
        n = int(np.prod(shape))
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
        x.block_until_ready()
        f = jax.jit(lambda a: a + 1.0)
        t = med(lambda: f(x), s1)
        gbs = 2 * n * 4 / t / 1e9
        print(json.dumps({"probe": "saxpy r+w", "shape": shape,
                          "ms": round(t * 1e3, 2), "GBs": round(gbs, 1)}))
        # donated variant (in-place update possible)
        fd = jax.jit(lambda a: a + 1.0, donate_argnums=0)
        y = fd(x)
        s1(y)
        t0 = time.perf_counter()
        for _ in range(5):
            y = fd(y)
        s1(y)
        t = (time.perf_counter() - t0) / 5
        print(json.dumps({"probe": "saxpy donated", "shape": shape,
                          "ms": round(t * 1e3, 2),
                          "GBs": round(2 * n * 4 / t / 1e9, 1)}))
        del y

    # --- reduce-only (read N, write N/3650) ---
    x = jax.random.normal(jax.random.PRNGKey(0), (3650, 512, 512))
    x.block_until_ready()
    f = jax.jit(lambda a: a.sum(axis=0))
    t = med(lambda: f(x), s1)
    print(json.dumps({"probe": "sum axis0 (3650,512,512)",
                      "ms": round(t * 1e3, 2),
                      "read_GBs": round(x.size * 4 / t / 1e9, 1)}))
    f = jax.jit(lambda a: a.sum(axis=(1, 2)))
    t = med(lambda: f(x), s1)
    print(json.dumps({"probe": "sum axis12 (3650,512,512)",
                      "ms": round(t * 1e3, 2),
                      "read_GBs": round(x.size * 4 / t / 1e9, 1)}))
    del x

    # --- sort layouts for the QDM shape ---
    for shape, axis in [((365, 930, 1024), 1), ((365, 1024, 930), 2),
                        ((930, 365 * 1024), 0), ((365 * 1024, 930), 1),
                        ((365, 30, 1024), 1), ((365, 1024, 30), 2),
                        ((30, 365, 1024), 0)]:
        x = jax.random.normal(jax.random.PRNGKey(1), shape)
        x.block_until_ready()
        f = jax.jit(lambda a: jnp.sort(a, axis=axis))
        try:
            t = med(lambda: f(x), s1)
            n = int(np.prod(shape))
            print(json.dumps({"probe": "sort", "shape": shape, "axis": axis,
                              "ms": round(t * 1e3, 2),
                              "Melem/s": round(n / t / 1e6, 1)}))
        except Exception as e:
            print(json.dumps({"probe": "sort", "shape": shape, "axis": axis,
                              "error": str(e)[:100]}))
        del x

    # --- top_k on realization axis (ensembles: 30 members) ---
    x = jax.random.normal(jax.random.PRNGKey(2), (365 * 128 * 256, 30))
    x.block_until_ready()
    f = jax.jit(lambda a: jnp.sort(a, axis=-1))
    t = med(lambda: f(x), s1)
    print(json.dumps({"probe": "sort ens (N,30) axis-1",
                      "ms": round(t * 1e3, 2),
                      "GBs_rw": round(2 * x.size * 4 / t / 1e9, 1)}))
    x2 = x.reshape(365, 128, 256, 30)
    f = jax.jit(lambda a: jnp.sort(a, axis=0))
    xt = jnp.moveaxis(x2, 3, 0)
    xt.block_until_ready()
    t = med(lambda: f(xt), s1)
    print(json.dumps({"probe": "sort ens (30,...) axis0",
                      "ms": round(t * 1e3, 2),
                      "GBs_rw": round(2 * x.size * 4 / t / 1e9, 1)}))


if __name__ == "__main__":
    main()
