"""Whole-pipeline jit for index functions.

Every index function in this framework is jax-traceable end-to-end: device
data flows through pure jnp ops while calendars/units/metadata live host-side
in coordinates that never depend on the data. ``climjit`` exploits this to
compile an ENTIRE index pipeline (threshold compare → run scans → segment
reductions → unit scaling) into one XLA program: ClimArray data become traced
arguments, coordinates/attrs/static kwargs become part of the cache key.

This is the structural replacement for the reference's laziness contract
(dask graphs built by xarray, xclim tests' ``assert_lazy``): here "lazy" means
"traced once, fused by XLA" — the cache hit count is observable via
``climjit(...).trace_count`` (the analogue of the reference's laziness
assertions, SURVEY.md §4).
"""

from __future__ import annotations

import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from xclim_tpu.core.calendar import TimeIndex
from xclim_tpu.core.dataarray import ClimArray

__all__ = ["climjit", "climjit_chain"]


#: substrings that identify a backend program-size / compile-capacity
#: failure (the tunnel backend's remote compile service rejects oversized
#: programs with HTTP 413/500; the chip itself with RESOURCE_EXHAUSTED)
_SIZE_ERR_MARKERS = ("remote_compile", "length limit", "413", "500",
                     "RESOURCE_EXHAUSTED", "exceeds the limit",
                     "Ran out of memory")


def _is_compile_capacity_error(e: Exception) -> bool:
    msg = str(e)
    return any(m in msg for m in _SIZE_ERR_MARKERS)


def _coord_fingerprint(coords: dict) -> tuple:
    out = []
    for k in sorted(coords):
        v = coords[k]
        if isinstance(v, TimeIndex):
            h = hashlib.blake2b(v.encode().tobytes(), digest_size=8).hexdigest()
            out.append((k, "time", v.calendar, len(v), h))
        elif isinstance(v, dict):
            # auxiliary metadata coords (e.g. stack_periods' '_stack' handle)
            out.append((k, "aux", hash(repr(sorted(v.keys())))))
        else:
            arr = np.asarray(v)
            h = hashlib.blake2b(arr.tobytes(), digest_size=8).hexdigest()
            out.append((k, str(arr.dtype), arr.shape, h))
    return tuple(out)


def _fingerprint(obj):
    if isinstance(obj, ClimArray):
        return ("ClimArray", obj.dims, tuple(obj.shape), str(obj.dtype),
                _coord_fingerprint(obj.coords),
                tuple(sorted((k, str(v)) for k, v in obj.attrs.items())))
    if isinstance(obj, (int, float, str, bool, type(None))):
        return obj
    if isinstance(obj, (list, tuple)):
        return tuple(_fingerprint(o) for o in obj)
    if isinstance(obj, dict):
        return tuple(sorted((k, _fingerprint(v)) for k, v in obj.items()))
    if isinstance(obj, jnp.ndarray):
        # device arrays are DYNAMIC inputs: fingerprint by shape/dtype only.
        # Hashing by value would pull the buffer through the ~15 MB/s tunnel
        # on every call, and the static-closure treatment would embed it as
        # a program CONSTANT — a (3650, 100, 100) f32 chain input inflated
        # the remote-compile request to ~600 MB and was the real cause of
        # the round-3 fused-chain HTTP 413 / multi-minute stalls.
        return ("jaxarray", str(obj.dtype), tuple(obj.shape))
    arr = np.asarray(obj)
    return ("array", str(arr.dtype), arr.shape,
            hashlib.blake2b(arr.tobytes(), digest_size=8).hexdigest())


def _abstract_proto(fn, args, kwargs):
    """Run `fn` under jax.eval_shape to capture its output structure
    (ClimArray dims/coords/attrs) without executing any device work.

    Returns the output pytree whose ClimArray ``.data`` entries are
    ShapeDtypeStructs (callers only ever ``proto.copy(data=real)``), or
    None if the function is not abstractly traceable (e.g. it branches on
    data values host-side)."""

    def leaves(o, acc):
        if isinstance(o, ClimArray):
            acc.append(o.data)
        elif isinstance(o, jnp.ndarray):
            acc.append(o)
        elif isinstance(o, (list, tuple)):
            for x in o:
                leaves(x, acc)
        elif isinstance(o, dict):
            for x in o.values():
                leaves(x, acc)
        return acc

    datas = leaves(list(args), [])
    datas = leaves(list(kwargs.values()), datas)
    captured = {}

    def shell(ds):
        it = iter(ds)

        def rebuild(o):
            if isinstance(o, ClimArray):
                return ClimArray(next(it), o.dims, o.coords, o.attrs, o.name)
            if isinstance(o, jnp.ndarray):
                return next(it)
            if isinstance(o, (list, tuple)):
                return type(o)(rebuild(x) for x in o)
            if isinstance(o, dict):
                return {k: rebuild(v) for k, v in o.items()}
            return o

        new_args = tuple(rebuild(a) for a in args)
        new_kwargs = {k: rebuild(v) for k, v in kwargs.items()}
        out = fn(*new_args, **new_kwargs)
        captured["out"] = out
        return leaves(out, []) if not isinstance(out, ClimArray) else [out.data]

    try:
        shapes = jax.eval_shape(shell, [jax.ShapeDtypeStruct(d.shape, d.dtype)
                                        for d in datas])
    except Exception:
        return None
    out = captured.get("out")

    # swap the leaked tracers inside the captured structure for inert
    # ShapeDtypeStructs (they are never executed, only replaced by
    # ``proto.copy(data=...)``, but holding dead tracers would trip
    # JAX_CHECK_TRACER_LEAKS)
    shapes_it = iter(shapes if isinstance(shapes, (list, tuple)) else [shapes])

    def strip(o):
        if isinstance(o, ClimArray):
            return ClimArray(next(shapes_it), o.dims, o.coords, o.attrs,
                             o.name)
        if isinstance(o, tuple) and hasattr(o, "_fields"):  # namedtuple
            return type(o)(*(strip(x) for x in o))
        if isinstance(o, (list, tuple)):
            return type(o)(strip(x) for x in o)
        if isinstance(o, dict):
            return {k: strip(v) for k, v in o.items()}
        if hasattr(o, "__jax_array__") or "Tracer" in type(o).__name__ or \
                type(o).__name__ == "ClimDataset":
            # unknown containers / raw tracers: make the caller fall back
            # to the eager proto pass rather than hold dead tracers
            raise TypeError("unstrippable value in output structure")
        return o

    try:
        return strip(out)
    except Exception:
        return None


def climjit(fn, on_capacity_error: str = "eager"):
    """Wrap an index function for whole-pipeline XLA compilation.

    ClimArray arguments are treated as dynamic (their ``data`` is traced);
    everything else — coordinates, attrs, thresholds, freq strings — is
    static and keys the compilation cache.

    ``on_capacity_error``: what to do when the backend rejects the compiled
    program with a size/capacity error — ``"eager"`` (default) reruns the
    pipeline uncompiled (correct, per-op dispatch), ``"raise"`` propagates
    (used by :func:`climjit_chain`, which splits the chain instead).
    """
    cache: dict = {}

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        key = (_fingerprint(args), _fingerprint(kwargs))
        if key not in cache:
            # build a jitted function over the flat list of ClimArray datas
            template_args = args
            template_kwargs = kwargs

            def traced(datas):
                it = iter(datas)

                def rebuild(o):
                    if isinstance(o, ClimArray):
                        return ClimArray(next(it), o.dims, o.coords, o.attrs, o.name)
                    if isinstance(o, jnp.ndarray):
                        return next(it)
                    if isinstance(o, (list, tuple)):
                        return type(o)(rebuild(x) for x in o)
                    if isinstance(o, dict):
                        return {k: rebuild(v) for k, v in o.items()}
                    return o

                new_args = tuple(rebuild(a) for a in template_args)
                new_kwargs = {k: rebuild(v) for k, v in template_kwargs.items()}
                out = fn(*new_args, **new_kwargs)
                if isinstance(out, ClimArray):
                    return out.data
                if isinstance(out, tuple):
                    return tuple(o.data if isinstance(o, ClimArray) else o
                                 for o in out)
                return out

            jitted = jax.jit(traced)
            wrapped.trace_count += 1

            def runner(call_args, call_kwargs):
                datas = []

                def collect(o):
                    if isinstance(o, ClimArray):
                        datas.append(o.data)
                    elif isinstance(o, jnp.ndarray):
                        datas.append(o)
                    elif isinstance(o, (list, tuple)):
                        for x in o:
                            collect(x)
                    elif isinstance(o, dict):
                        for x in o.values():
                            collect(x)

                for a in call_args:
                    collect(a)
                for v in call_kwargs.values():
                    collect(v)
                return jitted(datas)

            # capture the output structure (coords/attrs) under ABSTRACT
            # tracing — no eager execution of the full pipeline (which at
            # e.g. (3650, 512, 512) runs for seconds and can exhaust chip
            # memory since nothing fuses outside jit)
            proto = _abstract_proto(fn, args, kwargs)
            if proto is None:  # not traceable host-side: fall back to eager
                proto = fn(*args, **kwargs)
                cache[key] = (runner, proto)
                return proto
            cache[key] = (runner, proto)
        else:
            runner, proto = cache[key]
        if runner is None:  # previous compile hit a capacity error → eager
            return fn(*args, **kwargs)
        try:
            res = runner(args, kwargs)
        except Exception as e:
            if on_capacity_error != "eager" or \
                    not _is_compile_capacity_error(e):
                raise
            # the backend rejected the fused program (oversized / out of
            # compile capacity): run the pipeline eagerly instead of failing
            # — each op dispatches separately, slower but correct. The cache
            # remembers the demotion so later calls skip the failed compile.
            cache[key] = (None, None)
            return fn(*args, **kwargs)
        if isinstance(proto, ClimArray):
            return proto.copy(data=res)
        if isinstance(proto, tuple):
            return tuple(p.copy(data=r) if isinstance(p, ClimArray) else r
                         for p, r in zip(proto, res))
        return res

    wrapped.trace_count = 0
    return wrapped


def climjit_chain(steps):
    """Compile a LIST of index/indicator calls into as few XLA programs as
    the backend accepts.

    ``steps`` is a sequence of callables sharing one argument signature, each
    returning a ClimArray or tuple of ClimArrays. The whole chain is first
    compiled as ONE program (amortizing the tunnel backend's per-dispatch
    floor across every indicator — the ``--fused`` CLI mode and the fused
    bench chain). If the backend rejects the program with a size/capacity
    error (remote-compile HTTP 413/500, RESOURCE_EXHAUSTED), the chain is
    bisected and each half compiled separately, recursively, down to single
    steps — the largest compilable sub-programs. The partition is remembered,
    so later calls pay no failed compiles.

    This is the program-splitting counterpart of the reference's chained CLI
    (xclim:src/xclim/cli.py:363-389), which runs each indicator as its own
    dask graph; here the split only happens when one fused program is not
    compilable.
    """
    steps = list(steps)
    group_cache: dict = {}
    partition: list = [(0, len(steps))]

    def group_fn(lo, hi):
        if (lo, hi) not in group_cache:
            grp = steps[lo:hi]

            def g(*args, **kwargs):
                outs = []
                for s in grp:
                    o = s(*args, **kwargs)
                    outs.extend(o if isinstance(o, (list, tuple)) else (o,))
                return tuple(outs)

            group_cache[(lo, hi)] = climjit(
                g, on_capacity_error="raise" if hi - lo > 1 else "eager")
        return group_cache[(lo, hi)]

    def wrapped(*args, **kwargs):
        outs = []
        i = 0
        while i < len(partition):
            lo, hi = partition[i]
            try:
                outs.extend(group_fn(lo, hi)(*args, **kwargs))
                i += 1
            except Exception as e:
                if hi - lo == 1 or not _is_compile_capacity_error(e):
                    raise
                group_cache.pop((lo, hi), None)
                mid = (lo + hi) // 2
                partition[i:i + 1] = [(lo, mid), (mid, hi)]
        return tuple(outs)

    wrapped.partition = partition  # observable: how many programs ran
    return wrapped
