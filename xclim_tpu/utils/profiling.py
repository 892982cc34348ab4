"""Profiling helpers around the JAX profiler.

The reference's observability is the dask dashboard (xclim:cli.py:471-474);
on TPU the equivalents are XLA profiler traces (viewable in TensorBoard /
Perfetto) and simple synchronized wall-clock timing.
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["profile", "timed"]


@contextlib.contextmanager
def profile(logdir: str = "/tmp/xclim_tpu_trace"):
    """Capture a JAX/XLA profiler trace of the enclosed block.

    View with ``tensorboard --logdir <logdir>`` or upload the ``.trace.json``
    to Perfetto.
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "block", sync=None):
    """Synchronized wall-clock timing: blocks on `sync` (a jax array or a
    callable producing one) before stopping the clock, so async dispatch
    does not fake speed."""
    import jax

    t0 = time.perf_counter()
    holder = {}
    try:
        yield holder
    finally:
        out = holder.get("sync", sync)
        if callable(out):
            out = out()
        if out is not None:
            jax.block_until_ready(out)
        holder["seconds"] = time.perf_counter() - t0
        print(f"[xclim_tpu] {label}: {holder['seconds']:.3f}s")
