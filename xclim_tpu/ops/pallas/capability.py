"""Runtime capability probe + dispatch mode for Pallas/Mosaic kernels.

The reference picks its run-length implementation per-call with a size
heuristic (xclim:src/xclim/indices/run_length.py:33-79, ``use_ufunc``); the
TPU build replaces that with a *capability*-based dispatch: a trivial Mosaic
program is compiled once per process and the result is cached. Backends that
cannot compile Mosaic (CPU, and tunnel backends whose remote compile service
rejects Pallas programs) transparently fall back to the pure-XLA path.

Modes
-----
``mosaic``    compile Pallas kernels for real (probe succeeded)
``interpret`` run Pallas kernels in interpreter mode (tests / debugging)
``off``       pure-XLA path only

Selection: the ``XCLIM_TPU_PALLAS`` env var (``1``/``mosaic``, ``interpret``,
``0``/``off``) wins; otherwise the probe decides between ``mosaic`` and
``off``. :func:`set_pallas_mode` overrides programmatically.
"""

from __future__ import annotations

import os

__all__ = ["pallas_mode", "set_pallas_mode", "mosaic_supported",
           "dispatch_counts"]

_MODE: str | None = None

#: how many spell-statistic calls went through each path this process —
#: read by bench.py so the benchmark records which engine actually ran
dispatch_counts = {"pallas": 0, "xla": 0}


def _probe_mosaic() -> bool:
    """Try to compile + run a trivial Mosaic program once."""
    try:
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl

        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...] + 1.0

        x = jnp.zeros((8, 128), jnp.float32)
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
        return bool(out[0, 0] == 1.0)
    except Exception:
        return False


def pallas_mode() -> str:
    """Resolve (and cache) the Pallas dispatch mode for this process."""
    global _MODE
    if _MODE is not None:
        return _MODE
    env = os.environ.get("XCLIM_TPU_PALLAS", "").lower()
    if env in ("0", "off", "false"):
        _MODE = "off"
    elif env in ("1", "mosaic", "on", "true"):
        _MODE = "mosaic"
    elif env == "interpret":
        _MODE = "interpret"
    else:
        _MODE = "mosaic" if _probe_mosaic() else "off"
    return _MODE


def set_pallas_mode(mode: str | None) -> None:
    """Override the dispatch mode (``None`` re-enables probing)."""
    global _MODE
    if mode is not None and mode not in ("off", "mosaic", "interpret"):
        raise ValueError(f"unknown pallas mode {mode!r}")
    _MODE = mode


def mosaic_supported() -> bool:
    return pallas_mode() != "off"
