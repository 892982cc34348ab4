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
           "winquantile_supported", "winquantile_state",
           "set_winquantile_state", "segred_supported",
           "axisquantile_supported", "axisquantile_state",
           "set_axisquantile_state", "qdmadjust_supported",
           "spell_engine", "set_spell_engine", "dispatch_counts"]

_MODE: str | None = None

_SPELL_ENGINE: str | None = None


def spell_engine() -> str:
    """Which engine serves spell statistics / threshold counts.

    ``"xla"`` (default): the pure-XLA path on the slice-unroll segment
    engine — the measured round-4 winner on v5e (tx_days_above 448x448
    10y: XLA 45.8 ms vs Pallas 64.1 ms median, BENCH_DETAIL.json "spells
    engine A/B"), and the one that keeps fused multi-indicator chains free
    of Mosaic payloads (each embedded Mosaic kernel adds megabytes to the
    program the tunnel backend must accept — the round-3 fused-chain
    HTTP 413).

    ``"pallas"``: route through the fused Mosaic spell kernel (requires the
    capability probe to pass). Select with ``XCLIM_TPU_SPELLS=pallas`` or
    :func:`set_spell_engine`.
    """
    global _SPELL_ENGINE
    if _SPELL_ENGINE is not None:
        return _SPELL_ENGINE
    env = os.environ.get("XCLIM_TPU_SPELLS", "").lower()
    _SPELL_ENGINE = "pallas" if env in ("pallas", "1", "mosaic") else "xla"
    return _SPELL_ENGINE


def set_spell_engine(mode: str | None) -> None:
    """Override the spell engine (``None`` re-reads the env var)."""
    global _SPELL_ENGINE
    if mode is not None and mode not in ("xla", "pallas"):
        raise ValueError(f"unknown spell engine {mode!r}")
    _SPELL_ENGINE = mode

_PROBE_TRIES = 3  # tunnel remote-compile HTTP 500s are transient; retry
_PROBE_BACKOFF_S = 5.0  # per-attempt backoff factor (tests zero this)


def _retry_probe(fn) -> bool:
    """Run a probe body up to ``_PROBE_TRIES`` times, with a short pause
    between attempts.

    A flaky remote compile must not silently demote the whole process to the
    XLA fallback paths (round 3: one transient HTTP 500 during the
    winquantile probe sent the 16k-cell QDM config into the fallback's
    23.7 GB windowed gather and OOMed the chip; round 4: two consecutive
    failures during a driver bench run flipped the whole sweep to ``off``)."""
    import time

    last = False
    for i in range(_PROBE_TRIES):
        if i:
            time.sleep(_PROBE_BACKOFF_S * i)  # let a transient error clear
        try:
            last = bool(fn())
        except Exception:
            last = False
        if last:
            return True
    return last

#: how many spell-statistic calls went through each path this process —
#: read by bench.py so the benchmark records which engine actually ran
dispatch_counts = {"pallas": 0, "xla": 0}

#: winquantile (sdba train) routing — its own counter so QDM traffic does
#: not masquerade as spell-engine traffic in the bench artifact
wq_dispatch_counts = {"pallas": 0, "xla": 0}


def _probe_cache_path() -> str | None:
    """Disk marker for a successful probe, keyed by backend identity.

    The tunnel backend's remote Mosaic compile takes minutes and fails
    transiently (HTTP 500s); a past success in the same environment is the
    best predictor, so one good probe is remembered across processes.
    Failures are NOT cached — a flaky compile retries next process."""
    try:
        import jax

        key = (jax.default_backend(),
               os.environ.get("PALLAS_AXON_TPU_GEN", ""),
               os.environ.get("PALLAS_AXON_REMOTE_COMPILE", ""))
        base = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))))),
            ".jax_cache")
        os.makedirs(base, exist_ok=True)
        return os.path.join(base, "pallas_ok_" + "_".join(
            k.replace("/", "-") or "x" for k in key))
    except Exception:
        return None


def _probe_mosaic() -> bool:
    """Try to compile + run the REAL spell kernel at a tiny shape.

    A trivial add-one kernel is not representative: the axon tunnel backend's
    remote Mosaic AOT helper compiled it while rejecting the production
    kernel (e.g. `jnp.isnan` inside the kernel crashed it — found by
    bisection). Probing the actual kernel guarantees dispatch only claims
    what the backend can deliver. Runtime dispatch still falls back to XLA
    if a later Pallas call fails (see generic._pallas_threshold_count)."""
    marker = _probe_cache_path()
    if marker and os.path.exists(marker):
        return True

    def body():
        import numpy as np

        from xclim_tpu.core.calendar import date_range, resample_segments
        from xclim_tpu.ops.pallas.spells import fused_spell_stats

        t = date_range("2000-01-01", periods=16, freq="D", calendar="noleap")
        spec = resample_segments(t, "8D")
        x = np.ones((16, 128), np.float32)
        x[3:5, :] = np.nan
        cnt, _, _, _ = fused_spell_stats(x, spec, thresh=0.5, window=2,
                                         op=">")
        return bool(np.asarray(cnt)[0, 0] == 6.0)  # 8 days − 2 NaN

    ok = _retry_probe(body)
    if ok and marker:
        with open(marker, "w") as f:
            f.write("ok\n")
    return ok


_WQ_STATE: str | None = None  # "yes" | "no" | "attempt"


def _probe_winquantile() -> str:
    """Compile + run the windowed-quantile kernel at a tiny shape (its own
    probe: the spell kernel compiling does not imply this one does — the
    remote Mosaic helper accepts/rejects per-program).

    Tri-state result (round-5 fix for the silently-slow QDM 1k row: a
    transient tunnel failure during this probe demoted the whole process to
    the XLA fallback, 565 ms vs 70 ms train at 1024 cells):

    - ``"yes"``  — compiled, ran, and matched the XLA oracle;
    - ``"no"``   — ran but MISMATCHED the oracle (correctness: hard off);
    - ``"attempt"`` — every try raised (transient tunnel HTTP 500 /
      timeout): the caller should attempt the real kernel and fall back to
      XLA at runtime if the production compile also fails.
    """
    marker = _probe_cache_path()
    marker = marker + "_wq" if marker else None
    if marker and os.path.exists(marker):
        return "yes"

    raised = [0]

    def body():
        import numpy as np

        from xclim_tpu.ops.pallas.winquantile import (
            doy_window_quantiles, doy_window_quantiles_xla)

        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (20, 4, 8)).astype(np.float32)
        x[1, 2, 3] = np.nan
        q = np.array([0.1, 0.9], np.float32)
        try:
            a = np.asarray(doy_window_quantiles(x, q, 5, db=8))
        except Exception:
            raised[0] += 1
            raise
        b = np.asarray(doy_window_quantiles_xla(x, q, 5))
        return bool(np.allclose(a, b, rtol=1e-5, atol=1e-5, equal_nan=True))

    ok = _retry_probe(body)
    if ok:
        if marker:
            with open(marker, "w") as f:
                f.write("ok\n")
        return "yes"
    # every attempt raised (nothing ever ran) → transient; a completed run
    # with wrong numbers → hard off
    return "attempt" if raised[0] >= _PROBE_TRIES else "no"


def winquantile_state() -> str:
    """Tri-state dispatch decision for the windowed-quantile kernel:
    ``"yes"`` (probe-verified), ``"no"`` (unavailable or numerically
    wrong), ``"attempt"`` (probe only failed transiently — try the real
    kernel, fall back at runtime)."""
    global _WQ_STATE
    if _WQ_STATE is None:
        mode = pallas_mode()
        if mode == "off":
            _WQ_STATE = "no"
        elif mode == "interpret":
            _WQ_STATE = "no"  # interpret is for kernel tests, too slow to serve
        else:
            _WQ_STATE = _probe_winquantile()
    return _WQ_STATE


def set_winquantile_state(state: str | None) -> None:
    """Override the winquantile dispatch (``None`` re-probes next call);
    used by the sdba train path when an optimistic attempt fails."""
    global _WQ_STATE
    if state is not None and state not in ("yes", "no", "attempt"):
        raise ValueError(f"unknown winquantile state {state!r}")
    _WQ_STATE = state


def winquantile_supported() -> bool:
    """Whether the Pallas windowed-quantile kernel serves this process."""
    return winquantile_state() == "yes"


_SR_OK: bool | None = None


def _probe_segred() -> bool:
    """Compile + run the one-pass segment-reduce kernel at a tiny shape and
    check it against the XLA gather path (own probe — the remote Mosaic
    helper accepts/rejects per-program)."""
    marker = _probe_cache_path()
    marker = marker + "_sr" if marker else None
    if marker and os.path.exists(marker):
        return True

    def body():
        import numpy as np

        from xclim_tpu.core.calendar import date_range, resample_segments
        from xclim_tpu.ops.pallas.segred import segment_reduce_onepass

        t = date_range("2000-01-01", periods=20, freq="D", calendar="noleap")
        spec = resample_segments(t, "10D")
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (20, 16)).astype(np.float32)
        x[3:5, 2] = np.nan
        x[:10, 0] = np.nan  # one all-NaN segment lane
        oks = []
        for op in ("mean", "max", "std"):
            a = np.asarray(segment_reduce_onepass(x, spec, op))
            from xclim_tpu.ops.segments import segment_reduce as _xla_sr

            b = np.asarray(_xla_sr(x, spec, op, axis=0, _no_pallas=True))
            oks.append(np.allclose(a, b, rtol=1e-5, atol=1e-5,
                                   equal_nan=True))
        return all(bool(v) for v in oks)

    ok = _retry_probe(body)
    if ok and marker:
        with open(marker, "w") as f:
            f.write("ok\n")
    return ok


def segred_supported() -> bool:
    """Whether the Pallas one-pass segment-reduce serves this process."""
    global _SR_OK
    if _SR_OK is None:
        mode = pallas_mode()
        if mode == "off":
            _SR_OK = False
        elif mode == "interpret":
            _SR_OK = False
        else:
            _SR_OK = _probe_segred()
    return _SR_OK


_AQ_OK: str | None = None  # "yes" | "no" | "attempt"


def _probe_axisquantile() -> str:
    """Compile + run the small-axis quantile kernel at a tiny shape against
    the XLA nan_quantile path (own probe — the remote Mosaic helper
    accepts/rejects per-program).

    Tri-state like :func:`_probe_winquantile` (round-5 fix for the silently
    2x-slower saturated-ensembles row: a transient tunnel failure during
    this probe demoted the whole process to the sorting-network path):
    ``"yes"`` verified / ``"no"`` mismatched oracle / ``"attempt"`` every
    try raised (transient — the runtime path has its own retry + demote).
    """
    marker = _probe_cache_path()
    marker = marker + "_aq" if marker else None
    if marker and os.path.exists(marker):
        return "yes"

    raised = [0]

    def body():
        import numpy as np

        from xclim_tpu.ops.pallas.axisquantile import axis_quantile_small
        from xclim_tpu.ops.quantile import nan_quantile

        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (13, 24)).astype(np.float32)
        x[3:5, 2] = np.nan
        x[:, 0] = np.nan  # one all-NaN lane
        q = np.array([0.1, 0.5, 0.9])
        oks = []
        for ab in ((1.0, 1.0), (1 / 3, 1 / 3)):
            try:
                a = np.asarray(axis_quantile_small(x, q,
                                                   alpha=ab[0], beta=ab[1]))
            except Exception:
                raised[0] += 1
                raise
            b = np.asarray(nan_quantile(x, np.asarray(q, np.float32), axis=0,
                                        alpha=ab[0], beta=ab[1],
                                        _no_pallas=True))
            oks.append(np.allclose(a, b, rtol=1e-5, atol=1e-5,
                                   equal_nan=True))
        return all(bool(v) for v in oks)

    ok = _retry_probe(body)
    if ok:
        if marker:
            with open(marker, "w") as f:
                f.write("ok\n")
        return "yes"
    return "attempt" if raised[0] >= _PROBE_TRIES else "no"


_QA_OK: bool | None = None


def _probe_qdmadjust() -> bool:
    """Compile + run the fused QDM-adjust kernel at a tiny shape against the
    XLA rank+interp path."""
    marker = _probe_cache_path()
    marker = marker + "_qa" if marker else None
    if marker and os.path.exists(marker):
        return True

    def body():
        import jax.numpy as jnp
        import numpy as np

        from xclim_tpu.ops.pallas.qdmadjust import qdm_adjust_doy
        from xclim_tpu.sdba.utils import grouped_rank, interp_hat_nodes

        rng = np.random.default_rng(0)
        G, Y, C = 4, 10, 24
        q = np.linspace(0.05, 0.95, 7).astype(np.float32)
        xd = rng.normal(5, 3, (G, Y, C)).astype(np.float32)
        xd[1, 3:5, 2] = np.nan
        xd[:, :, 0] = np.nan
        af = np.sort(rng.normal(0, 2, (G, 7, C)).astype(np.float32), axis=1)
        got = np.asarray(qdm_adjust_doy(xd, af, q, kind="+"))
        gj = jnp.asarray(xd)
        nv = jnp.sum(~jnp.isnan(gj), axis=1).astype(jnp.int32)
        af_v = interp_hat_nodes(grouped_rank(gj, nv), jnp.asarray(q),
                                jnp.asarray(af))
        exp = np.asarray(gj + af_v)
        return bool((np.isnan(got) == np.isnan(exp)).all() and np.allclose(
            got[~np.isnan(exp)], exp[~np.isnan(exp)], rtol=1e-4, atol=1e-4))

    ok = _retry_probe(body)
    if ok and marker:
        with open(marker, "w") as f:
            f.write("ok\n")
    return ok


def qdmadjust_supported() -> bool:
    """Whether the fused QDM-adjust kernel serves this process."""
    global _QA_OK
    if _QA_OK is None:
        mode = pallas_mode()
        if mode in ("off", "interpret"):
            _QA_OK = False
        else:
            _QA_OK = _probe_qdmadjust()
    return _QA_OK


def axisquantile_state() -> str:
    """Tri-state dispatch decision for the small-axis quantile kernel:
    ``"yes"`` (probe-verified), ``"no"`` (unavailable or numerically
    wrong), ``"attempt"`` (probe only failed transiently — try the real
    kernel; its runtime path retries and demotes on failure)."""
    global _AQ_OK
    if _AQ_OK is None:
        mode = pallas_mode()
        if mode in ("off", "interpret"):
            _AQ_OK = "no"
        else:
            _AQ_OK = _probe_axisquantile()
    return _AQ_OK


def set_axisquantile_state(state: str | None) -> None:
    """Override the axisquantile dispatch (``None`` re-probes next call)."""
    global _AQ_OK
    if state is not None and state not in ("yes", "no", "attempt"):
        raise ValueError(f"unknown axisquantile state {state!r}")
    _AQ_OK = state


def axisquantile_supported() -> bool:
    """Whether the Pallas small-axis quantile kernel serves this process."""
    return axisquantile_state() == "yes"


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
    global _MODE, _WQ_OK, _SR_OK, _AQ_OK, _QA_OK
    if mode is not None and mode not in ("off", "mosaic", "interpret"):
        raise ValueError(f"unknown pallas mode {mode!r}")
    _MODE = mode
    _WQ_OK = None
    _SR_OK = None
    _AQ_OK = None
    _QA_OK = None


def mosaic_supported() -> bool:
    return pallas_mode() != "off"
