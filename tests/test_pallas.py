"""Pallas fused spell kernel + capability dispatch.

Kernel correctness runs in interpret mode on CPU (compiled Mosaic on capable
TPU backends); the dispatch layer is exercised end-to-end by forcing
``set_pallas_mode("interpret")`` and comparing full indicator outputs against
the pure-XLA path.
"""

import operator

import numpy as np
import pytest
import jax.numpy as jnp

from xclim_tpu.core.calendar import date_range, resample_segments
from xclim_tpu.ops import runlength as rl
from xclim_tpu.ops.pallas.capability import pallas_mode, set_pallas_mode
from xclim_tpu.ops.pallas.spells import fused_spell_stats
from xclim_tpu.ops.segments import segment_reduce

OPS = {">": operator.gt, ">=": operator.ge, "<": operator.lt,
       "<=": operator.le}


@pytest.fixture(autouse=True)
def _xla_reference_mode():
    """Force the XLA path while building references, restore after.

    Spell dispatch defaults to the XLA engine since round 4 (it won the
    on-chip A/B); these tests exercise the Pallas kernels explicitly, so
    the engine preference is overridden for the module."""
    from xclim_tpu.ops.pallas.capability import set_spell_engine

    set_pallas_mode("off")
    set_spell_engine("pallas")
    yield
    set_pallas_mode("off")
    set_spell_engine(None)


def _reference(x, spec, thresh, window, op):
    b = OPS[op](jnp.asarray(x), thresh)
    b = jnp.where(jnp.isnan(x), False, b)
    return (segment_reduce(b.astype(jnp.float32), spec, "sum"),
            rl.windowed_run_count(b, window, spec=spec),
            rl.windowed_run_events(b, window, spec=spec),
            rl.longest_run(b, spec=spec))


def _check(x, spec, thresh, window, op):
    cnt, wrc, wre, lng = fused_spell_stats(x, spec, thresh=thresh,
                                           window=window, op=op,
                                           interpret=True)
    ref = _reference(x, spec, thresh, window, op)
    for got, want, name in zip((cnt, wrc, wre, lng), ref,
                               ("cnt", "wrc", "wre", "lng")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   err_msg=name)


class TestFusedKernel:
    @pytest.mark.parametrize("op", [">", ">=", "<", "<="])
    @pytest.mark.parametrize("window", [1, 3])
    def test_all_ops_windows(self, op, window):
        rng = np.random.default_rng(1)
        t = date_range("2000-01-01", periods=730, freq="D")
        spec = resample_segments(t, "MS")
        x = rng.normal(25, 8, (730, 40)).astype(np.float32)
        x[3, 7] = np.nan
        _check(x, spec, 25.0, window, op)

    def test_multiblock_lanes(self):
        # >128 lanes → several grid blocks, plus padding in the last one
        rng = np.random.default_rng(2)
        t = date_range("2000-01-01", periods=365, freq="D")
        spec = resample_segments(t, "MS")
        x = rng.normal(25, 8, (365, 300)).astype(np.float32)
        _check(x, spec, 25.0, 3, ">")

    def test_nan_patterns(self):
        t = date_range("2000-01-01", periods=365, freq="D")
        spec = resample_segments(t, "YS")
        x = np.full((365, 4), 30.0, dtype=np.float32)
        x[:, 0] = np.nan                   # all-NaN lane
        x[::2, 1] = np.nan                 # alternating NaN
        x[100:110, 2] = np.nan             # NaN hole inside a long run
        _check(x, spec, 25.0, 3, ">")

    def test_segment_boundary_run_split(self):
        # a 10-day run straddling Jan|Feb must split 5/5 per month
        t = date_range("2001-01-01", periods=90, freq="D")
        spec = resample_segments(t, "MS")
        x = np.zeros((90, 1), dtype=np.float32)
        x[26:36, 0] = 30.0  # Jan 27–31 (5d) + Feb 1–5 (5d)
        cnt, wrc, wre, lng = fused_spell_stats(x, spec, thresh=25.0, window=3,
                                               op=">", interpret=True)
        np.testing.assert_array_equal(np.asarray(lng)[:, 0], [5, 5, 0])
        np.testing.assert_array_equal(np.asarray(wre)[:, 0], [1, 1, 0])
        np.testing.assert_array_equal(np.asarray(wrc)[:, 0], [5, 5, 0])
        _check(x, spec, 25.0, 3, ">")

    def test_run_shorter_than_window_ignored(self):
        t = date_range("2001-01-01", periods=31, freq="D")
        spec = resample_segments(t, "MS")
        x = np.zeros((31, 1), dtype=np.float32)
        x[5:7, 0] = 30.0  # 2-day run < window=3
        cnt, wrc, wre, lng = fused_spell_stats(x, spec, thresh=25.0, window=3,
                                               op=">", interpret=True)
        assert np.asarray(cnt)[0, 0] == 2
        assert np.asarray(wrc)[0, 0] == 0
        assert np.asarray(wre)[0, 0] == 0
        assert np.asarray(lng)[0, 0] == 2


class TestDispatch:
    """Indicators must produce identical results through the Pallas and XLA
    paths (VERDICT r1 #2: capability-based dual-path dispatch; precedent is
    the reference's use_ufunc, xclim:run_length.py:33-79)."""

    def _tasmax(self, nd=2):
        from xclim_tpu.core.dataarray import ClimArray

        rng = np.random.default_rng(3)
        t = date_range("2000-01-01", periods=730, freq="D")
        shape = (730,) if nd == 1 else (730, 3, 5)
        v = rng.normal(297, 8, shape).astype(np.float32)
        v.reshape(730, -1)[10, 0] = np.nan
        dims = ("time",) if nd == 1 else ("time", "lat", "lon")
        coords = {"time": t}
        if nd > 1:
            coords["lat"] = np.arange(3)
            coords["lon"] = np.arange(5)
        return ClimArray(jnp.asarray(v), dims, coords, {"units": "K"},
                         "tasmax")

    @pytest.mark.parametrize("indicator,kw", [
        ("tx_days_above", {"thresh": "300 K"}),
        ("hot_spell_frequency", {"thresh": "300 K", "window": 3}),
        ("hot_spell_max_length", {"thresh": "300 K", "window": 3}),
        ("hot_spell_total_length", {"thresh": "300 K", "window": 3}),
        ("heat_wave_index", {"thresh": "300 K", "window": 5}),
    ])
    @pytest.mark.parametrize("nd", [1, 2])
    def test_indicator_both_paths(self, indicator, kw, nd):
        import xclim_tpu.indices as xi

        fn = getattr(xi, indicator)
        da = self._tasmax(nd)
        set_pallas_mode("off")
        ref = np.asarray(fn(da, freq="MS", **kw).data)
        set_pallas_mode("interpret")
        got = np.asarray(fn(da, freq="MS", **kw).data)
        np.testing.assert_allclose(got, ref, err_msg=indicator)

    def test_dispatch_counts_recorded(self):
        from xclim_tpu.ops.pallas.capability import dispatch_counts
        import xclim_tpu.indices as xi

        da = self._tasmax(1)
        set_pallas_mode("interpret")
        before = dispatch_counts["pallas"]
        xi.tx_days_above(da, thresh="300 K", freq="YS")
        assert dispatch_counts["pallas"] > before

    def test_mode_off_uses_xla(self):
        from xclim_tpu.ops.pallas import capability

        set_pallas_mode("off")
        assert capability.pallas_mode() == "off"

    def test_env_override(self, monkeypatch):
        from xclim_tpu.ops.pallas import capability

        set_pallas_mode(None)
        monkeypatch.setenv("XCLIM_TPU_PALLAS", "interpret")
        assert capability.pallas_mode() == "interpret"
        set_pallas_mode(None)
        monkeypatch.setenv("XCLIM_TPU_PALLAS", "0")
        assert capability.pallas_mode() == "off"

    def test_probe_on_cpu_is_off(self, monkeypatch):
        from xclim_tpu.ops.pallas import capability

        set_pallas_mode(None)
        monkeypatch.delenv("XCLIM_TPU_PALLAS", raising=False)
        assert capability.pallas_mode() == "off"  # CPU can't compile Mosaic


class TestWinquantileTriState:
    """Round-5: a transient probe failure must not silently demote sdba
    training to the XLA fallback (BENCH r4 "QDM 1k" was 8x slow from
    exactly this). The probe is tri-state; "attempt" makes the train caller
    try the real kernel and retrace without it on failure."""

    def _reset(self):
        from xclim_tpu.ops.pallas.capability import (set_pallas_mode,
                                                     set_winquantile_state)

        set_pallas_mode(None)
        set_winquantile_state(None)

    def test_transient_probe_failure_yields_attempt(self, monkeypatch):
        from xclim_tpu.ops.pallas import capability

        self._reset()
        monkeypatch.setattr(capability, "pallas_mode", lambda: "mosaic")
        monkeypatch.setattr(capability, "_PROBE_TRIES", 2)

        def boom(*a, **k):
            raise RuntimeError("HTTP 500: transient remote-compile error")

        import xclim_tpu.ops.pallas.winquantile as wq
        monkeypatch.setattr(wq, "doy_window_quantiles", boom)
        # avoid marker short-circuit
        monkeypatch.setattr(capability, "_probe_cache_path", lambda: None)
        assert capability.winquantile_state() == "attempt"
        self._reset()

    def test_numeric_mismatch_yields_no(self, monkeypatch):
        import numpy as np

        from xclim_tpu.ops.pallas import capability

        self._reset()
        monkeypatch.setattr(capability, "pallas_mode", lambda: "mosaic")
        monkeypatch.setattr(capability, "_PROBE_TRIES", 2)

        import xclim_tpu.ops.pallas.winquantile as wq
        monkeypatch.setattr(
            wq, "doy_window_quantiles",
            lambda x, q, w, **k: np.full((x.shape[0], len(q), x.shape[2]),
                                         123.0, np.float32))
        monkeypatch.setattr(capability, "_probe_cache_path", lambda: None)
        assert capability.winquantile_state() == "no"
        self._reset()

    def test_train_core_fallback_retraces_without_pallas(self, monkeypatch):
        from xclim_tpu.ops.pallas import capability
        from xclim_tpu.sdba import adjustment

        self._reset()
        capability.set_winquantile_state("attempt")
        calls = []

        def core(*args, use_pallas=None, **kw):
            calls.append(use_pallas)
            if use_pallas:
                raise RuntimeError("Mosaic compile failed")
            return "ok"

        out = adjustment._run_train_core(core, 1, 2, q_tuple=(0.5,))
        assert out == "ok"
        assert calls == [True, False]
        # the failure demoted the process so later trains skip the attempt
        assert capability.winquantile_state() == "no"
        self._reset()

    def test_train_core_verified_path_raises_through(self):
        from xclim_tpu.ops.pallas import capability
        from xclim_tpu.sdba import adjustment
        import pytest as _pytest

        self._reset()
        capability.set_winquantile_state("no")

        def core(*args, use_pallas=None, **kw):
            raise ValueError("real error, not a pallas one")

        with _pytest.raises(ValueError):
            adjustment._run_train_core(core)
        self._reset()


class TestAxisquantileTriState:
    """Round-5: the saturated-ensembles regression twin of the QDM one — a
    transient probe failure must not silently demote ensemble quantiles to
    the 2x-slower sorting-network path. Tri-state: "attempt" lets
    _pallas_nan_quantile try the real kernel (it already retries and
    demotes on runtime failure)."""

    def _reset(self):
        from xclim_tpu.ops.pallas.capability import (set_axisquantile_state,
                                                     set_pallas_mode)

        set_pallas_mode(None)
        set_axisquantile_state(None)

    def test_transient_probe_failure_yields_attempt(self, monkeypatch):
        from xclim_tpu.ops.pallas import capability

        self._reset()
        monkeypatch.setattr(capability, "pallas_mode", lambda: "mosaic")
        monkeypatch.setattr(capability, "_PROBE_TRIES", 2)

        def boom(*a, **k):
            raise RuntimeError("HTTP 500: transient remote-compile error")

        import xclim_tpu.ops.pallas.axisquantile as aq
        monkeypatch.setattr(aq, "axis_quantile_small", boom)
        monkeypatch.setattr(capability, "_probe_cache_path", lambda: None)
        assert capability.axisquantile_state() == "attempt"
        self._reset()

    def test_numeric_mismatch_yields_no(self, monkeypatch):
        import numpy as np

        from xclim_tpu.ops.pallas import capability

        self._reset()
        monkeypatch.setattr(capability, "pallas_mode", lambda: "mosaic")
        monkeypatch.setattr(capability, "_PROBE_TRIES", 2)

        import xclim_tpu.ops.pallas.axisquantile as aq
        monkeypatch.setattr(
            aq, "axis_quantile_small",
            lambda x, q, **k: np.full((len(q), x.shape[1]), 123.0,
                                      np.float32))
        monkeypatch.setattr(capability, "_probe_cache_path", lambda: None)
        assert capability.axisquantile_state() == "no"
        self._reset()

    def test_attempt_runtime_failure_demotes_and_serves_fallback(
            self, monkeypatch):
        import numpy as np

        from xclim_tpu.ops import quantile as qmod
        from xclim_tpu.ops.pallas import capability

        self._reset()
        monkeypatch.setattr(capability, "_AQ_OK", "attempt")

        def boom(*a, **k):
            raise RuntimeError("production compile failed")

        import xclim_tpu.ops.pallas.axisquantile as aq
        monkeypatch.setattr(aq, "axis_quantile_small", boom)
        monkeypatch.setattr(aq, "axis_quantile_small_nd", boom)

        x = np.random.default_rng(0).normal(
            0, 1, (16, 64, 64)).astype(np.float32)
        out = qmod.nan_quantile(x, np.array([0.5], np.float32), axis=0)
        ref = qmod.nan_quantile(x, np.array([0.5], np.float32), axis=0,
                                _no_pallas=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # the failed attempt demoted the kernel for the process
        assert capability.axisquantile_state() == "no"
        self._reset()
