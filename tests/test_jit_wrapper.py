"""Whole-pipeline jit (the framework's laziness/compilation contract —
analogue of the reference's assert_lazy tests, SURVEY.md §4)."""

import numpy as np

from xclim_tpu.core.jit_wrapper import climjit
from xclim_tpu.indices import heat_wave_index, tg_mean, tx_days_above
from xclim_tpu.testing.helpers import test_timeseries


def test_climjit_matches_eager(tas_series):
    rng = np.random.default_rng(0)
    jitted = climjit(tg_mean)
    for i in range(3):
        vals = rng.normal(280, 5, 365).astype(np.float32)
        tas = tas_series(vals, start="2001-01-01")
        eager = tg_mean(tas, freq="MS")
        fast = jitted(tas, freq="MS")
        np.testing.assert_allclose(np.asarray(fast.values),
                                   np.asarray(eager.values), rtol=1e-6)
        assert fast.attrs["units"] == eager.attrs["units"]
    # one trace for the whole loop (same shapes/statics)
    assert jitted.trace_count == 1


def test_climjit_retrace_on_static_change(tas_series):
    jitted = climjit(tg_mean)
    tas = tas_series(np.zeros(365, dtype=np.float32), start="2001-01-01")
    jitted(tas, freq="MS")
    jitted(tas, freq="YS")  # different static → new trace
    assert jitted.trace_count == 2


def test_climjit_spell_pipeline(tasmax_series):
    rng = np.random.default_rng(1)
    jitted = climjit(heat_wave_index)
    for _ in range(2):
        tx = tasmax_series(rng.normal(300, 8, 365).astype(np.float32),
                           start="2001-01-01")
        eager = heat_wave_index(tx, thresh="25 degC", window=5, freq="YS")
        fast = jitted(tx, thresh="25 degC", window=5, freq="YS")
        np.testing.assert_allclose(np.asarray(fast.values),
                                   np.asarray(eager.values))
    assert jitted.trace_count == 1


def test_climjit_chain_one_program(tas_series):
    from xclim_tpu.core.jit_wrapper import climjit_chain
    from xclim_tpu.indices import frost_days

    tas = tas_series(np.random.default_rng(0).normal(275, 5, 365)
                     .astype(np.float32), start="2001-01-01")
    steps = [lambda d: tg_mean(d, freq="MS"),
             lambda d: frost_days(d, freq="YS")]
    chain = climjit_chain(steps)
    o1, o2 = chain(tas)
    np.testing.assert_allclose(np.asarray(o1.values),
                               np.asarray(tg_mean(tas, freq="MS").values))
    np.testing.assert_allclose(np.asarray(o2.values),
                               np.asarray(frost_days(tas, freq="YS").values))
    assert chain.partition == [(0, 2)]  # compiled as one program


def test_climjit_chain_splits_on_capacity_error(tas_series, monkeypatch):
    """A backend program-size rejection bisects the chain into the largest
    compilable sub-programs instead of failing (r3 verdict #1)."""
    from xclim_tpu.core import jit_wrapper
    from xclim_tpu.indices import frost_days, ice_days

    real_climjit = jit_wrapper.climjit
    max_ok = 1  # pretend the backend only compiles single-step programs

    def fake_climjit(fn, on_capacity_error="eager"):
        wrapped = real_climjit(fn, on_capacity_error=on_capacity_error)

        def guard(*args, **kwargs):
            out = wrapped(*args, **kwargs)
            n = len(out) if isinstance(out, tuple) else 1
            if n > max_ok:
                raise RuntimeError(
                    "INTERNAL: remote_compile: HTTP 413: length limit "
                    "exceeded")
            return out

        guard.trace_count = 0
        return guard

    monkeypatch.setattr(jit_wrapper, "climjit", fake_climjit)
    tas = tas_series(np.random.default_rng(1).normal(275, 5, 365)
                     .astype(np.float32), start="2001-01-01")
    steps = [lambda d: tg_mean(d, freq="MS"),
             lambda d: frost_days(d, freq="YS"),
             lambda d: ice_days(d, freq="YS")]
    chain = jit_wrapper.climjit_chain(steps)
    outs = chain(tas)
    assert len(outs) == 3
    assert chain.partition == [(0, 1), (1, 2), (2, 3)]
    np.testing.assert_allclose(np.asarray(outs[0].values),
                               np.asarray(tg_mean(tas, freq="MS").values))
    # second call reuses the discovered partition (no growth)
    chain(tas)
    assert chain.partition == [(0, 1), (1, 2), (2, 3)]


def test_climjit_eager_fallback_on_capacity_error(tas_series, monkeypatch):
    """climjit itself demotes to eager execution when the backend rejects
    the fused program, instead of surfacing the error."""
    from xclim_tpu.core import jit_wrapper

    calls = {"n": 0}

    def failing_runner(args, kwargs):
        calls["n"] += 1
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")

    jitted = jit_wrapper.climjit(tg_mean)
    tas = tas_series(np.random.default_rng(2).normal(275, 5, 365)
                     .astype(np.float32), start="2001-01-01")
    expected = tg_mean(tas, freq="MS")
    # first call populates the cache; then poison the runner to simulate a
    # compile-capacity failure on the next execution
    jitted(tas, freq="MS")
    key = next(iter(jitted.__closure__[0].cell_contents))
    jitted.__closure__[0].cell_contents[key] = (failing_runner, None)
    out = jitted(tas, freq="MS")
    np.testing.assert_allclose(np.asarray(out.values),
                               np.asarray(expected.values))
    assert calls["n"] == 1
    # demotion is cached: the failing runner is not retried
    jitted(tas, freq="MS")
    assert calls["n"] == 1
