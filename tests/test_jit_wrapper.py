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
