"""Pallas fused kernels (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from xclim_tpu.core.calendar import date_range, resample_segments
from xclim_tpu.ops import runlength as rl
from xclim_tpu.ops.pallas.spells import fused_spell_stats
from xclim_tpu.ops.segments import segment_reduce


@pytest.mark.parametrize("freq,op,window", [("MS", ">", 3), ("YS", ">=", 1),
                                            ("MS", "<", 5)])
def test_fused_spell_stats_vs_xla(freq, op, window):
    rng = np.random.default_rng(1)
    t = date_range("2000-01-01", periods=730, freq="D")
    spec = resample_segments(t, freq)
    C = 130  # force block padding
    x = rng.normal(25, 8, (730, C)).astype(np.float32)
    x[3, 7] = np.nan
    cnt, wrc, wre, lng = fused_spell_stats(x, spec, thresh=25.0, window=window,
                                           op=op, interpret=True)
    import operator

    ops = {">": operator.gt, ">=": operator.ge, "<": operator.lt}
    b = ops[op](jnp.asarray(x), 25.0)
    b = jnp.where(jnp.isnan(x), False, b)
    ref_cnt = segment_reduce(b.astype(jnp.float32), spec, "sum")
    ref_wrc = rl.windowed_run_count(b, window, spec=spec)
    ref_wre = rl.windowed_run_events(b, window, spec=spec)
    ref_lng = rl.longest_run(b, spec=spec)
    np.testing.assert_allclose(np.asarray(cnt), np.asarray(ref_cnt))
    np.testing.assert_allclose(np.asarray(wrc), np.asarray(ref_wrc))
    np.testing.assert_allclose(np.asarray(wre), np.asarray(ref_wre))
    np.testing.assert_allclose(np.asarray(lng), np.asarray(ref_lng))
