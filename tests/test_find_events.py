"""find_events padded event extraction."""

import numpy as np

from xclim_tpu.indices.run_length import find_events
from xclim_tpu.testing.helpers import test_timeseries


def test_basic_events(pr_series):
    vals = np.zeros(60, dtype=np.float32)
    vals[5:15] = 5.0   # event 1: 10 days
    vals[30:33] = 5.0  # event 2: 3 days
    pr = pr_series(vals, units="mm/d", start="2001-01-01")
    cond = pr > 1
    out = find_events(cond, window=2, data=pr)
    length = np.asarray(out["event_length"].values)
    ok = length[~np.isnan(length)]
    np.testing.assert_array_equal(sorted(ok), [3, 10])
    starts = np.asarray(out["event_start"].values)
    np.testing.assert_array_equal(sorted(starts[~np.isnan(starts)]), [6, 31])
    sums = np.asarray(out["event_sum"].values)
    np.testing.assert_allclose(sorted(sums[~np.isnan(sums)]), [15.0, 50.0])


def test_events_with_stop_condition(tas_series):
    vals = np.full(50, 280.0, dtype=np.float32)
    vals[10:20] = 300.0
    vals[20:23] = 290.0  # neither start nor stop → event continues
    vals[23:] = 270.0
    tas = tas_series(vals, start="2001-01-01")
    cond = tas > 295
    stop = tas < 275
    out = find_events(cond, window=3, condition_stop=stop, window_stop=2)
    length = np.asarray(out["event_length"].values)
    ok = length[~np.isnan(length)]
    # the stop marker sits on the FIRST day of the 2-day stop run (day 23),
    # so the event covers days 10..22 (reference runs_with_holes semantics)
    assert len(ok) == 1
    assert ok[0] == 13
