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


class TestThresholdedEvents:
    """Exact cases from xclim:tests/test_generic.py:800-860 (event starts
    expressed as day-of-year; the reference uses datetimes)."""

    ARR = np.array([0, 0, 0, 1, 2, 3, 0, 3, 3, 10, 0, 0, 0, 0, 0, 1, 2, 2,
                    2, 0, 0, 0, 0, 0, 0, 1, 3, 3, 2, 0, 0, 0, 2, 0, 0, 0, 0],
                   dtype=float)

    @staticmethod
    def _clean(out):
        res = {}
        for k in ("event_length", "event_effective_length", "event_sum",
                  "event_start"):
            v = np.asarray(out[k].values, dtype=float).ravel()
            res[k] = v[~np.isnan(v)]
        return res

    def test_simple(self, pr_series):
        from xclim_tpu.indices.generic import thresholded_events

        pr = pr_series(self.ARR, start="2000-01-01", units="mm")
        out = thresholded_events(pr, thresh="1 mm", op=">=", window=3)
        r = self._clean(out)
        np.testing.assert_array_equal(r["event_length"], [3, 3, 4, 4])
        np.testing.assert_array_equal(r["event_effective_length"],
                                      [3, 3, 4, 4])
        np.testing.assert_array_equal(r["event_sum"], [6, 16, 7, 9])
        np.testing.assert_array_equal(r["event_start"], [4, 8, 16, 26])

    def test_diff_windows(self, pr_series):
        from xclim_tpu.indices.generic import thresholded_events

        pr = pr_series(self.ARR, start="2000-01-01", units="mm")
        out = thresholded_events(pr, thresh="2 mm", op=">=", window=3,
                                 window_stop=4)
        r = self._clean(out)
        np.testing.assert_array_equal(r["event_length"], [3, 3, 7])
        np.testing.assert_array_equal(r["event_effective_length"],
                                      [3, 3, 4])
        np.testing.assert_array_equal(r["event_sum"], [16, 6, 10])
        np.testing.assert_array_equal(r["event_start"], [8, 17, 27])

    def test_stop_window(self, pr_series):
        from xclim_tpu.indices.generic import thresholded_events

        pr = pr_series(self.ARR, start="2000-01-01", units="mm")
        out = thresholded_events(pr, thresh="1 mm", op=">=", window=3,
                                 window_stop=3)
        r = self._clean(out)
        np.testing.assert_array_equal(r["event_length"], [7, 4, 4])
        np.testing.assert_array_equal(r["event_effective_length"],
                                      [6, 4, 4])
        np.testing.assert_array_equal(r["event_sum"], [22, 7, 9])
        np.testing.assert_array_equal(r["event_start"], [4, 16, 26])
