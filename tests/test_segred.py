"""One-pass Pallas segment-reduce kernel: interpret-mode parity with the XLA
gather path (ops/segments.py) across ops, freqs, NaN densities and shapes.

The kernel serves ``da.resample(time=freq).op()`` — the reference's universal
pattern (xclim:src/xclim/indices/generic.py:83 select_resample_op).
"""

import numpy as np
import pytest

from xclim_tpu.core.calendar import date_range, resample_segments
from xclim_tpu.ops.pallas.segred import SUPPORTED_OPS, segment_reduce_onepass
from xclim_tpu.ops.segments import segment_reduce


def _close(a, b, rtol=1e-5, atol=1e-5):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    assert a.shape == b.shape
    assert (np.isnan(a) == np.isnan(b)).all(), "NaN patterns differ"
    m = ~np.isnan(a)
    np.testing.assert_allclose(a[m], b[m], rtol=rtol, atol=atol)


def _mk(T, C, nan_frac, seed=0, scale=5.0, offset=285.0):
    rng = np.random.default_rng(seed)
    x = (rng.normal(offset, scale, (T, C))).astype(np.float32)
    if nan_frac:
        x[rng.random(x.shape) < nan_frac] = np.nan
    return x


OPS = sorted(SUPPORTED_OPS)


class TestInterpretParity:
    @pytest.mark.parametrize("op", OPS)
    @pytest.mark.parametrize("freq", ["MS", "YS", "QS-DEC"])
    def test_monthly_yearly(self, op, freq):
        t = date_range("2000-01-01", periods=730, freq="D", calendar="noleap")
        spec = resample_segments(t, freq)
        x = _mk(730, 17, 0.1)
        got = segment_reduce_onepass(x, spec, op, interpret=True)
        exp = segment_reduce(x, spec, op, axis=0, _no_pallas=True)
        _close(got, exp)

    @pytest.mark.parametrize("op", OPS)
    def test_all_nan_segment(self, op):
        t = date_range("2000-01-01", periods=365, freq="D", calendar="noleap")
        spec = resample_segments(t, "MS")
        x = _mk(365, 5, 0.0)
        x[31:59, 2] = np.nan  # February all-NaN in one lane
        x[:, 4] = np.nan      # a fully NaN lane
        got = segment_reduce_onepass(x, spec, op, interpret=True)
        exp = segment_reduce(x, spec, op, axis=0, _no_pallas=True)
        _close(got, exp)

    def test_count_dtype_and_values(self):
        t = date_range("2001-01-01", periods=365, freq="D", calendar="noleap")
        spec = resample_segments(t, "MS")
        x = _mk(365, 3, 0.25, seed=5)
        got = segment_reduce_onepass(x, spec, "count", interpret=True)
        exp = segment_reduce(x, spec, "count", axis=0, _no_pallas=True)
        assert np.asarray(got).dtype == np.int32
        np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))

    def test_unaligned_everything(self):
        # T, C and nseg all non-multiples of the tile sizes
        t = date_range("2000-03-14", periods=407, freq="D",
                       calendar="standard")
        spec = resample_segments(t, "MS")
        x = _mk(407, 133, 0.3, seed=9)
        for op in ("mean", "max", "std"):
            got = segment_reduce_onepass(x, spec, op, interpret=True)
            exp = segment_reduce(x, spec, op, axis=0, _no_pallas=True)
            _close(got, exp)

    def test_360_day_calendar(self):
        t = date_range("2000-01-01", periods=720, freq="D", calendar="360_day")
        spec = resample_segments(t, "MS")
        x = _mk(720, 11, 0.05, seed=2)
        for op in ("sum", "min", "var"):
            got = segment_reduce_onepass(x, spec, op, interpret=True)
            exp = segment_reduce(x, spec, op, axis=0, _no_pallas=True)
            _close(got, exp)

    def test_negative_values_and_zeros(self):
        # the NaN test is a self-comparison; 0.0 and negatives must be valid
        t = date_range("2000-01-01", periods=60, freq="D", calendar="noleap")
        spec = resample_segments(t, "MS")
        x = _mk(60, 7, 0.0, seed=3, scale=2.0, offset=0.0)
        x[0, 0] = 0.0
        x[1, 0] = -0.0
        for op in OPS:
            got = segment_reduce_onepass(x, spec, op, interpret=True)
            exp = segment_reduce(x, spec, op, axis=0, _no_pallas=True)
            _close(got, exp)


class TestDispatchGuards:
    def test_non_contiguous_spec_falls_back(self):
        from xclim_tpu.ops.segments import _segments_contiguous

        t = date_range("2000-01-01", periods=365, freq="D", calendar="noleap")
        spec = resample_segments(t, "MS")
        assert _segments_contiguous(spec)

    def test_dispatch_path_used_matches_xla(self, monkeypatch):
        """Force the dispatch on (interpret) and check segment_reduce output
        is identical to the forced-XLA path."""
        import xclim_tpu.ops.segments as seg
        from xclim_tpu.ops.pallas import capability

        monkeypatch.setattr(capability, "segred_supported", lambda: True)

        def fake_onepass(x2, spec, op, interpret=False):
            return segment_reduce_onepass(x2, spec, op, interpret=True)

        import xclim_tpu.ops.pallas.segred as segred_mod

        monkeypatch.setattr(segred_mod, "segment_reduce_onepass",
                            fake_onepass)
        t = date_range("2000-01-01", periods=365, freq="D",
                       calendar="noleap")
        spec = resample_segments(t, "MS")
        x = _mk(365, 9, 0.1, seed=11)
        got = seg.segment_reduce(x, spec, "mean", axis=0)
        exp = seg.segment_reduce(x, spec, "mean", axis=0, _no_pallas=True)
        _close(got, exp)
