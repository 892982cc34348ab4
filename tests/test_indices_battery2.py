"""Exact-value index battery, wave 2: precipitation family, cold spells,
percentile exceedance (tg/tx/tn 10p/90p, CSDI/WSDI), simple tx stats, daily
temperature range, wind count days (expected values re-derived from the
reference's class-per-index suite, xclim:tests/test_indices.py — VERDICT r1 #5).

Series default to a 2000-07-01 start (the reference fixture default), so
month bins line up with the reference's expected vectors.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import xclim_tpu.indices as xci
from xclim_tpu.core.dataarray import ClimArray
from xclim_tpu.core.percentiles import percentile_doy

K2C = 273.15


def _july_series(variable):
    """Local fixture factory defaulting to the reference's 2000-07-01 start
    (the package-wide fixtures default to 2000-01-01)."""

    @pytest.fixture(name=f"{variable}_series")
    def _fix(timeseries):
        def make(values, start="2000-07-01", units=None, freq="D"):
            return timeseries(np.asarray(values, dtype=float), variable=variable,
                              start=start, freq=freq, units=units)

        return make

    return _fix


tas_series = _july_series("tas")
tasmax_series = _july_series("tasmax")
tasmin_series = _july_series("tasmin")
pr_series = _july_series("pr")
sfcWind_series = _july_series("sfcWind")


class TestMaxNDayPrecipitationAmount:
    def test_single_max(self, pr_series):
        a = pr_series(np.array([3, 4, 20, 20, 0, 6, 9, 25, 0, 0], dtype=float))
        rxnday = xci.max_n_day_precipitation_amount(a, 2)
        assert rxnday.values[0] == 40 * 3600 * 24
        assert rxnday.time.year[0] == 2000

    def test_sumlength_max(self, pr_series):
        vals = np.array([3, 4, 20, 20, 0, 6, 9, 25, 0, 0], dtype=float)
        a = pr_series(vals)
        rxnday = xci.max_n_day_precipitation_amount(a, len(vals))
        assert rxnday.values[0] == vals.sum() * 3600 * 24

    def test_multi_max(self, pr_series):
        a = pr_series(np.array([3, 4, 20, 20, 0, 6, 15, 25, 0, 0], dtype=float))
        rxnday = xci.max_n_day_precipitation_amount(a, 2)
        assert rxnday.values[0] == 40 * 3600 * 24
        assert len(np.atleast_1d(np.asarray(rxnday.values))) == 1


class TestMax1DayPrecipitationAmount:
    @staticmethod
    def _mmday(pr_series, values):
        return pr_series(np.asarray(values, dtype=float), units="mm/day")

    def test_single_max(self, pr_series):
        rx1day = xci.max_1day_precipitation_amount(self._mmday(pr_series, [3, 4, 20, 0, 0]))
        assert rx1day.values[0] == 20
        assert rx1day.time.year[0] == 2000

    def test_multi_max(self, pr_series):
        rx1day = xci.max_1day_precipitation_amount(self._mmday(pr_series, [20, 4, 20, 20, 0]))
        assert rx1day.values[0] == 20
        assert len(np.atleast_1d(np.asarray(rx1day.values))) == 1

    def test_uniform_max(self, pr_series):
        rx1day = xci.max_1day_precipitation_amount(self._mmday(pr_series, [20] * 5))
        assert rx1day.values[0] == 20


class TestColdSpellDays:
    def test_simple(self, tas_series):
        a = np.zeros(365)
        a[10:20] -= 15  # 10 days
        a[40:43] -= 50  # too short -> 0
        a[80:100] -= 30  # spans a month boundary: 12 + 8
        da = tas_series(a + K2C)
        out = xci.cold_spell_days(da, thresh="-10 degC", freq="MS")
        np.testing.assert_array_equal(
            np.asarray(out.values)[:12], [10, 0, 12, 8, 0, 0, 0, 0, 0, 0, 0, 0])
        assert out.attrs["units"] == "d"


class TestColdSpellFreq:
    def test_simple(self, tas_series):
        a = np.zeros(365)
        a[10:20] -= 15
        a[40:43] -= 50
        a[80:86] -= 30
        a[95:101] -= 30
        da = tas_series(a + K2C, start="1971-01-01")
        out = xci.cold_spell_frequency(da, thresh="-10 degC", freq="MS")
        np.testing.assert_array_equal(
            np.asarray(out.values)[:12], [1, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0])
        out = xci.cold_spell_frequency(da, thresh="-10 degC", freq="YS")
        np.testing.assert_array_equal(np.asarray(out.values), [3])


class TestColdSpellMaxLength:
    def test_simple(self, tas_series):
        a = np.zeros(365)
        a[10:20] -= 15
        a[40:43] -= 50
        a[80:86] -= 30
        a[95:101] -= 30
        da = tas_series(a + K2C, start="1971-01-01")
        out = xci.cold_spell_max_length(da, thresh="-10 degC", freq="MS")
        np.testing.assert_array_equal(
            np.asarray(out.values)[:12], [10, 3, 6, 6, 0, 0, 0, 0, 0, 0, 0, 0])
        out = xci.cold_spell_max_length(da, thresh="-10 degC", freq="YS")
        np.testing.assert_array_equal(np.asarray(out.values), [10])


class TestColdSpellTotalLength:
    def test_simple(self, tas_series):
        a = np.zeros(365)
        a[10:20] -= 15
        a[40:43] -= 50
        a[80:86] -= 30
        a[95:101] -= 30
        da = tas_series(a + K2C, start="1971-01-01")
        out = xci.cold_spell_total_length(da, thresh="-10 degC", freq="MS")
        np.testing.assert_array_equal(
            np.asarray(out.values)[:12], [10, 3, 6, 6, 0, 0, 0, 0, 0, 0, 0, 0])
        out = xci.cold_spell_total_length(da, thresh="-10 degC", freq="YS")
        np.testing.assert_array_equal(np.asarray(out.values), [25])


class TestColdSpellDurationIndex:
    def test_simple(self, tasmin_series):
        rng = np.random.default_rng(42)
        i = 3650
        tn = np.zeros(i) + 10.0 * np.sin(np.arange(i) / 365.0 * 2 * np.pi) \
            + 0.1 * rng.random(i)
        tn[10:20] -= 2
        tns = tasmin_series(tn)
        tn10 = percentile_doy(tns, per=10).isel(percentiles=0)
        out = xci.cold_spell_duration_index(tns, tn10, freq="YS")
        assert out.values[0] == 10
        assert out.attrs["units"] == "d"


class TestWarmSpellDurationIndex:
    def test_simple(self, tasmax_series):
        rng = np.random.default_rng(43)
        i = 3650
        tx = np.zeros(i) + 10.0 * np.sin(np.arange(i) / 365.0 * 2 * np.pi) \
            + 0.1 * rng.random(i)
        tx[10:20] += 2
        txs = tasmax_series(tx)
        tx90 = percentile_doy(txs, per=90).isel(percentiles=0)
        out = xci.warm_spell_duration_index(txs, tx90, freq="YS")
        assert out.values[0] == 10


class TestHotDays:
    def test_simple(self, tasmax_series):
        a = np.zeros(365)
        a[:6] += [27, 28, 29, 30, 31, 32]  # 2 above 30
        out = xci.hot_days(tasmax_series(a + K2C), thresh="30 degC")
        v = np.asarray(out.values)
        np.testing.assert_array_equal(v[:1], [2])
        np.testing.assert_array_equal(v[1:], 0)


class TestTnDays:
    def test_above_simple(self, tasmin_series):
        a = np.zeros(365)
        a[:6] += [27, 28, 29, 30, 31, 32]
        out = xci.tn_days_above(tasmin_series(a + K2C), thresh="30 degC")
        np.testing.assert_array_equal(np.asarray(out.values)[:1], [2])

    def test_below_simple(self, tasmin_series):
        a = np.zeros(365)
        a[:6] -= [27, 28, 29, 30, 31, 32]
        mn = tasmin_series(a + K2C)
        out = xci.tn_days_below(mn, thresh="-10 degC")
        np.testing.assert_array_equal(np.asarray(out.values)[:1], [6])
        out = xci.tn_days_below(mn, thresh="-30 degC")
        np.testing.assert_array_equal(np.asarray(out.values)[:1], [2])

    def test_operator(self, tasmin_series):
        a = np.zeros(365)
        a[:6] += [27, 28, 29, 30, 31, 32]  # 3 at or above 30
        mn = tasmin_series(a + K2C)
        out = xci.tn_days_above(mn, thresh="30 degC", op="gteq")
        np.testing.assert_array_equal(np.asarray(out.values)[:1], [3])
        with pytest.raises(ValueError):
            xci.tn_days_above(mn, thresh="30 degC", op="lteq")

        a = np.zeros(365)
        a[:6] -= [27, 28, 29, 30, 31, 32]  # 2 at or below -31
        mn = tasmin_series(a + K2C)
        out = xci.tn_days_below(mn, thresh="-31 degC", op="<=")
        np.testing.assert_array_equal(np.asarray(out.values)[:1], [2])
        with pytest.raises(ValueError):
            xci.tn_days_below(mn, thresh="30 degC", op=">=")


class TestTgDays:
    def test_above_below(self, tas_series):
        a = np.zeros(365)
        a[:6] += [27, 28, 29, 30, 31, 32]
        out = xci.tg_days_above(tas_series(a + K2C), thresh="30 degC")
        np.testing.assert_array_equal(np.asarray(out.values)[:1], [2])
        b = np.zeros(365)
        b[:6] -= [27, 28, 29, 30, 31, 32]
        out = xci.tg_days_below(tas_series(b + K2C), thresh="-10 degC")
        np.testing.assert_array_equal(np.asarray(out.values)[:1], [6])


class TestTxDays:
    def test_above_below(self, tasmax_series):
        a = np.zeros(365)
        a[:6] += [27, 28, 29, 30, 31, 32]
        out = xci.tx_days_above(tasmax_series(a + K2C), thresh="30 degC")
        np.testing.assert_array_equal(np.asarray(out.values)[:1], [2])
        b = np.zeros(365)
        b[:6] -= [27, 28, 29, 30, 31, 32]
        out = xci.tx_days_below(tasmax_series(b + K2C), thresh="-30 degC")
        np.testing.assert_array_equal(np.asarray(out.values)[:1], [2])


class TestWarmDayFrequency:
    def test_1d(self, tasmax_series):
        a = np.zeros(35)
        a[25:] = 31
        da = tasmax_series(a + K2C)
        np.testing.assert_allclose(
            np.asarray(xci.warm_day_frequency(da, freq="MS").values), [6, 4])
        np.testing.assert_allclose(
            np.asarray(xci.warm_day_frequency(da, freq="YS").values), [10])
        np.testing.assert_allclose(
            np.asarray(xci.warm_day_frequency(da, thresh="-1 degC").values), [35])
        np.testing.assert_allclose(
            np.asarray(xci.warm_day_frequency(da, thresh="50 degC").values), [0])


class TestWarmNightFrequency:
    def test_1d(self, tasmin_series):
        a = np.zeros(35)
        a[25:] = 23
        da = tasmin_series(a + K2C)
        np.testing.assert_allclose(
            np.asarray(xci.warm_night_frequency(da, freq="MS").values), [6, 4])
        np.testing.assert_allclose(
            np.asarray(xci.warm_night_frequency(da, freq="YS").values), [10])
        np.testing.assert_allclose(
            np.asarray(xci.warm_night_frequency(da, thresh="-1 degC").values), [35])
        np.testing.assert_allclose(
            np.asarray(xci.warm_night_frequency(da, thresh="50 degC").values), [0])


class TestTxTnDaysAbove:
    def test_1d(self, tasmax_series, tasmin_series):
        tn = tasmin_series(
            np.asarray([20, 23, 23, 23, 23, 22, 23, 23, 23, 23], dtype=float) + K2C)
        tx = tasmax_series(
            np.asarray([29, 31, 31, 31, 29, 31, 30, 31, 31, 31], dtype=float) + K2C)
        np.testing.assert_allclose(
            np.asarray(xci.tx_tn_days_above(tn, tx).values), [6])
        np.testing.assert_allclose(
            np.asarray(xci.tx_tn_days_above(tn, tx, thresh_tasmax="50 degC").values), [0])
        np.testing.assert_allclose(
            np.asarray(xci.tx_tn_days_above(
                tn, tx, thresh_tasmax="0 degC", thresh_tasmin="0 degC").values), [10])
        # one day in each series exactly at threshold
        np.testing.assert_allclose(
            np.asarray(xci.tx_tn_days_above(tn, tx, op=">=").values), [8])
        with pytest.raises(ValueError):
            xci.tx_tn_days_above(tn, tx, op="<")


class TestWindIndices:
    def test_calm_days(self, sfcWind_series):
        a = np.full(365, 20.0)
        a[10:20] = 2    # calm at the 3 km/h test threshold
        a[40:50] = 3.1  # just above it
        da = sfcWind_series(a, units="km h-1")
        out = xci.calm_days(da, thresh="3 km h-1", freq="MS")
        np.testing.assert_array_equal(
            np.asarray(out.values)[:12], [10, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0])
        assert out.attrs["units"] == "d"

    def test_windy_days(self, sfcWind_series):
        a = np.zeros(365)
        a[10:20] = 10.8  # below the 12 km/h test threshold
        a[40:50] = 12
        a[80:90] = 15
        da = sfcWind_series(a, units="km h-1")
        out = xci.windy_days(da, thresh="12 km h-1", freq="MS")
        np.testing.assert_array_equal(
            np.asarray(out.values)[:12], [0, 10, 10, 0, 0, 0, 0, 0, 0, 0, 0, 0])
        assert out.attrs["units"] == "d"


class TestTGXN10p:
    """Monotonic-ramp year: no day sits below its own doy 10th percentile
    except an injected cold spell (reference tests/test_indices.py:2529)."""

    def _case(self, series, fn):
        base = np.arange(366, dtype=float)
        clean = series(base, start="2000-01-01")
        p10 = percentile_doy(clean, per=10).isel(percentiles=0)
        mod = base.copy()
        mod[175:180] = 1  # cold spell in june
        out = fn(series(mod, start="2000-01-01"), p10, freq="MS")
        v = np.asarray(out.values)
        assert v[0] == 0
        assert v[5] == 5

    def test_tg10p_simple(self, tas_series):
        self._case(tas_series, xci.tg10p)

    def test_tx10p_simple(self, tasmax_series):
        self._case(tasmax_series, xci.tx10p)

    def test_tn10p_simple(self, tasmin_series):
        self._case(tasmin_series, xci.tn10p)


class TestTGXN90p:
    """Same ramp against the 10th percentile: every day exceeds it except the
    edge-shrunk first window day and the injected cold spell."""

    def _case(self, series, fn):
        base = np.arange(366, dtype=float)
        clean = series(base, start="2000-01-01")
        per = percentile_doy(clean, per=10).isel(percentiles=0)
        mod = base.copy()
        mod[175:180] = 1
        out = fn(series(mod, start="2000-01-01"), per, freq="MS")
        v = np.asarray(out.values)
        assert v[0] == 30  # Jan 1's window has only later (larger) days
        assert v[1] == 29
        assert v[5] == 25

    def test_tg90p_simple(self, tas_series):
        self._case(tas_series, xci.tg90p)

    def test_tx90p_simple(self, tasmax_series):
        self._case(tasmax_series, xci.tx90p)

    def test_tn90p_simple(self, tasmin_series):
        self._case(tasmin_series, xci.tn90p)


class TestPrecipAccumulation:
    def test_simple(self, pr_series):
        pr = np.zeros(100)
        pr[5:10] = 1
        out = xci.precip_accumulation(pr_series(pr), freq="MS")
        np.testing.assert_array_equal(np.asarray(out.values)[0], 5 * 3600 * 24)

    def test_yearly(self, pr_series):
        # year-of-date as mm/d over 11 standard-calendar years
        from xclim_tpu.core.calendar import date_range

        t = date_range("2000-01-01", end="2010-12-31", freq="D", calendar="standard")
        pr = pr_series(t.year.astype(float), start="2000-01-01", units="mm d-1")
        out = xci.precip_accumulation(pr)
        years = np.unique(t.year)
        days_in_year = np.array([(t.year == y).sum() for y in years])
        np.testing.assert_allclose(np.asarray(out.values), days_in_year * years)

    def test_mixed_phases(self, pr_series, tas_series):
        pr = np.zeros(100)
        pr[5:20] = 1
        pr = pr_series(pr)
        tas = np.ones(100) * 280
        tas[5:10] = 270
        tas[10:15] = 268
        tas = tas_series(tas)
        out_snow = xci.precip_accumulation(pr, tas=tas, phase="solid", freq="MS")
        out_snow_t = xci.precip_accumulation(pr, tas=tas, phase="solid",
                                             thresh="269 K", freq="MS")
        out_rain = xci.precip_accumulation(pr, tas=tas, phase="liquid", freq="MS")
        np.testing.assert_array_equal(np.asarray(out_snow.values)[0], 10 * 3600 * 24)
        np.testing.assert_array_equal(np.asarray(out_snow_t.values)[0], 5 * 3600 * 24)
        np.testing.assert_array_equal(np.asarray(out_rain.values)[0], 5 * 3600 * 24)


class TestPrecipAverage:
    def test_simple(self, pr_series):
        pr = np.zeros(100)
        pr[5:10] = 1
        out = xci.precip_average(pr_series(pr), freq="MS")
        np.testing.assert_allclose(np.asarray(out.values)[0], 5 * 3600 * 24 / 31,
                                   rtol=1e-6)

    def test_mixed_phases(self, pr_series, tas_series):
        pr = np.zeros(100)
        pr[5:20] = 1
        pr = pr_series(pr)
        tas = np.ones(100) * 280
        tas[5:10] = 270
        tas[10:15] = 268
        tas = tas_series(tas)
        outsn = xci.precip_average(pr, tas=tas, phase="solid", freq="MS")
        outsn2 = xci.precip_average(pr, tas=tas, phase="solid", thresh="269 K",
                                    freq="MS")
        outrn = xci.precip_average(pr, tas=tas, phase="liquid", freq="MS")
        np.testing.assert_allclose(np.asarray(outsn.values)[0],
                                   10 * 3600 * 24 / 31, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(outsn2.values)[0],
                                   5 * 3600 * 24 / 31, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(outrn.values)[0],
                                   5 * 3600 * 24 / 31, rtol=1e-6)


class TestPrcptot:
    """prcptot accepts pre-aggregated (weekly/monthly mean-flux) input
    (reference tests/test_indices.py:3013)."""

    @staticmethod
    def _data(pr_series):
        vals = np.ones(731)
        vals[0:7] += 10
        vals[-7:] += 11
        return pr_series(vals, start="1971-01-01", units="mm / d")

    @pytest.mark.parametrize(
        "freq,expected",
        [("D", [435.0, 443.0]), ("7D", [441.0, 485.0]), ("MS", [435.0, 443.0])],
    )
    def test_simple(self, pr_series, freq, expected):
        pr = self._data(pr_series)
        if freq != "D":
            pr = pr.resample(freq).mean(keep_attrs=True)
        out = xci.prcptot(pr=pr, freq="YS")
        np.testing.assert_array_almost_equal(np.asarray(out.values), expected)


class TestPrecipWettestDriestPeriod:
    @pytest.mark.parametrize(
        "freq,op,expected",
        [
            ("D", "wettest", [11.0, 12.0]),
            ("D", "driest", [1, 1]),
            ("7D", "wettest", [77, 84]),
            ("7D", "driest", [7, 7]),
            ("MS", "wettest", [101, 108]),
            ("MS", "driest", [28, 29]),
        ],
    )
    def test_simple(self, pr_series, freq, op, expected):
        pr = TestPrcptot._data(pr_series)
        if freq != "D":
            pr = pr.resample(freq).mean(keep_attrs=True)
        out = xci.prcptot_wetdry_period(pr=pr, op=op, freq="YS")
        np.testing.assert_array_almost_equal(np.asarray(out.values), expected)


class TestWetDays:
    def test_simple(self, pr_series):
        a = np.zeros(365)
        a[:7] += [4, 5.5, 6, 6, 2, 7, 5]    # 4 above 5, 1 at 5
        a[100:106] += [1, 6, 7, 5, 2, 1]    # 2 above 5, 1 at 5
        pr = pr_series(a, units="mm/day")
        out = xci.wetdays(pr, thresh="5 mm/day", freq="MS")
        np.testing.assert_allclose(
            np.asarray(out.values)[:12], [5, 0, 0, 3, 0, 0, 0, 0, 0, 0, 0, 0])
        out = xci.wetdays(pr, thresh="5 mm/day", freq="MS", op=">")
        np.testing.assert_allclose(
            np.asarray(out.values)[:12], [4, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0])


class TestWetDaysProp:
    def test_simple(self, pr_series):
        a = np.zeros(365)
        a[:7] += [4, 5.5, 6, 6, 2, 7, 5]
        a[100:106] += [1, 6, 7, 5, 2, 1]
        pr = pr_series(a, units="mm/day")
        out = xci.wetdays_prop(pr, thresh="5 mm/day", freq="MS")
        np.testing.assert_allclose(
            np.asarray(out.values)[:4], [5 / 31, 0, 0, 3 / 31], rtol=1e-6)
        out = xci.wetdays_prop(pr, thresh="5 mm/day", freq="MS", op=">")
        np.testing.assert_allclose(
            np.asarray(out.values)[:4], [4 / 31, 0, 0, 2 / 31], rtol=1e-6)


class TestRPRCTot:
    def test_simple(self, pr_series, timeseries):
        a_pr = np.zeros(365)
        a_pr[:7] += [2, 4, 6, 8, 10, 12, 14]
        a_pr[35] = 6
        a_pr[100:105] += [2, 6, 10, 14, 20]
        a_prc = a_pr.copy() * 2  # ratio 2 on qualifying days
        a_prc[35] = 0            # zero convective precip
        pr = pr_series(a_pr, units="mm/day")
        prc = timeseries(a_prc, variable="prc", start="2000-07-01", units="mm/day")
        out = xci.rprctot(pr, prc, thresh="5 mm/day", freq="MS")
        v = np.asarray(out.values)[:12]
        np.testing.assert_allclose(
            v, [2, 0, np.nan, 2] + [np.nan] * 8)


class TestWinterRainRatio:
    def test_simple(self, pr_series, tas_series):
        pr = pr_series(np.ones(450), start="2000-12-01")
        tas = np.zeros(450) - 1
        tas[10:20] += 10  # 10 rain days in DJF
        tas = tas_series(tas + K2C, start="2000-12-01")
        out = xci.winter_rain_ratio(pr=pr, tas=tas)
        np.testing.assert_almost_equal(
            np.asarray(out.values)[:2], [10.0 / (31 + 31 + 28), 0])


class TestLiquidPrecipitationRatio:
    def test_simple(self, pr_series, tas_series):
        pr = np.zeros(100)
        pr[10:20] = 1
        pr = pr_series(pr)
        tas = np.zeros(100)
        tas[:14] -= 20
        tas[14:] += 10
        tas = tas_series(tas + K2C)
        out = xci.liquid_precip_ratio(pr, tas=tas, freq="MS")
        np.testing.assert_almost_equal(np.asarray(out.values)[:1], [0.6])


class TestDaysOverPrecipThresh:
    def test_simple(self, pr_series):
        a = np.zeros(365)
        a[:8] = np.arange(8)
        pr = pr_series(a, start="2000-01-01")
        perv = np.zeros(366)
        perv[5:] = 5
        per = ClimArray(jnp.asarray(perv, dtype=jnp.float32), ("dayofyear",),
                        {"dayofyear": np.arange(1, 367)},
                        {"units": "kg m-2 s-1"}, "per")
        out = xci.days_over_precip_thresh(pr, per, thresh="2 kg/m**2/s")
        np.testing.assert_array_almost_equal(np.asarray(out.values)[0], 4)
        out = xci.fraction_over_precip_thresh(pr, per, thresh="2 kg/m**2/s")
        np.testing.assert_array_almost_equal(
            np.asarray(out.values)[0], (3 + 4 + 6 + 7) / (3 + 4 + 5 + 6 + 7))


class TestRainOnFrozenGround:
    def test_simple(self, tas_series, pr_series):
        tas = np.zeros(30) - 1
        pr = np.zeros(30)
        tas[10] += 5
        pr[10] += 2
        out = xci.rain_on_frozen_ground_days(
            pr_series(pr / 3600 / 24), tas_series(tas + K2C), freq="MS")
        assert out.values[0] == 1

    def test_small_rain(self, tas_series, pr_series):
        tas = np.zeros(30) - 1
        pr = np.zeros(30)
        tas[10] += 5
        pr[10] += 0.5
        out = xci.rain_on_frozen_ground_days(
            pr_series(pr / 3600 / 24), tas_series(tas + K2C), freq="MS")
        assert out.values[0] == 0

    def test_consecutive_rain(self, tas_series, pr_series):
        tas = np.zeros(30) - 1
        pr = np.zeros(30)
        tas[10:16] += 5
        pr[10:16] += 5
        out = xci.rain_on_frozen_ground_days(
            pr_series(pr), tas_series(tas + K2C), freq="MS")
        assert out.values[0] == 1


class TestTxMin:
    def test_simple(self, tasmax_series):
        a = tasmax_series(np.array([20, 25, -15, 19], dtype=float))
        assert xci.tx_min(a, freq="YS").values[0] == -15


class TestTxMean:
    def test_attrs(self, tasmax_series):
        a = tasmax_series(np.array([320, 321, 322, 323, 324], dtype=float))
        txm = xci.tx_mean(a, freq="YS")
        assert txm.values[0] == 322
        assert txm.attrs["units"] == "K"
        a = tasmax_series(np.array([20, 21, 22, 23, 24], dtype=float), units="degC")
        txm = xci.tx_mean(a, freq="YS")
        assert txm.values[0] == 22
        assert txm.attrs["units"] == "degC"


class TestTxMax:
    def test_simple(self, tasmax_series):
        a = tasmax_series(np.array([20, 25, -15, 19], dtype=float))
        assert xci.tx_max(a, freq="YS").values[0] == 25


class TestDailyTemperatureRange:
    @staticmethod
    def _static(tasmin_series, tasmax_series):
        mx = np.array([22, 10, 35.2, 25.1, 18.9, 12, 16]) + K2C
        mn = np.array([17, 3.5, 22.7, 16, 12.4, 7, 12]) + K2C
        return tasmin_series(mn), tasmax_series(mx)

    @pytest.mark.parametrize("op,expected",
                             [("max", 12.5), ("min", 4.0), ("std", 2.72913233)])
    def test_static_reduce(self, tasmin_series, tasmax_series, op, expected):
        tasmin, tasmax = self._static(tasmin_series, tasmax_series)
        dtr = xci.daily_temperature_range(tasmin, tasmax, freq="YS", op=op)
        assert dtr.attrs["units"] == "K"
        np.testing.assert_array_almost_equal(np.asarray(dtr.values)[0], expected)

    def test_static_mean(self, tasmin_series, tasmax_series):
        tasmin, tasmax = self._static(tasmin_series, tasmax_series)
        dtr = xci.daily_temperature_range(tasmin, tasmax, freq="YS")
        assert dtr.attrs["units"] == "K"
        assert dtr.attrs["units_metadata"] == "temperature: difference"
        np.testing.assert_allclose(
            np.asarray(dtr.values)[0],
            np.mean(np.asarray(tasmax.values) - np.asarray(tasmin.values)),
            rtol=1e-6)

    def test_static_variability(self, tasmin_series, tasmax_series):
        tasmin, tasmax = self._static(tasmin_series, tasmax_series)
        vdtr = xci.daily_temperature_range_variability(tasmin, tasmax, freq="YS")
        # dtr = [5, 6.5, 12.5, 9.1, 6.5, 5, 4]; mean |diff| = 16/6
        np.testing.assert_allclose(np.asarray(vdtr.values)[0], 16 / 6, rtol=1e-5)


class TestMaxPrIntensity:
    def test_simple(self, timeseries):
        vals = np.zeros(24 * 36)
        vals[10:22] += np.arange(12)
        pr = timeseries(vals, variable="pr", start="2000-07-01", freq="h")
        out = xci.max_pr_intensity(pr, window=1, freq="YS")
        np.testing.assert_array_almost_equal(np.asarray(out.values)[0], 11)
        out = xci.max_pr_intensity(pr, window=12, freq="YS")
        np.testing.assert_array_almost_equal(np.asarray(out.values)[0], 5.5)
