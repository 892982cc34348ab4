"""Exact-value index battery, wave 1: seasons, degree days, first/last days,
consecutive extremes (expected values re-derived from the reference's
class-per-index suite, xclim:tests/test_indices.py — VERDICT r1 #5).

All series use the standard calendar starting 2000-01-01 (a leap year), the
same setup the reference uses, so day-of-year expectations line up.
"""

import numpy as np
import pytest

import xclim_tpu.indices as xci

K2C = 273.15


def _set_period(vals, da, d1, d2, value):
    """Set `value` on the steps whose date is within [d1, d2] inclusive
    (the ClimArray analogue of the reference's ``tas.where(~isin(slice))``)."""
    t = da.time
    iso = np.array([t.isoformat(i)[:10] for i in range(len(t))])
    out = np.asarray(vals, dtype=np.float64).copy()
    out[(iso >= d1) & (iso <= d2)] = value
    return out


class TestGrowingSeasonStart:
    def test_simple(self, tas_series):
        tg = np.zeros(365) - 1
        w = 5
        tg[10:10 + w - 1] += 6   # too short
        tg[20:20 + w] += 6       # at threshold / ok
        tg[30:30 + w + 1] += 6   # second valid condition, ignored
        tg = tas_series(tg + K2C, start="2000-01-01")
        out = xci.growing_season_start(tg, window=w)
        assert out.values[0] == 21  # Jan 21
        assert out.attrs["units"] == "1"
        assert out.attrs["is_dayofyear"] == 1

    def test_no_start(self, tas_series):
        tg = tas_series(np.zeros(365) - 1, start="2000-01-01")
        out = xci.growing_season_start(tg)
        np.testing.assert_equal(np.asarray(out.values), [np.nan])


class TestGrowingSeasonEnd:
    @pytest.mark.parametrize(
        "d1,d2,mid_date,expected",
        [
            ("1950-01-01", "1951-01-01", "07-01", np.nan),  # no season
            ("2000-01-01", "2000-12-31", "07-01", 365),     # all year
            ("2000-07-10", "2001-01-01", "07-01", np.nan),  # end before start
            ("2000-06-15", "2000-07-15", "07-01", 198),     # normal
            ("2000-06-15", "2000-07-25", "07-15", 208),     # PCC case
            ("2000-06-15", "2000-07-15", "10-01", 275),     # late mid_date
            ("2000-06-15", "2000-07-15", "01-10", np.nan),  # early mid_date
            ("2000-06-15", "2000-07-15", "06-15", np.nan),  # mid_date on day 1
        ],
    )
    def test_varying_mid_dates(self, tas_series, d1, d2, mid_date, expected):
        tas = tas_series(np.zeros(365), start="2000-01-01")
        tas = tas.copy(data=np.asarray(
            _set_period(np.zeros(365), tas, d1, d2, 280), dtype=np.float32))
        tas.attrs["units"] = "K"
        out = xci.growing_season_end(tas, mid_date=mid_date)
        np.testing.assert_array_equal(np.asarray(out.values), expected)
        assert out.attrs["units"] == "1"
        assert out.attrs["is_dayofyear"] == 1


class TestGrowingSeasonLength:
    @pytest.mark.parametrize(
        "d1,d2,expected",
        [
            ("1950-01-01", "1951-01-01", 0),
            ("2000-01-01", "2000-12-31", 365),
            ("2000-07-10", "2001-01-01", 0),
            ("2000-06-15", "2001-01-01", 199),  # no end
            ("2000-06-15", "2000-07-15", 31),
        ],
    )
    def test_simple(self, tas_series, d1, d2, expected):
        tas = tas_series(np.zeros(365), start="2000-01-01")
        tas = tas.copy(data=np.asarray(
            _set_period(np.zeros(365), tas, d1, d2, 280), dtype=np.float32))
        tas.attrs["units"] = "K"
        gsl = xci.growing_season_length(tas)
        np.testing.assert_array_equal(np.asarray(gsl.values), expected)

    def test_southhemisphere(self, tas_series):
        tas = tas_series(np.zeros(2 * 365), start="2000-01-01")
        tas = tas.copy(data=np.asarray(
            _set_period(np.zeros(2 * 365), tas, "2000-11-01", "2001-03-01",
                        280), dtype=np.float32))
        tas.attrs["units"] = "K"
        gsl = xci.growing_season_length(tas, mid_date="01-01", freq="YS-JUL")
        # period starting 2000-07-01
        vals = np.asarray(gsl.values)
        assert vals[1] == 121


class TestFrostSeasonLength:
    @pytest.mark.parametrize(
        "d1,d2,expected",
        [
            ("1950-01-01", "1951-01-01", 0),
            ("2000-01-01", "2000-12-31", 365),
            ("2000-06-15", "2001-01-01", 199),  # no end
            ("2000-06-15", "2000-07-15", 31),
        ],
    )
    def test_simple(self, tasmin_series, d1, d2, expected):
        tas = tasmin_series(np.zeros(365) + 300, start="2000-01-01")
        tas = tas.copy(data=np.asarray(
            _set_period(np.zeros(365) + 300, tas, d1, d2, 270),
            dtype=np.float32))
        tas.attrs["units"] = "K"
        fsl = xci.frost_season_length(tas, freq="YS", mid_date="07-01")
        np.testing.assert_array_equal(np.asarray(fsl.values), expected)

    def test_northhemisphere(self, tasmin_series):
        tas = tasmin_series(np.zeros(2 * 365) + 300, start="2000-01-01")
        tas = tas.copy(data=np.asarray(
            _set_period(np.zeros(2 * 365) + 300, tas, "2000-11-01",
                        "2001-03-01", 270), dtype=np.float32))
        tas.attrs["units"] = "K"
        fsl = xci.frost_season_length(tas)  # freq='YS-JUL', mid '01-01'
        vals = np.asarray(fsl.values)
        assert vals[1] == 121


class TestFrostFreeSeasonStart:
    def test_simple(self, tasmin_series):
        tn = np.zeros(365) - 1
        w = 5
        tn[10:10 + w - 1] += 2
        tn[20:20 + w] += 1
        tn[30:30 + w + 1] += 1
        tn = tasmin_series(tn + K2C, start="2000-01-01")
        out = xci.frost_free_season_start(tn, window=w)
        assert out.values[0] == 21
        assert out.attrs["units"] == "1"
        assert out.attrs["is_dayofyear"] == 1

    def test_no_start(self, tasmin_series):
        tn = tasmin_series(np.zeros(365) - 1, start="2000-01-01")
        out = xci.frost_free_season_start(tn)
        np.testing.assert_equal(np.asarray(out.values), [np.nan])


class TestFrostFreeSeasonEnd:
    @pytest.mark.parametrize(
        "d1,d2,mid_date,expected",
        [
            ("1950-01-01", "1951-01-01", "07-01", np.nan),
            ("2000-01-06", "2000-12-31", "07-01", 365),
            ("2000-07-10", "2001-01-01", "07-01", np.nan),
            ("2000-06-15", "2000-07-15", "07-01", 198),
            ("2000-06-15", "2000-07-25", "07-15", 208),
            ("2000-06-15", "2000-07-15", "10-01", 275),
            ("2000-06-15", "2000-07-15", "01-10", np.nan),
            ("2000-06-15", "2000-07-15", "06-15", np.nan),
        ],
    )
    def test_varying_mid_dates(self, tasmin_series, d1, d2, mid_date, expected):
        tn = tasmin_series(np.zeros(365), start="2000-01-01")
        tn = tn.copy(data=np.asarray(
            _set_period(np.zeros(365), tn, d1, d2, 0.1 + K2C),
            dtype=np.float32))
        tn.attrs["units"] = "K"
        out = xci.frost_free_season_end(tn, mid_date=mid_date)
        np.testing.assert_array_equal(np.asarray(out.values), expected)
        assert out.attrs["units"] == "1"
        assert out.attrs["is_dayofyear"] == 1


class TestFrostFreeSeasonLength:
    @pytest.mark.parametrize(
        "d1,d2,expected",
        [
            ("1950-01-01", "1951-01-01", 0),
            ("2000-01-01", "2000-12-31", 365),
            ("2000-06-15", "2001-01-01", 199),
            ("2000-06-15", "2000-07-15", 31),
        ],
    )
    def test_simple(self, tasmin_series, d1, d2, expected):
        tn = tasmin_series(np.zeros(365) + 270, start="2000-01-01")
        tn = tn.copy(data=np.asarray(
            _set_period(np.zeros(365) + 270, tn, d1, d2, 300),
            dtype=np.float32))
        tn.attrs["units"] = "K"
        fsl = xci.frost_free_season_length(tn, freq="YS", mid_date="07-01")
        np.testing.assert_array_equal(np.asarray(fsl.values), expected)

    def test_southhemisphere(self, tasmin_series):
        tn = tasmin_series(np.zeros(2 * 365) + 270, start="2000-01-01")
        tn = tn.copy(data=np.asarray(
            _set_period(np.zeros(2 * 365) + 270, tn, "2000-11-01",
                        "2001-03-01", 300), dtype=np.float32))
        tn.attrs["units"] = "K"
        fsl = xci.frost_free_season_length(tn, freq="YS-JUL", mid_date="01-01")
        vals = np.asarray(fsl.values)
        assert vals[1] == 121


class TestFrostFreeSpellMaxLength:
    def test_simple(self, tasmin_series):
        tn = np.zeros(365) - 1
        tn[10:12] = 1
        tn[20:30] = 1
        tn = tasmin_series(tn + K2C, start="2000-01-01")
        out = xci.frost_free_spell_max_length(tn)
        assert out.values[0] == 10


class TestMaxConsecutiveFrostDays:
    def test_one_freeze_day(self, tasmin_series):
        a = tasmin_series(np.array([3, 4, 5, -1, 3]) + K2C)
        assert xci.maximum_consecutive_frost_days(a).values[0] == 1

    def test_no_freeze(self, tasmin_series):
        a = tasmin_series(np.array([3, 4, 5, 1, 3]) + K2C)
        assert xci.maximum_consecutive_frost_days(a).values[0] == 0

    def test_all_year_freeze(self, tasmin_series):
        # default freq is YS-JUL: start at July so the year isn't split
        # (the reference's tasmin_series fixture starts 2000-07-01)
        a = tasmin_series(np.zeros(365) - 10 + K2C, start="2000-07-01")
        assert xci.maximum_consecutive_frost_days(a).values[0] == 365


class TestMaximumConsecutiveFrostFreeDays:
    def test_one_freeze_day(self, tasmin_series):
        a = tasmin_series(np.array([3, 4, 5, -1, 3]) + K2C)
        assert xci.maximum_consecutive_frost_free_days(a).values[0] == 3

    def test_two_freeze_days_with_threshold(self, tasmin_series):
        a = tasmin_series(np.array([3, 4, 5, -0.8, -2, 3]) + K2C)
        out = xci.maximum_consecutive_frost_free_days(a, thresh="-1 degC")
        assert out.values[0] == 4

    def test_no_freeze(self, tasmin_series):
        a = tasmin_series(np.array([3, 4, 5, 1, 3]) + K2C)
        assert xci.maximum_consecutive_frost_free_days(a).values[0] == 5

    def test_all_year_freeze(self, tasmin_series):
        a = tasmin_series(np.zeros(365) - 10 + K2C)
        assert np.all(np.asarray(
            xci.maximum_consecutive_frost_free_days(a).values) == 0)

    def test_zero(self, tasmin_series):
        # 0 degC is frost-free (>= thresh)
        a = tasmin_series(np.array([-1, -1, 1, 1, 0, 2, -1]) + K2C)
        assert xci.maximum_consecutive_frost_free_days(a).values[0] == 4


class TestCoolingDegreeDays:
    def test_no_cdd(self, tas_series):
        a = tas_series(np.array([10, 15, -5, 18]) + K2C)
        cdd = xci.cooling_degree_days(a)
        assert cdd.values[0] == 0
        assert set(cdd.attrs["units"].split()) == {"K", "d"}

    def test_cdd(self, tas_series):
        a = tas_series(np.array([20, 25, -15, 19]) + K2C)
        assert xci.cooling_degree_days(a).values[0] == 10

    def test_simple_approximation(self, tas_series, tasmin_series,
                                  tasmax_series):
        tmin = np.zeros(365) + 16
        tmin[:7] += [-3, -2, -1, 0, 1, 2, 3]
        tmean = np.zeros(365) + 18
        tmax = np.zeros(365) + 20
        # reference fixture starts 2000-07-01 → first YS period holds 184
        # days, of which 182 contribute 0.5 K d each
        out = xci.cooling_degree_days_approximation(
            tasmax_series(tmax + K2C, start="2000-07-01"),
            tasmin_series(tmin + K2C, start="2000-07-01"),
            tas_series(tmean + K2C, start="2000-07-01"))
        np.testing.assert_allclose(np.asarray(out.values)[:1], 91.0,
                                   rtol=1e-6)


class TestHeatingDegreeDays:
    def test_simple(self, tas_series):
        a = np.zeros(365) + 17
        a[:7] += [-3, -2, -1, 0, 1, 2, 3]
        out = xci.heating_degree_days(tas_series(a + K2C))
        np.testing.assert_array_equal(np.asarray(out.values)[:1], 6)
        np.testing.assert_array_equal(np.asarray(out.values)[1:], 0)

    def test_simple_approximation(self, tas_series, tasmin_series,
                                  tasmax_series):
        tmin = np.zeros(365) + 15
        tmean = np.zeros(365) + 17
        tmax = np.zeros(365) + 19
        tmax[:7] += [-3, -2, -1, 0, 1, 2, 3]
        out = xci.heating_degree_days_approximation(
            tasmax_series(tmax + K2C, start="2000-07-01"),
            tasmin_series(tmin + K2C, start="2000-07-01"),
            tas_series(tmean + K2C, start="2000-07-01"))
        np.testing.assert_allclose(np.asarray(out.values)[:1], 89.75,
                                   rtol=1e-6)


class TestGrowingDegreeDays:
    def test_simple(self, tas_series):
        a = np.zeros(365)
        a[0] = 5  # default thresh at 4
        assert xci.growing_degree_days(tas_series(a + K2C)).values[0] == 1


class TestDailyFreezeThawCycles:
    @pytest.mark.parametrize(
        "thresholds",
        [{}, {"thresh_tasmax": "0 degC", "thresh_tasmin": "0 degC"}],
    )
    def test_simple(self, tasmin_series, tasmax_series, thresholds):
        mn = np.zeros(365)
        mx = np.zeros(365)
        mn[10:20] -= 1   # 10 days mn below 0
        mx[10:15] += 1   # 5 of them with mx above 0
        mn[40:44] += [1, 1, -1, -1]
        mx[40:44] += [1, -1, 1, -1]  # 1 joint day in 2nd month
        out = xci.multiday_temperature_swing(
            tasmin_series(mn + K2C), tasmax_series(mx + K2C), **thresholds,
            op="sum", window=1, freq="MS")
        vals = np.asarray(out.values)
        np.testing.assert_array_equal(vals[:2], [5, 1])
        np.testing.assert_array_equal(vals[2:], 0)


class TestDailyPrIntensity:
    def test_simple(self, pr_series):
        a = np.zeros(365)
        a[3:8] += [0.5, 1, 2, 3, 4]
        out = xci.daily_pr_intensity(pr_series(a), thresh="1 kg/m**2/s")
        np.testing.assert_allclose(np.asarray(out.values)[0],
                                   2.5 * 3600 * 24, rtol=1e-6)

    def test_mm(self, pr_series):
        a = np.zeros(365)
        a[3:8] += [0.5, 1, 2, 3, 4]
        pr = pr_series(a, units="mm/d")
        out = xci.daily_pr_intensity(pr, thresh="1 mm/day")
        np.testing.assert_allclose(np.asarray(out.values)[0], 2.5, rtol=1e-6)


class TestLastSpringFrost:
    def test_simple(self, tas_series):
        a = np.zeros(365)
        a[180:270] = 303.15
        lsf = xci.last_spring_frost(tas_series(a, start="2000-01-01"))
        assert lsf.values[0] == 180
        assert lsf.attrs["units"] == "1"
        assert lsf.attrs["is_dayofyear"] == 1


class TestFirstDayBelow:
    def test_simple(self, tas_series):
        a = np.zeros(365)
        a[180:270] = 303.15
        fdb = xci.first_day_temperature_below(
            tas_series(a, start="2000-01-01"))
        assert fdb.values[0] == 271

        fdb = xci.first_day_temperature_below(
            tas_series(np.full(365, 303.15), start="2000-01-01"))
        assert np.isnan(fdb.values[0])
        assert fdb.attrs["units"] == "1"
        assert fdb.attrs["is_dayofyear"] == 1

    def test_below_forbidden(self, tasmax_series):
        a = np.zeros(365) + 307
        a[180:270] = 270
        with pytest.raises(ValueError):
            xci.first_day_temperature_below(
                tasmax_series(a, start="2000-01-01"), op=">=")


class TestFirstDayAbove:
    def test_simple(self, tas_series):
        a = np.zeros(365) + 307
        a[180:270] = 270
        tas = tas_series(a, start="2000-01-01")
        assert xci.first_day_temperature_above(tas).values[0] == 1
        assert xci.first_day_temperature_above(
            tas, after_date="07-01").values[0] == 271

        fda = xci.first_day_temperature_above(
            tas_series(np.full(365, 270.0), start="2000-01-01"))
        assert np.isnan(fda.values[0])
        assert fda.attrs["units"] == "1"
        assert fda.attrs["is_dayofyear"] == 1

    def test_thresholds(self, tas_series):
        tg = np.zeros(365) - 1
        w = 5
        tg[10:10 + w - 1] += 6  # too short
        tg[20:20 + w] += 1      # does not cross threshold
        tg[30:30 + w] += 6      # ok
        tg[40:40 + w + 1] += 6  # second valid, ignored
        tg = tas_series(tg + K2C, start="2000-01-01")
        out = xci.first_day_temperature_above(tg, thresh="0 degC", window=w)
        assert out.values[0] == 31
        assert out.attrs["units"] == "1"

    def test_above_forbidden(self, tasmax_series):
        a = np.zeros(365) + 307
        a[180:270] = 270
        with pytest.raises(ValueError):
            xci.first_day_temperature_above(
                tasmax_series(a, start="2000-01-01"), op="<")

    def test_no_start(self, tas_series):
        tg = tas_series(np.zeros(365) - 1, start="2000-01-01")
        out = xci.first_day_temperature_above(tg, thresh="0 degC", window=5)
        np.testing.assert_equal(np.asarray(out.values), [np.nan])


class TestMaximumConsecutiveDryDays:
    def test_simple(self, pr_series):
        a = np.zeros(365) + 10
        a[5:15] = 0
        out = xci.maximum_consecutive_dry_days(pr_series(a), freq="MS")
        assert out.values[0] == 10

    def test_run_start_at_0(self, pr_series):
        a = np.zeros(365) + 10
        a[:10] = 0
        out = xci.maximum_consecutive_dry_days(pr_series(a), freq="MS")
        assert out.values[0] == 10

    @pytest.mark.parametrize("resample_before_rl,expected",
                             [(True, 26), (False, 30)])
    def test_resampling_order(self, pr_series, resample_before_rl, expected):
        a = np.zeros(365) + 10
        a[5:35] = 0
        out = xci.maximum_consecutive_dry_days(
            pr_series(a), freq="MS", resample_before_rl=resample_before_rl)
        assert out.values[0] == expected


class TestMaximumConsecutiveTxDays:
    def test_simple(self, tasmax_series):
        a = np.zeros(365) + 273.15
        a[5:15] += 30
        tx = tasmax_series(a, start="2010-01-01")
        out = xci.maximum_consecutive_tx_days(tx, thresh="25 degC", freq="MS")
        assert out.values[0] == 10
        np.testing.assert_array_almost_equal(np.asarray(out.values)[1:], 0)
