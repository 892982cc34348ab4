"""Solar-geometry helper oracles (xclim:tests/test_helpers.py:15-266).

External expected values: NOAA solar calculator (declination), engr.scu.edu
solar calculator (extraterrestrial radiation), PyWGBT coszda/cosza (zenith
angle) — the same oracles the reference pins.
"""

import numpy as np
import pytest

from xclim_tpu.core.calendar import TimeIndex, date_range
from xclim_tpu.core.units import convert_units_to
from xclim_tpu.indices import helpers


@pytest.mark.parametrize("method,rtol", [("spencer", 5e3), ("simple", 1e2)])
def test_solar_declination(method, rtol):
    # NOAA https://gml.noaa.gov/grad/solcalc/azel.html
    t = TimeIndex(year=np.array([1793, 1969, 2022]),
                  month=np.array([1, 7, 5]),
                  day=np.array([21, 20, 20]),
                  hour=np.array([10, 20, 16]),
                  minute=np.array([22, 17, 55]),
                  second=np.array([0, 40, 48]))
    exp = [-19.83, 20.64, 20.00]
    got = np.asarray(helpers.solar_declination(t, method=method))
    np.testing.assert_allclose(got, np.deg2rad(exp),
                               atol=rtol * 2 * np.deg2rad(23.44))


@pytest.mark.parametrize("method", ["spencer", "simple"])
def test_extraterrestrial_radiation(method):
    # engr.scu.edu/~emaurer/tools/calc_solar_cgi.pl (non-authoritative,
    # hence the large rtol — same as the reference)
    t = date_range("1900-01-01", periods=3, freq="D", calendar="standard")
    lat = np.array([48.8656, 29.5519, -54.0])
    exp = [99.06, 239.98, 520.01]
    rad = helpers.extraterrestrial_solar_radiation(t, lat, method=method)
    # the reference pairs lat[i] with time[i]; ours broadcasts → diagonal
    got = np.diag(np.asarray(convert_units_to(rad, "W m-2").data))
    np.testing.assert_allclose(got, exp, rtol=3e-2)


class TestCosineSolarZenith:
    @pytest.mark.parametrize("calendar", ["standard", "noleap"])
    def test_sunlit_average_vs_pywgbt(self, calendar):
        # xclim:tests/test_helpers.py:223 — expected generated with PyWGBT
        t = date_range("1900-01-01 00:30", periods=49, freq="h",
                       calendar=calendar)
        lat = np.array([0.0, 45.0, 70.0])
        lon = np.array([-40.0, 0.0, 80.0])
        czda = helpers.cosine_of_solar_zenith_angle(t, lat, lon,
                                                    stat="average",
                                                    sunlit=True)
        exp_czda = np.array([
            [0.0, 0.0610457, 0.0],
            [0.09999178, 0.18221077, 0.0],
            [0.31387116, 0.285383, 0.0],
            [0.52638271, 0.35026199, 0.0],
            [0.70303168, 0.37242693, 0.0],
        ])
        np.testing.assert_allclose(np.asarray(czda.data)[7:12, :], exp_czda,
                                   rtol=1e-3, atol=5e-4)

    def test_full_average_vs_pywgbt(self):
        t = date_range("1900-01-01 00:30", periods=49, freq="h",
                       calendar="standard")
        lat = np.array([0.0, 45.0, 70.0])
        lon = np.array([-40.0, 0.0, 80.0])
        cza = helpers.cosine_of_solar_zenith_angle(t, lat, lon,
                                                   stat="average",
                                                   sunlit=False)
        exp_cza = np.array([
            [-0.83153798, -0.90358335, -0.34065474],
            [-0.90358299, -0.83874813, -0.26062708],
            [-0.91405234, -0.73561867, -0.18790995],
            [-0.86222963, -0.60121893, -0.12745608],
        ])
        np.testing.assert_allclose(np.asarray(cza.data)[:4, :], exp_cza,
                                   rtol=1e-3, atol=5e-4)


class TestDayLength:
    def test_equinox_equator(self):
        # at the equator, day length is ~12 h year-round; at the equinox it
        # is ~12 h at every latitude (reference TestDayLength setup)
        t = date_range("1992-12-01", end="1994-01-01", freq="D",
                       calendar="standard")
        lat = np.array([-60.0, -30.0, 0.0, 30.0, 60.0])
        dl = np.asarray(helpers.day_lengths(t, lat).data)
        eq_idx = [i for i in range(len(t))
                  if t.month[i] == 3 and t.day[i] == 20]
        np.testing.assert_allclose(dl[eq_idx[0]], [12.0] * 5, atol=0.35)
        np.testing.assert_allclose(dl[:, 2], 12.0, atol=0.2)
        # southern summer solstice: long days south, short days north
        sol_idx = [i for i in range(len(t))
                   if t.year[i] == 1992 and t.month[i] == 12
                   and t.day[i] == 21][0]
        assert dl[sol_idx, 0] > 15.0 and dl[sol_idx, 4] < 9.0
