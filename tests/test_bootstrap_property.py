"""Zhang-2005 bootstrap property battery across index × freq × calendar
(reference: xclim:tests/test_bootstrapping.py:22-76 — VERDICT r1 #5/missing #3).

Property: bootstrapping must raise the in-base exceedance counts more often
than it lowers them (the discontinuity-smoothing effect), and must leave the
out-of-base period untouched.
"""

import numpy as np
import pytest

import xclim_tpu.indices as xci
from xclim_tpu.core.percentiles import percentile_doy
from xclim_tpu.testing.helpers import test_timeseries


def _ar1(alpha, n, rng, positive=False):
    """AR(1) series (xclim:tests/test_bootstrapping.py:130)."""
    wn = rng.standard_normal(n - 1) * np.sqrt(1 - alpha ** 2)
    out = np.empty(n)
    out[0] = rng.standard_normal()
    for i, w in enumerate(wn):
        v = alpha * out[i] + w
        out[i + 1] = abs(v) if positive else v
    return out


@pytest.mark.parametrize(
    "var,p,index,freq,calendar",
    [
        ("tas", 98, "tg90p", "MS", "standard"),
        ("tasmin", 98, "tn90p", "YS-JUL", "standard"),
        ("tasmax", 98, "tx90p", "QS-APR", "standard"),
        ("tasmax", 98, "tx90p", "QS-APR", "noleap"),
        ("tasmin", 2, "tn10p", "MS", "standard"),
        ("tasmax", 2, "tx10p", "YS", "standard"),
        ("tasmax", 2, "tx10p", "YS", "noleap"),
        ("tasmax", 2, "tx10p", "YS", "360_day"),
        ("tas", 2, "tg10p", "MS", "standard"),
        ("tasmax", 98, "warm_spell_duration_index", "MS", "standard"),
        ("tasmin", 2, "cold_spell_duration_index", "MS", "standard"),
        ("pr", 99, "days_over_precip_thresh", "MS", "standard"),
        ("pr", 98, "fraction_over_precip_thresh", "MS", "standard"),
        ("pr", 98, "fraction_over_precip_thresh", "MS", "noleap"),
    ],
)
@pytest.mark.slow
def test_bootstrap_property(var, p, index, freq, calendar):
    rng = np.random.default_rng(seed=list(map(ord, "𝕽𝔞𝖓𝔡𝖔𝔪")))
    ndays = {"standard": int(4 * 365.25), "noleap": 4 * 365,
             "360_day": 4 * 360}[calendar]
    arr = _ar1(0.8, ndays, rng, positive=(var == "pr"))
    da = test_timeseries(arr.astype(np.float32), variable=var,
                         start="2000-01-01", calendar=calendar)
    in_base = da.time.year <= 2001
    per = percentile_doy(da.sel_time(mask=in_base), per=float(p))
    fn = getattr(xci, index)
    kw = {var: da, f"{var}_per": per, "freq": freq}

    plain = fn(**kw, bootstrap=False)
    boot = fn(**kw, bootstrap=True)

    out_years = np.asarray(plain.time.year)
    in_mask = out_years <= 2001
    out_mask = (out_years >= 2002) & (out_years <= 2003)
    pv = np.asarray(plain.values)
    bv = np.asarray(boot.values)

    up = np.count_nonzero(bv[in_mask] > pv[in_mask])
    down = np.count_nonzero(bv[in_mask] < pv[in_mask])
    assert up > down, (up, down)
    np.testing.assert_allclose(bv[out_mask], pv[out_mask], rtol=1e-6)


def test_bootstrap_no_doy_raises(pr_series):
    with pytest.raises(KeyError):
        xci.fraction_over_precip_thresh(
            pr_series(np.array([1.0, 2.0])), pr_series(np.array([1.0, 2.0])),
            bootstrap=True)
