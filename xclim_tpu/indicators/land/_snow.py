"""Snow indicator declarations (reference: xclim:src/xclim/indicators/land/_snow.py)."""

from __future__ import annotations

from xclim_tpu import indices
from xclim_tpu.core.indicator import Daily

__all__ = [
    "blowing_snow",
    "snd_days_above",
    "snd_season_end",
    "snd_season_length",
    "snd_season_start",
    "snd_storm_days",
    "snw_days_above",
    "snw_season_end",
    "snw_season_length",
    "snw_season_start",
    "snw_storm_days",
    "snow_depth",
]


class Snow(Daily):
    realm = "land"
    keywords = "snow"


snd_season_length = Snow(
    identifier="snd_season_length",
    title="Snow cover duration (depth)",
    units="days",
    long_name="Number of days with snow depth at or above {thresh}",
    description="The duration of the snow season, starting with at least {window} "
                "days with snow depth above {thresh} and ending with at least "
                "{window} days with snow depth under {thresh}.",
    compute=indices.snd_season_length,
)

snw_season_length = Snow(
    identifier="snw_season_length",
    title="Snow cover duration (amount)",
    units="days",
    long_name="Number of days with snow amount at or above {thresh}",
    description="The duration of the snow season, defined by snow amount {thresh}.",
    compute=indices.snw_season_length,
)

snd_season_start = Snow(
    identifier="snd_season_start",
    title="Start date of continuous snow depth cover",
    units="1",
    long_name="Start date of continuous snow depth cover",
    description="Day of year when snow depth is above {thresh} for at least "
                "{window} days.",
    compute=indices.snd_season_start,
)

snw_season_start = Snow(
    identifier="snw_season_start",
    title="Start date of continuous snow amount cover",
    units="1",
    long_name="Start date of continuous snow amount cover",
    description="Day of year when snow amount is above {thresh} for at least "
                "{window} days.",
    compute=indices.snw_season_start,
)

snd_season_end = Snow(
    identifier="snd_season_end",
    title="End date of continuous snow depth cover",
    units="1",
    long_name="End date of continuous snow depth cover",
    description="Day of year when snow depth is below {thresh} for at least "
                "{window} days.",
    compute=indices.snd_season_end,
)

snw_season_end = Snow(
    identifier="snw_season_end",
    title="End date of continuous snow amount cover",
    units="1",
    long_name="End date of continuous snow amount cover",
    description="Day of year when snow amount is below {thresh} for at least "
                "{window} days.",
    compute=indices.snw_season_end,
)

snd_storm_days = Snow(
    identifier="snd_storm_days",
    title="Winter storm days (depth)",
    units="days",
    long_name="Days with snowfall depth accumulation at or above {thresh}",
    description="{freq} number of days with snowfall accumulation above {thresh}.",
    compute=indices.snd_storm_days,
)

snw_storm_days = Snow(
    identifier="snw_storm_days",
    title="Winter storm days (amount)",
    units="days",
    long_name="Days with snowfall amount accumulation at or above {thresh}",
    description="{freq} number of days with snowfall amount accumulation above "
                "{thresh}.",
    compute=indices.snw_storm_days,
)

snd_days_above = Snow(
    identifier="snd_days_above",
    title="Days with snow (depth)",
    units="days",
    long_name="Number of days with snow depth at or above {thresh}",
    description="{freq} number of days with snow depth at or above {thresh}.",
    compute=indices.snd_days_above,
)

snw_days_above = Snow(
    identifier="snw_days_above",
    title="Days with snow (amount)",
    units="days",
    long_name="Number of days with snow amount at or above {thresh}",
    description="{freq} number of days with snow amount at or above {thresh}.",
    compute=indices.snw_days_above,
)

blowing_snow = Snow(
    identifier="blowing_snow",
    title="Blowing snow days",
    units="days",
    long_name="Days with snowfall and wind speed at or above given thresholds",
    description="{freq} number of days with snowfall over last {window} days "
                "above {snd_thresh} and wind speed above {sfcWind_thresh}.",
    compute=indices.blowing_snow,
)


snow_depth = Snow(
    identifier="snow_depth",
    title="Mean snow depth",
    units="cm",
    long_name="Mean of daily snow depth",
    description="{freq} mean of daily mean snow depth.",
    cell_methods="time: mean over days",
    compute=indices.snow_depth,
)
