"""API-parity guarantees against the reference (Ouranosinc/xclim).

These tests lock in the parity audits: every public name the reference
exposes must resolve in the corresponding xclim_tpu module. The reference
identifier/name lists are frozen here (from /root/reference @ 2026-07-23)
so the suite runs without the reference mounted."""

import numpy as np
import pytest

# the 216 indicator identifiers declared in the reference's Python modules
REF_INDICATOR_IDS = """
api aridity_index australian_hardiness_zones base_flow_index
base_flow_index_seasonal_ratio biologically_effective_degree_days
blowing_snow calm_days
cdd cffwis clearness_index cold_and_dry_days
cold_and_wet_days cold_spell_days cold_spell_duration_index
cold_spell_frequency
cold_spell_max_length cold_spell_total_length consecutive_frost_days
consecutive_frost_free_days
cool_night_index cooling_degree_days cooling_degree_days_approximation
corn_heat_units
cp cu cwd days_over_precip_doy_thresh
days_over_precip_thresh days_with_snow dc degree_days_exceedance_date
df dlyfrzthw dmc doy_qmax
doy_qmin dry_days dry_spell_frequency dry_spell_max_length
dry_spell_total_length dryness_index dtr dtrmax
dtrvar e_sat effective_growing_degree_days etr
ffdi fire_season first_day_tg_above first_day_tg_below
first_day_tn_above first_day_tn_below first_day_tx_above first_day_tx_below
first_snowfall fit flow_index fraction_over_precip_doy_thresh
fraction_over_precip_thresh freezethaw_spell_frequency
freezethaw_spell_max_length freezethaw_spell_mean_length
freezing_degree_days freshet_start frost_days frost_free_season_end
frost_free_season_length frost_free_season_start frost_free_spell_max_length
frost_season_length
growing_degree_days growing_season_end growing_season_length
growing_season_start
heat_index heat_spell_frequency heat_spell_max_length
heat_spell_total_length
heat_wave_frequency heat_wave_index heat_wave_max_length
heat_wave_total_length
heating_degree_days heating_degree_days_approximation high_flow_frequency
high_precip_low_temp
holiday_snow_and_snowfall_days holiday_snow_days hot_days
hot_spell_frequency
hot_spell_max_length hot_spell_max_magnitude hot_spell_total_length
huglin_index
humidex hurs hurs_fromdewpoint huss
huss_fromdewpoint ice_days jetstream_metric_woollings kbdi
lag_snowpack_flow_peaks last_snowfall last_spring_frost late_frost_days
latitude_temperature_index liquid_precip_ratio liquidprcpavg liquidprcptot
longwave_upwelling_radiation_from_net_downwelling low_flow_frequency
max_n_day_precipitation_amount max_pr_intensity
maximum_consecutive_warm_days mean_radiant_temperature
mean_temperature_from_max_and_min melt_and_precip_max
potential_evapotranspiration prcpavg prcptot prlp
prsn rain_frzgr rain_season rb_flashiness_index
return_level rprctot runoff_ratio rx1day
sdii sea_ice_area sea_ice_extent sen_slope
sfcWind_max sfcWind_mean sfcWind_min sfcWindmax_max
sfcWindmax_mean sfcWindmax_min sgi
shortwave_upwelling_radiation_from_net_downwelling
snd_days_above snd_max_doy snd_season_end snd_season_length
snd_season_start snd_storm_days snd_to_snw snow_depth
snow_melt_we_max snowfall_frequency snowfall_intensity snw_days_above
snw_max snw_max_doy snw_season_end snw_season_length
snw_season_start snw_storm_days snw_to_snd solidprcpavg
solidprcptot spei spi ssi
stats tdps_from_huss tg10p tg90p
tg_days_above tg_days_below tg_max tg_mean
tg_min thawing_degree_days tn10p tn90p
tn_days_above tn_days_below tn_max tn_mean
tn_min tropical_nights tx10p tx90p
tx_days_above tx_days_below tx_max tx_mean
tx_min tx_tn_days_above usda_hardiness_zones utci
vapor_pressure vapor_pressure_deficit warm_and_dry_days warm_and_wet_days
warm_spell_duration_index water_budget water_budget_from_tas
water_cycle_intensity
wet_prcptot wet_spell_frequency wet_spell_max_length wet_spell_total_length
wetdays wetdays_prop wind_chill wind_power_potential
wind_profile wind_speed_from_vector wind_vector_from_speed windy_days
""".split()


def test_all_reference_indicator_identifiers_registered():
    from xclim_tpu.core.indicator import registry

    mine = {k.lower() for k in registry}
    missing = sorted(r for r in set(REF_INDICATOR_IDS) if r.lower() not in mine)
    assert missing == [], f"missing indicator identifiers: {missing}"


@pytest.mark.parametrize("module,names", [
    ("xclim_tpu.core.calendar",
     ["percentile_doy", "select_time", "convert_doy", "convert_calendar",
      "stack_periods", "unstack_periods", "mask_between_doys",
      "split_time_to_season_year", "is_offset_divisor", "within_bnds_doy",
      "time_bnds", "parse_offset", "construct_offset", "date_range",
      "uniform_calendars", "doy_to_days_since", "days_since_to_doy",
      "climatological_mean_doy", "get_calendar", "common_calendar"]),
    ("xclim_tpu.core.units",
     ["convert_units_to", "declare_units", "declare_relative_units",
      "to_agg_units", "rate2amount", "amount2rate", "amount2lwethickness",
      "rate2flux", "flux2rate", "pint2cfattrs", "infer_context",
      "cf_conversion", "pint_multiply", "ensure_absolute_temperature",
      "str2pint", "units2pint", "pint2cfunits"]),
    ("xclim_tpu.core.missing",
     ["MissingAny", "MissingWMO", "MissingPct", "AtLeastNValid",
      "MissingSomeButNotAll", "missing_any", "missing_wmo", "missing_pct",
      "at_least_n_valid", "missing_from_context",
      "missing_some_but_not_all", "expected_count"]),
    ("xclim_tpu.core.formatting",
     ["AttrFormatter", "default_formatter", "merge_attributes",
      "update_history", "update_xclim_history", "gen_call_string",
      "parse_doc", "prefix_attrs", "unprefix_attrs",
      "get_percentile_metadata", "generate_indicator_docstring"]),
    ("xclim_tpu.core.utils",
     ["calc_perc", "nan_calc_percentiles", "InputKind",
      "infer_kind_from_parameter", "uses_dask", "lazy_indexing",
      "is_percentile_dataarray", "split_auxiliary_coordinates"]),
    ("xclim_tpu.ensembles",
     ["create_ensemble", "ensemble_percentiles",
      "ensemble_mean_std_max_min", "robustness_fractions",
      "robustness_categories", "robustness_coefficient",
      "kkz_reduce_ensemble", "kmeans_reduce_ensemble", "make_criteria",
      "hawkins_sutton", "lafferty_sriver"]),
    ("xclim_tpu.analog",
     ["spatial_analogs", "seuclidean", "nearest_neighbor", "zech_aslan",
      "szekely_rizzo", "friedman_rafsky", "kolmogorov_smirnov", "kldiv",
      "mahalanobis", "metric", "standardize"]),
    ("xclim_tpu.sdba",
     ["EmpiricalQuantileMapping", "DetrendedQuantileMapping",
      "QuantileDeltaMapping", "Scaling", "LOCI", "ExtremeValues",
      "Grouper", "npdf_transform", "processing", "properties", "measures"]),
    ("xclim_tpu.testing",
     ["test_timeseries", "generate_atmos", "assert_lazy", "nimbus",
      "open_dataset", "list_input_variables", "show_versions"]),
    ("xclim_tpu.indices.helpers",
     ["day_lengths", "cosine_of_solar_zenith_angle", "solar_declination",
      "extraterrestrial_solar_radiation", "distance_from_sun",
      "time_correction_for_solar_angle", "make_hourly_temperature",
      "resample_map", "jones_day_length_latitude_coefficient"]),
])
def test_module_exports(module, names):
    import importlib

    mod = importlib.import_module(module)
    missing = [n for n in names if not hasattr(mod, n)]
    assert missing == [], f"{module} missing: {missing}"


def test_yaml_module_counts():
    import xclim_tpu.indicators.anuclim as anuclim
    import xclim_tpu.indicators.cf as cf
    import xclim_tpu.indicators.icclim as icclim
    from xclim_tpu.core.indicator import Indicator

    def count(mod):
        return sum(1 for n in dir(mod)
                   if isinstance(getattr(mod, n, None), Indicator))

    assert count(icclim) >= 55
    assert count(anuclim) >= 19
    assert count(cf) >= 55


def test_registry_size():
    from xclim_tpu.core.indicator import registry

    assert len(registry) >= 317


class TestIndicatorModuleAttributeParity:
    """Every module attribute the reference exposes from its indicator
    realms must resolve here too — the reference often exposes long names
    differing from identifiers (e.g. ``maximum_consecutive_dry_days`` for
    ``cdd``; xclim:src/xclim/indicators/atmos/_precip.py:48-65)."""

    @pytest.mark.parametrize("realm", ["atmos", "land", "seaIce", "generic"])
    def test_all_reference_names_resolve(self, realm):
        import ast
        import glob
        import importlib

        ref_names = set()
        for f in glob.glob(f"/root/reference/src/xclim/indicators/{realm}/*.py"):
            for node in ast.walk(ast.parse(open(f).read())):
                if isinstance(node, ast.Assign):
                    for t in node.targets:
                        if isinstance(t, ast.Name) and t.id == "__all__":
                            for e in ast.walk(node.value):
                                if isinstance(e, ast.Constant) and \
                                        isinstance(e.value, str):
                                    ref_names.add(e.value)
        if not ref_names:
            pytest.skip("reference tree unavailable")
        mod = importlib.import_module(f"xclim_tpu.indicators.{realm}")
        missing = sorted(n for n in ref_names if not hasattr(mod, n))
        assert not missing, f"{realm} missing reference attributes: {missing}"
